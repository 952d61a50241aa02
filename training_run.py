#!/usr/bin/env python
"""Training entry point (the reference's `python run.py experiment=...` analog,
/root/reference/training/run.py:33-66).

Config = dataclass defaults + YAML experiment file + `key=value` CLI overrides
(dotted paths reach into the model config), replacing the Hydra compose stack:

    python training_run.py experiment=configs/experiments/gpt2-small.yaml \\
        model.n_layer=4 max_steps=200 tp=4 sequence_parallel=true
"""

from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path

import numpy as np


def _coerce(val: str):
    for cast in (int, float):
        try:
            return cast(val)
        except ValueError:
            pass
    if val.lower() in ("true", "false"):
        return val.lower() == "true"
    if val.lower() in ("none", "null"):
        return None
    return val


def parse_overrides(argv):
    exp, overrides = None, {}
    for arg in argv:
        key, _, val = arg.partition("=")
        if key == "experiment":
            exp = val
        else:
            overrides[key] = _coerce(val)
    return exp, overrides


def apply_overrides(cfg, overrides):
    for key, val in overrides.items():
        obj = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        if not hasattr(obj, parts[-1]):
            raise KeyError(f"unknown config key: {key}")
        setattr(obj, parts[-1], val)


def _load_yaml_composed(path: Path, _seen=None):
    """YAML with Hydra-ish composition: an `include:` list names config-group
    files (resolved relative to this file, then to configs/) merged in order
    BEFORE this file's own keys — the `defaults:` list analog of the
    reference's Hydra tree (training/configs/config.yaml:4-18)."""
    import yaml

    _seen = _seen or set()
    path = path.resolve()
    if path in _seen:
        raise ValueError(f"config include cycle at {path}")
    _seen.add(path)
    data = yaml.safe_load(path.read_text()) or {}
    includes = data.pop("include", [])
    merged: dict = {}
    for inc in includes:
        ip = Path(inc)
        if not ip.is_absolute():
            cand = path.parent / ip
            ip = cand if cand.exists() else Path("configs") / ip
        sub = _load_yaml_composed(ip, _seen)
        _deep_merge(merged, sub)
    _deep_merge(merged, data)
    return merged


def _deep_merge(dst: dict, src: dict):
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_merge(dst[k], v)
        else:
            dst[k] = v


_INNER = __import__("re").compile(r"\$\{([^${}]+)\}")


def _safe_eval(expr: str):
    """Arithmetic-only evaluator for `${eval:...}` — an AST walker over a
    whitelist of node/operator types, so YAML files cannot execute arbitrary
    code (the reference confines its OmegaConf eval resolver to arithmetic
    use; here that is enforced, not assumed)."""
    import ast
    import operator as op

    ops = {
        ast.Add: op.add, ast.Sub: op.sub, ast.Mult: op.mul,
        ast.Div: op.truediv, ast.FloorDiv: op.floordiv, ast.Mod: op.mod,
        ast.Pow: op.pow, ast.USub: op.neg, ast.UAdd: op.pos,
    }
    fns = {"min": min, "max": max, "abs": abs, "int": int, "round": round}

    def ev(node):
        if isinstance(node, ast.Expression):
            return ev(node.body)
        if isinstance(node, ast.Constant) and isinstance(
            node.value, (int, float, bool)
        ):
            return node.value
        if isinstance(node, ast.BinOp) and type(node.op) in ops:
            return ops[type(node.op)](ev(node.left), ev(node.right))
        if isinstance(node, ast.UnaryOp) and type(node.op) in ops:
            return ops[type(node.op)](ev(node.operand))
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id in fns
            and not node.keywords
        ):
            return fns[node.func.id](*(ev(a) for a in node.args))
        raise ValueError(
            f"eval: only arithmetic expressions are allowed, got "
            f"{ast.dump(node)} in {expr!r}"
        )

    return ev(ast.parse(expr, mode="eval"))


def _resolve_one(body: str, root: dict):
    """Resolve one innermost interpolation body: `eval:expr`, `div_up:a,b`
    (the reference's OmegaConf resolvers, training/run.py:11-15), or a
    dotted key reference."""
    if body.startswith("eval:"):
        return _safe_eval(body[5:])
    if body.startswith("div_up:"):
        a, b = (int(float(x)) for x in body[7:].split(","))
        return -(-a // b)
    cur = root
    for part in body.split("."):
        cur = cur[part]
    return cur


def _resolve_interpolations(root: dict):
    """Fixpoint-resolve `${...}` interpolations over the merged tree.
    Nested forms like `${eval:${model.n_embd}*4}` resolve inside-out. A
    value that is exactly one interpolation keeps its native type."""
    def resolve_str(s):
        m = _INNER.fullmatch(s.strip())
        if m:
            return _resolve_one(m.group(1), root)
        return _INNER.sub(lambda mm: str(_resolve_one(mm.group(1), root)), s)

    for _ in range(20):
        changed = False

        def walk(node):
            nonlocal changed
            if isinstance(node, dict):
                return {k: walk(v) for k, v in node.items()}
            if isinstance(node, list):
                return [walk(v) for v in node]
            if isinstance(node, str) and "${" in node:
                new = resolve_str(node)
                if new != node:
                    changed = True
                return new
            return node

        new_root = walk(root)
        root.clear()
        root.update(new_root)
        if not changed:
            break
    else:
        raise ValueError("config interpolation did not converge (cycle?)")
    return root


def _strip_scratch(node):
    """Drop `__`-prefixed scratch keys after resolution (the reference
    strips them the same way, training/run.py:36-38)."""
    if isinstance(node, dict):
        return {
            k: _strip_scratch(v)
            for k, v in node.items()
            if not k.startswith("__")
        }
    if isinstance(node, list):
        return [_strip_scratch(v) for v in node]
    return node


def load_experiment(cfg, path: str):
    data = _load_yaml_composed(Path(path))
    data = _strip_scratch(_resolve_interpolations(data))
    model = data.pop("model", {})
    for k, v in model.items():
        setattr(cfg.model, k, v)
    for k, v in data.items():
        setattr(cfg, k, v)


_CONFIG_GROUPS = ("mode", "scheduler", "optimizer", "callbacks", "logger")


def _resolve_experiment(exp: str) -> str:
    """experiment= accepts a path or a name under configs/experiments/
    (Hydra-style `experiment=gpt3/gpt3s-125m`)."""
    p = Path(exp)
    if p.exists():
        return str(p)
    cand = Path("configs/experiments") / (
        exp if exp.endswith(".yaml") else exp + ".yaml"
    )
    if cand.exists():
        return str(cand)
    raise FileNotFoundError(f"experiment config not found: {exp}")


def apply_group(cfg, group: str, name: str):
    """Merge a config-group file (the Hydra `mode=profile` /
    `scheduler=invsqrt` / `optimizer=sgd` group-override analog,
    reference configs/config.yaml:4-18). Falls back to treating the value
    as a plain field override when no group file exists (e.g.
    `optimizer=lamb` sets the field directly)."""
    path = Path("configs") / group / (name + ".yaml")
    if path.exists():
        load_experiment(cfg, str(path))
        return
    if hasattr(cfg, group):
        setattr(cfg, group, _coerce(name))
        return
    raise FileNotFoundError(f"no config group file {path}")


def main(argv=None):
    import os

    if os.environ.get("VFA_PLATFORM"):
        # the axon sitecustomize force-selects the TPU relay regardless of
        # JAX_PLATFORMS; this is the supported escape for CPU smoke runs
        # (jax.config wins over the env when set after import)
        import jax

        jax.config.update("jax_platforms", os.environ["VFA_PLATFORM"])

    from vllm_flash_attn_tpu.training.data import load_token_cache, synthetic_tokens
    from vllm_flash_attn_tpu.training.trainer import TrainConfig, Trainer

    argv = argv if argv is not None else sys.argv[1:]
    exp, overrides = parse_overrides(argv)
    cfg = TrainConfig()
    if exp:
        load_experiment(cfg, _resolve_experiment(exp))
    for group in _CONFIG_GROUPS:
        name = overrides.pop(group, None)
        if name is not None:
            apply_group(cfg, group, str(name))
    data_path = overrides.pop("data", None)
    apply_overrides(cfg, overrides)

    if data_path:
        tokens = load_token_cache(data_path)
    else:
        tokens = synthetic_tokens(
            cfg.model.vocab_size,
            max(cfg.seq_len * cfg.global_batch_size * 64, 1 << 16),
            cfg.seed,
        )

    trainer = Trainer(cfg, tokens)
    resumed = trainer.try_resume()
    print(f"[train] resumed={resumed} mesh dp={trainer.dp} tp={trainer.tp}")
    final = trainer.fit()
    print(json.dumps(final))
    return final


if __name__ == "__main__":
    main()
