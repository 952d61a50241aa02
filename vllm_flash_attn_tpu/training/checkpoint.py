"""Checkpoint save/restore with crash-autosave and exact-batch resume.

Covers the reference's fault-tolerance surface (SURVEY.md §5.3-5.4):
- ModelCheckpointMine.on_exception crash-autosave
  (training/src/callbacks/model_checkpoint.py:8-17) -> `autosave_on_crash`
  context manager writing `.auto_save` on any exception
- resume-picks-newest of last vs autosave (src/train.py:70-91)
- sampler state rides inside the checkpoint for exact-batch resume
  (language_modeling_hf.py:280-299)

Storage is orbax-checkpoint (the TPU-native array format; handles sharded
arrays across a mesh transparently).
"""

from __future__ import annotations

import contextlib
import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.max_to_keep = max_to_keep

    def _path(self, tag) -> Path:
        return self.directory / str(tag)

    def save(self, tag, state: Any, extra: Optional[dict] = None) -> None:
        """state: any pytree of arrays; extra: small JSON metadata
        (sampler counters, step, wall-clock)."""
        path = self._path(tag)
        if path.exists():
            import shutil

            shutil.rmtree(path)
        self._ckptr.save(path / "state", state)
        self._ckptr.wait_until_finished()
        if extra is not None:
            (path / "extra.json").write_text(json.dumps(extra))
        self._gc()

    def restore(self, tag, abstract_state: Any):
        """abstract_state: pytree of like-shaped arrays/ShapeDtypeStructs."""
        path = self._path(tag)
        state = self._ckptr.restore(path / "state", abstract_state)
        extra_path = path / "extra.json"
        extra = json.loads(extra_path.read_text()) if extra_path.exists() else {}
        return state, extra

    def newest(self) -> Optional[str]:
        """Pick the newest checkpoint — autosave included (src/train.py:70-91)."""
        candidates = [
            p for p in self.directory.iterdir()
            if p.is_dir() and (p / "state").exists()
        ]
        if not candidates:
            return None
        return max(candidates, key=lambda p: p.stat().st_mtime).name

    def _gc(self) -> None:
        tagged = sorted(
            (
                p for p in self.directory.iterdir()
                if p.is_dir() and p.name not in ("auto_save", "last")
            ),
            key=lambda p: p.stat().st_mtime,
        )
        import shutil

        while len(tagged) > self.max_to_keep:
            shutil.rmtree(tagged.pop(0))

    @contextlib.contextmanager
    def autosave_on_crash(self, get_state, get_extra=lambda: None):
        """Write an `auto_save` checkpoint if the wrapped block raises
        (crash-autosave semantics, model_checkpoint.py:8-17)."""
        try:
            yield
        except Exception:
            try:
                self.save("auto_save", get_state(), get_extra())
            except Exception:
                pass
            raise


def load_pretrained_params(
    ckpt_dir: str,
    abstract_params,
    tag: str = None,
    key_remap: dict = None,
    postprocess=None,
):
    """Warm-start / eval-time loader (the reference's load_checkpoint key
    remapping + state-dict postprocessing, src/utils/checkpoint.py:8-29 and
    src/tasks/seq.py:79-88 analogs).

    Restores ONLY the params subtree of a training checkpoint (optimizer
    state and step ignored), then applies `key_remap` — a {old_path_prefix:
    new_path_prefix} mapping over '/'-joined pytree paths — and an optional
    `postprocess(params) -> params` hook.
    """
    import jax.numpy as jnp

    mgr = CheckpointManager(ckpt_dir)
    tag = tag or mgr.newest()
    if tag is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")

    from vllm_flash_attn_tpu.training.train_step import TrainState

    def _abs32(x):
        return jax.ShapeDtypeStruct(x.shape, jnp.float32)

    abstract = TrainState(
        jax.ShapeDtypeStruct((), jnp.int32),
        abstract_params,
        {
            "mu": jax.tree_util.tree_map(_abs32, abstract_params),
            "nu": jax.tree_util.tree_map(_abs32, abstract_params),
        },
    )
    try:
        state, _ = mgr.restore(tag, abstract)
        params = state.params
    except Exception:
        # checkpoints written with a different optimizer layout: retry with
        # params-only best effort via raw orbax restore
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ck:
            raw = ck.restore(str(Path(ckpt_dir) / tag / "state"))
        params = raw["params"] if "params" in raw else raw

    if key_remap:
        flat = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
            for old, new in key_remap.items():
                if key.startswith(old):
                    key = new + key[len(old):]
                    break
            flat[key] = leaf
        params = _unflatten_paths(flat)
    if postprocess is not None:
        params = postprocess(params)
    return params


def _unflatten_paths(flat: dict):
    """'/'-joined path dict -> nested dict/list pytree (list levels detected
    by all-integer keys)."""
    tree: dict = {}
    for key, leaf in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    def fix(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [fix(node[str(i)]) for i in range(len(node))]
        return {k: fix(v) for k, v in node.items()}

    return fix(tree)


class BestCheckpointPolicy:
    """Top-k-on-metric checkpointing (the reference's ModelCheckpoint
    monitor='val/loss' save_top_k policy, configs/experiment/pile/
    base.yaml:62-78). Tracks the k best metric values and evicts the worst's
    checkpoint directory when a better one arrives."""

    def __init__(self, manager: "CheckpointManager", top_k: int = 3,
                 mode: str = "min"):
        self.mgr = manager
        self.top_k = top_k
        self.sign = 1.0 if mode == "min" else -1.0
        # Rebuild _kept from disk so a resumed run evicts/dedups correctly
        # against the checkpoints the previous run left behind.
        self._kept: list = []  # [(signed_metric, tag)]
        import json as _json

        root = manager.directory
        if root.exists():
            for p in sorted(root.glob("best_step_*")):
                extra_path = p / "extra.json"
                try:
                    metric = _json.loads(extra_path.read_text())["metric"]
                except Exception:
                    continue
                self._kept.append((self.sign * float(metric), p.name))
            self._kept.sort()

    def maybe_save(self, metric: float, step: int, state, extra=None) -> bool:
        """Save iff `metric` ranks in the current top-k; returns whether it
        was saved. Tags are best_step_{step}."""
        m = self.sign * float(metric)
        if len(self._kept) >= self.top_k and m >= max(
            v for v, _ in self._kept
        ):
            return False
        tag = f"best_step_{step}"
        self.mgr.save(tag, state, dict(extra or {}, metric=float(metric)))
        # same step saved twice (e.g. after resume): the directory was
        # overwritten, so drop any stale _kept entry with the same tag
        self._kept = [(v, t) for v, t in self._kept if t != tag]
        self._kept.append((m, tag))
        self._kept.sort()
        while len(self._kept) > self.top_k:
            _, worst = self._kept.pop()
            import shutil

            p = self.mgr._path(worst)
            if p.exists():
                shutil.rmtree(p)
        return True

    def best(self):
        """(tag, metric) of the current best, or None."""
        if not self._kept:
            return None
        m, tag = self._kept[0]
        return tag, self.sign * m
