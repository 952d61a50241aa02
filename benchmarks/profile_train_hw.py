#!/usr/bin/env python
"""Profile ONE full train step on hardware and print the device-time
breakdown (round-3 workflow: jax.profiler works through the axon relay;
parse the chrome trace and sum device-track events by op).

Usage: python benchmarks/profile_train_hw.py [n_layer n_embd seq batch]
Env: TB_CE_CHUNK / TB_REMAT / PB_* as in bench_train_hw.py.
"""
import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

import jax

_cache = os.path.expanduser("~/.cache/jax_comp_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))


def group(name: str) -> str:
    """Fold XLA op names into readable buckets."""
    n = name.lower()
    if "flash" in n or "mha" in n or "attn" in n:
        return name.split(".")[0][:48]
    n0 = re.sub(r"[.\d]+$", "", name)
    return n0[:48]


def main():
    args = [int(x) for x in sys.argv[1:]]
    n_layer, n_embd, seq, batch = (args + [4, 2048, 2048, 8])[:4]
    n_head = n_embd // 128

    from vllm_flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
    from vllm_flash_attn_tpu.training.train_step import make_optimizer

    cfg = GPTConfig(
        vocab_size=32000, n_positions=0, n_embd=n_embd, n_layer=n_layer,
        n_head=n_head, rotary_emb_dim=128, gated_mlp=True,
        rms_norm=True, qkv_proj_bias=False, out_proj_bias=False,
        mlp_fc1_bias=False, mlp_fc2_bias=False, activation_function="silu",
        n_inner=int(8 * n_embd / 3) // 128 * 128,
        fused_ce_chunk=int(os.environ.get("TB_CE_CHUNK", "0")),
        remat=os.environ.get("TB_REMAT", "none"),
    )
    model = GPTLMHeadModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.bfloat16)
    opt = make_optimizer(lr=1e-4, warmup_steps=10, total_steps=1000)
    opt_state = jax.jit(opt.init)(params)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 32000, (batch, seq)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 32000, (batch, seq)), jnp.int32)

    NIT = 4

    @jax.jit
    def many(p, os_, it, ids, labels):
        # ids/labels are jit ARGUMENTS (not closures): embedded HLO constants
        # risk the relay's HTTP 413 size limit (CLAUDE.md remote-compile rule)
        def body(c, _):
            p, os_, it = c
            loss, g = jax.value_and_grad(model.loss)(p, ids, labels)
            p2, os2, _ = opt.update(g, os_, p, it)
            return (p2, os2, it + 1), None

        c, _ = jax.lax.scan(body, (p, os_, it), None, length=NIT)
        return jax.tree_util.tree_reduce(
            lambda x, y: x + jnp.sum(y.astype(jnp.float32)), c, 0.0
        )

    it0 = jnp.zeros((), jnp.int32)
    t0 = time.time()
    float(many(params, opt_state, it0, ids, labels))  # compile + warm
    print(f"compile+warm {time.time()-t0:.0f}s", flush=True)

    tdir = "/tmp/train_profile"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        t0 = time.time()
        float(many(params, opt_state, it0, ids, labels))
        wall = time.time() - t0
    print(f"traced wall {wall*1e3:.1f} ms for {NIT} steps", flush=True)

    # parse the chrome trace: sum duration by event name on device tracks
    paths = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        print("NO TRACE FILE FOUND", glob.glob(f"{tdir}/**", recursive=True))
        return
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    # device tracks: pid whose process_name mentions TPU / device
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, n in pid_name.items()
        if ("TPU" in n or "/device" in n.lower()) and "host" not in n.lower()
    }
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            d = float(e.get("dur", 0.0))
            by_op[group(e.get("name", "?"))] += d
            total += d
    print(f"device tracks: {[pid_name[p] for p in dev_pids]}")
    print(f"total device time {total/1e3:.1f} ms ({NIT} steps)")
    for name, d in sorted(by_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{d/1e3:9.2f} ms  {100*d/max(total,1e-9):5.1f}%  {name}")


if __name__ == "__main__":
    main()
