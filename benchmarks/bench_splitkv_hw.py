#!/usr/bin/env python
"""Split-KV merge-overhead timing on real hardware.

On a 1-TensorCore v5e the heuristic returns num_splits=1 (the sequential DMA
walk already saturates HBM), so the split path never engages in production —
this harness FORCES num_splits in {1, 2, 4, 8} at decode shapes where a
multi-core part would split (small batch, long context) and reports the
wall-clock cost of the virtual-row split + LSE merge relative to the plain
kernel. All variants run in ONE process (cross-process variance ~30%).

Reference analog: the split-KV benchmarking behind the occupancy heuristic
(flash_api.cpp:154-192); kernel: paged_decode.paged_attention_splitkv.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vllm_flash_attn_tpu.kernels.paged_decode import (
    paged_attention,
    paged_attention_splitkv,
)
from vllm_flash_attn_tpu.utils.benchmark import benchmark_forward


def run(ctx, batch=1, h=32, h_k=8, d=128, page_size=64, splits=(1, 2, 4, 8)):
    rng = np.random.default_rng(0)
    nps = ctx // page_size
    npages = batch * nps + 1
    kp = jnp.asarray(
        rng.standard_normal((npages, page_size, h_k, d)), jnp.bfloat16
    )
    vp = jnp.asarray(
        rng.standard_normal((npages, page_size, h_k, d)), jnp.bfloat16
    )
    bt = jnp.asarray(
        rng.permutation(batch * nps).reshape(batch, nps).astype(np.int32) + 1
    )
    lens = jnp.full((batch,), ctx, jnp.int32)
    q = jnp.asarray(rng.standard_normal((batch, h, d)), jnp.bfloat16)

    base_sec = None
    for ns in splits:
        if ns == 1:
            fn = lambda q_: paged_attention(q_, kp, vp, lens, bt)
        else:
            fn = lambda q_, ns=ns: paged_attention_splitkv(
                q_, kp, vp, lens, bt, num_splits=ns
            )
        sec, _ = benchmark_forward(fn, q, n_iter=30)
        if ns == 1:
            base_sec = sec
        rel = sec / base_sec if base_sec else float("nan")
        kv_gb = 2 * batch * ctx * h_k * d * 2 / 1e9
        print(
            f"ctx={ctx} b={batch} splits={ns}: {sec*1e6:9.1f} us/step "
            f"({kv_gb/sec:6.1f} GB/s) merge-overhead x{rel:.3f}",
            flush=True,
        )

    # numerics on hardware (the correctness evidence was interpret-only)
    o1 = np.asarray(
        paged_attention(q, kp, vp, lens, bt).astype(jnp.float32)
    )
    o4 = np.asarray(
        paged_attention_splitkv(q, kp, vp, lens, bt, num_splits=4).astype(
            jnp.float32
        )
    )
    err = np.abs(o1 - o4).max()
    print(f"ctx={ctx} splitkv-vs-plain maxerr {err:.2e}", flush=True)
    assert err < 2e-2, err


if __name__ == "__main__":
    t0 = time.time()
    print("devices:", jax.devices(), flush=True)
    for ctx in (8192, 32768):
        run(ctx)
    print(f"total {time.time()-t0:.0f}s", flush=True)
