#!/usr/bin/env python
"""In-process A/B of the splash-style folded varlen grid (VF_SPLASH) on
hardware: dense skipped-step grid vs dynamic active-pair enumeration, on
packed causal batches where most dense grid steps are no-ops.

For a packed batch of b equal sequences the dense grid runs ~2b times the
active step count (causal halves within a segment, cross-segment pairs all
skip); the folded grid runs active steps only. This also smoke-tests the
Mosaic dynamic-grid-bound lowering (tiny shape first).

Usage: python benchmarks/bench_varlen_splash_hw.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vllm_flash_attn_tpu.kernels.flash_varlen import flash_attention_varlen

N_ITER = 20


def run_case(seqlens, h=16, h_k=16, d=128, block=512, causal=True):
    total = sum(seqlens)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((h, total, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((h_k, total, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((h_k, total, d)), jnp.bfloat16)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(seqlens)]), jnp.int32)
    flops = 4 * h * d * sum(
        (s * s / 2 if causal else s * s) for s in seqlens
    )

    def make(fold, cp=()):
        @jax.jit
        def many(q, k, v, cu):
            def body(y, _):
                o = flash_attention_varlen(
                    y, k, v, cu, cu, causal=causal,
                    block_q=block, block_k=block, fold=fold, cp=cp,
                )
                return o.astype(y.dtype), None

            y, _ = jax.lax.scan(body, q, None, length=N_ITER)
            return y.sum()

        return many

    fns = {
        "dense": make(False),
        "fold": make(True),
        # round-4 flat manual-DMA structure (VF_CP=flat port of PF_CP=flat)
        "flat": make(False, cp=("flat",)),
        "flat_nb": make(False, cp=("flat", "nobounds")),
        "flat_d3": make(False, cp=("flat", "d3")),
    }
    for name, fn in fns.items():
        t0 = time.time()
        float(fn(q, k, v, cu))
        print(f"  warm {name}: {time.time()-t0:.1f}s", flush=True)
    res = {}
    for name, fn in fns.items():
        times = []
        for _ in range(3):
            t0 = time.time()
            float(fn(q, k, v, cu))
            times.append((time.time() - t0) / N_ITER)
        res[name] = min(times)
    for name, t in res.items():
        print(
            f"  {name:<6} {t*1e6:8.0f}us  {flops/t/1e12:6.1f} TF "
            f"({'x%.2f vs dense' % (res['dense']/t) if name != 'dense' else 'base'})",
            flush=True,
        )


def run_paged_case(lens_q, lens_k, h=16, h_k=4, d=128, page_size=16):
    from vllm_flash_attn_tpu.kernels.varlen_paged import (
        flash_attention_varlen_paged,
    )

    rng = np.random.default_rng(0)
    b = len(lens_q)
    per = max((l + page_size - 1) // page_size for l in lens_k) + 1
    npages = b * per + 2
    kp = jnp.asarray(
        rng.standard_normal((npages, page_size, h_k, d)), jnp.bfloat16
    )
    vp = jnp.asarray(
        rng.standard_normal((npages, page_size, h_k, d)), jnp.bfloat16
    )
    bt = np.zeros((b, per), np.int32)
    perm = rng.permutation(npages)
    off = 0
    for i, l in enumerate(lens_k):
        n = (l + page_size - 1) // page_size
        bt[i, :n] = perm[off : off + n]
        off += n
    bt = jnp.asarray(bt)
    q = jnp.asarray(rng.standard_normal((h, sum(lens_q), d)), jnp.bfloat16)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens_q)]), jnp.int32)
    lk = jnp.asarray(lens_k, jnp.int32)

    def make(fold):
        @jax.jit
        def many(q, kp, vp, cu, lk, bt):
            def body(y, _):
                o = flash_attention_varlen_paged(
                    y, kp, vp, cu, lk, bt, max(lens_q),
                    causal=True, fold=fold,
                )
                return o.astype(y.dtype), None

            y, _ = jax.lax.scan(body, q, None, length=N_ITER)
            return y.sum()

        return many

    fns = {"dense": make(False), "fold": make(True)}
    for name, fn in fns.items():
        t0 = time.time()
        float(fn(q, kp, vp, cu, lk, bt))
        print(f"  warm {name}: {time.time()-t0:.1f}s", flush=True)
    res = {}
    for name, fn in fns.items():
        times = []
        for _ in range(3):
            t0 = time.time()
            float(fn(q, kp, vp, cu, lk, bt))
            times.append((time.time() - t0) / N_ITER)
        res[name] = min(times)
    for name, t in res.items():
        rel = "base" if name == "dense" else "x%.2f vs dense" % (res["dense"] / t)
        print(f"  {name:<6} {t*1e6:8.0f}us  ({rel})", flush=True)


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    # tiny first: catches a Mosaic dynamic-grid lowering reject cheaply
    print("== smoke 2x256 causal (tiny)")
    run_case([256, 256], h=4, h_k=4, block=128)
    print("== packed 8x2048 causal (training shape)")
    run_case([2048] * 8)
    print("== packed 16x1024 causal (many short seqs)")
    run_case([1024] * 16)
    print("== single 4096 causal (prefill-like, fold win should be ~2x max)")
    run_case([4096])
    # paged variant (engine chunked-prefill path), mixed realistic batch
    print("== paged smoke (tiny)")
    run_paged_case([64, 64], [128, 128], h=4, h_k=2)
    print("== paged chunked-prefill mix")
    run_paged_case(
        [512, 1, 256, 1, 1024, 1, 1, 128],
        [2048, 1024, 512, 3072, 1024, 256, 2048, 640],
    )


if __name__ == "__main__":
    main()
