#!/usr/bin/env python
"""Hardware A/B for the round-4 varlen Pallas backward (real TPU).

Times fwd+bwd of a packed ragged batch (BERT-unpad-style shape) through
both backward routes IN ONE PROCESS:
  - pallas: static max_seqlen threaded -> per-seq bottom-right padding into
    the dense Pallas kernel pair (flash_backward_pallas)
  - xla:    the segment-aware XLA backward (mha_backward_varlen)

Usage: python benchmarks/bench_varlen_bwd_hw.py
"""
import os
import time

import jax

_cache = os.path.expanduser("~/.cache/jax_comp_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

from vllm_flash_attn_tpu.kernels.flash_varlen import flash_attention_varlen


def main():
    rng = np.random.default_rng(0)
    # packed batch: 8 ragged sequences, total 8k tokens, llama-ish heads
    seqlens = [1536, 384, 1024, 2048, 512, 896, 1024, 768]
    total = sum(seqlens)
    h, d = 16, 128
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(seqlens)]), jnp.int32)
    q = jnp.asarray(rng.standard_normal((h, total, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((h, total, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((h, total, d)), jnp.bfloat16)
    ms = max(seqlens)

    def make_step(use_pallas):
        msq = ms if use_pallas else 0

        def loss(q, k, v):
            o = flash_attention_varlen(
                q, k, v, cu, cu, causal=True,
                max_seqlen_q=msq, max_seqlen_k=msq,
            )
            return jnp.sum(o.astype(jnp.float32) ** 2)

        grad = jax.grad(loss, argnums=(0, 1, 2))

        @jax.jit
        def many(q, k, v):
            def body(c, _):
                dq, dk, dv = grad(c, k, v)
                # chain on dq (forces sequential steps) and keep dk/dv alive
                nxt = (
                    c.astype(jnp.float32)
                    + 1e-9 * dq.astype(jnp.float32)
                    + 1e-30 * (jnp.sum(dk) + jnp.sum(dv)).astype(jnp.float32)
                ).astype(c.dtype)
                return nxt, None

            y, _ = jax.lax.scan(body, q, None, length=8)
            return jnp.sum(y.astype(jnp.float32))

        return many

    # analytic attention FLOPs for the packed batch (fwd+bwd = 3.5x fwd,
    # benchmark convention benchmarks/benchmark_flash_attention.py:27-30)
    flops = sum(4 * s * s * h * d / 2 for s in seqlens) * 3.5

    for name, use_pallas in (("xla", False), ("pallas", True)):
        step = make_step(use_pallas)
        t0 = time.time()
        float(step(q, k, v))
        t_compile = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(step(q, k, v))
            best = min(best, time.time() - t0)
        dt = best / 8
        print(
            f"{name:7s} packed fwd+bwd: {dt*1e3:8.2f} ms/step "
            f"({flops/dt/1e12:6.1f} TFLOP/s eq., compile {t_compile:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
