#!/usr/bin/env python
"""Attention roofline benchmark (the reference
benchmarks/benchmark_flash_attention.py analog): fwd / bwd / fwd+bwd TFLOP/s
across seqlens and head dims, kernel vs pure-XLA SDPA baseline.

Run on TPU:  python benchmarks/benchmark_flash_attention.py
"""

import math

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vllm_flash_attn_tpu.kernels.flash_prefill import flash_attention
from vllm_flash_attn_tpu.utils.benchmark import (
    attention_flops,
    benchmark_backward,
    benchmark_forward,
)


def sdpa_baseline(q, k, v, causal):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / math.sqrt(
        q.shape[-1]
    )
    if causal:
        sq, sk = s.shape[-2], s.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        s = jnp.where(col > row, -jnp.inf, s)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def main():
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    print(f"device: {jax.devices()[0].device_kind}")
    print(f"{'config':<36} {'flash fwd':>10} {'flash bwd':>10} {'sdpa fwd':>10}")
    for headdim in (64, 128):
        for seqlen in (512, 1024, 2048, 4096, 8192):
            batch = max(1, 16384 // seqlen)  # reference convention: 16k tokens
            nheads = 2048 // headdim
            shape = (batch, nheads, seqlen, headdim)
            q = jnp.asarray(rng.standard_normal(shape), dtype)
            k = jnp.asarray(rng.standard_normal(shape), dtype)
            v = jnp.asarray(rng.standard_normal(shape), dtype)
            for causal in (False, True):
                f, _ = benchmark_forward(
                    lambda q_, k_, v_: flash_attention(q_, k_, v_, causal=causal),
                    q, k, v, n_iter=10,
                )
                bperf = attention_flops(batch, seqlen, headdim, nheads, causal) / f / 1e12
                bwd, _ = benchmark_backward(
                    lambda q_, k_, v_: flash_attention(q_, k_, v_, causal=causal),
                    q, k, v, n_iter=5,
                )
                bwd_tf = attention_flops(batch, seqlen, headdim, nheads, causal, "bwd") / bwd / 1e12
                try:
                    sf, _ = benchmark_forward(
                        lambda q_, k_, v_: sdpa_baseline(q_, k_, v_, causal),
                        q, k, v, n_iter=5,
                    )
                    sdpa_tf = attention_flops(batch, seqlen, headdim, nheads, causal) / sf / 1e12
                except Exception:
                    sdpa_tf = float("nan")  # O(s^2) HBM blowup at long seqlen
                cfg = f"hd{headdim} s{seqlen} b{batch} causal={int(causal)}"
                print(f"{cfg:<36} {bperf:>9.1f}T {bwd_tf:>9.1f}T {sdpa_tf:>9.1f}T")


if __name__ == "__main__":
    main()
