#!/usr/bin/env python
"""Roofline benchmark. Prints ONE JSON line for the driver.

Primary metric (BASELINE.json north star): Llama-7B-shape paged-KV decode
attention, tokens/sec/chip. `vs_baseline` is the fraction of the chip's
HBM speed-of-light (decode attention is bandwidth-bound: every step must read
the whole KV cache once; the reference's analogous roofline is the split-KV
occupancy target, flash_api.cpp:154-192).

Timing notes: through the axon relay, block_until_ready does not observe
device completion, so every measurement chains data dependencies and forces a
scalar readback; large iteration counts amortize the relay RTT.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# v5e: 819 GB/s HBM, ~197 bf16 TFLOP/s. Allow override for other chips.
HBM_GBPS = {"TPU v5 lite": 819.0, "TPU v5e": 819.0, "TPU v4": 1228.0,
            "TPU v5p": 2765.0, "TPU v6 lite": 1640.0}
PEAK_TFLOPS_BF16 = {"TPU v5 lite": 197.0, "TPU v5e": 197.0, "TPU v4": 275.0,
                    "TPU v5p": 459.0, "TPU v6 lite": 918.0}


def timed(fn, chain_arg, *args, n_iter=50):
    """sec/iter: the loop is chained INSIDE one jit (lax.scan) so the host
    relay's ~0.7ms per-dispatch overhead is amortized; a scalar readback at
    the end forces real device completion. Operands are explicit jit args so
    they are not embedded into the serialized HLO (relay size limits)."""

    @jax.jit
    def many(y, *a):
        def body(y, _):
            return fn(y, *a).astype(y.dtype), None

        y, _ = jax.lax.scan(body, y, None, length=n_iter)
        return jnp.sum(y.astype(jnp.float32))

    float(many(chain_arg, *args))  # warm + compile
    t0 = time.time()
    float(many(chain_arg, *args))
    return (time.time() - t0) / n_iter


def bench_decode(ctx=2048, batch=8, h=32, h_k=32, d=128, page_size=16):
    from vllm_flash_attn_tpu.kernels.paged_decode import paged_attention

    rng = np.random.default_rng(0)
    pages_per_seq = ctx // page_size
    num_pages = batch * pages_per_seq
    kp = jnp.asarray(
        rng.standard_normal((num_pages, page_size, h_k, d)), jnp.bfloat16
    )
    vp = jnp.asarray(
        rng.standard_normal((num_pages, page_size, h_k, d)), jnp.bfloat16
    )
    bt = jnp.asarray(
        rng.permutation(num_pages).reshape(batch, pages_per_seq).astype(np.int32)
    )
    lens = jnp.full((batch,), ctx, jnp.int32)
    q0 = jnp.asarray(rng.standard_normal((batch, h, d)), jnp.bfloat16)

    def step(q, kp, vp, lens, bt):
        return paged_attention(
            q, kp, vp, lens, bt, pages_per_compute_block=512 // page_size
        )

    dt = timed(step, q0, kp, vp, lens, bt)
    kv_bytes = batch * ctx * 2 * h_k * d * 2  # K+V bf16
    tokens_per_sec = batch / dt
    gbps = kv_bytes / dt / 1e9
    return tokens_per_sec, gbps, dt


def bench_prefill(s=4096, b=1, h=32, d=128):
    from vllm_flash_attn_tpu.kernels.flash_prefill import flash_attention

    rng = np.random.default_rng(1)
    q0 = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)

    def step(q, k, v):
        return flash_attention(q, k, v, causal=True)

    dt = timed(step, q0, k, v, n_iter=20)
    flops = 4 * b * s * s * h * d / 2  # causal convention, benchmarks/benchmark_flash_attention.py:27-30
    return flops / dt / 1e12, dt


def main():
    dev = jax.devices()[0]
    kind = dev.device_kind
    hbm = HBM_GBPS.get(kind, 819.0)
    peak = PEAK_TFLOPS_BF16.get(kind, 197.0)

    tok_s, gbps, dt_d = bench_decode()
    tflops, dt_p = bench_prefill()

    sol_tokens = 8 / ((8 * 2048 * 2 * 32 * 128 * 2) / (hbm * 1e9))
    print(
        f"[bench] device={kind} decode: {tok_s:.0f} tok/s ({gbps:.0f} GB/s, "
        f"{100*gbps/hbm:.1f}% of HBM SoL, step {dt_d*1e6:.0f}us) | "
        f"prefill: {tflops:.1f} TFLOP/s ({100*tflops/peak:.1f}% of peak, "
        f"{dt_p*1e3:.2f}ms @4k)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "llama7b_paged_decode_attn_tokens_per_sec_per_chip",
                "value": round(tok_s, 1),
                "unit": "tokens/s",
                "vs_baseline": round(gbps / hbm, 4),
                "extra": {
                    "decode_hbm_gbps": round(gbps, 1),
                    "prefill_attn_tflops": round(tflops, 2),
                    "prefill_mxu_util": round(tflops / peak, 4),
                    "device": kind,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
