#!/usr/bin/env python
"""In-process A/B of the int8-PV decode experiment (PD_QPV) on hardware.

Measures the int8 decode MARGINAL (ctx 2048 -> 8192) step time with
qpv=False (bf16 PV after a V dequant cast) vs qpv=True (requantized-p
int8 x int8 MXU PV, no V cast) plus the bf16 cache baseline, all in ONE
process (cross-process timing variance on this rig is ~30%). Shapes:
the bench.py llama7b MHA point and a llama-70B-style GQA point.

Usage: python benchmarks/bench_qpv_hw.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vllm_flash_attn_tpu.kernels.kv_quant import QuantizedPages, quantize_pages
from vllm_flash_attn_tpu.kernels.paged_decode import paged_attention

N_ITER = 50


def measure(h, h_k, d=128, page_size=16, batch=8, ctx_points=(2048, 8192)):
    ctx_max = max(ctx_points)
    rng = np.random.default_rng(0)
    pages_per_seq = ctx_max // page_size
    num_pages = batch * pages_per_seq
    kp = jnp.asarray(
        rng.standard_normal((num_pages, page_size, h_k, d)), jnp.float32
    )
    vp = jnp.asarray(
        rng.standard_normal((num_pages, page_size, h_k, d)), jnp.float32
    )
    kq, vq = quantize_pages(kp, vp, jnp.int8)
    kb, vb = kp.astype(jnp.bfloat16), vp.astype(jnp.bfloat16)
    del kp, vp
    bt = jnp.asarray(
        rng.permutation(num_pages).reshape(batch, pages_per_seq).astype(np.int32)
    )
    q0 = jnp.asarray(rng.standard_normal((batch, h, d)), jnp.bfloat16)
    lens_by_ctx = {
        c: jnp.full((batch,), c, jnp.int32) for c in ctx_points
    }
    ppcb = 512 // page_size

    @jax.jit
    def many_bf16(q, kd, vd, lens, bt):
        def body(y, _):
            out = paged_attention(
                y, kd, vd, lens, bt, pages_per_compute_block=ppcb
            )
            return out.astype(y.dtype), None

        y, _ = jax.lax.scan(body, q, None, length=N_ITER)
        return y.sum()

    def make_many_int8(qpv):
        @jax.jit
        def many(q, kd, ks, vd, lens, bt):
            kq_ = QuantizedPages(kd, ks, 0, h_k, d)
            vq_ = QuantizedPages(vd, ks, 64, h_k, d)

            def body(y, _):
                out = paged_attention(
                    y, kq_, vq_, lens, bt,
                    pages_per_compute_block=ppcb, qpv=qpv,
                )
                return out.astype(y.dtype), None

            y, _ = jax.lax.scan(body, q, None, length=N_ITER)
            return y.sum()

        return many

    many_q0 = make_many_int8(False)
    many_q1 = make_many_int8(True)

    variants = {
        "bf16": lambda c: many_bf16(q0, kb, vb, lens_by_ctx[c], bt),
        "int8": lambda c: many_q0(q0, kq.data, kq.scales, vq.data,
                                  lens_by_ctx[c], bt),
        "int8_qpv": lambda c: many_q1(q0, kq.data, kq.scales, vq.data,
                                      lens_by_ctx[c], bt),
    }
    # compile + warm every (variant, ctx) pair first
    for name, fn in variants.items():
        for c in ctx_points:
            t0 = time.time()
            float(fn(c))
            print(f"  warm {name} ctx={c}: {time.time()-t0:.1f}s", flush=True)
    # best-of-3 coherent rounds per variant
    res = {}
    for name, fn in variants.items():
        best = None
        for _ in range(3):
            pt = {}
            for c in ctx_points:
                t0 = time.time()
                float(fn(c))
                pt[c] = (time.time() - t0) / N_ITER
            marg = pt[max(ctx_points)] - pt[min(ctx_points)]
            if best is None or marg < best[0]:
                best = (marg, pt)
        res[name] = best
    return res


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    for label, h, h_k in (("llama7b-mha", 32, 32), ("llama70b-gqa", 32, 8)):
        print(f"== {label} h={h} h_kv={h_k}", flush=True)
        res = measure(h, h_k)
        base = res["bf16"][0]
        for name, (marg, pt) in res.items():
            times = " ".join(
                f"ctx{c}={t*1e6:.0f}us" for c, t in sorted(pt.items())
            )
            print(
                f"  {name:<9} marginal={marg*1e6:.0f}us "
                f"ratio_vs_bf16={marg/base:.3f}  {times}",
                flush=True,
            )


if __name__ == "__main__":
    main()
