#!/usr/bin/env python
"""Paged-decode benchmark: tokens/s and HBM bandwidth across context lengths,
batch sizes, page sizes and KV dtypes (bf16 / int8 / fp8). The decode-side
counterpart of the reference's split-KV benchmarking (flash_api.cpp:154-192
occupancy heuristic).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vllm_flash_attn_tpu.kernels.kv_quant import QuantizedPages, quantize_pages
from vllm_flash_attn_tpu.kernels.paged_decode import paged_attention
from vllm_flash_attn_tpu.utils.benchmark import benchmark_forward

HBM_GBPS = {"TPU v5 lite": 819.0, "TPU v4": 1228.0, "TPU v5p": 2765.0}


def bench(ctx, batch, h, h_k, d, page_size, kv_dtype, rng):
    nps = ctx // page_size
    npages = batch * nps
    kp = jnp.asarray(rng.standard_normal((npages, page_size, h_k, d)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((npages, page_size, h_k, d)), jnp.float32)
    bt = jnp.asarray(rng.permutation(npages).reshape(batch, nps).astype(np.int32))
    lens = jnp.full((batch,), ctx, jnp.int32)
    q = jnp.asarray(rng.standard_normal((batch, h, d)), jnp.bfloat16)
    if kv_dtype == "bf16":
        kq, vq = kp.astype(jnp.bfloat16), vp.astype(jnp.bfloat16)
        bpt = 2 * h_k * d * 2
    else:
        dt = jnp.int8 if kv_dtype == "int8" else jnp.float8_e4m3fn
        kq, vq = quantize_pages(kp, vp, dt)
        bpt = 2 * h_k * d * 1 + 2 * h_k * 4

    # pools/tables are explicit jit ARGUMENTS (QuantizedPages is a registered
    # pytree): closed-over operands embed as HLO constants and blow the
    # relay's remote-compile HTTP 413 size limit at ctx>=2048
    def fn(q_, kq, vq, lens, bt):
        return paged_attention(q_, kq, vq, lens, bt)

    sec, _ = benchmark_forward(fn, q, kq, vq, lens, bt, n_iter=30)
    gbps = batch * ctx * bpt / sec / 1e9
    return batch / sec, gbps, sec


def main():
    rng = np.random.default_rng(0)
    kind = jax.devices()[0].device_kind
    hbm = HBM_GBPS.get(kind, 819.0)
    print(f"device: {kind} (HBM {hbm:.0f} GB/s)")
    print(f"{'config':<44} {'tok/s':>9} {'GB/s':>7} {'%SoL':>6}")
    for kv_dtype in ("bf16", "int8", "fp8"):
        for ctx in (1024, 2048, 8192):
            for batch in (1, 8, 32):
                if batch * ctx > 262144:
                    continue
                tok_s, gbps, sec = bench(ctx, batch, 32, 32, 128, 16, kv_dtype, rng)
                cfg = f"{kv_dtype} ctx={ctx} b={batch} llama7b ps=16"
                print(f"{cfg:<44} {tok_s:>9.0f} {gbps:>7.0f} {100*gbps/hbm:>5.1f}%")


if __name__ == "__main__":
    main()
