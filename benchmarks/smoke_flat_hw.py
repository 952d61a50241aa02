#!/usr/bin/env python
"""Tiny-shape hardware smoke for the flat manual-DMA kernels (PF/PB_CP=flat).

Run BEFORE the 4k flat A/Bs: a Mosaic kernel that fails at RUN time can
wedge the relay ~10 min, so the first hardware exercise of the manual-DMA
ring lowering is at the smallest useful shape. Checks numerics against the
grid kernels on-device.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    t0 = time.time()
    print("devices:", jax.devices(), flush=True)
    from vllm_flash_attn_tpu.kernels.flash_prefill import flash_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, 4, 512, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 4, 512, 128)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 4, 512, 128)), jnp.bfloat16)
    base = np.asarray(
        flash_attention(q, k, v, causal=True, block_q=256, block_k=256,
                        cp=())
        .astype(jnp.float32)
    )
    # the hardware default is cp=("nobounds","fusein") (round-4 winner);
    # assert the compiler knobs do not change numerics on the real device
    dflt = np.asarray(
        flash_attention(q, k, v, causal=True, block_q=256, block_k=256)
        .astype(jnp.float32)
    )
    errd = np.abs(dflt - base).max()
    print(f"fwd default(cpboth)-vs-noknob maxerr {errd:.2e}", flush=True)
    assert errd < 2e-2, errd
    flat = np.asarray(
        flash_attention(
            q, k, v, causal=True, block_q=256, block_k=256, cp=("flat",)
        ).astype(jnp.float32)
    )
    err = np.abs(flat - base).max()
    print(f"fwd flat-vs-base maxerr {err:.2e} ({time.time()-t0:.0f}s)",
          flush=True)
    assert err < 2e-2, err

    # window + GQA (exercises the guarded ring with first > 0)
    basew = np.asarray(
        flash_attention(
            q, k[:, :2], v[:, :2], window=(128, 64), block_q=256, block_k=256
        ).astype(jnp.float32)
    )
    flatw = np.asarray(
        flash_attention(
            q, k[:, :2], v[:, :2], window=(128, 64), block_q=256,
            block_k=256, cp=("flat",),
        ).astype(jnp.float32)
    )
    errw = np.abs(flatw - basew).max()
    print(f"fwd flat window/gqa maxerr {errw:.2e}", flush=True)
    assert errw < 2e-2, errw

    # varlen flat port (VF_CP=flat): packed ragged batch, MQA, seg masking
    from vllm_flash_attn_tpu.kernels.flash_varlen import (
        flash_attention_varlen,
    )

    lens = [300, 212]
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    qv = jnp.asarray(rng.standard_normal((4, sum(lens), 128)), jnp.bfloat16)
    kv_ = jnp.asarray(rng.standard_normal((1, sum(lens), 128)), jnp.bfloat16)
    vv = jnp.asarray(rng.standard_normal((1, sum(lens), 128)), jnp.bfloat16)
    vbase = np.asarray(
        flash_attention_varlen(
            qv, kv_, vv, cu, cu, causal=True, block_q=256, block_k=256,
            cp=(),
        ).astype(jnp.float32)
    )
    vflat = np.asarray(
        flash_attention_varlen(
            qv, kv_, vv, cu, cu, causal=True, block_q=256, block_k=256,
            cp=("flat",),
        ).astype(jnp.float32)
    )
    errv = np.abs(vflat - vbase).max()
    print(f"varlen flat-vs-base maxerr {errv:.2e}", flush=True)
    assert errv < 2e-2, errv

    # backward pair (PB_CP read at import/trace time in this process)
    os.environ["PB_CP"] = "flat"
    from vllm_flash_attn_tpu.kernels.flash_backward_pallas import (
        mha_backward_pallas,
    )
    from vllm_flash_attn_tpu.kernels.flash_backward import mha_backward

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    do = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)
    out, lse = flash_attention(
        qf, kf, vf, causal=True, block_q=256, block_k=256, return_lse=True
    )
    g_flat = mha_backward_pallas(
        qf, kf, vf, out, lse, do, causal=True, sm_scale=1 / np.sqrt(128),
        block_q=256, block_k=256,
    )
    g_ref = mha_backward(
        qf, kf, vf, out, lse, do, None, causal=True,
        sm_scale=1 / np.sqrt(128), window=(-1, -1), softcap=0.0,
    )
    for gf, gr, name in zip(g_flat, g_ref, ("dq", "dk", "dv")):
        e = float(jnp.abs(gf - gr).max())
        print(f"bwd flat {name} vs XLA maxerr {e:.2e}", flush=True)
        assert e < 5e-2, (name, e)
    print(f"FLAT HW SMOKE OK ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
