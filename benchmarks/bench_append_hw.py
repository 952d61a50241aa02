#!/usr/bin/env python
"""Hardware A/B: decode step with vs without the cache append + rotary.

VERDICT r2 item 5: the XLA scatter append is suspected to cost one extra HBM
pass per decode step per layer. This measures the marginal device cost of
append+rotary inside ONE jit (chained scan, scalar readback): if XLA performs
the scatter in place on the scan-carried pool, append ~= no-append and the
in-kernel fusion is moot; if it copies the pool, the gap shows directly.

Usage: python benchmarks/bench_append_hw.py [ctx ...]  (default 2048 8192)
"""
import os
import sys
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


def run(ctx, batch=8, h=32, h_kv=8, d=128, page_size=16, n_iter=20):
    from vllm_flash_attn_tpu.kernels.kv_cache import append_kv_paged
    from vllm_flash_attn_tpu.kernels.paged_decode import paged_attention
    from vllm_flash_attn_tpu.layers.rotary import RotaryEmbedding

    rng = np.random.default_rng(0)
    nps = ctx // page_size
    npages = batch * nps + batch  # slack page per seq for the append
    kp = jnp.asarray(
        rng.standard_normal((npages, page_size, h_kv, d)), jnp.bfloat16
    )
    vp = jnp.asarray(
        rng.standard_normal((npages, page_size, h_kv, d)), jnp.bfloat16
    )
    bt = jnp.asarray(
        rng.permutation(npages).reshape(batch, -1).astype(np.int32)
    )
    # leave room in the last page so the append never overflows
    lens = jnp.full((batch,), ctx - 1, jnp.int32)
    q = jnp.asarray(rng.standard_normal((batch, h, d)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((batch, 1, h_kv, d)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((batch, 1, h_kv, d)), jnp.bfloat16)
    rot = RotaryEmbedding(d)
    cos, sin = rot.tables(ctx + 8)

    def attend_only(carry, _):
        kp_, vp_, q_ = carry
        o = paged_attention(q_, kp_, vp_, lens, bt)
        return (kp_, vp_, o.astype(q_.dtype)), None

    def append_attend(carry, _):
        kp_, vp_, q_ = carry
        from vllm_flash_attn_tpu.layers.rotary import apply_rotary_emb

        pos = lens[:, None]
        kr = apply_rotary_emb(kn, cos, sin, False, positions=pos)
        kp2, vp2 = append_kv_paged(kp_, vp_, kr, vn, lens, bt)
        o = paged_attention(q_, kp2, vp2, lens + 1, bt)
        return (kp2, vp2, o.astype(q_.dtype)), None

    def timed(body):
        @jax.jit
        def many(kp_, vp_, q_):
            c, _ = jax.lax.scan(body, (kp_, vp_, q_), None, length=n_iter)
            return jnp.sum(c[2].astype(jnp.float32))

        t0 = time.time()
        float(many(kp, vp, q))
        t_c = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            float(many(kp, vp, q))
            best = min(best, time.time() - t0)
        return best / n_iter, t_c

    t_a, c_a = timed(attend_only)
    t_b, c_b = timed(append_attend)
    print(
        f"ctx={ctx} b={batch}: attend {t_a*1e6:7.0f} us/step (compile {c_a:.0f}s)"
        f" | +append+rotary {t_b*1e6:7.0f} us/step (compile {c_b:.0f}s)"
        f" | delta {(t_b-t_a)*1e6:6.0f} us",
        flush=True,
    )


if __name__ == "__main__":
    ctxs = [int(x) for x in sys.argv[1:]] or [2048, 8192]
    for c in ctxs:
        run(c)
