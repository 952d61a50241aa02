"""Pallas TPU flash-attention backward (training hot path).

The reference fork ships NO attention backward (forward-only build,
/root/reference/setup.py:154-171); training here is first-class. Round-3
profiling showed the XLA-level backward (kernels/flash_backward.py) taking
~52% of the train-step device time (~36 ms/layer at b8/2048/d2048 vs ~7 ms
for a roofline kernel), so the hot MHA shape gets a real kernel pair — the
standard TPU two-pass FlashAttention-2 backward (upstream reference dataflow
flash_bwd_kernel.h in Dao-AILab; absent from this fork):

- dQ kernel:   grid (b, h, q_blocks, kv_blocks-serial), dq accumulates in
  VMEM scratch across the kv sweep.
- dK/dV kernel: grid (b, h, kv_blocks, q_blocks-serial), dk/dv accumulate
  across the q sweep.

Both recompute the probability tile from the SAVED LSE — no online max:
p = exp2(q_s . k^T - lse * log2e) with sm_scale*log2(e) pre-folded into q
(scale_softmax_log2 discipline, flash_api.cpp:21-137). All scale constants
fold into the one fused elementwise chain per tile:
    ds_dq = p * (dp - D) * sm_scale          (dq += ds_dq @ k)
    ds_dk = p * (dp - D) / log2(e)           (dk += ds_dk^T @ q_s)
    dv += p^T @ do
where D = rowsum(do * out) is computed once in XLA.

Scope: MHA and GQA (dk/dv accumulate across the q-head group via the
serial sweep axis — the XLA backward's fused group-sum, done by iteration
order), causal/sliding-window. alibi/softcap fall back to the XLA backward
(the custom_vjp dispatcher in flash_prefill picks per trace).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_flash_attn_tpu.config import use_interpret
from vllm_flash_attn_tpu.kernels.flash_prefill import (
    LOG2E,
    MIN_LANES,
    _active_range,
    _flat_pipeline,
    _guard,
    _ring_depth,
    _round_block,
)


def _tile_math(q_s, k, v, do, lse2, dval, *, mask, sm_scale):
    """Shared per-tile recompute: returns (p, ds_dq, ds_dk); operands may be
    pre-zeroed by the caller for partial tiles. lse2/dval are (bq, 128)
    lane-replicated; subtract lane-TILED copies (vreg copies), never a
    1-lane broadcast (Mosaic lowers those poorly — fwd kernel note)."""
    s = jax.lax.dot_general(
        q_s, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk), log2-domain
    nrep = s.shape[1] // MIN_LANES
    lse_big = pltpu.repeat(lse2, nrep, axis=1) if nrep > 1 else lse2
    d_big = pltpu.repeat(dval, nrep, axis=1) if nrep > 1 else dval
    p = jnp.exp2(s - lse_big)
    if mask is not None:
        p = jnp.where(mask, p, 0.0)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    base = p * (dp - d_big)
    if mask is not None:
        # dp is undefined (NaN in interpret mode) at OOB kv columns; p==0
        # there, but 0*NaN poisons — mask the product, not just p
        base = jnp.where(mask, base, 0.0)
    return p, base * sm_scale, base * (1.0 / LOG2E)


def _mask_tile(bq, bk, min_row, col_base, seqlen_q, seqlen_k, offset, wl, wr):
    row = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + min_row
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + col_base
    mask = jnp.logical_and(col < seqlen_k, row < seqlen_q)
    if wr >= 0:
        mask &= col <= row + offset + wr
    if wl >= 0:
        mask &= col >= row + offset - wl
    return mask


def _zero_oob_rows(x, base, limit):
    valid = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + base < limit
    return jnp.where(valid, x, 0)


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref, dq_out, dq_acc, *,
    causal, window, block_q, block_k, seqlen_q, seqlen_k, sm_scale, nk,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    offset = seqlen_k - seqlen_q
    wl, wr = window
    if causal:
        wr = 0
    first, last = _active_range(
        qi, nk, block_q, block_k, seqlen_q, offset, wl, wr
    )

    @pl.when(jnp.logical_and(ki >= first, ki <= last))
    def _run():
        @pl.when(ki == first)
        def _init():
            dq_acc[...] = jnp.zeros(dq_acc.shape, jnp.float32)

        min_row = qi * block_q
        col_base = ki * block_k
        q_s = q_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse2 = lse_ref[0, 0]  # (bq, MIN_LANES) lane-replicated
        dval = d_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]

        def update(masked: bool):
            if masked:
                mask = _mask_tile(
                    block_q, block_k, min_row, col_base, seqlen_q,
                    seqlen_k, offset, wl, wr,
                )
                kk = _zero_oob_rows(k, col_base, seqlen_k)
            else:
                mask, kk = None, k
            _, ds_dq, _ = _tile_math(
                q_s, kk, v, do, lse2, dval, mask=mask, sm_scale=sm_scale
            )
            dq_acc[...] = dq_acc[...] + jax.lax.dot(
                ds_dq.astype(kk.dtype), kk,
                preferred_element_type=jnp.float32,
            )

        needs = col_base + block_k > seqlen_k
        needs |= min_row + block_q > seqlen_q
        if wr >= 0:
            needs |= col_base + block_k - 1 > min_row + offset + wr
        if wl >= 0:
            max_row = jnp.minimum(min_row + block_q, seqlen_q) - 1
            needs |= col_base < max_row + offset - wl
        jax.lax.cond(needs, lambda: update(True), lambda: update(False))

        @pl.when(ki == last)
        def _store():
            dq_out[0, 0] = dq_acc[...].astype(dq_out.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, d_ref, dk_out, dv_out,
    dk_acc, dv_acc, *,
    causal, window, block_q, block_k, seqlen_q, seqlen_k, sm_scale, nq,
    q_per_kv: int = 1,
):
    ki = pl.program_id(2)
    # serial axis enumerates (g, qi): all q blocks of every q head in this
    # kv head's group — dk/dv accumulate across the whole group (the XLA
    # backward's fused group-sum, done by sweep order here)
    t = pl.program_id(3)
    qi = jax.lax.rem(t, nq)
    g = t // nq
    offset = seqlen_k - seqlen_q
    wl, wr = window
    if causal:
        wr = 0
    col_base = ki * block_k
    # active q-block range attending to this kv block (inverse of
    # _active_range): rows with col <= row + offset + wr  and
    # col >= row + offset - wl for some col in the tile
    if wr >= 0:
        first_q = jnp.clip((col_base - offset - wr) // block_q, 0, nq - 1)
    else:
        first_q = jnp.int32(0)
    if wl >= 0:
        last_q = jnp.clip(
            (col_base + block_k - 1 - offset + wl) // block_q, 0, nq - 1
        )
    else:
        last_q = jnp.int32(nq - 1)

    @pl.when(jnp.logical_and(qi >= first_q, qi <= last_q))
    def _run():
        @pl.when(jnp.logical_and(g == 0, qi == first_q))
        def _init():
            dk_acc[...] = jnp.zeros(dk_acc.shape, jnp.float32)
            dv_acc[...] = jnp.zeros(dv_acc.shape, jnp.float32)

        min_row = qi * block_q
        q_s = q_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse2 = lse_ref[0, 0]
        dval = d_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]

        def update(masked: bool):
            if masked:
                mask = _mask_tile(
                    block_q, block_k, min_row, col_base, seqlen_q,
                    seqlen_k, offset, wl, wr,
                )
                # partial q tile: garbage rows would pollute the bq
                # contraction below; p rows are masked, but do rows multiply
                # p in dv — zero them too (0*NaN guard, interpret padding)
                do_ = _zero_oob_rows(do, min_row, seqlen_q)
                q_ = _zero_oob_rows(q_s, min_row, seqlen_q)
            else:
                mask, do_, q_ = None, do, q_s
            p, _, ds_dk = _tile_math(
                q_, k, v, do_, lse2, dval, mask=mask, sm_scale=sm_scale
            )
            # contract the q (row) dim — no explicit transpose
            dv_acc[...] = dv_acc[...] + jax.lax.dot_general(
                p.astype(do_.dtype), do_, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk_acc[...] = dk_acc[...] + jax.lax.dot_general(
                ds_dk.astype(q_.dtype), q_, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        needs = col_base + block_k > seqlen_k
        needs |= min_row + block_q > seqlen_q
        if wr >= 0:
            needs |= col_base + block_k - 1 > min_row + offset + wr
        if wl >= 0:
            max_row = jnp.minimum(min_row + block_q, seqlen_q) - 1
            needs |= col_base < max_row + offset - wl
        jax.lax.cond(needs, lambda: update(True), lambda: update(False))

        @pl.when(jnp.logical_and(g == q_per_kv - 1, qi == last_q))
        def _store():
            dk_out[0, 0] = dk_acc[...].astype(dk_out.dtype)
            dv_out[0, 0] = dv_acc[...].astype(dv_out.dtype)


# ---------------------------------------------- flat manual-DMA variants
# PB_CP=flat (round-4 experiment, same hypothesis as the forward's
# PF_CP=flat): take operand staging away from the grid pipeline. The grid
# shrinks to its parallel axes only; the former serial axis becomes a
# statically-unrolled in-kernel loop whose k/v (dq kernel) or q/do/lse/D
# (dkv kernel) tiles are hand double-buffered HBM->VMEM with
# pltpu.make_async_copy — tile j+1's copies issue before tile j computes.
# All DMA offsets and ring slots are compile-time constants.


def _dq_kernel_flat(
    q_ref, do_ref, lse_ref, d_ref, k_hbm, v_hbm, dq_out,
    dq_acc, k_scr, v_scr, k_sem, v_sem, *,
    causal, window, block_q, block_k, seqlen_q, seqlen_k, sm_scale, nk,
    q_per_kv, depth=2,
):
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    qi = pl.program_id(2)
    hk = hi // q_per_kv
    offset = seqlen_k - seqlen_q
    wl, wr = window
    if causal:
        wr = 0
    first, last = _active_range(
        qi, nk, block_q, block_k, seqlen_q, offset, wl, wr
    )
    dq_acc[...] = jnp.zeros(dq_acc.shape, jnp.float32)
    min_row = qi * block_q
    q_s = q_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    lse2 = lse_ref[0, 0]
    dval = d_ref[0, 0]

    def start(j):
        s = j % depth
        pltpu.make_async_copy(
            k_hbm.at[bi, hk, pl.ds(j * block_k, block_k), :],
            k_scr.at[s], k_sem.at[s],
        ).start()
        pltpu.make_async_copy(
            v_hbm.at[bi, hk, pl.ds(j * block_k, block_k), :],
            v_scr.at[s], v_sem.at[s],
        ).start()

    def wait(j):
        s = j % depth
        pltpu.make_async_copy(
            k_hbm.at[bi, hk, pl.ds(j * block_k, block_k), :],
            k_scr.at[s], k_sem.at[s],
        ).wait()
        pltpu.make_async_copy(
            v_hbm.at[bi, hk, pl.ds(j * block_k, block_k), :],
            v_scr.at[s], v_sem.at[s],
        ).wait()

    def tile(j):
        def body():
            wait(j)
            col_base = j * block_k
            k = k_scr[j % depth]
            v = v_scr[j % depth]

            def update(masked: bool):
                if masked:
                    mask = _mask_tile(
                        block_q, block_k, min_row, col_base, seqlen_q,
                        seqlen_k, offset, wl, wr,
                    )
                    kk = _zero_oob_rows(k, col_base, seqlen_k)
                else:
                    mask, kk = None, k
                _, ds_dq, _ = _tile_math(
                    q_s, kk, v, do, lse2, dval, mask=mask, sm_scale=sm_scale
                )
                dq_acc[...] = dq_acc[...] + jax.lax.dot(
                    ds_dq.astype(kk.dtype), kk,
                    preferred_element_type=jnp.float32,
                )

            needs = col_base + block_k > seqlen_k
            needs |= min_row + block_q > seqlen_q
            if wr >= 0:
                needs |= col_base + block_k - 1 > min_row + offset + wr
            if wl >= 0:
                max_row = jnp.minimum(min_row + block_q, seqlen_q) - 1
                needs |= col_base < max_row + offset - wl
            jax.lax.cond(needs, lambda: update(True), lambda: update(False))
        return body

    _flat_pipeline(nk, first, last, start, tile, depth=depth)

    dq_out[0, 0] = dq_acc[...].astype(dq_out.dtype)


def _dkv_kernel_flat(
    k_ref, v_ref, q_hbm, do_hbm, lse_hbm, d_hbm, dk_out, dv_out,
    dk_acc, dv_acc, q_scr, do_scr, lse_scr, dv_scr_st, q_sem, do_sem,
    lse_sem, dval_sem, *,
    causal, window, block_q, block_k, seqlen_q, seqlen_k, sm_scale, nq,
    q_per_kv, depth=2,
):
    bi = pl.program_id(0)
    hk = pl.program_id(1)
    ki = pl.program_id(2)
    offset = seqlen_k - seqlen_q
    wl, wr = window
    if causal:
        wr = 0
    col_base = ki * block_k
    if wr >= 0:
        first_q = jnp.clip((col_base - offset - wr) // block_q, 0, nq - 1)
    else:
        first_q = 0
    if wl >= 0:
        last_q = jnp.clip(
            (col_base + block_k - 1 - offset + wl) // block_q, 0, nq - 1
        )
    else:
        last_q = nq - 1

    dk_acc[...] = jnp.zeros(dk_acc.shape, jnp.float32)
    dv_acc[...] = jnp.zeros(dv_acc.shape, jnp.float32)
    k = k_ref[0, 0]
    v = v_ref[0, 0]

    def active(t):
        qi = t % nq  # static
        return (qi >= first_q) & (qi <= last_q)

    def start(t):
        s = t % depth
        g, qi = t // nq, t % nq  # static
        h_ = hk * q_per_kv + g
        row = qi * block_q
        pltpu.make_async_copy(
            q_hbm.at[bi, h_, pl.ds(row, block_q), :],
            q_scr.at[s], q_sem.at[s],
        ).start()
        pltpu.make_async_copy(
            do_hbm.at[bi, h_, pl.ds(row, block_q), :],
            do_scr.at[s], do_sem.at[s],
        ).start()
        pltpu.make_async_copy(
            lse_hbm.at[bi, h_, pl.ds(row, block_q), :],
            lse_scr.at[s], lse_sem.at[s],
        ).start()
        pltpu.make_async_copy(
            d_hbm.at[bi, h_, pl.ds(row, block_q), :],
            dv_scr_st.at[s], dval_sem.at[s],
        ).start()

    def wait(t):
        s = t % depth
        g, qi = t // nq, t % nq
        h_ = hk * q_per_kv + g
        row = qi * block_q
        pltpu.make_async_copy(
            q_hbm.at[bi, h_, pl.ds(row, block_q), :],
            q_scr.at[s], q_sem.at[s],
        ).wait()
        pltpu.make_async_copy(
            do_hbm.at[bi, h_, pl.ds(row, block_q), :],
            do_scr.at[s], do_sem.at[s],
        ).wait()
        pltpu.make_async_copy(
            lse_hbm.at[bi, h_, pl.ds(row, block_q), :],
            lse_scr.at[s], lse_sem.at[s],
        ).wait()
        pltpu.make_async_copy(
            d_hbm.at[bi, h_, pl.ds(row, block_q), :],
            dv_scr_st.at[s], dval_sem.at[s],
        ).wait()

    def tile(t):
        def body():
            wait(t)
            qi = t % nq
            min_row = qi * block_q
            s = t % depth
            q_s = q_scr[s]
            do = do_scr[s].astype(jnp.float32)
            lse2 = lse_scr[s]
            dval = dv_scr_st[s]

            def update(masked: bool):
                if masked:
                    mask = _mask_tile(
                        block_q, block_k, min_row, col_base, seqlen_q,
                        seqlen_k, offset, wl, wr,
                    )
                    do_ = _zero_oob_rows(do, min_row, seqlen_q)
                    q_ = _zero_oob_rows(q_s, min_row, seqlen_q)
                else:
                    mask, do_, q_ = None, do, q_s
                p, _, ds_dk = _tile_math(
                    q_, k, v, do_, lse2, dval, mask=mask, sm_scale=sm_scale
                )
                dv_acc[...] = dv_acc[...] + jax.lax.dot_general(
                    p.astype(do_.dtype), do_, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dk_acc[...] = dk_acc[...] + jax.lax.dot_general(
                    ds_dk.astype(q_.dtype), q_, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            needs = col_base + block_k > seqlen_k
            needs |= min_row + block_q > seqlen_q
            if wr >= 0:
                needs |= col_base + block_k - 1 > min_row + offset + wr
            if wl >= 0:
                max_row = jnp.minimum(min_row + block_q, seqlen_q) - 1
                needs |= col_base < max_row + offset - wl
            jax.lax.cond(needs, lambda: update(True), lambda: update(False))
        return body

    # the dkv serial axis has PER-TILE activity (qi(t) in range), not a
    # contiguous [first, last] span — use per-id guards, pipelined by depth:
    # iteration t starts t+depth-1 and computes t (slot reuse is safe: tile
    # t+depth's start happens at iteration t+1, after t computed)
    nt = q_per_kv * nq
    for tt in range(min(depth - 1, nt)):
        _guard(active(tt), lambda tt=tt: start(tt))
    for t in range(nt):
        if t + depth - 1 < nt:
            _guard(active(t + depth - 1), lambda t=t: start(t + depth - 1))
        _guard(active(t), tile(t))

    dk_out[0, 0] = dk_acc[...].astype(dk_out.dtype)
    dv_out[0, 0] = dv_acc[...].astype(dv_out.dtype)


def supports_pallas_backward(h, h_k, softcap, has_alibi) -> bool:
    return h % h_k == 0 and softcap == 0.0 and not has_alibi


def mha_backward_pallas(
    q, k, v, out, lse, do, *, causal, sm_scale,
    window: Tuple[int, int] = (-1, -1),
    block_q: int = 1024,
    block_k: int = 1024,
    cp: Optional[Tuple[str, ...]] = None,
    interpret: Optional[bool] = None,
):
    """Public wrapper: resolves the PB_CP Mosaic knob OUTSIDE the jit
    (each cp value is a real static arg with its own executable-cache
    entry — flipping PB_CP mid-process cannot serve a stale trace)."""
    import os as _os

    if cp is None:
        from vllm_flash_attn_tpu.config import knob as _knob
        cp = tuple(_knob("pb_cp"))
    return _mha_backward_pallas_jit(
        q, k, v, out, lse, do, causal=causal, sm_scale=sm_scale,
        window=tuple(window), block_q=block_q, block_k=block_k,
        cp=tuple(cp), interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "sm_scale", "window", "block_q", "block_k", "cp",
        "interpret",
    ),
)
def _mha_backward_pallas_jit(
    q: jax.Array,  # (b, h, sq, d)
    k: jax.Array,  # (b, h, sk, d)  (MHA: h == h_k)
    v: jax.Array,
    out: jax.Array,
    lse: jax.Array,  # (b, h, sq) fp32, natural log
    do: jax.Array,
    *,
    causal: bool,
    sm_scale: float,
    window: Tuple[int, int] = (-1, -1),
    block_q: int = 1024,  # v5e sweep: 1024x1024 -> 61.5% train MFU,
    block_k: int = 1024,  # 512x512 -> 59.9%, 256x1024 -> 59.7%
    cp: Tuple[str, ...] = (),
    interpret: Optional[bool] = None,
):
    _cpar = pltpu.CompilerParams(
        # grid kernels below are 4-dim; the flat path builds its own 3-dim
        # params (a length mismatch is a Mosaic lowering error)
        dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024,
        **({"disable_bounds_checks": True} if "nobounds" in cp else {}),
        # 'fusein' mirrors the forward's win: let XLA fuse elementwise
        # producers (q*sm_scale, the lse/delta lane broadcasts) into the
        # operand loads instead of separate HBM round trips (both grid
        # kernels take 6 operands)
        **({"allow_input_fusion": [True] * 6} if "fusein" in cp else {}),
    )
    b, h, sq, d = q.shape
    sk = k.shape[2]
    h_k = k.shape[1]
    assert h % h_k == 0
    qpk = h // h_k
    if interpret is None:
        interpret = use_interpret()

    d_orig = d
    if d % MIN_LANES != 0:
        d = pl.cdiv(d, MIN_LANES) * MIN_LANES
        pw = [(0, 0)] * 3 + [(0, d - d_orig)]
        q, k, v, out, do = (jnp.pad(x, pw) for x in (q, k, v, out, do))

    block_q = _round_block(sq, block_q)
    block_k = _round_block(sk, block_k)
    nq = pl.cdiv(sq, block_q)
    nk = pl.cdiv(sk, block_k)

    q_s = (q * jnp.asarray(sm_scale * LOG2E, q.dtype)).astype(q.dtype)
    # lane-replicated per-row stats (a (bq,) 1-D block is a Mosaic hazard;
    # (bq, MIN_LANES) tiles cleanly and the kernel reads lane 0)
    lse2 = jnp.broadcast_to(
        (lse * LOG2E).astype(jnp.float32)[..., None], (*lse.shape, MIN_LANES)
    )
    dval = jnp.broadcast_to(
        (jnp.einsum("bhsd,bhsd->bhs", do.astype(jnp.float32),
                    out.astype(jnp.float32)))[..., None],
        (*lse.shape, MIN_LANES),
    )

    wl_, wr_ = int(window[0]), int(window[1])

    if "flat" in cp:
        return _mha_backward_flat(
            q_s, k, v, do, lse2, dval, causal=causal, window=(wl_, wr_),
            sm_scale=float(sm_scale), block_q=block_q, block_k=block_k,
            seqlen_q=sq, seqlen_k=sk, q_per_kv=qpk, d_orig=d_orig,
            cp=cp, interpret=interpret,
        )

    def qix(b_, h_, qi, ki):
        return (b_, h_, qi, 0)

    def kix(b_, h_, qi, ki, qpk=qpk):
        return (b_, h_ // qpk, ki, 0)

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, causal=causal, window=(wl_, wr_), block_q=block_q,
            block_k=block_k, seqlen_q=sq, seqlen_k=sk,
            sm_scale=float(sm_scale), nk=nk,
        ),
        grid=(b, h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), qix),
            pl.BlockSpec((1, 1, block_k, d), kix),
            pl.BlockSpec((1, 1, block_k, d), kix),
            pl.BlockSpec((1, 1, block_q, d), qix),
            pl.BlockSpec((1, 1, block_q, MIN_LANES), qix),
            pl.BlockSpec((1, 1, block_q, MIN_LANES), qix),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), qix),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=_cpar,
        interpret=interpret,
    )(q_s, k, v, do, lse2, dval)

    def qix2(b_, hk_, ki, t, qpk=qpk, nq=nq):
        # serial axis t = g*nq + qi; q head = kv_head*qpk + g
        return (b_, hk_ * qpk + t // nq, t % nq, 0)

    def kix2(b_, hk_, ki, t):
        return (b_, hk_, ki, 0)

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, causal=causal, window=(wl_, wr_), block_q=block_q,
            block_k=block_k, seqlen_q=sq, seqlen_k=sk,
            sm_scale=float(sm_scale), nq=nq, q_per_kv=qpk,
        ),
        grid=(b, h_k, nk, qpk * nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), qix2),
            pl.BlockSpec((1, 1, block_k, d), kix2),
            pl.BlockSpec((1, 1, block_k, d), kix2),
            pl.BlockSpec((1, 1, block_q, d), qix2),
            pl.BlockSpec((1, 1, block_q, MIN_LANES), qix2),
            pl.BlockSpec((1, 1, block_q, MIN_LANES), qix2),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), kix2),
            pl.BlockSpec((1, 1, block_k, d), kix2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h_k, sk, d), k.dtype),
            jax.ShapeDtypeStruct((b, h_k, sk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=_cpar,
        interpret=interpret,
    )(q_s, k, v, do, lse2, dval)

    return (
        dq[..., :d_orig], dk[..., :d_orig], dv[..., :d_orig]
    )


def _mha_backward_flat(
    q_s, k, v, do, lse2, dval, *, causal, window, sm_scale, block_q,
    block_k, seqlen_q, seqlen_k, q_per_kv, d_orig, cp, interpret,
):
    """PB_CP=flat host path: grid = parallel axes only; the former serial
    sweep runs inside the kernel over hand double-buffered HBM tiles.
    Manual DMAs must never read out of bounds, so the manually-staged side
    is zero-padded to whole blocks host-side (zero q/do rows keep the
    contractions exact; the in-kernel masks already handle partial tiles)."""
    cpar = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel"),
        vmem_limit_bytes=100 * 1024 * 1024,
        **({"disable_bounds_checks": True} if "nobounds" in cp else {}),
    )
    depth = _ring_depth(cp)
    b, h, sq, d = q_s.shape
    h_k = k.shape[1]
    sk = k.shape[2]
    nq = pl.cdiv(sq, block_q)
    nk = pl.cdiv(sk, block_k)

    kp, vp = k, v
    if sk % block_k != 0:
        pw = [(0, 0), (0, 0), (0, nk * block_k - sk), (0, 0)]
        kp, vp = jnp.pad(k, pw), jnp.pad(v, pw)
    qp, dop, lsep, dvalp = q_s, do, lse2, dval
    if sq % block_q != 0:
        pw = [(0, 0), (0, 0), (0, nq * block_q - sq), (0, 0)]
        qp, dop = jnp.pad(q_s, pw), jnp.pad(do, pw)
        lsep, dvalp = jnp.pad(lse2, pw), jnp.pad(dval, pw)

    def qix3(b_, h_, qi):
        return (b_, h_, qi, 0)

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel_flat, causal=causal, window=window, block_q=block_q,
            block_k=block_k, seqlen_q=sq, seqlen_k=sk, sm_scale=sm_scale,
            nk=nk, q_per_kv=q_per_kv, depth=depth,
        ),
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), qix3),
            pl.BlockSpec((1, 1, block_q, d), qix3),
            pl.BlockSpec((1, 1, block_q, MIN_LANES), qix3),
            pl.BlockSpec((1, 1, block_q, MIN_LANES), qix3),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), qix3),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q_s.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((depth, block_k, d), k.dtype),
            pltpu.VMEM((depth, block_k, d), v.dtype),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
        compiler_params=cpar,
        interpret=interpret,
    )(q_s, do, lse2, dval, kp, vp)

    def kix3(b_, hk_, ki):
        return (b_, hk_, ki, 0)

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel_flat, causal=causal, window=window, block_q=block_q,
            block_k=block_k, seqlen_q=sq, seqlen_k=sk, sm_scale=sm_scale,
            nq=nq, q_per_kv=q_per_kv, depth=depth,
        ),
        grid=(b, h_k, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_k, d), kix3),
            pl.BlockSpec((1, 1, block_k, d), kix3),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), kix3),
            pl.BlockSpec((1, 1, block_k, d), kix3),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h_k, sk, d), k.dtype),
            jax.ShapeDtypeStruct((b, h_k, sk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((depth, block_q, d), q_s.dtype),
            pltpu.VMEM((depth, block_q, d), do.dtype),
            pltpu.VMEM((depth, block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((depth, block_q, MIN_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
        compiler_params=cpar,
        interpret=interpret,
    )(k, v, qp, dop, lsep, dvalp)

    return dq[..., :d_orig], dk[..., :d_orig], dv[..., :d_orig]
