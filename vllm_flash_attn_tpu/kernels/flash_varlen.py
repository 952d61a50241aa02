"""Pallas TPU varlen (packed ragged batch) flash-attention forward.

TPU-native re-design of `mha_varlen_fwd`
(/root/reference/csrc/flash_attn/flash_api.cpp:422-668). The CUDA kernel walks
`cu_seqlens` per CTA through `BlockInfo` (src/block_info.h:11-46); XLA wants
static shapes, so here the ragged batch is expressed as *per-token metadata
arrays* (segment id + aligned position), a form the VPU consumes directly:

- mask  = (q_seg == k_seg) & window(q_pos_aligned, k_pos)
- causal bottom-right alignment per sequence is folded into q_pos_aligned =
  pos_in_seq + (len_k_i - len_q_i)  (flash_attn_interface.py:1051-1061)
- `seqused_k` (flash_api.cpp:534-540) folds into k validity + len_k_i.

Work skipping: per-q-block [first,last] active kv-block bounds are precomputed
with cheap XLA ops and read from SMEM, replacing the CUDA reverse-iteration
early-exit. This keeps complexity O(sum_i sq_i * sk_i) instead of O(total^2).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_flash_attn_tpu.config import knob, use_interpret

# Diagonal quadrant skip for packed-causal varlen (vf_diagsplit,
# import-once like pf_diagsplit): the mask is metadata-driven (per-token
# segment/position vectors), so the skip predicate is computed FROM the
# mask itself — if the top-half-rows x right-half-cols quadrant is fully
# masked, the top half-rows contract only k[:block_k//2] and the quadrant
# drops out of both GEMMs and the softmax. Bit-exact by construction (the
# predicate is sufficient: every skipped score was masked).
_VF_DIAGSPLIT = knob("vf_diagsplit")

from vllm_flash_attn_tpu.kernels.flash_prefill import (  # noqa: E402
    DEFAULT_MASK_VALUE,
    LN2,
    LOG2E,
    MIN_LANES,
    _cparams,
    _flat_pipeline,
    _ring_depth,
)

# Splash-style folded grid (dynamic-length, active pairs only) as the varlen
# forward's grid structure instead of the dense nq*nk sweep with skipped
# steps. Default off until hardware-validated; per-process module constant
# (like PD_QINT8) — pass fold= explicitly for in-process A/Bs.


# Round-4 structure knob, mirroring flash_prefill's PF_CP: 'flat' routes the
# forward through the manual-DMA flat kernel below, 'nobounds' disables
# Mosaic bounds checks, 'd3'/'d4' deepen the DMA ring. Module constant (read
# once per process, never inside a jit trace); pass cp= for in-process A/Bs.



def build_varlen_metadata(
    cu_seqlens_q: jax.Array,
    cu_seqlens_k: jax.Array,
    total_q: int,
    total_k: int,
    seqused_k: Optional[jax.Array] = None,
):
    """Per-token metadata for the varlen kernel (all jit-friendly).

    Returns:
        q_info (2, total_q) int32: [seg_id (-1 pad), pos_aligned]
        k_info (2, total_k) int32: [seg_id (-2 pad), pos_in_seq]
    """
    cu_q = cu_seqlens_q.astype(jnp.int32)
    cu_k = cu_seqlens_k.astype(jnp.int32)
    len_q = cu_q[1:] - cu_q[:-1]
    len_k = cu_k[1:] - cu_k[:-1]
    if seqused_k is not None:
        len_k = jnp.minimum(len_k, seqused_k.astype(jnp.int32))

    qi = jnp.arange(total_q, dtype=jnp.int32)
    q_seg = jnp.searchsorted(cu_q[1:], qi, side="right").astype(jnp.int32)
    q_valid = qi < cu_q[-1]
    q_pos = qi - cu_q[jnp.clip(q_seg, 0, len_q.shape[0] - 1)]
    sgc = jnp.clip(q_seg, 0, len_q.shape[0] - 1)
    q_pos_aligned = q_pos + len_k[sgc] - len_q[sgc]
    q_info = jnp.stack(
        [jnp.where(q_valid, q_seg, -1), jnp.where(q_valid, q_pos_aligned, 0)]
    )

    ki = jnp.arange(total_k, dtype=jnp.int32)
    k_seg = jnp.searchsorted(cu_k[1:], ki, side="right").astype(jnp.int32)
    kgc = jnp.clip(k_seg, 0, len_k.shape[0] - 1)
    k_pos = ki - cu_k[kgc]
    k_valid = (ki < cu_k[-1]) & (k_pos < len_k[kgc])
    k_info = jnp.stack(
        [jnp.where(k_valid, k_seg, -2), jnp.where(k_valid, k_pos, 0)]
    )
    return q_info, k_info


def build_block_bounds(
    q_info: jax.Array,
    cu_seqlens_k: jax.Array,
    seqused_k: Optional[jax.Array],
    cu_sq: jax.Array,
    window: Tuple[int, int],
    causal: bool,
    block_q: int,
    block_k: int,
    num_k_blocks: int,
):
    """(nq, 2) int32 [first_active_kv_block, last_active_kv_block] per q block."""
    total_q = q_info.shape[1]
    nq = pl.cdiv(total_q, block_q)
    cu_k = cu_seqlens_k.astype(jnp.int32)
    len_k = cu_k[1:] - cu_k[:-1]
    if seqused_k is not None:
        len_k = jnp.minimum(len_k, seqused_k.astype(jnp.int32))
    wl, wr = window
    if causal:
        wr = 0

    seg = jnp.clip(q_info[0], 0, len_k.shape[0] - 1)
    pos_al = q_info[1]
    base = cu_k[seg]
    if wl >= 0:
        start_tok = base + jnp.clip(pos_al - wl, 0, None)
    else:
        start_tok = base
    if wr >= 0:
        end_tok = base + jnp.clip(pos_al + wr, 0, jnp.maximum(len_k[seg] - 1, 0))
    else:
        end_tok = base + jnp.maximum(len_k[seg] - 1, 0)
    # padding rows: neutral bounds
    pad = q_info[0] < 0
    start_tok = jnp.where(pad, jnp.iinfo(jnp.int32).max, start_tok)
    end_tok = jnp.where(pad, 0, end_tok)

    pad_to = nq * block_q
    start_tok = jnp.pad(
        start_tok, (0, pad_to - total_q), constant_values=jnp.iinfo(jnp.int32).max
    ).reshape(nq, block_q)
    end_tok = jnp.pad(end_tok, (0, pad_to - total_q)).reshape(nq, block_q)
    first = jnp.min(start_tok, axis=1) // block_k
    last = jnp.max(end_tok, axis=1) // block_k
    first = jnp.clip(first, 0, num_k_blocks - 1)
    last = jnp.clip(last, 0, num_k_blocks - 1)
    first = jnp.minimum(first, last)
    return jnp.stack([first, last], axis=1).astype(jnp.int32)


def build_fold_maps(bounds: jax.Array, nq: int, nk: int):
    """Splash-style folded-grid maps: enumerate ONLY the active (qi, ki)
    pairs, q-block-major. Returns (qmap, kmap) of STATIC worst-case length
    nq*nk plus the DYNAMIC number of real steps (the Pallas grid dim) — the
    clamped tail past `total` is never executed."""
    counts = bounds[:, 1] - bounds[:, 0] + 1  # (nq,) >= 1
    cum = jnp.cumsum(counts)
    total = cum[-1]
    t = jnp.arange(nq * nk, dtype=jnp.int32)
    qm = jnp.searchsorted(cum, t, side="right").astype(jnp.int32)
    qc = jnp.clip(qm, 0, nq - 1)
    km = bounds[qc, 0] + (t - (cum[qc] - counts[qc]))
    qmap = jnp.where(t < total, qc, nq - 1)
    kmap = jnp.where(t < total, km, bounds[nq - 1, 1])
    return qmap, kmap, total


def _varlen_kernel(
    bounds_ref,  # SMEM (nq, 2)
    q_ref,
    k_ref,
    v_ref,
    q_info_ref,  # (2, block_q)
    k_info_ref,  # (2, block_k)
    alibi_ref,  # SMEM (1, h)
    o_ref,
    lse_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    sm_scale: float,
    causal: bool,
    window: Tuple[int, int],
    softcap: float,
    block_q: int,
    block_k: int,
    total_k: int,
    has_alibi: bool,
    qmap_ref=None,  # folded grid: dim 1 enumerates only ACTIVE (qi, ki)
    kmap_ref=None,
):
    h_ = pl.program_id(0)
    if qmap_ref is not None:
        t = pl.program_id(1)
        qi = qmap_ref[t]
        ki = kmap_ref[t]
    else:
        qi = pl.program_id(1)
        ki = pl.program_id(2)

    wl, wr = window
    if causal:
        wr = 0

    first = bounds_ref[qi, 0]
    last = bounds_ref[qi, 1]

    @pl.when(jnp.logical_and(ki >= first, ki <= last))
    def _run():
        @pl.when(ki == first)
        def _init():
            m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
            l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
            acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

        q = q_ref[0]
        k = k_ref[0]

        # the mask is metadata-driven (segment/position vectors) and does
        # not need the scores — build it FIRST so the diagonal-quadrant
        # skip can branch before any GEMM runs
        q_seg = q_info_ref[0, :][:, None]  # (block_q, 1)
        q_pos = q_info_ref[1, :][:, None]
        k_seg = k_info_ref[0, :][None, :]  # (1, block_k)
        k_pos = k_info_ref[1, :][None, :]

        mask = q_seg == k_seg
        if total_k % block_k != 0:
            # k_info's remainder block tail is undefined memory; guard it.
            mask &= (
                jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
                + ki * block_k
                < total_k
            )
        if wr >= 0:
            mask &= k_pos <= q_pos + wr
        if wl >= 0:
            mask &= k_pos >= q_pos - wl

        def update(s, mask_, rows_, q_pos_, k_pos_):
            # sm_scale*log2(e) is folded into q host-side; scores are
            # log2-domain (scale_softmax_log2, flash_api.cpp:21-137)
            if softcap > 0.0:
                cap2 = softcap * LOG2E
                s = jnp.tanh(s / cap2) * cap2
            if has_alibi:
                slope = alibi_ref[0, h_]  # pre-scaled by log2(e) host-side
                s = s - slope * jnp.abs(q_pos_ - k_pos_).astype(jnp.float32)
            s = jnp.where(mask_, s, DEFAULT_MASK_VALUE)

            m_prev = m_scr[rows_]
            l_prev = l_scr[rows_]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp2(m_prev - m_next)
            # masked entries need no second where: exp2(MASKVAL - m) == 0
            # once any real key raised m; fully-masked rows (q padding tail)
            # are zeroed by the store-time m-based guard
            p = jnp.exp2(s - m_next[:, :1])
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_scr[rows_] = m_next
            l_scr[rows_] = l_next

            v = v_ref[0][: s.shape[1]]
            if total_k % block_k != 0:
                valid = (
                    jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
                    + ki * block_k
                    < total_k
                )
                v = jnp.where(valid, v, 0)
            pv = jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            acc_scr[rows_] = acc_scr[rows_] * alpha[:, :1] + pv

        bq = q.shape[0]
        diag_split = (
            _VF_DIAGSPLIT
            and lse_ref is None  # lse variant: scoped-vmem headroom (see
            # flash_prefill's pf_diagsplit gate)
            and bq % 16 == 0
            and block_k % (2 * MIN_LANES) == 0
        )
        if diag_split:
            h2 = bq // 2
            hw = block_k // 2
            # sufficient by construction: every score the split path skips
            # is masked
            quad_all_masked = (
                jnp.sum(mask[:h2, hw:].astype(jnp.int32)) == 0
            )

            def _split():
                s_top = jax.lax.dot_general(
                    q[:h2], k[:hw], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                update(s_top, mask[:h2, :hw], slice(0, h2),
                       q_pos[:h2], k_pos[:, :hw])
                s_bot = jax.lax.dot_general(
                    q[h2:], k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                update(s_bot, mask[h2:, :], slice(h2, bq),
                       q_pos[h2:], k_pos)

            def _full():
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                update(s, mask, slice(0, bq), q_pos, k_pos)

            jax.lax.cond(quad_all_masked, _split, _full)
        else:
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            update(s, mask, slice(0, bq), q_pos, k_pos)

        @pl.when(ki == last)
        def _store():
            l = l_scr[...][:, :1]
            m_fin = m_scr[...][:, :1]
            # fully-masked rows: m never left the mask floor and l holds
            # garbage exp2(0)==1 sums (out 0 / lse +inf, flash_api.cpp:401-407)
            dead = jnp.logical_or(l == 0.0, m_fin <= 0.5 * DEFAULT_MASK_VALUE)
            l_inv = jnp.where(dead, 0.0, 1.0 / l)
            o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
            if lse_ref is not None:
                # m is log2-domain; natural-log LSE out (flash_api.cpp:418)
                lse = jnp.where(dead, jnp.inf, m_fin * LN2 + jnp.log(l))
                lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _varlen_kernel_flat(
    bounds_ref,  # SMEM (nq, 2) int32
    q_ref,       # (1, block_q, d) VMEM (pre-scaled by sm_scale*log2e)
    k_hbm,       # (h_k, nk*block_k, d) ANY (zero-padded tail)
    v_hbm,       # (h_k, nk*block_k, d) ANY (zero-padded tail)
    q_info_ref,  # (2, block_q) VMEM
    k_info_ref,  # (2, nk*block_k) VMEM (tail padded with seg=-2)
    alibi_ref,   # SMEM (1, h) fp32 (or (1, 1) when unused)
    o_ref,       # (1, block_q, d)
    lse_ref,     # (1, block_q, MIN_LANES) or None
    k_scr,       # (depth, block_k, d) VMEM
    v_scr,       # (depth, block_k, d) VMEM
    m_scr,
    l_scr,
    acc_scr,     # (block_q, d) fp32
    k_sem,       # DMA (depth,)
    v_sem,       # DMA (depth,)
    *,
    causal: bool,
    window: Tuple[int, int],
    softcap: float,
    block_q: int,
    block_k: int,
    has_alibi: bool,
    nk: int,
    q_per_kv: int,
    depth: int = 2,
):
    """Flat manual-DMA varlen forward (VF_CP=flat).

    Port of flash_prefill's round-4 flat structure to the packed ragged
    batch: ONE grid step per (head, q-block); k/v stay in HBM and a
    statically-unrolled tile loop hand double-buffers them into a
    depth-slot VMEM ring (pltpu.make_async_copy), issuing tile j+depth-1's
    copies before computing tile j. The per-q-block [first, last] active
    kv range comes from SMEM bounds (traced scalars predicating the static
    tile list via pl.when), replacing the grid version's skipped steps —
    and, per the round-3 stage isolation, the grid pipeline's ~5.9us/tile
    machinery floor. Compute body mirrors _varlen_kernel exactly
    (bit-equal in interpret mode)."""
    hi = pl.program_id(0)
    qi = pl.program_id(1)
    hk = hi // q_per_kv

    wl, wr = window
    if causal:
        wr = 0

    first = bounds_ref[qi, 0]
    last = bounds_ref[qi, 1]

    m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
    l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
    acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def start(j):
        s = j % depth
        pltpu.make_async_copy(
            k_hbm.at[hk, pl.ds(j * block_k, block_k), :],
            k_scr.at[s], k_sem.at[s],
        ).start()
        pltpu.make_async_copy(
            v_hbm.at[hk, pl.ds(j * block_k, block_k), :],
            v_scr.at[s], v_sem.at[s],
        ).start()

    def wait(j):
        s = j % depth
        pltpu.make_async_copy(
            k_hbm.at[hk, pl.ds(j * block_k, block_k), :],
            k_scr.at[s], k_sem.at[s],
        ).wait()
        pltpu.make_async_copy(
            v_hbm.at[hk, pl.ds(j * block_k, block_k), :],
            v_scr.at[s], v_sem.at[s],
        ).wait()

    def compute(j):
        k = k_scr[j % depth]
        v = v_scr[j % depth]
        q = q_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if softcap > 0.0:
            cap2 = softcap * LOG2E
            s = jnp.tanh(s / cap2) * cap2

        q_seg = q_info_ref[0, :][:, None]  # (block_q, 1)
        q_pos = q_info_ref[1, :][:, None]
        # static slice of the VMEM-resident metadata (j is a python int)
        k_seg = k_info_ref[0, j * block_k:(j + 1) * block_k][None, :]
        k_pos = k_info_ref[1, j * block_k:(j + 1) * block_k][None, :]

        # k_info's host-padded tail carries seg=-2, so no extra iota guard;
        # v's tail is host-zero-padded (p there is exactly 0 via the mask)
        mask = q_seg == k_seg
        if wr >= 0:
            mask &= k_pos <= q_pos + wr
        if wl >= 0:
            mask &= k_pos >= q_pos - wl

        if has_alibi:
            slope = alibi_ref[0, hi]  # pre-scaled by log2(e) host-side
            s = s - slope * jnp.abs(q_pos - k_pos).astype(jnp.float32)

        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, :1])
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = l_next

        pv = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    def _tile_body(j):
        def body():
            wait(j)
            compute(j)
        return body

    _flat_pipeline(nk, first, last, start, _tile_body, depth=depth)

    l = l_scr[...][:, :1]
    m_fin = m_scr[...][:, :1]
    dead = jnp.logical_or(l == 0.0, m_fin <= 0.5 * DEFAULT_MASK_VALUE)
    l_inv = jnp.where(dead, 0.0, 1.0 / l)
    o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
    if lse_ref is not None:
        lse = jnp.where(dead, jnp.inf, m_fin * LN2 + jnp.log(l))
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _flash_attention_varlen_impl(
    q: jax.Array,  # (h, total_q, d)
    k: jax.Array,  # (h_k, total_k, d)
    v: jax.Array,
    cu_seqlens_q: jax.Array,  # (b+1,) int32
    cu_seqlens_k: jax.Array,
    seqused_k: Optional[jax.Array] = None,
    alibi_slopes: Optional[jax.Array] = None,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    window: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    block_q: int = 1024,  # round-5 hardware sweep on the packed-ragged mix:
    #   128->1024 blocks = 10.3 -> 36.7 TF (grid/step overhead dominates at
    #   small tiles); per-seq clamping keeps small inputs correct
    block_k: int = 1024,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
    fold: Optional[bool] = None,
    cp: Optional[Tuple[str, ...]] = None,
):
    if fold is None:
        fold = knob("vf_splash")
    if cp is None:
        cp = tuple(knob("vf_cp"))
    h, total_q, d = q.shape
    h_k, total_k, _ = k.shape
    assert h % h_k == 0
    q_per_kv = h // h_k
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = use_interpret()

    # arbitrary head dims: pad d to a lane multiple (flash_api.cpp:312-320
    # analog); sm_scale above uses the original d
    d_orig = d
    if d % MIN_LANES != 0:
        d = pl.cdiv(d, MIN_LANES) * MIN_LANES
        pw = [(0, 0), (0, 0), (0, d - d_orig)]
        q = jnp.pad(q, pw)
        k = jnp.pad(k, pw)
        v = jnp.pad(v, pw)

    # Fold sm_scale*log2(e) into q so the kernel skips the scale pass and
    # uses native exp2 (scale_softmax_log2, flash_api.cpp:21-137).
    q = (q * jnp.asarray(sm_scale * LOG2E, q.dtype)).astype(q.dtype)

    block_q = min(block_q, max(MIN_LANES, pl.cdiv(total_q, MIN_LANES) * MIN_LANES))
    block_k = min(block_k, max(MIN_LANES, pl.cdiv(total_k, MIN_LANES) * MIN_LANES))
    nq = pl.cdiv(total_q, block_q)
    nk = pl.cdiv(total_k, block_k)

    q_info, k_info = build_varlen_metadata(
        cu_seqlens_q, cu_seqlens_k, total_q, total_k, seqused_k
    )
    bounds = build_block_bounds(
        q_info,
        cu_seqlens_k,
        seqused_k,
        cu_seqlens_q,
        window,
        causal,
        block_q,
        block_k,
        nk,
    )

    has_alibi = alibi_slopes is not None
    if has_alibi:
        alibi_slopes = (
            jnp.asarray(alibi_slopes, jnp.float32).reshape(1, h) * LOG2E
        )  # kernel scores are log2-domain
    else:
        alibi_slopes = jnp.zeros((1, 1), jnp.float32)

    if "flat" in cp:
        # round-4 experiment: manual-DMA flat structure (VF_CP=flat).
        # k/v/k_info are hand-DMA'd from HBM, so their tile tails must be
        # real memory: zero-pad k/v (p is exactly 0 there via the seg mask)
        # and pad k_info with seg=-2 (matches no q segment).
        sk_pad = nk * block_k
        if total_k != sk_pad:
            kv_pw = [(0, 0), (0, sk_pad - total_k), (0, 0)]
            k = jnp.pad(k, kv_pw)
            v = jnp.pad(v, kv_pw)
            k_info = jnp.pad(
                k_info,
                [(0, 0), (0, sk_pad - total_k)],
                constant_values=-2,
            )
            k_info = k_info.at[1, total_k:].set(0)
        depth = _ring_depth(cp)
        flat_kernel = functools.partial(
            _varlen_kernel_flat,
            causal=causal,
            window=tuple(int(w) for w in window),
            softcap=float(softcap),
            block_q=block_q,
            block_k=block_k,
            has_alibi=has_alibi,
            nk=nk,
            q_per_kv=q_per_kv,
            depth=depth,
        )
        if not return_lse:
            def flat_kernel2(b_r, q_r, k_r, v_r, qi_r, ki_r, a_r, o_r, *scr,
                             _k=flat_kernel):
                _k(b_r, q_r, k_r, v_r, qi_r, ki_r, a_r, o_r, None, *scr)
        else:
            flat_kernel2 = flat_kernel
        out_specs = [
            pl.BlockSpec((1, block_q, d), lambda h_, qi: (h_, qi, 0))
        ]
        if return_lse:
            out_specs.append(
                pl.BlockSpec(
                    (1, block_q, MIN_LANES), lambda h_, qi: (h_, qi, 0)
                )
            )
        results = pl.pallas_call(
            flat_kernel2,
            grid=(h, nq),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # bounds (nq, 2)
                pl.BlockSpec((1, block_q, d), lambda h_, qi: (h_, qi, 0)),
                pl.BlockSpec(memory_space=pl.ANY),  # k (HBM)
                pl.BlockSpec(memory_space=pl.ANY),  # v (HBM)
                pl.BlockSpec((2, block_q), lambda h_, qi: (0, qi)),
                pl.BlockSpec((2, sk_pad), lambda h_, qi: (0, 0)),  # k_info
                pl.BlockSpec(memory_space=pltpu.SMEM),  # alibi (1, h)
            ],
            out_specs=out_specs,
            out_shape=[
                jax.ShapeDtypeStruct((h, total_q, d), q.dtype),
            ] + (
                [jax.ShapeDtypeStruct((h, total_q, MIN_LANES), jnp.float32)]
                if return_lse else []
            ),
            scratch_shapes=[
                pltpu.VMEM((depth, block_k, d), k.dtype),
                pltpu.VMEM((depth, block_k, d), v.dtype),
                pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
                pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
                pltpu.SemaphoreType.DMA((depth,)),
                pltpu.SemaphoreType.DMA((depth,)),
            ],
            compiler_params=_cparams(("parallel", "parallel"), cp, 7),
            interpret=interpret,
        )(bounds, q, k, v, q_info, k_info, alibi_slopes)
        if return_lse:
            out, lse = results
            return out[..., :d_orig], lse[..., 0]
        return results[0][..., :d_orig]

    kernel = functools.partial(
        _varlen_kernel,
        sm_scale=float(sm_scale),
        causal=causal,
        window=tuple(int(w) for w in window),
        softcap=float(softcap),
        block_q=block_q,
        block_k=block_k,
        total_k=total_k,
        has_alibi=has_alibi,
    )
    if not return_lse:
        body = kernel
        if fold:

            def kernel(b_r, qm_r, km_r, q_r, k_r, v_r, qi_r, ki_r, a_r, o_r,  # noqa: F811
                       m_s, l_s, acc_s):
                body(b_r, q_r, k_r, v_r, qi_r, ki_r, a_r, o_r, None,
                     m_s, l_s, acc_s, qmap_ref=qm_r, kmap_ref=km_r)

        else:

            def kernel(b_r, q_r, k_r, v_r, qi_r, ki_r, a_r, o_r, m_s, l_s, acc_s):  # noqa: F811
                body(b_r, q_r, k_r, v_r, qi_r, ki_r, a_r, o_r, None, m_s, l_s, acc_s)

    elif fold:
        body = kernel

        def kernel(b_r, qm_r, km_r, q_r, k_r, v_r, qi_r, ki_r, a_r, o_r,  # noqa: F811
                   lse_r, m_s, l_s, acc_s):
            body(b_r, q_r, k_r, v_r, qi_r, ki_r, a_r, o_r, lse_r,
                 m_s, l_s, acc_s, qmap_ref=qm_r, kmap_ref=km_r)

    scratch_shapes = [
        pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
        pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
        pltpu.VMEM((block_q, d), jnp.float32),
    ]
    out_shape = [jax.ShapeDtypeStruct((h, total_q, d), q.dtype)]
    if return_lse:
        out_shape.append(
            jax.ShapeDtypeStruct((h, total_q, MIN_LANES), jnp.float32)
        )

    if fold:
        # splash-style folded grid: dimension 1 walks ONLY the active
        # (qi, ki) pairs via scalar-prefetched maps; its length is the
        # DYNAMIC active-pair count (a Mosaic dynamic grid bound), so a
        # packed batch of b sequences costs ~sum_i sq_i*sk_i tile steps
        # instead of total_q*total_k with ~(1 - 1/b) skipped no-op steps.
        qmap, kmap, total_steps = build_fold_maps(bounds, nq, nk)

        def q_index(h_, t, bnd, qm, km):
            return (h_, qm[t], 0)

        def kv_index(h_, t, bnd, qm, km, qpk=q_per_kv):
            return (h_ // qpk, km[t], 0)

        in_specs = [
            pl.BlockSpec((1, block_q, d), q_index),
            pl.BlockSpec((1, block_k, d), kv_index),
            pl.BlockSpec((1, block_k, d), kv_index),
            pl.BlockSpec((2, block_q), lambda h_, t, bnd, qm, km: (0, qm[t])),
            pl.BlockSpec((2, block_k), lambda h_, t, bnd, qm, km: (0, km[t])),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # alibi (1, h)
        ]
        out_specs = [pl.BlockSpec((1, block_q, d), q_index)]
        if return_lse:
            out_specs.append(
                pl.BlockSpec((1, block_q, MIN_LANES),
                             lambda h_, t, bnd, qm, km: (h_, qm[t], 0))
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(h, total_steps),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        )
        results = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(bounds, qmap, kmap, q, k, v, q_info, k_info, alibi_slopes)
    else:
        # kv fetch clamp: skipped steps re-point at the q block's
        # [first, last] kv range (read from the scalar-prefetched bounds), so
        # the pipeline elides their DMAs — without this, causal varlen DMAs
        # O(total_q * total_k) bytes even though the compute is skipped.
        def kv_index(h_, qi, ki, bnd, qpk=q_per_kv):
            ki_c = jnp.clip(ki, bnd[qi, 0], bnd[qi, 1])
            return (h_ // qpk, ki_c, 0)

        def kinfo_index(h_, qi, ki, bnd):
            return (0, jnp.clip(ki, bnd[qi, 0], bnd[qi, 1]))

        in_specs = [
            pl.BlockSpec((1, block_q, d), lambda h_, qi, ki, bnd: (h_, qi, 0)),
            pl.BlockSpec((1, block_k, d), kv_index),
            pl.BlockSpec((1, block_k, d), kv_index),
            pl.BlockSpec((2, block_q), lambda h_, qi, ki, bnd: (0, qi)),
            pl.BlockSpec((2, block_k), kinfo_index),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # alibi (1, h)
        ]
        out_specs = [
            pl.BlockSpec((1, block_q, d), lambda h_, qi, ki, bnd: (h_, qi, 0))
        ]
        if return_lse:
            out_specs.append(
                pl.BlockSpec(
                    (1, block_q, MIN_LANES), lambda h_, qi, ki, bnd: (h_, qi, 0)
                )
            )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(h, nq, nk),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        )
        results = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(bounds, q, k, v, q_info, k_info, alibi_slopes)
    if return_lse:
        out, lse = results
        return out[..., :d_orig], lse[..., 0]
    return results[0][..., :d_orig]


# --------------------------------------------------------------- custom VJP
# The reference fork ships no varlen backward at all (setup.py:154-171);
# here packed-batch training (BERT unpad path) backprops through the flash
# path via a segment-aware linear-memory backward (flash_backward.py).


def _int_zeros(x):
    import numpy as np

    return np.zeros(x.shape, jax.dtypes.float0)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17)
)
def _varlen_vjp(
    q, k, v, cu_seqlens_q, cu_seqlens_k, seqused_k, alibi_slopes,
    causal, sm_scale, window, softcap, block_q, block_k, interpret,
    max_seqlen_q=0, max_seqlen_k=0, fold=None, cp=None,
):
    return _flash_attention_varlen_impl(
        q, k, v, cu_seqlens_q, cu_seqlens_k,
        seqused_k if seqused_k.size else None,
        alibi_slopes if alibi_slopes.size else None,
        causal=causal, sm_scale=sm_scale, window=window, softcap=softcap,
        block_q=block_q, block_k=block_k, return_lse=False,
        interpret=interpret, fold=fold, cp=cp,
    )


def _varlen_vjp_fwd(
    q, k, v, cu_seqlens_q, cu_seqlens_k, seqused_k, alibi_slopes,
    causal, sm_scale, window, softcap, block_q, block_k, interpret,
    max_seqlen_q=0, max_seqlen_k=0, fold=None, cp=None,
):
    out, lse = _flash_attention_varlen_impl(
        q, k, v, cu_seqlens_q, cu_seqlens_k,
        seqused_k if seqused_k.size else None,
        alibi_slopes if alibi_slopes.size else None,
        causal=causal, sm_scale=sm_scale, window=window, softcap=softcap,
        block_q=block_q, block_k=block_k, return_lse=True,
        interpret=interpret, fold=fold, cp=cp,
    )
    res = (q, k, v, out, lse, cu_seqlens_q, cu_seqlens_k, seqused_k,
           alibi_slopes)
    return out, res


def _varlen_backward_dense_pallas(
    q, k, v, out, lse, g, cu_q, cu_k, seqused_k, *,
    causal, sm_scale, window, max_sq, max_sk,
):
    """Packed-batch backward through the DENSE Pallas two-kernel pair
    (flash_backward_pallas): each sequence is padded BOTTOM-RIGHT into its
    (max_sq, max_sk) slot — bottom-right placement makes the dense kernel's
    global causal offset (max_sk - max_sq) reproduce every sequence's own
    bottom-right alignment (len_k_i - len_q_i) exactly, windows included
    (pure translation). Pad rows carry lse=+inf and zero q/k/v/do, so
    p = exp2(s - inf) = 0 kills their dq AND their dk/dv contributions;
    grads are then gathered back into the packed layout (pad positions and
    seqused-truncated keys receive exact zeros via fill-mode gathers)."""
    from vllm_flash_attn_tpu.kernels.flash_backward_pallas import (
        mha_backward_pallas,
    )

    h, total_q, d = q.shape
    h_k = k.shape[0]
    total_k = k.shape[1]
    b = cu_q.shape[0] - 1
    # Defensive clamps (build_varlen_metadata does the same for the fwd):
    # seqused_k may not exceed its cu segment, and no length may exceed the
    # static max_seqlen slot — an undersized caller max would otherwise make
    # `start` negative and the dense gather read the NEIGHBORING sequence.
    len_q = jnp.minimum(cu_q[1:] - cu_q[:-1], max_sq)  # (b,)
    seg_k = cu_k[1:] - cu_k[:-1]
    len_k = (
        jnp.minimum(seqused_k.astype(jnp.int32), seg_k)
        if seqused_k.size
        else seg_k
    )
    len_k = jnp.minimum(len_k, max_sk)

    def to_dense(x, cu, lens, S, fill):
        # (hx, total, d) -> (b, hx, S, d), tokens at rows [S-len, S)
        t = jnp.arange(S, dtype=jnp.int32)
        start = S - lens  # (b,)
        src = cu[:-1, None] + (t[None] - start[:, None])  # (b, S)
        idx = jnp.where(t[None] >= start[:, None], src, x.shape[1])
        g_ = jnp.take(
            x, idx.reshape(-1), axis=1, mode="fill", fill_value=fill
        )  # (hx, b*S, d...)
        return (
            g_.reshape(x.shape[0], b, S, *x.shape[2:]).swapaxes(0, 1)
        )

    qd = to_dense(q, cu_q, len_q, max_sq, 0)
    od = to_dense(out, cu_q, len_q, max_sq, 0)
    gd = to_dense(g, cu_q, len_q, max_sq, 0)
    lsed = to_dense(lse[..., None], cu_q, len_q, max_sq, jnp.inf)[..., 0]
    kd = to_dense(k, cu_k, len_k, max_sk, 0)
    vd = to_dense(v, cu_k, len_k, max_sk, 0)

    dq_d, dk_d, dv_d = mha_backward_pallas(
        qd, kd, vd, od, lsed, gd,
        causal=causal, sm_scale=sm_scale, window=window,
    )

    def to_packed(xd, cu, lens, S, total):
        # inverse gather: packed token j of seq i sits at dense row
        # (i, S - lens[i] + (j - cu[i])); tokens outside every sequence
        # (inter-seq padding, seqused-truncated keys) read the fill zero
        j = jnp.arange(total, dtype=jnp.int32)
        seq = jnp.searchsorted(cu, j, side="right") - 1
        seq = jnp.clip(seq, 0, b - 1)
        off = j - cu[seq]
        row = S - lens[seq] + off
        flat = seq * S + row
        flat = jnp.where((off >= 0) & (off < lens[seq]), flat, b * S)
        xf = xd.swapaxes(0, 1).reshape(xd.shape[1], b * S, xd.shape[-1])
        return jnp.take(xf, flat, axis=1, mode="fill", fill_value=0)

    dq = to_packed(dq_d, cu_q, len_q, max_sq, total_q).astype(q.dtype)
    dk = to_packed(dk_d, cu_k, len_k, max_sk, total_k).astype(k.dtype)
    dv = to_packed(dv_d, cu_k, len_k, max_sk, total_k).astype(v.dtype)
    return dq, dk, dv


def _varlen_vjp_bwd(
    causal, sm_scale, window, softcap, block_q, block_k, interpret,
    max_seqlen_q, max_seqlen_k, fold, cp, res, g,
):
    from vllm_flash_attn_tpu.kernels.flash_backward import mha_backward_varlen

    (q, k, v, out, lse, cu_seqlens_q, cu_seqlens_k, seqused_k,
     alibi_slopes) = res
    total_q, total_k = q.shape[1], k.shape[1]
    h, h_k = q.shape[0], k.shape[0]
    if (
        max_seqlen_q > 0
        and max_seqlen_k > 0
        and softcap == 0.0
        and alibi_slopes.size == 0
        and h % h_k == 0
    ):
        # hot path: pad-per-seq into the dense Pallas backward pair (the
        # round-3 kernel that took train MFU 49.6 -> 61.0%); needs the
        # STATIC max seqlens threaded from the API
        dq, dk, dv = _varlen_backward_dense_pallas(
            q, k, v, out, lse, g, cu_seqlens_q, cu_seqlens_k, seqused_k,
            causal=causal, sm_scale=sm_scale, window=window,
            max_sq=int(max_seqlen_q), max_sk=int(max_seqlen_k),
        )
    else:
        q_info, k_info = build_varlen_metadata(
            cu_seqlens_q, cu_seqlens_k, total_q, total_k,
            seqused_k if seqused_k.size else None,
        )
        dq, dk, dv = mha_backward_varlen(
            q, k, v, out, lse, g, q_info, k_info,
            alibi_slopes if alibi_slopes.size else None,
            window=window, softcap=softcap, sm_scale=sm_scale, causal=causal,
        )
    return (
        dq, dk, dv,
        _int_zeros(cu_seqlens_q), _int_zeros(cu_seqlens_k),
        _int_zeros(seqused_k), jnp.zeros_like(alibi_slopes),
    )


_varlen_vjp.defvjp(_varlen_vjp_fwd, _varlen_vjp_bwd)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal",
        "sm_scale",
        "window",
        "softcap",
        "block_q",
        "block_k",
        "return_lse",
        "interpret",
        "max_seqlen_q",
        "max_seqlen_k",
        "fold",
        "cp",
    ),
)
def flash_attention_varlen(
    q: jax.Array,  # (h, total_q, d)
    k: jax.Array,  # (h_k, total_k, d)
    v: jax.Array,
    cu_seqlens_q: jax.Array,  # (b+1,) int32
    cu_seqlens_k: jax.Array,
    seqused_k: Optional[jax.Array] = None,
    alibi_slopes: Optional[jax.Array] = None,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    window: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    block_q: int = 1024,  # round-5 hardware sweep on the packed-ragged mix:
    #   128->1024 blocks = 10.3 -> 36.7 TF (grid/step overhead dominates at
    #   small tiles); per-seq clamping keeps small inputs correct
    block_k: int = 1024,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
    max_seqlen_q: int = 0,
    max_seqlen_k: int = 0,
    fold: Optional[bool] = None,  # splash folded grid (None -> VF_SPLASH env)
    cp: Optional[Tuple[str, ...]] = None,  # structure knobs (None -> VF_CP)
):
    """Varlen flash attention over head-major packed tokens.

    `alibi_slopes` must be (h,) here — varlen packs the batch, so per-batch
    slopes are not supported (matches the packed call path of the reference).
    Differentiable wrt q/k/v when return_lse=False (segment-aware backward;
    the reference ships no varlen backward, setup.py:154-171). With STATIC
    max_seqlen_q/max_seqlen_k (> 0, as the reference API requires anyway,
    flash_attn_interface.py:1026-1044) the backward runs the dense Pallas
    kernel pair via per-sequence bottom-right padding; otherwise the
    XLA-level segment-aware backward.

    Returns out (h, total_q, d) [, lse (h, total_q) fp32].
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    if interpret is None:
        interpret = use_interpret()
    if return_lse:
        return _flash_attention_varlen_impl(
            q, k, v, cu_seqlens_q, cu_seqlens_k, seqused_k, alibi_slopes,
            causal=causal, sm_scale=sm_scale, window=window, softcap=softcap,
            block_q=block_q, block_k=block_k, return_lse=True,
            interpret=interpret, fold=fold, cp=cp,
        )
    if seqused_k is None:
        seqused_k = jnp.zeros((0,), jnp.int32)
    if alibi_slopes is None:
        alibi_slopes = jnp.zeros((0,), jnp.float32)
    else:
        alibi_slopes = jnp.asarray(alibi_slopes, jnp.float32)
    return _varlen_vjp(
        q, k, v, cu_seqlens_q, cu_seqlens_k, seqused_k, alibi_slopes,
        causal, float(sm_scale), tuple(int(w) for w in window),
        float(softcap), block_q, block_k, interpret,
        int(max_seqlen_q), int(max_seqlen_k), fold, cp,
    )
