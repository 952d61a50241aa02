"""Ragged paged-prefill attention: varlen queries over a PAGED KV cache.

The reference resolves pages per-thread inside the CUDA kernel
(/root/reference/csrc/flash_attn/src/utils.h:412-428, enabled for
`mha_varlen_fwd(block_table=...)`, flash_api.cpp:467-492). The TPU-native
equivalent: per-(page, kv-head) async DMAs driven by a scalar-prefetched block
table (the paged_decode.py idiom), combined with varlen masking — so chunked
prefill / speculative verify read exactly the pages AND heads they attend to
instead of gathering the whole cache to a dense copy (the old gather_kv_paged
path, O(b * h_k * max_len) HBM traffic per call).

Layout: q and out are head-major packed streams (h, total_q, d) in HBM (ANY);
sequence starts are not block-aligned, so each q row-window is DMA'd manually
(BlockSpec indexing cannot express unaligned dynamic offsets) and the output
window is written back the same way.

Two kernel structures (config `vp_allheads` picks; default ON):
- ALL-HEADS (round 5, `_kernel_allheads`): grid (batch, NQ, NKB) — each step
  DMAs the whole page ONCE for every head (the paged_decode pattern) and
  sweeps the heads in a statically unrolled loop with static lane slices;
  per-head softmax state lives in (h, block_q, *) scratch. 1.6x the per-head
  grid on the chunked-prefill mix (the old structure re-walked every page
  once PER HEAD in 4KB lane-slice DMAs — DMA-issue-bound).
- PER-HEAD (`_kernel`): grid (h, batch, NQ, NKB); kept as the fallback for
  h > 64 or when the all-head scratch exceeds the VMEM estimate.
Both: inactive steps are skipped by pl.when; the kv pipeline is per-row
double-buffered (first block fetched at row start, next prefetched per step).
Multi-token in-kernel append prologue (fused speculative-verify path): see
`_emit_append_prologue`.
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
from vllm_flash_attn_tpu.kernels.flash_prefill import (
    DEFAULT_MASK_VALUE,
    LN2,
    LOG2E,
    MIN_LANES,
)

def _kernel(
    # scalar prefetch
    cu_q_ref,  # (b+1,) int32 query sequence starts (8-ALIGNED packing)
    lens_q_ref,  # (b,) int32 TRUE query lengths (aligned slots may exceed)
    lens_k_ref,  # (b,) int32 keys per sequence
    tables_ref,  # (b, max_pages) int32
    # inputs (ANY/HBM)
    q_hbm,  # (h, total_q_padded, d)
    k_pages_ref,  # (num_pages, page_size, h_k, d)
    v_pages_ref,
    alibi_ref,  # SMEM (1, h) or (1, 1)
    # outputs
    o_hbm,  # (h, total_q_padded, d) ANY
    lse_hbm,  # (h, total_q_padded, MIN_LANES) fp32 ANY, or None
    # scratch
    q_buf,  # (block_q, d)
    o_buf,  # (block_q, d)
    lse_buf,  # (block_q, MIN_LANES) fp32
    k_buf,  # (2, ppb, page_size, d)  — single kv head
    v_buf,
    sems,  # DMA (2, 2)
    qo_sem,  # DMA (2,)
    m_scr,  # (block_q, MIN_LANES)
    l_scr,
    acc_scr,  # (block_q, d)
    *,
    batch: int,
    page_size: int,
    pages_per_block: int,
    q_per_kv: int,
    block_q: int,
    sm_scale: float,
    causal: bool,
    window: Tuple[int, int],
    softcap: float,
    has_alibi: bool,
    return_lse: bool = False,
    nkb_s: int = 0,
    s_new: int = 0,  # fused multi-token append: tokens per row in k_new
    bmap_ref=None,  # folded grid: dim 1 walks only ACTIVE (b, qi, ki) steps
    qmap_ref=None,
    kmap_ref=None,
    num_new_ref=None,  # (b,) int32 — tokens row bb actually appends
    k_new_hbm=None,  # (n_pad, h_k*d) VMEM — new tokens, row-padded to 8
    v_new_hbm=None,
    append_sem=None,  # DMA (2,)
    append_buf=None,  # VMEM (page_size, h_k*d) — page RMW staging
):
    h_ = pl.program_id(0)
    if bmap_ref is not None:
        t = pl.program_id(1)
        b = bmap_ref[t]
        qi = qmap_ref[t]
        ki = kmap_ref[t]
        nkb = nkb_s
        grid_first = jnp.logical_and(h_ == 0, pl.program_id(1) == 0)
    else:
        b = pl.program_id(1)
        qi = pl.program_id(2)
        ki = pl.program_id(3)
        nkb = pl.num_programs(3)
        grid_first = (
            (h_ == 0) & (b == 0) & (qi == 0) & (ki == 0)
        )
    bk = page_size * pages_per_block
    hk_idx = h_ // q_per_kv

    if s_new > 0:
        _emit_append_prologue(
            grid_first, batch, s_new, page_size, lens_k_ref, num_new_ref,
            tables_ref, k_pages_ref, v_pages_ref, k_new_hbm, v_new_hbm,
            append_sem, append_buf,
        )

    wl, wr = window
    if causal:
        wr = 0

    # the host repacks q so every sequence starts on an 8-row boundary and
    # block_q is a multiple of 8 — assert it so Mosaic can prove the
    # sublane-dim DMA offsets divisible by the tiling
    q_start = pl.multiple_of(cu_q_ref[b], 8)
    len_q = lens_q_ref[b]
    len_k = lens_k_ref[b]
    nq_b = pl.cdiv(len_q, block_q)

    # active kv-block range for (b, qi): bottom-right causal alignment
    offset = len_k - len_q
    row_lo = qi * block_q
    row_hi = jnp.minimum(row_lo + block_q, len_q) - 1
    nkb_b = jnp.maximum(pl.cdiv(len_k, bk) - 1, 0)  # last kv block of the seq
    if wr >= 0:
        last = jnp.clip((row_hi + offset + wr) // bk, 0, nkb - 1)
    else:
        last = jnp.int32(nkb - 1)
    last = jnp.minimum(last, nkb_b)
    if wl >= 0:
        first = jnp.clip((row_lo + offset - wl) // bk, 0, last)
    else:
        first = jnp.int32(0)

    active = jnp.logical_and(qi < nq_b, jnp.logical_and(ki >= first, ki <= last))
    active = jnp.logical_and(active, len_k > 0)

    d = k_buf.shape[-1]
    # The pool arrives as (num_pages, page_size, h_k*d): a single head is a
    # 128-aligned LANE slice, which DMA supports — slicing the head out of
    # the 4D (num_pages, page_size, h_k, d) layout is a second-minor-dim
    # slice that Mosaic's (sublane, lane) tiling rejects on hardware.
    hk_off = pl.multiple_of(hk_idx * d, 128)

    def start_kv_fetch(ki_, slot):
        max_pages = tables_ref.shape[1]
        num_pages = k_pages_ref.shape[0]
        for p in range(pages_per_block):
            # Clamp both the table index (the final block group may be partial
            # when max_pages % pages_per_block != 0) and the page value (table
            # entries past a sequence's allocation are caller garbage): an
            # OOB-index DMA is undefined on hardware even though the fetched
            # rows are masked out of the result.
            idx = jnp.minimum(ki_ * pages_per_block + p, max_pages - 1)
            page_idx = jnp.clip(tables_ref[b, idx], 0, num_pages - 1)
            pltpu.make_async_copy(
                k_pages_ref.at[page_idx, :, pl.ds(hk_off, d)],
                k_buf.at[slot, p],
                sems.at[slot, 0],
            ).start()
            pltpu.make_async_copy(
                v_pages_ref.at[page_idx, :, pl.ds(hk_off, d)],
                v_buf.at[slot, p],
                sems.at[slot, 1],
            ).start()

    @pl.when(active)
    def _run():
        step = ki - first  # 0-based step within the row
        slot = jax.lax.rem(step, 2)

        @pl.when(ki == first)
        def _init_row():
            # row start: kick off the first kv block and this row's q window
            start_kv_fetch(ki, slot)
            pltpu.make_async_copy(
                q_hbm.at[
                    h_, pl.ds(pl.multiple_of(q_start + qi * block_q, 8),
                              block_q)
                ],
                q_buf,
                qo_sem.at[0],
            ).start()
            m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
            l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
            acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)
            pltpu.make_async_copy(
                q_hbm.at[
                    h_, pl.ds(pl.multiple_of(q_start + qi * block_q, 8),
                              block_q)
                ],
                q_buf,
                qo_sem.at[0],
            ).wait()

        @pl.when(ki < last)
        def _prefetch_next():
            start_kv_fetch(ki + 1, 1 - slot)

        for p in range(pages_per_block):
            pltpu.make_async_copy(
                k_pages_ref.at[0, :, pl.ds(0, d)], k_buf.at[slot, p],
                sems.at[slot, 0],
            ).wait()
        k = k_buf[slot].reshape(bk, k_buf.shape[-1])  # (bk, d)
        q = q_buf[...]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, bk)
        # sm_scale*log2(e) is folded into q host-side; scores are log2-domain
        # (scale_softmax_log2, flash_api.cpp:21-137) — no full-tile scale pass.
        if softcap > 0.0:
            cap2 = softcap * LOG2E
            s = jnp.tanh(s / cap2) * cap2

        row = (
            jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
        )  # q position in sequence
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * bk
        mask = jnp.logical_and(col < len_k, row < len_q)
        if wr >= 0:
            mask &= col <= row + offset + wr
        if wl >= 0:
            mask &= col >= row + offset - wl
        if has_alibi:
            # (1, h) shared slopes or (batch, h) per-batch slopes — both are
            # scalar SMEM reads (flash_api.cpp:221-237 validates both shapes)
            ab = 0 if alibi_ref.shape[0] == 1 else b
            slope = alibi_ref[ab, h_]  # pre-scaled by log2(e) host-side
            s = s - slope * jnp.abs(row + offset - col).astype(jnp.float32)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        # masked entries need no second where: exp2(MASKVAL - m) == 0 once
        # any real key raised m; fully-masked rows (q tail past len_q) are
        # zeroed by the store-time m-based guard
        p = jnp.exp2(s - m_next[:, :1])
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = l_next

        for pg in range(pages_per_block):
            pltpu.make_async_copy(
                v_pages_ref.at[0, :, pl.ds(0, d)], v_buf.at[slot, pg],
                sems.at[slot, 1],
            ).wait()
        v = v_buf[slot].reshape(bk, v_buf.shape[-1])
        pv = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

        @pl.when(ki == last)
        def _store_row():
            l = l_scr[...][:, :1]
            m_fin = m_scr[...][:, :1]
            dead = jnp.logical_or(l == 0.0, m_fin <= 0.5 * DEFAULT_MASK_VALUE)
            l_inv = jnp.where(dead, 0.0, 1.0 / l)
            o_buf[...] = (acc_scr[...] * l_inv).astype(o_buf.dtype)
            copy = pltpu.make_async_copy(
                o_buf,
                o_hbm.at[
                    h_, pl.ds(pl.multiple_of(q_start + qi * block_q, 8),
                              block_q)
                ],
                qo_sem.at[1],
            )
            copy.start()
            copy.wait()
            if return_lse:
                # m is log2-domain; natural-log LSE (flash_api.cpp:418)
                lse = jnp.where(dead, jnp.inf, m_fin * LN2 + jnp.log(l))
                lse_buf[...] = jnp.broadcast_to(lse, lse_buf.shape)
                lcopy = pltpu.make_async_copy(
                    lse_buf,
                    lse_hbm.at[
                        h_,
                        pl.ds(pl.multiple_of(q_start + qi * block_q, 8),
                              block_q),
                    ],
                    qo_sem.at[1],
                )
                lcopy.start()
                lcopy.wait()


def _emit_append_prologue(
    grid_first, batch, s_new, page_size, lens_k_ref, num_new_ref,
    tables_ref, k_pages_ref, v_pages_ref, k_new_ref, v_new_ref,
    append_sem, append_buf,
):
    """In-kernel MULTI-token cache append (the reference Append_KV prologue,
    flash_fwd_kernel.h:671-785, for seqlen_knew > 1 — the speculative-verify
    case): before ANY page fetch, write each row's new tokens into its page
    slots. Row bb's tokens occupy positions lens_k[bb]-num_new[bb] ..
    lens_k[bb]-1 (lens_k already includes the new tokens), spanning at most
    npp pages.

    Mosaic rejects every single-row DMA shape for this (a 1-row slice of any
    tiled dim fails the (sublane,128) alignment check — three round-5
    hardware compile errors), so the append is page-granular
    read-modify-write instead: DMA the whole page into VMEM, replace the
    target rows via a one-hot row-select matmul from the VMEM k_new block
    (exact — exactly one 1.0 per selected row), DMA the page back. All
    slices are full-extent leading-dim slices. The grid is sequential on one
    core, so the first grid step strictly precedes every fetch."""
    npp = (s_new + page_size - 2) // page_size + 1
    n_pad = k_new_ref.shape[0]

    @pl.when(grid_first)
    def _append_prologue():
        num_pages_ = k_pages_ref.shape[0]
        max_pages_ = tables_ref.shape[1]
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (page_size, n_pad), 1)
        for bb in range(batch):
            @pl.when(num_new_ref[bb] > 0)
            def _row(bb=bb):
                pos0 = lens_k_ref[bb] - num_new_ref[bb]
                first_pg = pos0 // page_size
                last_pg = (lens_k_ref[bb] - 1) // page_size
                for pp in range(npp):
                    @pl.when(first_pg + pp <= last_pg)
                    def _page(bb=bb, pp=pp):
                        idx = jnp.minimum(first_pg + pp, max_pages_ - 1)
                        pg = jnp.clip(tables_ref[bb, idx], 0, num_pages_ - 1)
                        rows_g = (
                            (first_pg + pp) * page_size
                            + jax.lax.broadcasted_iota(
                                jnp.int32, (page_size, 1), 0
                            )
                        )
                        tok = rows_g - pos0  # (ps, 1) token index
                        valid = jnp.logical_and(
                            tok >= 0, tok < num_new_ref[bb]
                        )
                        tgt = jnp.where(valid, bb * s_new + tok, -1)
                        sel = (iota_n == tgt).astype(k_new_ref.dtype)
                        for src_ref, pool_ref in (
                            (k_new_ref, k_pages_ref),
                            (v_new_ref, v_pages_ref),
                        ):
                            cin = pltpu.make_async_copy(
                                pool_ref.at[pg], append_buf, append_sem.at[0]
                            )
                            cin.start()
                            cin.wait()
                            new_rows = jax.lax.dot_general(
                                sel, src_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )  # (ps, h_k*d) — exact one-hot select
                            merged = jnp.where(
                                valid,
                                new_rows,
                                append_buf[...].astype(jnp.float32),
                            )
                            append_buf[...] = merged.astype(append_buf.dtype)
                            cout = pltpu.make_async_copy(
                                append_buf, pool_ref.at[pg], append_sem.at[1]
                            )
                            cout.start()
                            cout.wait()


def _kernel_allheads(
    # scalar prefetch
    cu_q_ref,  # (b+1,) int32 query sequence starts (8-ALIGNED packing)
    lens_q_ref,  # (b,) int32 TRUE query lengths
    lens_k_ref,  # (b,) int32 keys per sequence
    tables_ref,  # (b, max_pages) int32
    # inputs
    q_hbm,  # (h, total_q_padded, d) ANY/HBM
    k_pages_ref,  # (num_pages, page_size, h_k*d) ANY/HBM
    v_pages_ref,
    alibi_ref,  # SMEM (1, h) or (batch, h)
    # outputs
    o_hbm,  # (h, total_q_padded, d) ANY
    lse_hbm,  # (h, total_q_padded, MIN_LANES) fp32 ANY, or None
    # scratch
    q_buf,  # (h, block_q, d)
    o_buf,  # (h, block_q, d)
    lse_buf,  # (h, block_q, MIN_LANES) fp32
    k_buf,  # (2, ppb, page_size, h_k*d) — ALL heads per page
    v_buf,
    sems,  # DMA (2, 2)
    qo_sem,  # DMA (2,)
    m_scr,  # (h, block_q, MIN_LANES)
    l_scr,
    acc_scr,  # (h, block_q, d) fp32
    *,
    batch: int,
    page_size: int,
    pages_per_block: int,
    q_per_kv: int,
    block_q: int,
    n_heads: int,
    head_dim: int,
    sm_scale: float,
    causal: bool,
    window,
    softcap: float,
    has_alibi: bool,
    return_lse: bool = False,
    nkb_s: int = 0,
    s_new: int = 0,
    bmap_ref=None,
    qmap_ref=None,
    kmap_ref=None,
    num_new_ref=None,
    k_new_hbm=None,
    v_new_hbm=None,
    append_sem=None,
    append_buf=None,
):
    """All-heads-per-step variant of _kernel (round 5). The per-head grid
    re-walks every page once PER HEAD in 4 KB lane-slice DMAs — measured
    6-7 TF on the chunked-prefill mix regardless of block tuning, i.e.
    DMA-issue-bound. Here the grid is (b, qi, ki) only: each step DMAs the
    whole page ONCE for all heads (the paged_decode pattern that reaches
    HBM speed-of-light) and sweeps the heads in a STATIC unrolled loop with
    static lane slices of the shared block. Scratch carries per-head
    softmax state; q/o move as single all-head window DMAs."""
    if bmap_ref is not None:
        t = pl.program_id(0)
        b = bmap_ref[t]
        qi = qmap_ref[t]
        ki = kmap_ref[t]
        nkb = nkb_s
        grid_first = t == 0
    else:
        b = pl.program_id(0)
        qi = pl.program_id(1)
        ki = pl.program_id(2)
        nkb = pl.num_programs(2)
        grid_first = (b == 0) & (qi == 0) & (ki == 0)
    bk = page_size * pages_per_block
    d = head_dim

    if s_new > 0:
        _emit_append_prologue(
            grid_first, batch, s_new, page_size, lens_k_ref, num_new_ref,
            tables_ref, k_pages_ref, v_pages_ref, k_new_hbm, v_new_hbm,
            append_sem, append_buf,
        )

    wl, wr = window
    if causal:
        wr = 0

    q_start = pl.multiple_of(cu_q_ref[b], 8)
    len_q = lens_q_ref[b]
    len_k = lens_k_ref[b]
    nq_b = pl.cdiv(len_q, block_q)

    offset = len_k - len_q
    row_lo = qi * block_q
    row_hi = jnp.minimum(row_lo + block_q, len_q) - 1
    nkb_b = jnp.maximum(pl.cdiv(len_k, bk) - 1, 0)
    if wr >= 0:
        last = jnp.clip((row_hi + offset + wr) // bk, 0, nkb - 1)
    else:
        last = jnp.int32(nkb - 1)
    last = jnp.minimum(last, nkb_b)
    if wl >= 0:
        first = jnp.clip((row_lo + offset - wl) // bk, 0, last)
    else:
        first = jnp.int32(0)

    active = jnp.logical_and(qi < nq_b, jnp.logical_and(ki >= first, ki <= last))
    active = jnp.logical_and(active, len_k > 0)

    def start_kv_fetch(ki_, slot):
        max_pages = tables_ref.shape[1]
        num_pages = k_pages_ref.shape[0]
        for p in range(pages_per_block):
            idx = jnp.minimum(ki_ * pages_per_block + p, max_pages - 1)
            page_idx = jnp.clip(tables_ref[b, idx], 0, num_pages - 1)
            pltpu.make_async_copy(
                k_pages_ref.at[page_idx], k_buf.at[slot, p], sems.at[slot, 0]
            ).start()
            pltpu.make_async_copy(
                v_pages_ref.at[page_idx], v_buf.at[slot, p], sems.at[slot, 1]
            ).start()

    @pl.when(active)
    def _run():
        step = ki - first
        slot = jax.lax.rem(step, 2)
        win = pl.ds(pl.multiple_of(q_start + qi * block_q, 8), block_q)

        @pl.when(ki == first)
        def _init_row():
            start_kv_fetch(ki, slot)
            qc = pltpu.make_async_copy(
                q_hbm.at[:, win], q_buf, qo_sem.at[0]
            )
            qc.start()
            m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
            l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
            acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)
            qc.wait()

        @pl.when(ki < last)
        def _prefetch_next():
            start_kv_fetch(ki + 1, 1 - slot)

        for p in range(pages_per_block):
            pltpu.make_async_copy(
                k_pages_ref.at[0], k_buf.at[slot, p], sems.at[slot, 0]
            ).wait()
            pltpu.make_async_copy(
                v_pages_ref.at[0], v_buf.at[slot, p], sems.at[slot, 1]
            ).wait()
        kt = k_buf[slot].reshape(bk, k_buf.shape[-1])  # (bk, h_k*d)
        vt = v_buf[slot].reshape(bk, v_buf.shape[-1])

        # position mask is head-independent: compute ONCE for all heads
        row = jax.lax.broadcasted_iota(jnp.int32, (block_q, bk), 0) + qi * block_q
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, bk), 1) + ki * bk
        mask = jnp.logical_and(col < len_k, row < len_q)
        if wr >= 0:
            mask &= col <= row + offset + wr
        if wl >= 0:
            mask &= col >= row + offset - wl
        if has_alibi:
            ab = 0 if alibi_ref.shape[0] == 1 else b
            dist = jnp.abs(row + offset - col).astype(jnp.float32)

        for hh in range(n_heads):
            lo = (hh // q_per_kv) * d  # static lane offset of this kv head
            kh = kt[:, lo:lo + d]  # (bk, d)
            s = jax.lax.dot_general(
                q_buf[hh], kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (block_q, bk); log2-domain (sm_scale*log2e folded into q)
            if softcap > 0.0:
                cap2 = softcap * LOG2E
                s = jnp.tanh(s / cap2) * cap2
            if has_alibi:
                s = s - alibi_ref[ab, hh] * dist
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

            m_prev = m_scr[hh]
            l_prev = l_scr[hh]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next[:, :1])
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_scr[hh] = m_next
            l_scr[hh] = l_next
            pv = jax.lax.dot(
                p.astype(vt.dtype), vt[:, lo:lo + d],
                preferred_element_type=jnp.float32,
            )
            acc_scr[hh] = acc_scr[hh] * alpha[:, :1] + pv

        @pl.when(ki == last)
        def _store_row():
            for hh in range(n_heads):
                l = l_scr[hh][:, :1]
                m_fin = m_scr[hh][:, :1]
                dead = jnp.logical_or(
                    l == 0.0, m_fin <= 0.5 * DEFAULT_MASK_VALUE
                )
                l_inv = jnp.where(dead, 0.0, 1.0 / l)
                o_buf[hh] = (acc_scr[hh] * l_inv).astype(o_buf.dtype)
                if return_lse:
                    lse = jnp.where(dead, jnp.inf, m_fin * LN2 + jnp.log(l))
                    lse_buf[hh] = jnp.broadcast_to(lse, lse_buf.shape[1:])
            copy = pltpu.make_async_copy(
                o_buf, o_hbm.at[:, win], qo_sem.at[1]
            )
            copy.start()
            copy.wait()
            if return_lse:
                lcopy = pltpu.make_async_copy(
                    lse_buf, lse_hbm.at[:, win], qo_sem.at[1]
                )
                lcopy.start()
                lcopy.wait()


def _build_paged_fold_maps(
    lens_q, lens_k, batch, nq, nkb, block_q, bk, causal, window
):
    """Maps for the folded paged-varlen grid: (bmap, qmap, kmap) of STATIC
    worst-case length batch*nq*nkb plus the DYNAMIC active step count.
    Mirrors the kernel's in-kernel [first, last] bounds exactly (bottom-right
    causal alignment, inclusive window)."""
    wl, wr = int(window[0]), int(window[1])
    if causal:
        wr = 0
    qi_g = jnp.arange(nq, dtype=jnp.int32)[None, :]
    lq = lens_q.astype(jnp.int32)[:, None]
    lk = lens_k.astype(jnp.int32)[:, None]
    row_lo = jnp.broadcast_to(qi_g * block_q, (batch, nq))
    row_hi = jnp.minimum(row_lo + block_q, lq) - 1
    offset = lk - lq
    nkb_b = jnp.maximum((lk + bk - 1) // bk - 1, 0)
    if wr >= 0:
        last = jnp.clip((row_hi + offset + wr) // bk, 0, nkb - 1)
    else:
        last = jnp.full((batch, nq), nkb - 1, jnp.int32)
    last = jnp.minimum(last, jnp.broadcast_to(nkb_b, (batch, nq)))
    if wl >= 0:
        first = jnp.clip((row_lo + offset - wl) // bk, 0, last)
    else:
        first = jnp.zeros((batch, nq), jnp.int32)
    nq_b = (lq + block_q - 1) // block_q
    active = jnp.logical_and(qi_g < nq_b, lk > 0)
    counts = jnp.where(active, last - first + 1, 0).reshape(-1)
    cum = jnp.cumsum(counts)
    real_total = cum[-1]
    # clamp to >= 1 so an all-inactive batch still has a (guarded, no-op)
    # step; the kernel re-checks activity from lens either way
    total = jnp.maximum(real_total, 1)
    t = jnp.arange(batch * nq * nkb, dtype=jnp.int32)
    r = jnp.searchsorted(cum, t, side="right").astype(jnp.int32)
    rc = jnp.clip(r, 0, batch * nq - 1)
    firsts = first.reshape(-1)
    in_row = t - (cum[rc] - counts[rc])
    live = t < real_total
    bmap = jnp.where(live, rc // nq, 0).astype(jnp.int32)
    qmap = jnp.where(live, rc % nq, 0).astype(jnp.int32)
    kmap = jnp.where(live, firsts[rc] + in_row, firsts[0]).astype(jnp.int32)
    return bmap, qmap, kmap, total


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_seqlen_q", "causal", "sm_scale", "window", "softcap", "block_q",
        "pages_per_compute_block", "return_lse", "interpret", "fold",
    ),
)
def flash_attention_varlen_paged(
    q: jax.Array,  # (h, total_q, d) head-major packed
    k_pages: jax.Array,  # (num_pages, page_size, h_k, d)
    v_pages: jax.Array,
    cu_seqlens_q: jax.Array,  # (b+1,) int32
    lens_k: jax.Array,  # (b,) int32 keys in cache per sequence
    block_tables: jax.Array,  # (b, max_pages) int32
    max_seqlen_q: int,
    alibi_slopes: Optional[jax.Array] = None,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    window: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    block_q: int = 256,
    pages_per_compute_block: Optional[int] = None,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
    fold: Optional[bool] = None,  # splash folded grid (None -> VP_SPLASH env)
    k_new: Optional[jax.Array] = None,  # (b, s_new, h_k, d): fused append
    v_new: Optional[jax.Array] = None,
    num_new: Optional[jax.Array] = None,  # (b,) tokens per row (def: s_new)
):
    """Varlen queries attending over a paged KV cache, zero dense gathering.

    Causal is bottom-right aligned per sequence (query i of sequence b sits at
    key position i + lens_k[b] - len_q[b], flash_attn_interface.py:1051-1061).
    Returns out (h, total_q, d) [, fp32 lse (h, total_q) if return_lse].

    With k_new/v_new, the kernel writes each row's `num_new[b]` (default
    s_new) new tokens into its page slots at positions
    lens_k[b]-num_new[b]..lens_k[b]-1 BEFORE the sweep (multi-token in-kernel
    append, flash_fwd_kernel.h:671-785 analog — the speculative-verify /
    chunked-prefill case); `lens_k` must already include the new tokens, and
    the (donated, aliased) updated pools are returned after the attention
    output: (out[, lse], k_pages, v_pages). Requires a lane-aligned pool
    (d % 128 == 0 or a lane-padded allocation).
    """
    h, total_q, d = q.shape
    num_pages, page_size, h_k, d_pool = k_pages.shape
    assert h % h_k == 0
    q_per_kv = h // h_k
    batch = block_tables.shape[0]
    max_pages = block_tables.shape[1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = use_interpret()
    if pages_per_compute_block is None:
        # round-5 hardware sweep (all-heads kernel): bk=256 beats bk=512 by
        # ~8% on both the chunked-prefill mix and monolithic prompts
        pages_per_compute_block = max(1, min(max_pages, 256 // page_size))
    ppb = min(pages_per_compute_block, max_pages)
    nkb = pl.cdiv(max_pages, ppb)

    block_q = min(block_q, max(MIN_LANES, pl.cdiv(max_seqlen_q, 8) * 8))
    nq = max(1, pl.cdiv(max_seqlen_q, block_q))

    # arbitrary head dims (flash_api.cpp:312-320 analog). Fast path: the pool
    # was allocated lane-padded (PagedState.allocate) — pad q only, no
    # per-call pool copy. Legacy path: pad the pool per call.
    d_orig = d
    if d_pool != d:
        assert d_pool % MIN_LANES == 0 and d_pool > d, (d_pool, d)
        q = jnp.pad(q, [(0, 0), (0, 0), (0, d_pool - d)])
        d = d_pool
    elif d % MIN_LANES != 0:
        d = pl.cdiv(d, MIN_LANES) * MIN_LANES
        q = jnp.pad(q, [(0, 0), (0, 0), (0, d - d_orig)])
        kv_pw = [(0, 0), (0, 0), (0, 0), (0, d - d_orig)]
        k_pages = jnp.pad(k_pages, kv_pw)
        v_pages = jnp.pad(v_pages, kv_pw)

    # Fold sm_scale*log2(e) into q so the kernel skips the scale pass and
    # uses native exp2 (scale_softmax_log2, flash_api.cpp:21-137).
    q = (q * jnp.asarray(sm_scale * LOG2E, q.dtype)).astype(q.dtype)

    # 8-align each sequence's packed rows: Mosaic requires the kernel's
    # sublane-dim q/o window DMA offsets to be PROVABLY divisible by the
    # (8,128) tiling, and arbitrary cu_seqlens are not (found by round-3
    # hardware smoke — interpret mode does not check this). One scatter in,
    # one gather out; O(total_q) next to the attention sweep.
    cu_q32 = cu_seqlens_q.astype(jnp.int32)
    lens_q_ = cu_q32[1:] - cu_q32[:-1]
    aligned_lens = ((lens_q_ + 7) // 8) * 8
    cu_aligned = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(aligned_lens)]
    ).astype(jnp.int32)
    tok = jnp.arange(total_q, dtype=jnp.int32)
    seg = jnp.searchsorted(cu_q32[1:], tok, side="right").astype(jnp.int32)
    new_idx = cu_aligned[seg] + (tok - cu_q32[seg])
    total_aligned = total_q + 8 * batch  # static bound on the aligned total
    q = (
        jnp.zeros((h, total_aligned, d), q.dtype)
        .at[:, new_idx, :].set(q, mode="promise_in_bounds")
    )
    cu_for_kernel = cu_aligned

    # pad the packed q stream so every block_q window DMA is in-bounds
    total_pad = (pl.cdiv(total_aligned, block_q) + 1) * block_q
    q = jnp.pad(q, [(0, 0), (0, total_pad - total_aligned), (0, 0)])

    has_alibi = alibi_slopes is not None
    if has_alibi:
        a = jnp.asarray(alibi_slopes, jnp.float32)
        # (h,) shared or (batch, h) per-batch; kernel scores are log2-domain
        alibi_slopes = (a if a.ndim == 2 else a.reshape(1, h)) * LOG2E
    else:
        alibi_slopes = jnp.zeros((1, 1), jnp.float32)

    # Collapse (h_k, d) so the kernel can DMA one head as an aligned lane
    # slice (see _kernel.start_kv_fetch); metadata-only reshape.
    k_pages = k_pages.reshape(num_pages, page_size, h_k * d)
    v_pages = v_pages.reshape(num_pages, page_size, h_k * d)

    # fused multi-token append operands (dummies keep ONE kernel signature)
    append = k_new is not None
    if append:
        assert v_new is not None
        s_new = k_new.shape[1]
        assert d == d_orig or d_pool == d, (
            "fused append requires a lane-aligned pool (d % 128 == 0 or a "
            "lane-padded allocation): the per-call pool pad copies the pool, "
            "defeating in-place aliasing — use append_kv_paged instead"
        )
        if k_new.shape[-1] != d:  # lane-padded pool: pad the new tokens only
            pw = [(0, 0), (0, 0), (0, 0), (0, d - k_new.shape[-1])]
            k_new = jnp.pad(k_new, pw)
            v_new = jnp.pad(v_new, pw)
        # (n_pad, h_k*d) VMEM block, rows 8-padded: the kernel consumes the
        # new tokens as VALUES (one-hot row-select matmul), never as
        # single-row DMA sources (Mosaic tiling constraint)
        n_pad = -(-batch * s_new // 8) * 8
        k_new = k_new.astype(k_pages.dtype).reshape(batch * s_new, h_k * d)
        v_new = v_new.astype(v_pages.dtype).reshape(batch * s_new, h_k * d)
        pad_rows = [(0, n_pad - batch * s_new), (0, 0)]
        k_new = jnp.pad(k_new, pad_rows)
        v_new = jnp.pad(v_new, pad_rows)
        if num_new is None:
            num_new = jnp.full((batch,), s_new, jnp.int32)
        else:
            num_new = num_new.astype(jnp.int32)
    else:
        s_new = 0
        k_new = jnp.zeros((8, 128), k_pages.dtype)
        v_new = jnp.zeros((8, 128), v_pages.dtype)
        num_new = jnp.zeros((batch,), jnp.int32)

    if fold is None:
        fold = knob("vp_splash")
    # all-heads-per-step structure (round 5): one full-page DMA shared by
    # every head + static head loop — 32x fewer, 32x bigger page DMAs than
    # the per-head grid (which measured 6-7 TF, DMA-issue-bound, on the
    # chunked-prefill mix). Guarded by a VMEM estimate: per-head softmax
    # state and all-head q/o/acc buffers must fit.
    vmem_allheads = (
        2 * 2 * ppb * page_size * h_k * d            # k+v rings (bf16-ish)
        + h * block_q * (2 * d * 2 + d * 4)          # q/o bf16 + acc fp32
        + 2 * h * block_q * MIN_LANES * 4            # m/l
        + h * block_q * MIN_LANES * 4                # lse
    )
    allheads = bool(knob("vp_allheads")) and h <= 64 and vmem_allheads < 80e6
    common = dict(
        batch=batch,
        page_size=page_size,
        pages_per_block=ppb,
        q_per_kv=q_per_kv,
        block_q=block_q,
        sm_scale=float(sm_scale),
        causal=causal,
        window=tuple(int(w) for w in window),
        softcap=float(softcap),
        has_alibi=has_alibi,
        return_lse=return_lse,
        nkb_s=nkb,
        s_new=s_new,
    )
    if allheads:
        body = functools.partial(
            _kernel_allheads, n_heads=h, head_dim=d, **common
        )
    else:
        body = functools.partial(_kernel, **common)
    n_pref = 8 if fold else 5
    n_out = 1 + (1 if return_lse else 0) + (2 if append else 0)

    def kernel(*refs):
        # one positional adapter for every (fold, lse, append) combination:
        # prefetch refs, input refs, output refs, scratch refs — in operand
        # order
        cu_r, lq_r, lk_r, bt_r, nn_r = refs[:5]
        maps = refs[5:n_pref]
        q_r, kp_r, vp_r, a_r, kn_r, vn_r = refs[n_pref:n_pref + 6]
        outs = refs[n_pref + 6:n_pref + 6 + n_out]
        scr = refs[n_pref + 6 + n_out:]
        o_r = outs[0]
        lse_r = outs[1] if return_lse else None
        if append:
            # the aliased pool OUTPUT refs replace the input pool refs for
            # the whole kernel: on hardware they are the same HBM buffers
            # (input_output_aliases); in interpret mode the outputs are
            # seeded with the input values — append writes and sweep reads
            # see one consistent, mutating pool either way
            kp_r, vp_r = outs[-2], outs[-1]
        app_buf, app_sem = (scr[-2], scr[-1]) if append else (None, None)
        scr_main = scr[:-2] if append else scr
        kw = (
            dict(bmap_ref=maps[0], qmap_ref=maps[1], kmap_ref=maps[2])
            if fold else {}
        )
        body(cu_r, lq_r, lk_r, bt_r, q_r, kp_r, vp_r, a_r, o_r, lse_r,
             *scr_main, num_new_ref=nn_r, k_new_hbm=kn_r, v_new_hbm=vn_r,
             append_sem=app_sem, append_buf=app_buf, **kw)

    if fold:
        bmap, qmap, kmap, total_steps = _build_paged_fold_maps(
            lens_q_, lens_k, batch, nq, nkb, block_q, ppb * page_size,
            causal, window,
        )
        grid = (total_steps,) if allheads else (h, total_steps)
    else:
        grid = (batch, nq, nkb) if allheads else (h, batch, nq, nkb)
    semantics = ("arbitrary",) * len(grid)
    if allheads:
        scratch_shapes = [
            pltpu.VMEM((h, block_q, d), q.dtype),
            pltpu.VMEM((h, block_q, d), q.dtype),
            pltpu.VMEM((h, block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((2, ppb, page_size, h_k * d), k_pages.dtype),
            pltpu.VMEM((2, ppb, page_size, h_k * d), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((h, block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((h, block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((h, block_q, d), jnp.float32),
        ]
    else:
        scratch_shapes = [
            pltpu.VMEM((block_q, d), q.dtype),
            pltpu.VMEM((block_q, d), q.dtype),
            pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((2, ppb, page_size, d), k_pages.dtype),
            pltpu.VMEM((2, ppb, page_size, d), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ]
    if append:
        scratch_shapes.append(
            pltpu.VMEM((page_size, h_k * d), k_pages.dtype)
        )
        scratch_shapes.append(pltpu.SemaphoreType.DMA((2,)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_pref,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # q stream
            pl.BlockSpec(memory_space=pl.ANY),  # k pages
            pl.BlockSpec(memory_space=pl.ANY),  # v pages
            pl.BlockSpec(memory_space=pltpu.SMEM),  # alibi
            # k_new/v_new live in VMEM as full blocks: the append prologue
            # reads them as values for its row-select matmul
            pl.BlockSpec(k_new.shape, lambda *_: (0, 0)),
            pl.BlockSpec(v_new.shape, lambda *_: (0, 0)),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_out,
        scratch_shapes=scratch_shapes,
    )
    out_shape = [jax.ShapeDtypeStruct((h, total_pad, d), q.dtype)]
    if return_lse:
        out_shape.append(
            jax.ShapeDtypeStruct((h, total_pad, MIN_LANES), jnp.float32)
        )
    if append:
        out_shape += [
            jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
            jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
        ]
    operands = [
        cu_for_kernel,
        lens_q_.astype(jnp.int32),
        lens_k.astype(jnp.int32),
        block_tables.astype(jnp.int32),
        num_new,
    ]
    if fold:
        operands += [bmap, qmap, kmap]
    operands += [q, k_pages, v_pages, alibi_slopes, k_new, v_new]
    # operand indices count scalar prefetch too: k_pages = n_pref+1
    aliases = (
        {n_pref + 1: n_out - 2, n_pref + 2: n_out - 1} if append else {}
    )
    results = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    pools = ()
    if append:
        pools = (
            results[-2].reshape(num_pages, page_size, h_k, d),
            results[-1].reshape(num_pages, page_size, h_k, d),
        )
        results = results[:-2]
    out = results[0][:, new_idx, :d_orig]  # gather back to the caller's packing
    if return_lse:
        ret = (out, results[1][:, new_idx, 0])
    else:
        ret = (out,)
    if append:
        return ret + pools
    return ret if return_lse else out
