"""Pallas TPU flash-attention forward (prefill) kernel.

TPU-native re-design of the reference CUDA forward kernel
(/root/reference/csrc/flash_attn/src/flash_fwd_kernel.h:28-472):

- CUTLASS CTA tiling            -> Pallas grid (b, h, q_blocks, kv_blocks) + BlockSpecs
- cp.async double buffering     -> Pallas's automatic pipelined block fetches
- online-softmax rescale        -> fp32 m/l/acc VMEM scratch carried across kv blocks
- template static_switch zoo    -> Python-level trace specialization (causal/window/
                                   alibi/softcap flags close over the kernel body)
- reverse n-block iteration     -> when masking skips blocks (causal/window),
                                   a folded grid: scalar-prefetched (qi, ki)
                                   maps enumerate ONLY the active pairs, so
                                   skipped blocks cost no grid steps (the TPU
                                   answer to the CUDA early exit,
                                   flash_fwd_kernel.h:109-111); full-coverage
                                   runs keep the dense static grid, which
                                   pipelines marginally better.

Semantics match the reference API (/root/reference/vllm_flash_attn/
flash_attn_interface.py:1026-1116): bottom-right-aligned causal for sq != sk,
inclusive sliding window (left, right), ALiBi bias -slope*|i + sk - sq - j|,
MQA/GQA head broadcast, fp32 LSE output, fully-masked rows -> out 0 / lse +inf
(flash_api.cpp:401-407).

Internal layout is (b, h, s, d): the trailing (s, d) pair maps onto MXU tiles.

Perf notes (v5e, 4k, bf16, 1024x1024 blocks): ~80 TFLOP/s non-causal, ~43-52
TFLOP/s causal-convention (run-to-run relay noise ~15%). Round-3 stage
isolation (PF_SKIP knobs, one process): softmax VPU ~1.8us/tile, both MXU
GEMMs ~2.6us/tile, and ~5.9us/tile REMAINS with qk+softmax+pv all skipped —
the cost is VMEM tile traffic + per-step machinery, scaling with block size
(2048-blocks are slower per FLOP, so it is not a fixed per-step constant).
Measured dead ends: interleaved independent sub-q chains (45.8), bf16-exp2
softmax (48 vs 51.6 base), dense vs folded grid (~equal), kv-chunked inner
fori_loop (~equal), software-pipelined inner loop (38.9 — the s carry adds
traffic and Mosaic does not overlap MXU/VPU across tiles), one-step VMEM
score staging (round 2), inner-k chunking (round 1). All knobs kept
(default off) for reproducibility: PF_INTERLEAVE/PF_PBF16/PF_DENSE/
PF_ROWSUM/PF_CHUNK/PF_PIPE/PF_SKIP.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_flash_attn_tpu.config import knob, use_interpret

# Diagonal quadrant split (pf_diagsplit, import-once): with interleave >= 2,
# a sub-chain whose rows cannot see the right half of a causal diagonal tile
# contracts only k[:block_k//2] — the upper-right QUADRANT of each diagonal
# tile skips both its GEMMs and its softmax (for bq == bk causal at 4k/1024
# blocks, 4 of 10 tiles per head are diagonal: ~11%% fewer tile-FLOPs).
# Plain-causal only (no window/alibi/softcap/rowsum/skip); pairs with
# pf_interleave=2 (at interleave=1 the whole-block chain always sees the
# right half, so the branch never fires).
_DIAGSPLIT = knob("pf_diagsplit")

# Branch-free masking experiment (pf_nocond, import-once like the pd_*
# knobs). A VMEM-resident microbenchmark measured the per-tile lax.cond
# dual path at ~3 us/tile (both branches predicated), but in THIS kernel
# the cond lowers as a cheap branch and unconditional masking loses ~3%
# on hardware (round-5 interleaved A/B, caches cleared). Kept as a knob:
# the microbenchmark result says the lowering is context-dependent.
_NOCOND = knob("pf_nocond")

# -0.7 * float32 max: large enough to zero out after softmax, finite so that
# exp(m - m) never hits inf - inf -> NaN on fully-masked rows.
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
MIN_LANES = 128
LOG2E = math.log2(math.e)
LN2 = math.log(2.0)


def _stats_block(block_q: int) -> Tuple[int, int]:
    return (block_q, MIN_LANES)


def _fwd_kernel(
    q_ref,
    k_ref,
    v_ref,
    alibi_ref,
    diag_ref,  # (block_q, block_k) fp32 additive causal-mask tile, or (1,1)
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
    seqlen_q: int,
    seqlen_k: int,
    has_alibi: bool,
    return_lse: bool,
    nk: int,
    fuse_rowsum: bool = False,
    p_bf16: bool = False,
    interleave: int = 1,
    debug_skip: Tuple[str, ...] = (),
    diag_bias: bool = False,
    d_model: int = 0,
    qmap_ref=None,
    kmap_ref=None,
):
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    if qmap_ref is not None:
        # folded grid: dimension 2 enumerates only ACTIVE (qi, ki) pairs
        t = pl.program_id(2)
        qi = qmap_ref[t]
        ki = kmap_ref[t]
    else:
        qi = pl.program_id(2)
        ki = pl.program_id(3)

    offset = seqlen_k - seqlen_q  # bottom-right causal alignment
    wl, wr = window
    if causal:
        wr = 0

    first_active, last_active = _active_range(
        qi, nk, block_q, block_k, seqlen_q, offset, wl, wr
    )

    @pl.when(jnp.logical_and(ki >= first_active, ki <= last_active))
    def _run():
        @pl.when(ki == first_active)
        def _init():
            m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
            l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
            acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

        min_row = qi * block_q
        k = k_ref[0, 0]  # (block_k, d)
        col_base = ki * block_k
        # The q block is processed as `interleave` INDEPENDENT sub-q chains.
        # Each chain is QK-matmul -> softmax -> PV-matmul with no data
        # dependence on its siblings (separate scratch rows), so Mosaic's
        # instruction scheduler can overlap one chain's VPU softmax with
        # another chain's MXU matmuls — the per-step critical path drops
        # from VPU+MXU (serial) toward max(VPU, MXU). interleave=1 keeps
        # the original single-chain body.
        sub = block_q // interleave

        def chain(ii):
            r0 = ii * sub
            rows = slice(r0, r0 + sub)
            min_row_i = min_row + r0
            max_row_i = jnp.minimum(min_row_i + sub, seqlen_q) - 1
            q = q_ref[0, 0, rows]  # (sub, d); pre-scaled by sm_scale*log2(e)
            diag_split = (
                _DIAGSPLIT
                and causal
                and wl < 0
                and not has_alibi
                and softcap == 0.0
                and not fuse_rowsum
                and not p_bf16
                and not debug_skip
                and not diag_bias
                # lse variant (training fwd under the vjp) sits within 180KB
                # of the 16MB scoped-vmem stack limit at 1024 blocks; the
                # split's extra branch buffers push it over. Inference
                # prefill (no lse) keeps the +4.7%; the training step loses
                # ~0.3% (fwd attention is ~7% of the step).
                and not return_lse
                and sub % 16 == 0
                and block_k % (2 * MIN_LANES) == 0
            )
            # Scores live in the log2 domain: sm_scale*log2(e) is folded
            # into q host-side (the reference's scale_softmax_log2,
            # flash_api.cpp:21-137 used at flash_fwd_kernel.h:318-321), so
            # the kernel runs NO full-tile scale pass and the softmax uses
            # native exp2.
            if diag_split:
                s = None  # QK happens inside the diag-split branches
            elif "qk" in debug_skip:
                # stage isolation: pseudo-scores from a cheap vreg tile of q
                # (data-dependent so softmax stays honest; the k/v block
                # fetches are emitted by the Pallas pipeline regardless)
                s = pltpu.repeat(
                    q[:, :MIN_LANES].astype(jnp.float32),
                    block_k // MIN_LANES, axis=1,
                )
            else:
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (sub, block_k)
            if softcap > 0.0 and not diag_split:
                # tanh(nat/cap)*cap*log2e == tanh(s/c')*c' with c'=cap*log2e
                cap2 = softcap * LOG2E
                s = jnp.tanh(s / cap2) * cap2

            if has_alibi and not diag_split:
                row = (
                    jax.lax.broadcasted_iota(jnp.int32, (sub, block_k), 0)
                    + min_row_i
                )
                col = (
                    jax.lax.broadcasted_iota(jnp.int32, (sub, block_k), 1)
                    + col_base
                )
                # full (b, h) array lives in SMEM (a (1,1)-blocked SMEM spec
                # fails Mosaic lowering on hardware); index by grid position
                slope = alibi_ref[bi, hi]
                s = s - slope * jnp.abs(row + offset - col).astype(jnp.float32)

            def online_update(s, masked: bool, rows_=None, min_row_=None):
                # width- and row-window-general: s may be (sub, block_k), a
                # narrower (sub, w) slice, or a row SUBSET (diag-split path:
                # the top half-rows of a diagonal tile contract only the
                # left half of k); shapes derive from s, the scratch window
                # from rows_/min_row_ (default: this chain's full window)
                width = s.shape[1]
                if rows_ is None:
                    rows_, min_row_ = rows, min_row_i
                if masked:
                    row = (
                        jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                        + min_row_
                    )
                    col = (
                        jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                        + col_base
                    )
                    mask = col < seqlen_k
                    if wr >= 0:
                        mask &= col <= row + offset + wr
                    if wl >= 0:
                        mask &= col >= row + offset - wl
                    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
                if "softmax" in debug_skip:
                    # stage isolation: raw scores as p, running stats frozen
                    m_scr[rows_] = jnp.zeros(_stats_block(s.shape[0]), jnp.float32)
                    l_scr[rows_] = jnp.ones(_stats_block(s.shape[0]), jnp.float32)
                    v = v_ref[0, 0, :width]
                    if "pv" in debug_skip:
                        dv_ = acc_scr.shape[-1]
                        pv = s[:, :dv_]
                    else:
                        pv = jax.lax.dot(
                            s.astype(v.dtype), v,
                            preferred_element_type=jnp.float32,
                        )
                    acc_scr[rows_] = acc_scr[rows_] + pv
                    return
                m_prev = m_scr[rows_]  # (sub, 128)
                l_prev = l_scr[rows_]
                m_cur = jnp.max(s, axis=1, keepdims=True)
                m_next = jnp.maximum(m_prev, m_cur)
                alpha = jnp.exp2(m_prev - m_next)
                # Masked entries need no second where: exp2(MASKVAL - m) == 0
                # whenever the row saw any real key (m real); rows that never
                # do hold garbage l that the store-time m-based guard zeroes
                # (and any interim garbage is wiped by alpha == 0 on the
                # first real block). This deletes one full-tile VPU pass per
                # masked block.
                # Subtract a lane-TILED max, never a 1-lane broadcast: m_next
                # is (sub, 128) lane-replicated, and pltpu.repeat copies whole
                # vregs across the (sub, block_k) tile. Broadcasting
                # m_next[:, :1] instead is a 1-lane->N-lane broadcast Mosaic
                # lowers poorly (CLAUDE.md gotcha; same trick as jnp.tile in
                # the stock jax flash kernel).
                nrep = width // MIN_LANES
                m_big = (
                    pltpu.repeat(m_next, nrep, axis=1) if nrep > 1 else m_next
                )
                if p_bf16:
                    # exp2 on bf16 lanes; p lands directly in the PV matmul
                    # dtype (deletes the fp32->bf16 cast pass)
                    p = jnp.exp2((s - m_big).astype(jnp.bfloat16))
                else:
                    p = jnp.exp2(s - m_big)
                if not fuse_rowsum:
                    l_next = alpha * l_prev + jnp.sum(
                        p, axis=1, keepdims=True, dtype=jnp.float32
                    )
                    l_scr[rows_] = l_next
                m_scr[rows_] = m_next
                v = v_ref[0, 0, :width]
                if masked and seqlen_k % block_k != 0:
                    # OOB rows of a partial final kv tile are undefined (NaN
                    # in interpret mode, stale VMEM on hardware); 0*NaN would
                    # poison P@V even though the matching P entry is 0. Any
                    # tile straddling seqlen_k needs this, not just sub-lane
                    # remainders (the old % MIN_LANES condition missed
                    # 128-multiple ragged lengths).
                    valid = (
                        jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
                        + col_base
                        < seqlen_k
                    )
                    v = jnp.where(valid, v, 0)
                if "pv" in debug_skip:
                    # stage isolation: p feeds the acc, no matmul
                    pv = p[:, : acc_scr.shape[-1]].astype(jnp.float32)
                else:
                    pv = jax.lax.dot(
                        p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32,
                    )
                # same lane-tile rule for the (sub, d_v) acc rescale
                dv_ = acc_scr.shape[-1]
                if dv_ % MIN_LANES == 0:
                    arep = dv_ // MIN_LANES
                    alpha_acc = (
                        pltpu.repeat(alpha, arep, axis=1) if arep > 1
                        else alpha
                    )
                else:
                    alpha_acc = alpha[:, :1]
                acc_scr[rows_] = acc_scr[rows_] * alpha_acc + pv

            any_mask = (wl >= 0) or (wr >= 0) or (seqlen_k % block_k != 0)
            if diag_split:
                # Causal diagonal-tile QUADRANT skip, within one chain: when
                # the TOP half-rows of this chain cannot see the right half
                # of k, split the tile — top half-rows contract only
                # k[:block_k//2] (quadrant dropped from both GEMMs and the
                # softmax), bottom half-rows run full width. One cheap
                # branch per tile; interior tiles take the normal path.
                hw = block_k // 2
                sub2 = sub // 2
                needs = col_base + block_k > seqlen_k
                # masking needed if the last col exceeds what the FIRST row
                # of the chain may see
                needs |= col_base + block_k - 1 > min_row_i + offset
                split_ok = jnp.logical_and(
                    needs,
                    col_base + hw > min_row_i + sub2 - 1 + offset,
                )

                def _split():
                    s_top = jax.lax.dot_general(
                        q[:sub2], k[:hw], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    online_update(
                        s_top, True, slice(r0, r0 + sub2), min_row_i
                    )
                    s_bot = jax.lax.dot_general(
                        q[sub2:], k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    online_update(
                        s_bot, True, slice(r0 + sub2, r0 + sub),
                        min_row_i + sub2,
                    )

                def _normal():
                    s2 = jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    jax.lax.cond(
                        needs,
                        lambda: online_update(s2, True),
                        lambda: online_update(s2, False),
                    )

                jax.lax.cond(split_ok, _split, _normal)
                return
            if not any_mask:
                online_update(s, False)
            elif diag_bias:
                # sq == sk square-block causal fast path: every masked tile
                # is a pure diagonal tile (no seq tails), and they all share
                # ONE additive bias (col > row -> MASK). A single add
                # replaces the two iotas + compare + where passes;
                # exp2(MASK - m) == 0 keeps the softmax exact.
                needs = col_base + block_k - 1 > min_row_i + offset
                if _NOCOND:
                    # branch-free: interior tiles add gate*bias == 0 (one
                    # fused multiply-add pass beats the predicated-both-
                    # branches cond by ~3 us/tile)
                    gate = jnp.where(needs, jnp.float32(1), jnp.float32(0))
                    online_update(s + gate * diag_ref[rows], False)
                else:
                    jax.lax.cond(
                        needs,
                        lambda: online_update(s + diag_ref[rows], False),
                        lambda: online_update(s, False),
                    )
            elif _NOCOND:
                # unconditional masking: ~0.34 us/tile vs ~3 us for the cond
                online_update(s, True)
            else:
                needs = col_base + block_k > seqlen_k
                if wr >= 0:
                    needs |= col_base + block_k - 1 > min_row_i + offset + wr
                if wl >= 0:
                    needs |= col_base < max_row_i + offset - wl
                jax.lax.cond(
                    needs,
                    lambda: online_update(s, True),
                    lambda: online_update(s, False),
                )

        for ii in range(interleave):
            chain(ii)

        @pl.when(ki == last_active)
        def _store():
            if fuse_rowsum:
                # the row-sum rode the PV matmul in v's appended ones lanes
                # (VPU reduction moved onto the MXU)
                l = acc_scr[...][:, d_model:d_model + 1]
            else:
                l = l_scr[...][:, :1]
            m_fin = m_scr[...][:, :1]
            # fully-masked rows: m never left the mask floor and l holds
            # garbage exp2(0)==1 sums — zero them here (out 0 / lse +inf,
            # flash_api.cpp:401-407)
            dead = jnp.logical_or(
                l == 0.0, m_fin <= 0.5 * DEFAULT_MASK_VALUE
            )
            l_inv = jnp.where(dead, 0.0, 1.0 / l)
            acc = acc_scr[...][:, :d_model] if fuse_rowsum else acc_scr[...]
            o_ref[0, 0] = (acc * l_inv).astype(o_ref.dtype)
            if return_lse:
                # m is log2-domain; natural-log LSE out (flash_api.cpp:418)
                lse = jnp.where(dead, jnp.inf, m_fin * LN2 + jnp.log(l))
                lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _fwd_kernel_chunked(
    q_ref,  # (1, 1, block_q, d) VMEM
    k_ref,  # (1, 1, kv_chunk, d) VMEM — a whole KV chunk resident
    v_ref,  # (1, 1, kv_chunk, d_v)
    alibi_ref,  # SMEM (b, h) or (1, 1)
    o_ref,
    lse_ref,
    m_scr,  # (block_q, 128)
    l_scr,
    acc_scr,  # (block_q, d_v)
    *,
    causal: bool,
    window: Tuple[int, int],
    softcap: float,
    block_q: int,
    block_k: int,  # inner sweep tile within the chunk
    kv_chunk: int,
    seqlen_q: int,
    seqlen_k: int,
    has_alibi: bool,
    return_lse: bool,
    pipe: bool = False,
    unroll: bool = False,
    d_model: int = 0,
):
    """Chunked-sweep forward: the kv loop runs INSIDE one grid step over a
    VMEM-resident chunk (lax.fori_loop over block_k tiles), so the per-tile
    cost is pure compute — hardware isolation showed the per-grid-step
    pipeline overhead (~6 us) dominating both GEMMs (+softmax) in the
    stepped kernel. Grid: (b, h, nq, num_chunks); Pallas prefetches chunk
    ci+1 while ci's tiles compute (static index maps). The online-softmax
    state persists in VMEM scratch across the (serial, innermost) chunk
    axis. The CUDA analog of the inner loop is the reverse n-block sweep of
    compute_attn_1rowblock (flash_fwd_kernel.h:281-404)."""
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    qi = pl.program_id(2)
    ci = pl.program_id(3)

    offset = seqlen_k - seqlen_q
    wl, wr = window
    if causal:
        wr = 0

    nk_in = pl.cdiv(seqlen_k, block_k)  # inner tiles, global units
    first_active, last_active = _active_range(
        qi, nk_in, block_q, block_k, seqlen_q, offset, wl, wr
    )
    bpc = kv_chunk // block_k
    chunk_lo = ci * bpc
    lo = jnp.maximum(first_active, chunk_lo)
    hi_ = jnp.minimum(last_active, chunk_lo + bpc - 1)

    min_row = qi * block_q
    max_row = jnp.minimum(min_row + block_q, seqlen_q) - 1

    @pl.when(lo <= hi_)
    def _run():
        @pl.when(first_active >= chunk_lo)
        def _init():
            m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
            l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
            acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

        q = q_ref[0, 0]  # (block_q, d); pre-scaled by sm_scale*log2(e)

        def compute_s(j, jj=None):
            # tile index within the resident chunk; a PYTHON int when the
            # sweep is unrolled (static VMEM slices for Mosaic)
            jj = j - chunk_lo if jj is None else jj
            col_base = j * block_k
            k = k_ref[0, 0, pl.ds(jj * block_k, block_k)]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (block_q, block_k); log2-domain (scale folded into q)
            if softcap > 0.0:
                cap2 = softcap * LOG2E
                s = jnp.tanh(s / cap2) * cap2
            if has_alibi:
                row = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (block_q, block_k), 0
                    )
                    + min_row
                )
                col = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (block_q, block_k), 1
                    )
                    + col_base
                )
                slope = alibi_ref[bi, hi]
                s = s - slope * jnp.abs(
                    row + offset - col
                ).astype(jnp.float32)
            return s

        def consume(j, s, jj=None):
            jj = j - chunk_lo if jj is None else jj
            col_base = j * block_k

            def update(s, masked: bool):
                if masked:
                    row = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (block_q, block_k), 0
                        )
                        + min_row
                    )
                    col = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (block_q, block_k), 1
                        )
                        + col_base
                    )
                    mask = col < seqlen_k
                    if wr >= 0:
                        mask &= col <= row + offset + wr
                    if wl >= 0:
                        mask &= col >= row + offset - wl
                    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
                m_prev = m_scr[...]
                l_prev = l_scr[...]
                m_cur = jnp.max(s, axis=1, keepdims=True)
                m_next = jnp.maximum(m_prev, m_cur)
                alpha = jnp.exp2(m_prev - m_next)
                nrep = block_k // MIN_LANES
                m_big = (
                    pltpu.repeat(m_next, nrep, axis=1) if nrep > 1 else m_next
                )
                p = jnp.exp2(s - m_big)
                l_scr[...] = alpha * l_prev + jnp.sum(
                    p, axis=1, keepdims=True, dtype=jnp.float32
                )
                m_scr[...] = m_next
                v = v_ref[0, 0, pl.ds(jj * block_k, block_k)]
                if masked and seqlen_k % block_k != 0:
                    # partial final tile: zero undefined OOB v rows (see the
                    # stepped kernel's note — 0*NaN poisons P@V)
                    valid = (
                        jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
                        + col_base
                        < seqlen_k
                    )
                    v = jnp.where(valid, v, 0)
                pv = jax.lax.dot(
                    p.astype(v.dtype), v, preferred_element_type=jnp.float32
                )
                dv_ = acc_scr.shape[-1]
                if dv_ % MIN_LANES == 0:
                    arep = dv_ // MIN_LANES
                    alpha_acc = (
                        pltpu.repeat(alpha, arep, axis=1) if arep > 1
                        else alpha
                    )
                else:
                    alpha_acc = alpha[:, :1]
                acc_scr[...] = acc_scr[...] * alpha_acc + pv

            if (wl >= 0) or (wr >= 0) or (seqlen_k % block_k != 0):
                if _NOCOND:
                    update(s, True)  # see _NOCOND note at module top
                else:
                    needs = col_base + block_k > seqlen_k
                    if wr >= 0:
                        needs |= (
                            col_base + block_k - 1 > min_row + offset + wr
                        )
                    if wl >= 0:
                        needs |= col_base < max_row + offset - wl
                    jax.lax.cond(
                        needs, lambda: update(s, True),
                        lambda: update(s, False),
                    )
            else:
                update(s, False)

        if unroll:
            # round-4 experiment: UNROLLED sweep over the chunk's tiles —
            # static VMEM slice offsets and no loop-carry machinery; each
            # tile is predicated on the dynamic active range (inactive tiles
            # execute nothing). Amortizes the per-grid-step cost over
            # kv_chunk/block_k tiles without growing the tile itself.
            for j_off in range(bpc):
                @pl.when(
                    jnp.logical_and(
                        chunk_lo + j_off >= lo, chunk_lo + j_off <= hi_
                    )
                )
                def _tile(j_off=j_off):
                    j = chunk_lo + j_off
                    consume(j, compute_s(j, jj=j_off), jj=j_off)
        elif pipe:
            # software pipeline: tile j+1's QK matmul is issued BEFORE tile
            # j's softmax/PV consume it, so the per-tile critical path can
            # drop from MXU+VPU (serial) toward max(MXU, VPU) — the two have
            # no data dependence across adjacent tiles (the CUDA kernel gets
            # this from its cp.async/GEMM interleave,
            # flash_fwd_kernel.h:281-352).
            def tile_p(j, s_cur):
                s_next = compute_s(jnp.minimum(j + 1, hi_))
                consume(j, s_cur)
                return s_next

            jax.lax.fori_loop(lo, hi_ + 1, tile_p, compute_s(lo))
        else:

            def tile(j, _):
                consume(j, compute_s(j))
                return 0

            jax.lax.fori_loop(lo, hi_ + 1, tile, 0)

        @pl.when(last_active <= chunk_lo + bpc - 1)
        def _store():
            l = l_scr[...][:, :1]
            m_fin = m_scr[...][:, :1]
            # fully-masked rows: out 0 / lse +inf (flash_api.cpp:401-407)
            dead = jnp.logical_or(l == 0.0, m_fin <= 0.5 * DEFAULT_MASK_VALUE)
            l_inv = jnp.where(dead, 0.0, 1.0 / l)
            o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
            if return_lse:
                # m is log2-domain; natural-log LSE out (flash_api.cpp:418)
                lse = jnp.where(dead, jnp.inf, m_fin * LN2 + jnp.log(l))
                lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])

    # first chunk of an all-masked q row (cannot happen under causal; possible
    # under extreme windows): the dense grid still visits (qi, 0) — emit the
    # zero/inf convention so the output block is defined
    if not causal and (wl >= 0 or wr >= 0):

        @pl.when(jnp.logical_and(first_active > last_active, ci == 0))
        def _dead_row():
            o_ref[0, 0] = jnp.zeros(o_ref.shape[2:], o_ref.dtype)
            if return_lse:
                lse_ref[0, 0] = jnp.full(
                    lse_ref.shape[2:], jnp.inf, jnp.float32
                )


def _active_range(qi, nk, block_q, block_k, seqlen_q, offset, wl, wr):
    """[first, last] kv blocks this q block attends to (scalar int32)."""
    min_row = qi * block_q
    max_row = jnp.minimum(min_row + block_q, seqlen_q) - 1
    if wr >= 0:
        last = jnp.clip((max_row + offset + wr) // block_k, 0, nk - 1)
    else:
        last = nk - 1
    if wl >= 0:
        first = jnp.clip((min_row + offset - wl) // block_k, 0, last)
    else:
        first = 0
    return first, last


def _round_block(n: int, b: int) -> int:
    return min(b, max(MIN_LANES, pl.cdiv(n, MIN_LANES) * MIN_LANES)) if n else b


def _build_folded_maps(nq, nk, block_q, block_k, sq, sk, wl, wr):
    """Static (qi, ki) enumeration of the ACTIVE block pairs under a
    causal/window mask — the folded-grid maps (see _flash_attention_impl)."""
    offset = sk - sq
    qmap, kmap = [], []
    for qi_ in range(nq):
        min_row = qi_ * block_q
        max_row = min(min_row + block_q, sq) - 1
        last = (
            min(max(0, (max_row + offset + wr) // block_k), nk - 1)
            if wr >= 0
            else nk - 1
        )
        first = (
            min(max(0, (min_row + offset - wl) // block_k), last)
            if wl >= 0
            else 0
        )
        for ki_ in range(first, last + 1):
            qmap.append(qi_)
            kmap.append(ki_)
    return jnp.asarray(qmap, jnp.int32), jnp.asarray(kmap, jnp.int32)


def _guard(cond, fn):
    """pl.when that folds away when the condition is a trace-time bool
    (full-window cases make the flat kernels' activity guards static)."""
    if isinstance(cond, bool):
        if cond:
            fn()
    else:
        pl.when(cond)(fn)


def _ring_depth(cp) -> int:
    """Flat-kernel DMA ring depth: 'd3'/'d4' in cp deepen the prefetch
    pipeline (if one tile's compute is shorter than the DMA latency, a
    2-slot ring under-prefetches)."""
    return 4 if "d4" in cp else (3 if "d3" in cp else 2)


def _flat_pipeline(nk, first, last, start, tile, depth=2):
    """Shared software-pipeline skeleton for the flat kernels.

    Prologue: start the first depth-1 active tiles ([first, first+depth-2]).
    Iteration j: start tile j+depth-1 (when j >= first keeps it disjoint
    from the prologue), then wait+compute tile j. Every tile id is a static
    python int (DMA offsets and ring slots are compile-time constants);
    activity is predicated with _guard, which folds away when first/last
    are trace-time ints (full-window case)."""
    for jj in range(nk):
        _guard(
            (jj >= first) & (jj <= last) & (jj <= first + (depth - 2)),
            lambda jj=jj: start(jj),
        )
    for j in range(nk):
        if j + depth - 1 < nk:
            _guard(
                (j >= first) & (j + depth - 1 <= last),
                lambda j=j: start(j + depth - 1),
            )
        _guard((j >= first) & (j <= last), tile(j))


# ------------------------------------------------ flat manual-DMA kernel
# Round-4 experiment against the per-tile floor from a different angle than
# two-pass/unroll: the round-3 stage isolation showed ~5.9us/tile remaining
# with QK+softmax+PV all skipped, i.e. the EMPTY pipeline costs almost as
# much as both GEMMs — consistent with Mosaic's grid pipeline not hiding
# operand DMAs under compute on this rig. This kernel takes DMA scheduling
# away from the grid machinery: ONE grid step per (b, h, q-block); k/v stay
# in HBM (memory_space=ANY) and a statically-unrolled tile loop hand
# double-buffers them into a 2-slot VMEM ring (pltpu.make_async_copy),
# issuing tile j+1's copies before computing tile j. All DMA offsets and
# ring slots are static (python-unrolled loop); activity is predicated with
# pl.when so causal/window skips cost one branch, not a grid step.
# Enabled via PF_CP=flat (composes with nobounds); differentiable like the
# other structures (same out/lse contract through _fwd_dispatch).


def _fwd_kernel_flat(
    q_ref,      # (1, 1, block_q, d) VMEM (pre-scaled by sm_scale*log2e)
    k_hbm,      # (b, h_kv, sk_pad, d) ANY
    v_hbm,      # (b, h_kv, sk_pad, d) ANY
    alibi_ref,  # (b, h) fp32 SMEM (or (1, 1) when unused)
    o_ref,      # (1, 1, block_q, d)
    lse_ref,    # (1, 1, block_q, MIN_LANES) or None
    k_scr,      # (2, block_k, d) VMEM
    v_scr,      # (2, block_k, d) VMEM
    m_scr,      # stats blocks
    l_scr,
    acc_scr,    # (block_q, d) fp32
    k_sem,      # DMA (2,)
    v_sem,      # DMA (2,)
    *,
    causal: bool,
    window: Tuple[int, int],
    softcap: float,
    block_q: int,
    block_k: int,
    seqlen_q: int,
    seqlen_k: int,
    has_alibi: bool,
    return_lse: bool,
    nk: int,
    q_per_kv: int,
    depth: int = 2,
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
    # non-causal unbounded window: every tile active -> the pl.when guards
    # below fold to constants and the loop is branch-free
    min_row = qi * block_q
    max_row = jnp.minimum(min_row + block_q, seqlen_q) - 1

    m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
    l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
    acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

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

    def compute(j):
        col_base = j * block_k
        k = k_scr[j % depth]
        v = v_scr[j % depth]
        q = q_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k)
        if softcap > 0.0:
            cap2 = softcap * LOG2E
            s = jnp.tanh(s / cap2) * cap2
        if has_alibi:
            row = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + min_row
            )
            col = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + col_base
            )
            slope = alibi_ref[bi, hi]
            s = s - slope * jnp.abs(row + offset - col).astype(jnp.float32)

        def update(s, masked: bool):
            if masked:
                row = (
                    jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + min_row
                )
                col = (
                    jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + col_base
                )
                mask = col < seqlen_k
                if wr >= 0:
                    mask &= col <= row + offset + wr
                if wl >= 0:
                    mask &= col >= row + offset - wl
                s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
            m_prev = m_scr[...]
            l_prev = l_scr[...]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp2(m_prev - m_next)
            nrep = block_k // MIN_LANES
            m_big = (
                pltpu.repeat(m_next, nrep, axis=1) if nrep > 1 else m_next
            )
            p = jnp.exp2(s - m_big)
            l_scr[...] = alpha * l_prev + jnp.sum(
                p, axis=1, keepdims=True, dtype=jnp.float32
            )
            m_scr[...] = m_next
            # v rows past seqlen_k are host-zero-padded (no NaN poison)
            pv = jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            arep = acc_scr.shape[-1] // MIN_LANES
            alpha_acc = pltpu.repeat(alpha, arep, axis=1) if arep > 1 else alpha
            acc_scr[...] = acc_scr[...] * alpha_acc + pv

        any_mask = (wl >= 0) or (wr >= 0) or (seqlen_k % block_k != 0)
        if not any_mask:
            update(s, False)
        elif _NOCOND:
            update(s, True)  # see _NOCOND note at module top
        else:
            needs = col_base + block_k > seqlen_k
            if wr >= 0:
                needs |= col_base + block_k - 1 > min_row + offset + wr
            if wl >= 0:
                needs |= col_base < max_row + offset - wl
            jax.lax.cond(
                needs,
                lambda: update(s, True),
                lambda: update(s, False),
            )

    # software pipeline over the static tile list: issue j+1, compute j.
    # Activity guards are traced scalars on STATIC tile ids — every DMA
    # offset and ring slot is a compile-time constant. With a full window
    # (non-causal, unbounded) first/last are python ints, the guards fold
    # to True at trace time, and the loop is branch-free straight-line code.
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
    o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
    if return_lse:
        lse = jnp.where(dead, jnp.inf, m_fin * LN2 + jnp.log(l))
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _flash_attention_flat(
    q, k, v, alibi_slopes, *, causal, sm_scale, window, softcap,
    block_q, block_k, return_lse, cp, interpret,
):
    """Host wrapper for the flat manual-DMA kernel (PF_CP=flat)."""
    b, h, sq, d = q.shape
    _, h_k, sk, _ = k.shape
    assert h % h_k == 0
    q_per_kv = h // h_k

    d_orig = d
    if d % MIN_LANES != 0:
        d = pl.cdiv(d, MIN_LANES) * MIN_LANES
        pw = [(0, 0)] * 3 + [(0, d - d_orig)]
        q, k, v = jnp.pad(q, pw), jnp.pad(k, pw), jnp.pad(v, pw)
    q = (q * jnp.asarray(sm_scale * LOG2E, q.dtype)).astype(q.dtype)

    block_q = _round_block(sq, block_q)
    block_k = _round_block(sk, block_k)
    nq = pl.cdiv(sq, block_q)
    nk = pl.cdiv(sk, block_k)
    if sk % block_k != 0:
        # manual HBM DMAs must not read out of bounds; zero padding also
        # keeps padded v rows from poisoning PV (p there is exactly 0)
        pad = nk * block_k - sk
        kv_pw = [(0, 0), (0, 0), (0, pad), (0, 0)]
        k, v = jnp.pad(k, kv_pw), jnp.pad(v, kv_pw)

    has_alibi = alibi_slopes is not None
    if has_alibi:
        alibi_slopes = jnp.broadcast_to(
            jnp.asarray(alibi_slopes, jnp.float32).reshape(-1, h)[:1]
            if alibi_slopes.ndim == 1
            else alibi_slopes.astype(jnp.float32),
            (b, h),
        ) * LOG2E
    else:
        alibi_slopes = jnp.zeros((1, 1), jnp.float32)

    depth = _ring_depth(cp)
    kernel = functools.partial(
        _fwd_kernel_flat,
        causal=causal, window=(int(window[0]), int(window[1])),
        softcap=float(softcap), block_q=block_q, block_k=block_k,
        seqlen_q=sq, seqlen_k=sk, has_alibi=has_alibi,
        return_lse=return_lse, nk=nk, q_per_kv=q_per_kv, depth=depth,
    )
    if not return_lse:
        def kernel2(q_r, k_r, v_r, a_r, o_r, *scr):
            kernel(q_r, k_r, v_r, a_r, o_r, None, *scr)
    else:
        kernel2 = kernel

    out_shape = [jax.ShapeDtypeStruct((b, h, sq, d), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, qi: (b_, h_, qi, 0))
    ]
    if return_lse:
        out_shape.append(
            jax.ShapeDtypeStruct((b, h, sq, MIN_LANES), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, 1, block_q, MIN_LANES), lambda b_, h_, qi: (b_, h_, qi, 0)
            )
        )
    results = pl.pallas_call(
        kernel2,
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d), lambda b_, h_, qi: (b_, h_, qi, 0)
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((depth, block_k, d), k.dtype),
            pltpu.VMEM((depth, block_k, d), v.dtype),
            pltpu.VMEM(_stats_block(block_q), jnp.float32),
            pltpu.VMEM(_stats_block(block_q), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
        compiler_params=_cparams(
            ("parallel", "parallel", "parallel"), cp, 4
        ),
        interpret=interpret,
    )(q, k, v, alibi_slopes)
    if return_lse:
        out, lse = results
        # the flat kernel stores natural-log LSE directly (same as _fwd_kernel)
        return out[..., :d_orig], lse[..., 0]
    return results[0][..., :d_orig]


def _cparams(dims, cp, num_inputs):
    """CompilerParams with round-4 Mosaic-knob A/B extras (PF_CP env,
    resolved OUTSIDE the jit in flash_attention like every other knob):
    'nobounds' disables Mosaic bounds checks (kernels are interpret-mode
    sanitized; targets the per-tile machinery floor), 'fusein' lets XLA
    fuse elementwise producers (e.g. the q sm_scale*LOG2E premultiply)
    into the operand loads instead of a separate HBM round trip."""
    kw = dict(dimension_semantics=dims, vmem_limit_bytes=100 * 1024 * 1024)
    if "nobounds" in cp:
        kw["disable_bounds_checks"] = True
    if "fusein" in cp:
        kw["allow_input_fusion"] = [True] * num_inputs
    return pltpu.CompilerParams(**kw)


def _flash_attention_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    alibi_slopes: Optional[jax.Array] = None,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    window: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    block_q: int = 1024,
    block_k: int = 1024,
    return_lse: bool = False,
    fuse_rowsum: Optional[bool] = None,
    p_bf16: bool = False,
    interleave: int = 1,
    force_dense: bool = False,
    debug_skip: Tuple[str, ...] = (),
    kv_chunk: int = 0,
    pipe: bool = False,
    unroll: bool = False,
    no_diag: bool = False,
    cp: Tuple[str, ...] = (),
    interpret: Optional[bool] = None,
):
    """Flash attention forward.

    Args:
        q: (batch, num_heads, seqlen_q, head_dim)
        k, v: (batch, num_kv_heads, seqlen_k, head_dim); num_heads must be a
            multiple of num_kv_heads (MQA/GQA broadcast,
            flash_attn_interface.py:1046-1049).
        alibi_slopes: optional (batch, num_heads) fp32.
        causal: bottom-right-aligned causal mask.
        window: inclusive (left, right) sliding window; -1 = unbounded.

    Returns:
        out (b, h, sq, d), and fp32 lse (b, h, sq) if return_lse.
    """
    b, h, sq, d = q.shape
    _, h_k, sk, _ = k.shape
    assert h % h_k == 0, f"num_heads {h} not divisible by num_kv_heads {h_k}"
    q_per_kv = h // h_k
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = use_interpret()
    if "flat" in cp:
        # round-4 experiment: manual-DMA flat structure (PF_CP=flat)
        return _flash_attention_flat(
            q, k, v, alibi_slopes, causal=causal, sm_scale=sm_scale,
            window=window, softcap=softcap, block_q=block_q,
            block_k=block_k, return_lse=return_lse,
            cp=tuple(x for x in cp if x != "flat"), interpret=interpret,
        )

    # Arbitrary head dims: pad d to a lane multiple (the TPU analog of the
    # reference's pad-to-%8, flash_api.cpp:312-320). Zero-padded q/k columns
    # contribute nothing to QK^T and padded v columns produce zeros that are
    # sliced off; sm_scale above uses the ORIGINAL d.
    d_orig = d
    if d % MIN_LANES != 0:
        d = pl.cdiv(d, MIN_LANES) * MIN_LANES
        pw = [(0, 0)] * 3 + [(0, d - d_orig)]
        q = jnp.pad(q, pw)
        k = jnp.pad(k, pw)
        v = jnp.pad(v, pw)

    # Fold sm_scale*log2(e) into q (one tiny O(sq*d) pass XLA fuses into the
    # producer) so the kernel's O(sq*sk) tiles skip the scale pass and use
    # native exp2 (scale_softmax_log2, flash_api.cpp:21-137).
    q = (q * jnp.asarray(sm_scale * LOG2E, q.dtype)).astype(q.dtype)

    # Fused row-sum: append 128 ones-lanes to v so P@[V|1] computes the
    # softmax denominator on the MXU, deleting the per-block VPU reduction
    # over the (block_q, block_k) tile (A/B knob PF_ROWSUM while measuring).
    if fuse_rowsum is None:
        fuse_rowsum = False
    d_v = d + MIN_LANES if fuse_rowsum else d
    if fuse_rowsum:
        v = jnp.concatenate(
            [v, jnp.ones((b, h_k, sk, MIN_LANES), v.dtype)], axis=-1
        )

    block_q = _round_block(sq, block_q)
    block_k = _round_block(sk, block_k)
    # sub-chain rows must stay (8,128)-tileable
    while interleave > 1 and (
        block_q % interleave != 0 or (block_q // interleave) % 8 != 0
    ):
        interleave //= 2
    nq = pl.cdiv(sq, block_q)
    nk = pl.cdiv(sk, block_k)
    grid = (b, h, nq, nk)

    if kv_chunk > 0 and not fuse_rowsum:
        # chunked-sweep path: kv tiles loop INSIDE the grid step over a
        # VMEM-resident chunk (see _fwd_kernel_chunked)
        kc = max(kv_chunk // block_k, 1) * block_k
        nkc = pl.cdiv(sk, kc)
        cgrid = (b, h, nq, nkc)
        ckernel = functools.partial(
            _fwd_kernel_chunked,
            unroll=unroll,
            causal=causal,
            window=tuple(int(w) for w in window),
            softcap=float(softcap),
            block_q=block_q,
            block_k=block_k,
            kv_chunk=kc,
            seqlen_q=sq,
            seqlen_k=sk,
            has_alibi=alibi_slopes is not None,
            return_lse=return_lse,
            pipe=pipe,
            d_model=d,
        )

        def ckern(q_r, k_r, v_r, a_r, o_r, *rest):
            lse_r = rest[0] if return_lse else None
            scr = rest[1:] if return_lse else rest
            ckernel(q_r, k_r, v_r, a_r, o_r, lse_r, *scr)

        alibi_c = (
            jnp.broadcast_to(
                jnp.asarray(alibi_slopes, jnp.float32).reshape(-1, h)[:1]
                if alibi_slopes.ndim == 1
                else alibi_slopes.astype(jnp.float32),
                (b, h),
            ) * LOG2E
            if alibi_slopes is not None
            else jnp.zeros((1, 1), jnp.float32)
        )
        c_in_specs = [
            pl.BlockSpec(
                (1, 1, block_q, d), lambda b_, h_, qi, ci: (b_, h_, qi, 0)
            ),
            pl.BlockSpec(
                (1, 1, kc, d),
                lambda b_, h_, qi, ci, qpk=q_per_kv: (b_, h_ // qpk, ci, 0),
            ),
            pl.BlockSpec(
                (1, 1, kc, d),
                lambda b_, h_, qi, ci, qpk=q_per_kv: (b_, h_ // qpk, ci, 0),
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        c_out_shape = [jax.ShapeDtypeStruct((b, h, sq, d), q.dtype)]
        c_out_specs = [
            pl.BlockSpec(
                (1, 1, block_q, d), lambda b_, h_, qi, ci: (b_, h_, qi, 0)
            )
        ]
        if return_lse:
            c_out_shape.append(
                jax.ShapeDtypeStruct((b, h, sq, MIN_LANES), jnp.float32)
            )
            c_out_specs.append(
                pl.BlockSpec(
                    (1, 1, block_q, MIN_LANES),
                    lambda b_, h_, qi, ci: (b_, h_, qi, 0),
                )
            )
        results = pl.pallas_call(
            ckern,
            grid=cgrid,
            in_specs=c_in_specs,
            out_specs=c_out_specs,
            out_shape=c_out_shape,
            scratch_shapes=[
                pltpu.VMEM(_stats_block(block_q), jnp.float32),
                pltpu.VMEM(_stats_block(block_q), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
            compiler_params=_cparams(
                ("parallel", "parallel", "parallel", "arbitrary"), cp, 4
            ),
            interpret=interpret,
        )(q, k, v, alibi_c)
        if return_lse:
            out, lse = results
            return out[..., :d_orig], lse[..., 0]
        return results[0][..., :d_orig]

    # --- folded causal/window grid: enumerate only the active (qi, ki) pairs
    # so masked-out blocks cost no grid steps. The maps are tiny int32 arrays
    # scalar-prefetched into SMEM. ---
    _wl0, _wr0 = int(window[0]), (0 if causal else int(window[1]))
    folded = (_wl0 >= 0 or _wr0 >= 0) and not force_dense
    if folded:
        qmap, kmap = _build_folded_maps(
            nq, nk, block_q, block_k, sq, sk, _wl0, _wr0
        )

    has_alibi = alibi_slopes is not None
    if has_alibi:
        alibi_slopes = jnp.broadcast_to(
            jnp.asarray(alibi_slopes, jnp.float32).reshape(-1, h)[:1]
            if alibi_slopes.ndim == 1
            else alibi_slopes.astype(jnp.float32),
            (b, h),
        ) * LOG2E  # kernel scores are log2-domain
    else:
        alibi_slopes = jnp.zeros((1, 1), jnp.float32)

    # diagonal-bias experiment: square blocks + block-aligned causal offset +
    # no seq tails means every masked tile is a diagonal tile sharing ONE
    # additive (col > row -> MASK) bias — one add replaces the iota/compare/
    # where passes. Measured NEUTRAL on v5e (51.7 vs 51.8 TF in-process),
    # consistent with the stage isolation: mask passes are not the
    # bottleneck. Off by default (opt-in via no_diag=False callers /
    # PF_DIAG=1); kept for future rigs where iota ALU is dearer
    offset_ = sk - sq
    diag_bias = (
        causal
        and _wl0 < 0
        and block_q == block_k
        and offset_ % block_k == 0
        and sk % block_k == 0
        and not has_alibi
        and not no_diag
    )
    if diag_bias:
        r_ = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        c_ = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        diag_tile = jnp.where(c_ > r_, DEFAULT_MASK_VALUE, 0.0).astype(
            jnp.float32
        )
    else:
        diag_tile = jnp.zeros((1, 1), jnp.float32)

    body = functools.partial(
        _fwd_kernel,
        sm_scale=float(sm_scale),
        causal=causal,
        window=tuple(int(w) for w in window),
        softcap=float(softcap),
        block_q=block_q,
        block_k=block_k,
        seqlen_q=sq,
        seqlen_k=sk,
        has_alibi=has_alibi,
        return_lse=return_lse,
        nk=nk,
        fuse_rowsum=fuse_rowsum,
        p_bf16=p_bf16,
        interleave=interleave,
        debug_skip=tuple(debug_skip),
        diag_bias=diag_bias,
        d_model=d,
    )

    if folded:

        def kernel(qm_r, km_r, q_r, k_r, v_r, a_r, dg_r, o_r, *rest):
            lse_r = rest[0] if return_lse else None
            scr = rest[1:] if return_lse else rest
            body(
                q_r, k_r, v_r, a_r, dg_r, o_r, lse_r, *scr,
                qmap_ref=qm_r, kmap_ref=km_r,
            )

        def q_index(b_, h_, t, qm, km):
            return (b_, h_, qm[t], 0)

        def kv_index(b_, h_, t, qm, km, qpk=q_per_kv):
            return (b_, h_ // qpk, km[t], 0)


        grid = (b, h, len(qmap))
    else:

        def kernel(q_r, k_r, v_r, a_r, dg_r, o_r, *rest):
            lse_r = rest[0] if return_lse else None
            scr = rest[1:] if return_lse else rest
            body(q_r, k_r, v_r, a_r, dg_r, o_r, lse_r, *scr)

        def q_index(b_, h_, qi, ki):
            return (b_, h_, qi, 0)

        def kv_index(b_, h_, qi, ki, qpk=q_per_kv):
            return (b_, h_ // qpk, ki, 0)


    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), q_index),
        pl.BlockSpec((1, 1, block_k, d), kv_index),
        pl.BlockSpec((1, 1, block_k, d_v), kv_index),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        (
            pl.BlockSpec(
                (block_q, block_k), lambda *a: (0, 0)
            )
            if diag_bias
            else pl.BlockSpec(memory_space=pl.ANY)
        ),
    ]
    out_shape = [jax.ShapeDtypeStruct((b, h, sq, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, 1, block_q, d), q_index)]
    if return_lse:
        # LSE written with a trailing 128-lane axis (TPU tiling requires the last
        # two block dims aligned); the wrapper slices lane 0 to give the
        # (b, h, sq) fp32 softmax_lse convention of flash_api.cpp:418.
        out_shape.append(
            jax.ShapeDtypeStruct((b, h, sq, MIN_LANES), jnp.float32)
        )
        out_specs.append(pl.BlockSpec((1, 1, block_q, MIN_LANES), q_index))

    scratch_shapes = [
        pltpu.VMEM(_stats_block(block_q), jnp.float32),
        pltpu.VMEM(_stats_block(block_q), jnp.float32),
        pltpu.VMEM((block_q, d_v), jnp.float32),
    ]

    if folded:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        )
        results = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            # scalar-dynamic index maps defeat Mosaic's buffer-reuse proof,
            # so the folded grid books more scoped VMEM than the dense one;
            # the default 16MB limit is too tight at 1024-block sizes
            compiler_params=_cparams(
                ("parallel", "parallel", "arbitrary"), cp, 7
            ),
            interpret=interpret,
        )(qmap, kmap, q, k, v, alibi_slopes, diag_tile)
    else:
        results = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            # big-block configs (2048-row tiles) exceed the default 16MB
            # scoped-vmem budget
            compiler_params=_cparams(
                ("parallel", "parallel", "parallel", "arbitrary"), cp, 5
            ),
            interpret=interpret,
        )(q, k, v, alibi_slopes, diag_tile)
    if return_lse:
        out, lse = results
        return out[..., :d_orig], lse[..., 0]
    return results[0][..., :d_orig]


# ------------------------------------------------- two-pass (lse-then-pv)
# Round-4 experiment against the ~5.9us/tile single-pass machinery floor
# (round-3 stage isolation): pass 1 computes ONLY the log2-domain LSE per
# row (QK + online max/sum; no V traffic, no acc rescale); pass 2 recomputes
# scores and accumulates exp2(s - lse) @ V with NO online state — no m/l
# scratch churn, no alpha rescale of the (bq, d) acc, and the store needs no
# 1/l division. Costs one extra QK matmul per tile (~2.6us) against the
# removed per-tile machinery; this is the forward analog of the backward
# pair's recompute-from-LSE dataflow (flash_backward_pallas.py).


def _mask_and_bias(s, bi, hi, min_row, col_base, *, block_rows, block_k,
                   seqlen_q, seqlen_k, offset, wl, wr, has_alibi, alibi_ref,
                   softcap):
    if softcap > 0.0:
        cap2 = softcap * LOG2E
        s = jnp.tanh(s / cap2) * cap2
    row = (
        jax.lax.broadcasted_iota(jnp.int32, (block_rows, block_k), 0) + min_row
    )
    col = (
        jax.lax.broadcasted_iota(jnp.int32, (block_rows, block_k), 1) + col_base
    )
    if has_alibi:
        slope = alibi_ref[bi, hi]
        s = s - slope * jnp.abs(row + offset - col).astype(jnp.float32)
    mask = col < seqlen_k
    if wr >= 0:
        mask &= col <= row + offset + wr
    if wl >= 0:
        mask &= col >= row + offset - wl
    return jnp.where(mask, s, DEFAULT_MASK_VALUE)


def _stats_kernel(
    q_ref, k_ref, alibi_ref, lse_ref, m_scr, l_scr, *,
    causal, window, softcap, block_q, block_k, seqlen_q, seqlen_k,
    has_alibi, nk, unroll=1, qmap_ref=None, kmap_ref=None,
):
    bi, hi = pl.program_id(0), pl.program_id(1)
    if qmap_ref is not None:
        t = pl.program_id(2)
        qi, ki = qmap_ref[t], kmap_ref[t]
    else:
        qi, ki = pl.program_id(2), pl.program_id(3)
    offset = seqlen_k - seqlen_q
    wl, wr = window
    if causal:
        wr = 0
    super_k = block_k * unroll  # grid dim walks SUPER blocks of unroll tiles
    first_active, last_active = _active_range(
        qi, nk, block_q, super_k, seqlen_q, offset, wl, wr
    )

    @pl.when(jnp.logical_and(ki >= first_active, ki <= last_active))
    def _run():
        @pl.when(ki == first_active)
        def _init():
            m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
            l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)

        min_row = qi * block_q
        q = q_ref[0, 0]
        kblk = k_ref[0, 0]  # (super_k, d)
        for u in range(unroll):
            col_base = ki * super_k + u * block_k
            k = (
                kblk[u * block_k : (u + 1) * block_k] if unroll > 1 else kblk
            )
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = _mask_and_bias(
                s, bi, hi, min_row, col_base, block_rows=block_q,
                block_k=block_k, seqlen_q=seqlen_q, seqlen_k=seqlen_k,
                offset=offset, wl=wl, wr=wr, has_alibi=has_alibi,
                alibi_ref=alibi_ref, softcap=softcap,
            )
            m_prev = m_scr[...]
            l_prev = l_scr[...]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp2(m_prev - m_next)
            nrep = block_k // MIN_LANES
            m_big = pltpu.repeat(m_next, nrep, axis=1) if nrep > 1 else m_next
            p = jnp.exp2(s - m_big)
            m_scr[...] = m_next
            l_scr[...] = alpha * l_prev + jnp.sum(
                p, axis=1, keepdims=True, dtype=jnp.float32
            )

        @pl.when(ki == last_active)
        def _store():
            m_fin = m_scr[...]
            l = l_scr[...]
            # log2-domain LSE; fully-masked rows -> +inf so pass 2's
            # exp2(s - lse) is exactly 0 (out 0, flash_api.cpp:401-407)
            dead = jnp.logical_or(l == 0.0, m_fin <= 0.5 * DEFAULT_MASK_VALUE)
            lse2 = jnp.where(
                dead, jnp.inf, m_fin + jnp.log2(jnp.maximum(l, 1e-45))
            )
            lse_ref[0, 0] = lse2


def _pv_kernel(
    q_ref, k_ref, v_ref, alibi_ref, lse_ref, o_ref, acc_scr, *,
    causal, window, softcap, block_q, block_k, seqlen_q, seqlen_k,
    has_alibi, nk, unroll=1, qmap_ref=None, kmap_ref=None,
):
    bi, hi = pl.program_id(0), pl.program_id(1)
    if qmap_ref is not None:
        t = pl.program_id(2)
        qi, ki = qmap_ref[t], kmap_ref[t]
    else:
        qi, ki = pl.program_id(2), pl.program_id(3)
    offset = seqlen_k - seqlen_q
    wl, wr = window
    if causal:
        wr = 0
    super_k = block_k * unroll
    first_active, last_active = _active_range(
        qi, nk, block_q, super_k, seqlen_q, offset, wl, wr
    )

    @pl.when(jnp.logical_and(ki >= first_active, ki <= last_active))
    def _run():
        @pl.when(ki == first_active)
        def _init():
            acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

        min_row = qi * block_q
        q = q_ref[0, 0]
        kblk = k_ref[0, 0]  # (super_k, d)
        vblk = v_ref[0, 0]
        lse2 = lse_ref[0, 0]  # (block_q, MIN_LANES) lane-replicated
        nrep = block_k // MIN_LANES
        lse_big = pltpu.repeat(lse2, nrep, axis=1) if nrep > 1 else lse2
        for u in range(unroll):
            col_base = ki * super_k + u * block_k
            k = (
                kblk[u * block_k : (u + 1) * block_k] if unroll > 1 else kblk
            )
            v = (
                vblk[u * block_k : (u + 1) * block_k] if unroll > 1 else vblk
            )
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = _mask_and_bias(
                s, bi, hi, min_row, col_base, block_rows=block_q,
                block_k=block_k, seqlen_q=seqlen_q, seqlen_k=seqlen_k,
                offset=offset, wl=wl, wr=wr, has_alibi=has_alibi,
                alibi_ref=alibi_ref, softcap=softcap,
            )
            # exp2(MASKVAL - lse) == 0 and exp2(s - inf) == 0: masking and
            # dead rows both come out exact with zero extra passes
            p = jnp.exp2(s - lse_big)
            if seqlen_k % super_k != 0:
                # partial trailing super block: sub-tiles past seqlen_k hold
                # undefined VMEM rows; p is 0 there but 0*NaN would poison acc
                valid = (
                    jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) + col_base
                    < seqlen_k
                )
                v = jnp.where(valid, v, 0)
            acc_scr[...] = acc_scr[...] + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )

        @pl.when(ki == last_active)
        def _store():
            # already normalized: p used exp2(s - lse), no 1/l pass
            o_ref[0, 0] = acc_scr[...].astype(o_ref.dtype)


def _stats_kernel_flat(
    q_ref, k_hbm, alibi_ref, lse_ref, m_scr, l_scr, k_scr, k_sem, *,
    causal, window, softcap, block_q, block_k, seqlen_q, seqlen_k,
    has_alibi, nk, q_per_kv, depth=2,
):
    """Pass 1 of flat×two-pass: LSE only, k hand-ringed from HBM (no V
    operand at all — no V traffic in this pass)."""
    bi, hi, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    hk = hi // q_per_kv
    offset = seqlen_k - seqlen_q
    wl, wr = window
    if causal:
        wr = 0
    first, last = _active_range(
        qi, nk, block_q, block_k, seqlen_q, offset, wl, wr
    )
    m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
    l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
    min_row = qi * block_q
    q = q_ref[0, 0]

    def start(j):
        s = j % depth
        pltpu.make_async_copy(
            k_hbm.at[bi, hk, pl.ds(j * block_k, block_k), :],
            k_scr.at[s], k_sem.at[s],
        ).start()

    def tile(j):
        def body():
            s_slot = j % depth
            pltpu.make_async_copy(
                k_hbm.at[bi, hk, pl.ds(j * block_k, block_k), :],
                k_scr.at[s_slot], k_sem.at[s_slot],
            ).wait()
            col_base = j * block_k
            s = jax.lax.dot_general(
                q, k_scr[s_slot], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = _mask_and_bias(
                s, bi, hi, min_row, col_base, block_rows=block_q,
                block_k=block_k, seqlen_q=seqlen_q, seqlen_k=seqlen_k,
                offset=offset, wl=wl, wr=wr, has_alibi=has_alibi,
                alibi_ref=alibi_ref, softcap=softcap,
            )
            m_prev = m_scr[...]
            l_prev = l_scr[...]
            m_next = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp2(m_prev - m_next)
            nrep = block_k // MIN_LANES
            m_big = pltpu.repeat(m_next, nrep, axis=1) if nrep > 1 else m_next
            p = jnp.exp2(s - m_big)
            m_scr[...] = m_next
            l_scr[...] = alpha * l_prev + jnp.sum(
                p, axis=1, keepdims=True, dtype=jnp.float32
            )
        return body

    _flat_pipeline(nk, first, last, start, tile, depth=depth)

    m_fin = m_scr[...]
    l = l_scr[...]
    dead = jnp.logical_or(l == 0.0, m_fin <= 0.5 * DEFAULT_MASK_VALUE)
    lse_ref[0, 0] = jnp.where(
        dead, jnp.inf, m_fin + jnp.log2(jnp.maximum(l, 1e-45))
    )


def _pv_kernel_flat(
    q_ref, lse_ref, k_hbm, v_hbm, alibi_ref, o_ref, acc_scr, k_scr, v_scr,
    k_sem, v_sem, *,
    causal, window, softcap, block_q, block_k, seqlen_q, seqlen_k,
    has_alibi, nk, q_per_kv, depth=2,
):
    """Pass 2 of flat×two-pass: out = exp2(s - lse) @ V, no online state,
    k/v hand-ringed. Host zero-padding keeps OOB v rows inert (p there 0)."""
    bi, hi, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    hk = hi // q_per_kv
    offset = seqlen_k - seqlen_q
    wl, wr = window
    if causal:
        wr = 0
    first, last = _active_range(
        qi, nk, block_q, block_k, seqlen_q, offset, wl, wr
    )
    acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)
    min_row = qi * block_q
    q = q_ref[0, 0]
    lse2 = lse_ref[0, 0]
    nrep = block_k // MIN_LANES
    lse_big = pltpu.repeat(lse2, nrep, axis=1) if nrep > 1 else lse2

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

    def tile(j):
        def body():
            s_slot = j % depth
            pltpu.make_async_copy(
                k_hbm.at[bi, hk, pl.ds(j * block_k, block_k), :],
                k_scr.at[s_slot], k_sem.at[s_slot],
            ).wait()
            pltpu.make_async_copy(
                v_hbm.at[bi, hk, pl.ds(j * block_k, block_k), :],
                v_scr.at[s_slot], v_sem.at[s_slot],
            ).wait()
            col_base = j * block_k
            s = jax.lax.dot_general(
                q, k_scr[s_slot], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = _mask_and_bias(
                s, bi, hi, min_row, col_base, block_rows=block_q,
                block_k=block_k, seqlen_q=seqlen_q, seqlen_k=seqlen_k,
                offset=offset, wl=wl, wr=wr, has_alibi=has_alibi,
                alibi_ref=alibi_ref, softcap=softcap,
            )
            p = jnp.exp2(s - lse_big)
            acc_scr[...] = acc_scr[...] + jax.lax.dot(
                p.astype(v_scr.dtype), v_scr[s_slot],
                preferred_element_type=jnp.float32,
            )
        return body

    _flat_pipeline(nk, first, last, start, tile, depth=depth)

    o_ref[0, 0] = acc_scr[...].astype(o_ref.dtype)


def _two_pass_flat(
    q, k, v, alibi_slopes, *, causal, window, softcap, block_q, block_k,
    seqlen_q, seqlen_k, has_alibi, q_per_kv, return_lse, d_orig, cp,
    interpret,
):
    """Host side of the flat×two-pass composition (q pre-scaled, d padded,
    alibi normalized by the caller). Pads k/v to whole blocks for the
    manual DMAs."""
    b, h, sq, d = q.shape
    sk = seqlen_k
    nq = pl.cdiv(sq, block_q)
    nk = pl.cdiv(sk, block_k)
    if sk % block_k != 0:
        pad = nk * block_k - sk
        kv_pw = [(0, 0), (0, 0), (0, pad), (0, 0)]
        k, v = jnp.pad(k, kv_pw), jnp.pad(v, kv_pw)

    depth = _ring_depth(cp)
    statics = dict(
        causal=causal, window=(int(window[0]), int(window[1])),
        softcap=float(softcap), block_q=block_q, block_k=block_k,
        seqlen_q=sq, seqlen_k=sk, has_alibi=has_alibi, nk=nk,
        q_per_kv=q_per_kv, depth=depth,
    )
    dims3 = ("parallel", "parallel", "parallel")

    def qix3(b_, h_, qi):
        return (b_, h_, qi, 0)

    lse2 = pl.pallas_call(
        functools.partial(_stats_kernel_flat, **statics),
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), qix3),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, MIN_LANES), qix3),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, MIN_LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(_stats_block(block_q), jnp.float32),
            pltpu.VMEM(_stats_block(block_q), jnp.float32),
            pltpu.VMEM((depth, block_k, d), k.dtype),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
        compiler_params=_cparams(dims3, cp, 3),
        interpret=interpret,
    )(q, k, alibi_slopes)

    out = pl.pallas_call(
        functools.partial(_pv_kernel_flat, **statics),
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), qix3),
            pl.BlockSpec((1, 1, block_q, MIN_LANES), qix3),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), qix3),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((depth, block_k, d), k.dtype),
            pltpu.VMEM((depth, block_k, d), v.dtype),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
        compiler_params=_cparams(dims3, cp, 5),
        interpret=interpret,
    )(q, lse2, k, v, alibi_slopes)

    if return_lse:
        return out[..., :d_orig], lse2[..., 0] * LN2
    return out[..., :d_orig]


def _flash_attention_two_pass(
    q, k, v, alibi_slopes, *, causal, sm_scale, window, softcap,
    block_q, block_k, return_lse, force_dense, interpret, unroll=0,
    cp=(),
):
    """Two-pass forward (see the section comment). Same semantics as
    _flash_attention_impl for causal/window/alibi/softcap/GQA. With
    unroll=N > 1 each grid step sweeps N statically-unrolled block_k
    sub-tiles (PF_TWOPASS=1 PF_UNROLL=N composes both experiments)."""
    b, h, sq, d = q.shape
    _, h_k, sk, _ = k.shape
    assert h % h_k == 0
    q_per_kv = h // h_k

    d_orig = d
    if d % MIN_LANES != 0:
        d = pl.cdiv(d, MIN_LANES) * MIN_LANES
        pw = [(0, 0)] * 3 + [(0, d - d_orig)]
        q, k, v = jnp.pad(q, pw), jnp.pad(k, pw), jnp.pad(v, pw)
    q = (q * jnp.asarray(sm_scale * LOG2E, q.dtype)).astype(q.dtype)

    block_q = _round_block(sq, block_q)
    block_k = _round_block(sk, block_k)
    unroll = max(1, int(unroll))
    # the grid walks SUPER blocks of `unroll` block_k sub-tiles; clamp the
    # unroll so a super block never exceeds the (padded) key length
    while unroll > 1 and block_k * unroll > pl.cdiv(sk, block_k) * block_k:
        unroll //= 2
    super_k = block_k * unroll
    nq = pl.cdiv(sq, block_q)
    nk = pl.cdiv(sk, super_k)

    _wl0, _wr0 = int(window[0]), (0 if causal else int(window[1]))
    folded = (_wl0 >= 0 or _wr0 >= 0) and not force_dense
    if folded:
        qmap, kmap = _build_folded_maps(
            nq, nk, block_q, super_k, sq, sk, _wl0, _wr0
        )

    has_alibi = alibi_slopes is not None
    if has_alibi:
        alibi_slopes = jnp.broadcast_to(
            jnp.asarray(alibi_slopes, jnp.float32).reshape(-1, h)[:1]
            if alibi_slopes.ndim == 1
            else alibi_slopes.astype(jnp.float32),
            (b, h),
        ) * LOG2E
    else:
        alibi_slopes = jnp.zeros((1, 1), jnp.float32)

    if "flat" in cp:
        # flat×two-pass composition: both passes hand-ring their k (and v)
        # tiles; unroll is meaningless here (the ring already amortizes the
        # per-tile grid machinery the super-blocks targeted)
        return _two_pass_flat(
            q, k, v, alibi_slopes, causal=causal, window=window,
            softcap=softcap, block_q=block_q, block_k=block_k,
            seqlen_q=sq, seqlen_k=sk, has_alibi=has_alibi,
            q_per_kv=q_per_kv, return_lse=return_lse, d_orig=d_orig,
            cp=cp, interpret=interpret,
        )

    statics = dict(
        causal=causal, window=(_wl0, int(window[1])), softcap=float(softcap),
        block_q=block_q, block_k=block_k, seqlen_q=sq, seqlen_k=sk,
        has_alibi=has_alibi, nk=nk, unroll=unroll,
    )
    dims = (
        ("parallel", "parallel", "arbitrary") if folded
        else ("parallel", "parallel", "parallel", "arbitrary")
    )
    # per-pass input counts differ (pass 1 has no V/lse operand)
    cparams_s = _cparams(dims, cp, 5 if folded else 3)
    cparams_p = _cparams(dims, cp, 7 if folded else 5)

    if folded:
        def q_index(b_, h_, t, qm, km):
            return (b_, h_, qm[t], 0)

        def kv_index(b_, h_, t, qm, km, qpk=q_per_kv):
            return (b_, h_ // qpk, km[t], 0)

        grid = (b, h, len(qmap))
    else:
        def q_index(b_, h_, qi, ki):
            return (b_, h_, qi, 0)

        def kv_index(b_, h_, qi, ki, qpk=q_per_kv):
            return (b_, h_ // qpk, ki, 0)

        grid = (b, h, nq, nk)

    # ---- pass 1: LSE (no V operand — no V HBM traffic in this pass)
    s_kernel = functools.partial(_stats_kernel, **statics)
    s_in_specs = [
        pl.BlockSpec((1, 1, block_q, d), q_index),
        pl.BlockSpec((1, 1, super_k, d), kv_index),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    s_out_shape = jax.ShapeDtypeStruct((b, h, sq, MIN_LANES), jnp.float32)
    s_out_spec = pl.BlockSpec((1, 1, block_q, MIN_LANES), q_index)
    s_scratch = [
        pltpu.VMEM(_stats_block(block_q), jnp.float32),
        pltpu.VMEM(_stats_block(block_q), jnp.float32),
    ]
    if folded:
        def skern(qm_r, km_r, q_r, k_r, a_r, lse_r, *scr):
            s_kernel(q_r, k_r, a_r, lse_r, *scr, qmap_ref=qm_r, kmap_ref=km_r)

        lse2 = pl.pallas_call(
            skern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=grid, in_specs=s_in_specs,
                out_specs=s_out_spec, scratch_shapes=s_scratch,
            ),
            out_shape=s_out_shape, compiler_params=cparams_s,
            interpret=interpret,
        )(qmap, kmap, q, k, alibi_slopes)
    else:
        lse2 = pl.pallas_call(
            s_kernel, grid=grid, in_specs=s_in_specs, out_specs=s_out_spec,
            out_shape=s_out_shape, scratch_shapes=s_scratch,
            compiler_params=cparams_s, interpret=interpret,
        )(q, k, alibi_slopes)

    # ---- pass 2: out = exp2(s - lse) @ V, pure accumulation
    p_kernel = functools.partial(_pv_kernel, **statics)
    p_in_specs = [
        pl.BlockSpec((1, 1, block_q, d), q_index),
        pl.BlockSpec((1, 1, super_k, d), kv_index),
        pl.BlockSpec((1, 1, super_k, d), kv_index),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, block_q, MIN_LANES), q_index),
    ]
    p_out_shape = jax.ShapeDtypeStruct((b, h, sq, d), q.dtype)
    p_out_spec = pl.BlockSpec((1, 1, block_q, d), q_index)
    p_scratch = [pltpu.VMEM((block_q, d), jnp.float32)]
    if folded:
        def pkern(qm_r, km_r, q_r, k_r, v_r, a_r, l_r, o_r, *scr):
            p_kernel(
                q_r, k_r, v_r, a_r, l_r, o_r, *scr,
                qmap_ref=qm_r, kmap_ref=km_r,
            )

        out = pl.pallas_call(
            pkern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=grid, in_specs=p_in_specs,
                out_specs=p_out_spec, scratch_shapes=p_scratch,
            ),
            out_shape=p_out_shape, compiler_params=cparams_p,
            interpret=interpret,
        )(qmap, kmap, q, k, v, alibi_slopes, lse2)
    else:
        out = pl.pallas_call(
            p_kernel, grid=grid, in_specs=p_in_specs, out_specs=p_out_spec,
            out_shape=p_out_shape, scratch_shapes=p_scratch,
            compiler_params=cparams_p, interpret=interpret,
        )(q, k, v, alibi_slopes, lse2)

    if return_lse:
        return out[..., :d_orig], lse2[..., 0] * LN2  # natural-log LSE
    return out[..., :d_orig]


# --------------------------------------------------------------- custom VJP
# The reference fork is forward-only (setup.py:285-286); training here is
# first-class via a linear-memory XLA backward (kernels/flash_backward.py).


def _fwd_dispatch(
    q, k, v, alibi_slopes, *, causal, sm_scale, window, softcap, block_q,
    block_k, return_lse, fuse_rowsum, p_bf16, interleave, force_dense,
    debug_skip, kv_chunk, pipe, no_diag, unroll, two_pass, cp, interpret,
):
    """Route to the two-pass experiment kernels or the main impl. Both
    produce identical out (and natural-log lse), so the backward below is
    agnostic to which forward ran — the experiment knobs stay differentiable."""
    if two_pass:
        return _flash_attention_two_pass(
            q, k, v, alibi_slopes, causal=causal, sm_scale=sm_scale,
            window=window, softcap=softcap, block_q=block_q, block_k=block_k,
            return_lse=return_lse, force_dense=force_dense,
            interpret=interpret, unroll=unroll, cp=cp,
        )
    return _flash_attention_impl(
        q, k, v, alibi_slopes, causal=causal, sm_scale=sm_scale,
        window=window, softcap=softcap, block_q=block_q, block_k=block_k,
        return_lse=return_lse, fuse_rowsum=fuse_rowsum, p_bf16=p_bf16,
        interleave=interleave, force_dense=force_dense,
        debug_skip=debug_skip, kv_chunk=kv_chunk, pipe=pipe,
        unroll=unroll, no_diag=no_diag, cp=cp, interpret=interpret,
    )


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=tuple(range(4, 22)),
)
def _flash_attention_vjp(
    q, k, v, alibi_slopes, causal, sm_scale, window, softcap, block_q, block_k,
    fuse_rowsum, p_bf16, interleave, force_dense, debug_skip, kv_chunk,
    pipe, no_diag, unroll, two_pass, cp, interpret,
):
    return _fwd_dispatch(
        q, k, v, alibi_slopes if alibi_slopes.size else None,
        causal=causal, sm_scale=sm_scale, window=window,
        softcap=softcap, block_q=block_q, block_k=block_k,
        return_lse=False, fuse_rowsum=fuse_rowsum, p_bf16=p_bf16,
        interleave=interleave, force_dense=force_dense,
        debug_skip=debug_skip, kv_chunk=kv_chunk, pipe=pipe,
        no_diag=no_diag, unroll=unroll, two_pass=two_pass, cp=cp,
        interpret=interpret,
    )


def _vjp_fwd(
    q, k, v, alibi_slopes, causal, sm_scale, window, softcap, block_q, block_k,
    fuse_rowsum, p_bf16, interleave, force_dense, debug_skip, kv_chunk,
    pipe, no_diag, unroll, two_pass, cp, interpret,
):
    out, lse = _fwd_dispatch(
        q, k, v, alibi_slopes if alibi_slopes.size else None,
        causal=causal, sm_scale=sm_scale, window=window,
        softcap=softcap, block_q=block_q, block_k=block_k,
        return_lse=True, fuse_rowsum=fuse_rowsum, p_bf16=p_bf16,
        interleave=interleave, force_dense=force_dense,
        debug_skip=debug_skip, kv_chunk=kv_chunk, pipe=pipe,
        no_diag=no_diag, unroll=unroll, two_pass=two_pass, cp=cp,
        interpret=interpret,
    )
    return out, (q, k, v, alibi_slopes, out, lse)


def _vjp_bwd(
    causal, sm_scale, window, softcap, block_q, block_k, fuse_rowsum,
    p_bf16, interleave, force_dense, debug_skip, kv_chunk, pipe, no_diag,
    unroll, two_pass, cp, interpret, res, g
):
    from vllm_flash_attn_tpu.kernels.flash_backward import mha_backward
    from vllm_flash_attn_tpu.kernels.flash_backward_pallas import (
        mha_backward_pallas,
        supports_pallas_backward,
    )

    q, k, v, alibi_slopes, out, lse = res
    # hot MHA shapes take the Pallas kernel pair (round-3 profiling: the XLA
    # backward was ~52% of train-step device time); GQA/alibi/softcap and
    # non-causal bounded windows fall back to the XLA path. VFA_XLA_BWD=1
    # forces the fallback.
    use_pallas = (
        supports_pallas_backward(
            q.shape[1], k.shape[1], softcap, bool(alibi_slopes.size)
        )
        and (causal or tuple(window) == (-1, -1))
        and not knob("xla_bwd")
    )
    if use_pallas:
        # per-PROCESS block-size knobs (read at trace time; fine for A/B
        # benches which use one setting per process — do not flip mid-process)
        dq, dk, dv = mha_backward_pallas(
            q, k, v, out, lse, g,
            causal=causal, sm_scale=sm_scale, window=window,
            block_q=int(knob("pb_bq")),
            block_k=int(knob("pb_bk")),
            interpret=interpret,
        )
    else:
        dq, dk, dv = mha_backward(
            q, k, v, out, lse, g,
            alibi_slopes if alibi_slopes.size else None,
            causal=causal, sm_scale=sm_scale, window=window, softcap=softcap,
        )
    return dq, dk, dv, jnp.zeros_like(alibi_slopes)


_flash_attention_vjp.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "sm_scale", "window", "softcap", "block_q", "block_k",
        "return_lse", "fuse_rowsum", "p_bf16", "interleave", "force_dense",
        "debug_skip", "kv_chunk", "pipe", "unroll", "no_diag", "two_pass",
        "cp", "interpret",
    ),
)
def _flash_attention_jit(
    q, k, v, alibi_slopes, *, causal, sm_scale, window, softcap, block_q,
    block_k, return_lse, fuse_rowsum, p_bf16, interleave, force_dense,
    debug_skip, kv_chunk, pipe, unroll=0, no_diag, two_pass=False,
    cp=(), interpret,
):
    if return_lse:
        return _fwd_dispatch(
            q, k, v, alibi_slopes, causal=causal, sm_scale=sm_scale,
            window=window, softcap=softcap, block_q=block_q, block_k=block_k,
            return_lse=True, fuse_rowsum=fuse_rowsum, p_bf16=p_bf16,
            interleave=interleave, force_dense=force_dense,
            debug_skip=debug_skip, kv_chunk=kv_chunk, pipe=pipe,
            no_diag=no_diag, unroll=unroll, two_pass=two_pass, cp=cp,
            interpret=interpret,
        )
    if alibi_slopes is None:
        alibi_norm = jnp.zeros((0, 0), jnp.float32)
    elif alibi_slopes.ndim == 1:
        alibi_norm = jnp.broadcast_to(
            jnp.asarray(alibi_slopes, jnp.float32)[None], (q.shape[0], q.shape[1])
        )
    else:
        alibi_norm = jnp.asarray(alibi_slopes, jnp.float32)
    return _flash_attention_vjp(
        q, k, v, alibi_norm, causal, float(sm_scale), tuple(window),
        float(softcap), block_q, block_k, fuse_rowsum, p_bf16, interleave,
        force_dense, debug_skip, kv_chunk, pipe, no_diag, unroll, two_pass,
        cp, interpret,
    )


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    alibi_slopes: Optional[jax.Array] = None,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    window: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    block_q: int = 1024,
    block_k: int = 1024,
    return_lse: bool = False,
    fuse_rowsum: Optional[bool] = None,
    p_bf16: Optional[bool] = None,
    interleave: Optional[int] = None,
    force_dense: Optional[bool] = None,
    debug_skip: Optional[Tuple[str, ...]] = None,
    kv_chunk: Optional[int] = None,
    pipe: Optional[bool] = None,
    unroll: Optional[int] = None,
    no_diag: Optional[bool] = None,
    two_pass: Optional[bool] = None,
    cp: Optional[Tuple[str, ...]] = None,
    interpret: Optional[bool] = None,
):
    """Flash attention forward (differentiable when return_lse=False).

    q: (b, h, sq, d); k/v: (b, h_kv, sk, d), h %% h_kv == 0 (GQA broadcast,
    flash_attn_interface.py:1046-1049). Causal is bottom-right aligned;
    window is the inclusive (left, right) sliding window, -1 = unbounded.
    Returns out (b, h, sq, d) [, fp32 lse (b, h, sq)].

    Perf knobs (env default so A/B runs need no code change; resolved HERE,
    outside the jit, so each setting gets its own executable-cache entry):
    fuse_rowsum/PF_ROWSUM, p_bf16/PF_PBF16 (bf16 exp2 softmax),
    interleave/PF_INTERLEAVE (independent sub-q chains per grid step),
    force_dense/PF_DENSE (dense grid even for causal/window).
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    if interpret is None:
        interpret = use_interpret()
    # knob registry: config.py is the ONE documented surface (env overrides
    # of the same names still work for shell-level A/Bs); explicit kwargs win
    if fuse_rowsum is None:
        fuse_rowsum = knob("pf_rowsum")
    if p_bf16 is None:
        p_bf16 = knob("pf_pbf16")
    if interleave is None:
        interleave = int(knob("pf_interleave"))
    if force_dense is None:
        force_dense = knob("pf_dense")
    if debug_skip is None:
        debug_skip = tuple(knob("pf_skip"))
    if kv_chunk is None:
        kv_chunk = int(knob("pf_chunk"))
    if pipe is None:
        pipe = knob("pf_pipe")
    if no_diag is None:
        # experiment default OFF: enable with pf_diag (measured neutral)
        no_diag = not knob("pf_diag")
    if two_pass is None:
        # round-4 experiment: lse-then-pv two-pass structure (-22% at the
        # b=4 headline shape, round-5 sweep)
        two_pass = knob("pf_two_pass")
    if unroll is None:
        # round-4 experiment: pf_unroll=N sweeps N block_k tiles per grid
        # step with a statically UNROLLED inner loop (chunked-kernel path)
        unroll = int(knob("pf_unroll"))
    if cp is None:
        # Mosaic compiler knobs (see _cparams). Hardware default measured
        # round 4: bounds checks off + input fusion on = +26% raw TFLOP/s
        # in-process on v5e (benchmarks/bench_prefill_hw.py: base 41.7 ->
        # cpboth 52.7). pf_cp/PF_CP overrides for A/Bs (env "none" forces
        # empty). Interpret mode (the CPU sanitizer path) keeps no knobs so
        # its coverage is independent of Mosaic compiler behavior.
        cp = knob("pf_cp")
        if cp is None:
            cp = () if interpret else ("nobounds", "fusein")
    if unroll and not kv_chunk:
        kv_chunk = int(unroll) * block_k
    return _flash_attention_jit(
        q, k, v, alibi_slopes, causal=causal, sm_scale=float(sm_scale),
        window=tuple(window), softcap=float(softcap), block_q=block_q,
        block_k=block_k, return_lse=return_lse, fuse_rowsum=bool(fuse_rowsum),
        p_bf16=bool(p_bf16), interleave=int(interleave),
        force_dense=bool(force_dense), debug_skip=tuple(debug_skip),
        kv_chunk=int(kv_chunk), pipe=bool(pipe), unroll=int(unroll),
        no_diag=bool(no_diag), two_pass=bool(two_pass), cp=tuple(cp),
        interpret=interpret,
    )
