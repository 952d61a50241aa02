"""Pallas TPU paged-KV decode attention (the `flash_attn_with_kvcache` core).

TPU-native re-design of the reference split-KV decode path
(/root/reference/csrc/flash_attn/flash_api.cpp:671-936,
csrc/flash_attn/src/flash_fwd_kernel.h:475-1055):

- per-thread page-slice resolution (utils.h:412-428)  -> one async DMA per page
  fetching ALL kv heads at once (cache layout (num_pages, page_size, h_k, d) —
  the reference's own layout, flash_attn_interface.py:1183-1187, which on TPU
  makes each page one contiguous page_size*h_k*d stream), double-buffered
  against compute
- CUDA split-KV + combine kernel                      -> sequential kv-block
  walk per batch row with online softmax in VMEM; the DMA pipeline keeps HBM
  saturated, which is what the split-KV occupancy heuristic
  (flash_api.cpp:154-192) buys on GPU
- decode matvec shape                                 -> VPU broadcast-multiply
  + axis reductions in a token-major (block_k, num_q_heads) layout: per-head
  MXU matmuls would waste 128x on M/N padding, while the VPU form costs ~2
  passes over the KV block and stays under the DMA time (bandwidth-bound)
- GQA ngroups<->seqlen_q swap (flash_api.cpp:298-305) -> all q heads live in
  the lane dimension; K/V rows are repeated across each query group in VMEM

Supports: per-sequence lengths, sliding window, ALiBi, softcap, any
page_size >= 8 (the fork's small-page support, flash_api.cpp:491).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from vllm_flash_attn_tpu.config import use_interpret
from vllm_flash_attn_tpu.kernels.flash_prefill import (
    DEFAULT_MASK_VALUE,
    LN2,
    LOG2E,
    MIN_LANES,
)
from vllm_flash_attn_tpu.kernels.kv_quant import V_SCALE_LANE

# perf-archaeology knob: comma-separated stages to skip (WRONG RESULTS) so the
# per-stage cost can be measured on real hardware. e.g. PD_SKIP=pv,softmax.
# All three pd_* knobs are defined in config.py (the single knob surface) and
# read ONCE at this module's import — they steer trace-time structure inside
# the jitted decode path, so set them before the first import / via env.
from vllm_flash_attn_tpu.config import knob as _knob

_DEBUG_SKIP = frozenset(_knob("pd_skip"))
# int8 cache: run QK as an int8 x int8 MXU matmul against a host-quantized
# block-diagonal q weight (per-b-per-head absmax scales folded into the
# existing per-token k-scale multiply) instead of casting the K block to
# bf16. Default ON: raw decode 1.43x bf16 without it, ~1.0x with it
# (in-process v5e A/B), ppl delta +0.015 vs the 0.05 budget
# (eval_kv_quant_ppl). pd_qint8=False reverts.
_QINT8 = _knob("pd_qint8")
# int8 PV: requantize p per q head (v scales folded in first — exact) and run
# PV as int8 x int8 MXU matmul against the raw int8 V block (skips the V
# dequant cast + head-repeat passes). Default ON since the round-4 hardware
# A/B: marginal int8/bf16 step time 0.807 -> 0.547 at the llama-7B MHA shape
# (benchmarks/bench_qpv_hw.py), ppl budget still met
# (tests/test_kv_quant.py::test_quantized_cache_ppl_delta). pd_qpv escapes.
_QPV = _knob("pd_qpv")


def _decode_kernel(
    # scalar prefetch
    lengths_ref,  # (b,) keys THIS row sweeps (local to its KV-range split)
    block_tables_ref,  # (b, max_pages)
    col_base_ref,  # (b,) global column of this row's first key (0 unless
    #               split-KV: virtual row (split s, seq b) starts at its
    #               split's global offset so window/alibi positions stay
    #               global — reference splits are position-global too,
    #               flash_fwd_kernel.h:475-512)
    total_lens_ref,  # (b,) FULL sequence length (decode q position = total-1)
    append_mask_ref,  # (b,) int32 — 1 = this row appends its k_new/v_new
    # inputs
    q_ref,  # (1, h_kv*d, hq) VMEM — block-diagonal query weight
    k_pages_ref,  # (num_pages, page_size, h_k, d) ANY/HBM
    v_pages_ref,
    k_scales_ref,  # (num_pages, page_size, h_k) ANY/HBM or None
    v_scales_ref,
    alibi_ref,  # SMEM (1, hq) / (1, 1), or VMEM (1, 1, hq) per-b block when
    #             the caller passes per-batch (batch, nheads) slopes
    #             (flash_api.cpp:221-237 validates both shapes)
    q_scale_ref,  # (1, hq) fp32 VMEM — per-head q dequant scales (qint8)
    k_new_ref,  # (batch, h_k, d) VMEM — this step's new tokens, or (1,1,1)
    v_new_ref,
    # outputs
    o_ref,  # (1, hq, d)
    lse_ref,  # (1, hq, MIN_LANES) or None
    # scratch
    k_buf,  # (2, ppb, page_size, h_k, d)
    v_buf,
    ks_buf,  # (2, ppb, page_size, h_k) fp32 or None
    vs_buf,
    sems,  # DMA (2, 4)
    append_sem,  # DMA (2,)
    m_scr,  # (1, hq)
    l_scr,  # (1, hq)
    acc_scr,  # (1, hq, d)
    buf_idx_ref,  # SMEM (1,)
    *,
    batch: int,
    page_size: int,
    pages_per_block: int,
    q_per_kv: int,
    sm_scale: float,
    window: Tuple[int, int],
    has_alibi: bool,
    softcap: float,
    quantized: bool = False,
    packed_scales: bool = False,
    append: bool = False,
    qpv: bool = False,
    mask_value: float = DEFAULT_MASK_VALUE,
):
    core = pl.program_id(0)
    ncores = pl.num_programs(0)
    b = pl.program_id(1) * ncores + core
    i = pl.program_id(2)
    bk = page_size * pages_per_block

    def num_blocks(b_):
        len_ = jnp.where(b_ < batch, lengths_ref[jnp.minimum(b_, batch - 1)], 0)
        return jnp.maximum(pl.cdiv(len_, bk), 1)  # empty seq: 1 masked block

    length = jnp.where(b < batch, lengths_ref[jnp.minimum(b, batch - 1)], 0)
    nb = num_blocks(b)

    def next_indices(b_, i_):
        roll = i_ >= num_blocks(b_)
        return jnp.where(roll, b_ + ncores, b_), jnp.where(roll, 0, i_)

    def start_fetch(b_, i_, slot):
        if "dma" in _DEBUG_SKIP:
            return

        @pl.when(b_ < batch)
        def _():
            max_pages = block_tables_ref.shape[1]
            num_pages = k_pages_ref.shape[0]
            for p in range(pages_per_block):
                # Clamp the table index (final block group may be partial) and
                # the page value (entries past a sequence's allocation are
                # caller garbage) — an OOB-index DMA is undefined on hardware
                # even though the fetched rows are masked out of the result.
                idx = jnp.minimum(i_ * pages_per_block + p, max_pages - 1)
                page_idx = jnp.clip(block_tables_ref[b_, idx], 0, num_pages - 1)
                pltpu.make_async_copy(
                    k_pages_ref.at[page_idx], k_buf.at[slot, p], sems.at[slot, 0]
                ).start()
                pltpu.make_async_copy(
                    v_pages_ref.at[page_idx], v_buf.at[slot, p], sems.at[slot, 1]
                ).start()
                if quantized:
                    # packed layout: ONE scale tile carries k (lanes [0:h))
                    # and v (lanes [V_SCALE_LANE:V_SCALE_LANE+h)) — half the
                    # scale DMAs and waits of the split layout
                    pltpu.make_async_copy(
                        k_scales_ref.at[page_idx], ks_buf.at[slot, p],
                        sems.at[slot, 2],
                    ).start()
                    if not packed_scales:
                        pltpu.make_async_copy(
                            v_scales_ref.at[page_idx], vs_buf.at[slot, p],
                            sems.at[slot, 3],
                        ).start()

    is_first_step = jnp.logical_and(pl.program_id(1) == 0, i == 0)

    @pl.when(jnp.logical_and(i < nb, b < batch))
    def _run():
        @pl.when(is_first_step)
        def _prefetch_first():
            if append and "append" not in _DEBUG_SKIP:
                # In-kernel cache append (flash_fwd_kernel.h:671-785 analog):
                # write every row's new k/v token into its page slot BEFORE
                # the first page prefetch, so the sweep (lengths includes the
                # new token) reads it back. One (h_k, d) DMA per row per
                # side; all issued, then all awaited — a few KB, latency-
                # bound, once per kernel invocation.
                # single-core only (host asserts ncores == 1 with append):
                # with multiple cores another core's first prefetch could
                # race these writes
                page_size_ = k_buf.shape[2]
                num_pages_ = k_pages_ref.shape[0]
                max_pages_ = block_tables_ref.shape[1]
                for bb in range(batch):
                    # masked-out rows (inactive or mid-prefill engine slots)
                    # append nothing; start+wait inside the cond keeps
                    # semaphore counts matched
                    @pl.when(
                        jnp.logical_and(
                            lengths_ref[bb] > 0, append_mask_ref[bb] > 0
                        )
                    )
                    def _append_row(bb=bb):
                        pos = lengths_ref[bb] - 1
                        idx = jnp.minimum(pos // page_size_, max_pages_ - 1)
                        pg = jnp.clip(
                            block_tables_ref[bb, idx], 0, num_pages_ - 1
                        )
                        row = jax.lax.rem(pos, page_size_)
                        ck = pltpu.make_async_copy(
                            k_new_ref.at[bb], k_pages_ref.at[pg, row],
                            append_sem.at[0],
                        )
                        cv = pltpu.make_async_copy(
                            v_new_ref.at[bb], v_pages_ref.at[pg, row],
                            append_sem.at[1],
                        )
                        ck.start()
                        cv.start()
                        ck.wait()
                        cv.wait()
            buf_idx_ref[0] = 0
            start_fetch(b, i, 0)

        slot = buf_idx_ref[0]
        nxt_b, nxt_i = next_indices(b, i + 1)

        @pl.when(nxt_b < batch)
        def _prefetch_next():
            start_fetch(nxt_b, nxt_i, 1 - slot)

        buf_idx_ref[0] = 1 - slot

        @pl.when(i == 0)
        def _init():
            m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
            l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
            acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

        if "dma" not in _DEBUG_SKIP:
            for p in range(pages_per_block):
                pltpu.make_async_copy(
                    k_pages_ref.at[0], k_buf.at[slot, p], sems.at[slot, 0]
                ).wait()
        h_kv = k_buf.shape[-2]
        # --- QK on the MXU. The d-contraction as a VPU lane reduction costs
        # ~7 cross-lane passes over the whole block; instead view the K block
        # token-major as (bk, h_kv*d) and multiply by the host-built
        # block-diagonal query weight (h_kv*d, hq) — q head j occupies rows
        # [(j%h_kv)*d, (j%h_kv+1)*d) of its column, zeros elsewhere — so the
        # result lands directly as (bk, hq) with no extraction pass. The
        # h_kv-fold FLOP waste on the zero rows is absorbed by the MXU and is
        # what turns the per-head matvec (M=1, unusable) into one fat matmul.
        k_tok = k_buf[slot].reshape(bk, h_kv * k_buf.shape[-1])
        q_blk = q_ref[0]  # (h_kv*d, hq) block-diagonal
        qint8 = (
            quantized and _QINT8 and k_buf.dtype == jnp.int8
            and q_ref.shape[-1] % 8 == 0
        )
        if quantized and not qint8:
            # int8/fp8 payloads are exact in bf16 (<= 8 mantissa bits); cast so
            # the dot stays on the fast bf16 MXU path (scales fold in below)
            k_tok = k_tok.astype(jnp.bfloat16)
        if "qk" in _DEBUG_SKIP:
            s = jnp.zeros((bk, q_blk.shape[-1]), jnp.float32) + i
        elif qint8:
            # int8 x int8 MXU matmul with int32 accumulate — no K cast pass;
            # the per-head q scale folds into the per-token k-scale multiply
            s = jax.lax.dot_general(
                k_tok, q_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * q_scale_ref[0]
        else:
            s = jax.lax.dot_general(
                k_tok, q_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bk, hq)
        if quantized:
            # dequant folds in AFTER the d-reduction: one (bk, hq) multiply
            for p in range(pages_per_block):
                pltpu.make_async_copy(
                    k_scales_ref.at[0], ks_buf.at[slot, p], sems.at[slot, 2]
                ).wait()
            h_kv = k_buf.shape[-2]
            sk = ks_buf[slot].reshape(bk, ks_buf.shape[-1])[:, :h_kv]
            if q_per_kv > 1:
                sk = pltpu.repeat(sk, q_per_kv, axis=1)
            s *= sk
        # sm_scale*log2(e) is folded into the block-diagonal q weight
        # host-side; scores are log2-domain from here (scale_softmax_log2,
        # flash_api.cpp:21-137) — no per-block scale pass.
        if softcap > 0.0:
            cap2 = softcap * LOG2E
            s = jnp.tanh(s / cap2) * cap2

        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * bk
        mask = col < length  # local: keys this row actually owns
        # window/alibi positions are GLOBAL: offset by this row's split base;
        # the decode query position is total_length-1 (one new token per seq)
        qpos = total_lens_ref[jnp.minimum(b, batch - 1)] - 1
        col_g = col + col_base_ref[jnp.minimum(b, batch - 1)]
        wl, wr = window
        if wl >= 0:
            mask &= col_g >= qpos - wl
        if wr >= 0:
            mask &= col_g <= qpos + wr

        if has_alibi:
            if len(alibi_ref.shape) == 3:
                slopes = alibi_ref[0]  # per-batch slopes: this row's block
            else:
                slopes = alibi_ref[...]  # (1, hq) shared across the batch
            dist = jnp.abs(qpos - col_g).astype(jnp.float32)
            s = s - slopes * dist

        s = jnp.where(mask, s, mask_value)

        if "softmax" in _DEBUG_SKIP:
            p = s
            alpha = jnp.ones_like(m_scr[...])
            m_scr[...] = jnp.max(s, axis=0, keepdims=True)
            l_scr[...] = jnp.ones_like(l_scr[...])
        else:
            m_prev = m_scr[...]  # (1, hq)
            l_prev = l_scr[...]
            m_cur = jnp.max(s, axis=0, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp2(m_prev - m_next)
            # masked entries need no second where: exp2(MASKVAL - m) == 0
            # once any real key raised m; all-masked columns (length 0) are
            # zeroed by the store-time m-based guard
            p = jnp.exp2(s - m_next)
            l_next = alpha * l_prev + jnp.sum(p, axis=0, keepdims=True)
            m_scr[...] = m_next
            l_scr[...] = l_next

        if "dma" not in _DEBUG_SKIP:
            for pg in range(pages_per_block):
                pltpu.make_async_copy(
                    v_pages_ref.at[0], v_buf.at[slot, pg], sems.at[slot, 1]
                ).wait()
        if "pv" in _DEBUG_SKIP:
            acc_scr[...] = acc_scr[...] * alpha[0][:, None] + jnp.sum(
                p, axis=0, keepdims=True
            )[0][:, None]
            return
        h_kv = v_buf.shape[-2]
        sv = None
        if quantized:
            if packed_scales:
                # v scales ride the k-scale tile (already waited before QK):
                # no second scale DMA, no second wait
                sv = ks_buf[slot].reshape(bk, ks_buf.shape[-1])[
                    :, V_SCALE_LANE : V_SCALE_LANE + h_kv
                ]
            else:
                for pg in range(pages_per_block):
                    pltpu.make_async_copy(
                        v_scales_ref.at[0], vs_buf.at[slot, pg], sems.at[slot, 3]
                    ).wait()
                sv = vs_buf[slot].reshape(bk, vs_buf.shape[-1])[:, :h_kv]
            if q_per_kv > 1:
                sv = pltpu.repeat(sv, q_per_kv, axis=1)
        if quantized and qpv and v_buf.dtype == jnp.int8:
            # int8 PV experiment (PD_QPV=1): fold the per-token v scales into
            # p FIRST (exact — they are per token, so they cannot come out of
            # the token reduction), requantize p to int8 per q head, and run
            # PV as ONE int8 x int8 MXU matmul against the RAW int8 V block:
            # no V dequant cast pass over the big tile and no head-repeat
            # vreg copy of it. The h_kv-fold FLOP waste on mismatched
            # (q head, kv head) column pairs is absorbed by the MXU exactly
            # like the QK block-diagonal trick above; the matching blocks are
            # selected out afterwards on the tiny (hq, h_kv, d) result.
            pf = p * sv  # (bk, hq) fp32
            ps = (
                jnp.maximum(jnp.max(jnp.abs(pf), axis=0, keepdims=True), 1e-30)
                / 127.0
            )  # (1, hq) per-head requant scale
            p_q = jnp.clip(jnp.round(pf / ps), -127, 127).astype(jnp.int8)
            v_tok = v_buf[slot].reshape(bk, h_kv * v_buf.shape[-1])  # int8
            r = jax.lax.dot_general(
                p_q, v_tok, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)  # (hq, h_kv*d)
            hq_ = r.shape[0]
            d_ = v_buf.shape[-1]
            r3 = r.reshape(hq_, h_kv, d_)
            # lane l's own kv head is l % h_kv (same pairing as QK/repeat)
            lane_kv = jax.lax.broadcasted_iota(jnp.int32, r3.shape, 0) % h_kv
            grp = jax.lax.broadcasted_iota(jnp.int32, r3.shape, 1)
            pv_hd = jnp.sum(
                jnp.where(lane_kv == grp, r3, 0.0), axis=1, keepdims=True
            ).reshape(hq_, d_)
            pv_hd = pv_hd * ps[0][:, None]
            acc_scr[...] = acc_scr[...] * alpha[0][:, None] + pv_hd
        else:
            v = v_buf[slot].reshape(bk, h_kv, v_buf.shape[-1])
            if quantized:
                # int8/fp8 payloads are exact in bf16; cast once (packed
                # pass) so the PV products run on the same packed-bf16 path
                # as the unquantized case instead of full fp32 products. Cast
                # BEFORE the q_per_kv head repeat: the pre-repeat tile is
                # q_per_kv times smaller, and the repeat itself then copies
                # bf16 vregs that the PV multiply consumes directly.
                v = v.astype(jnp.bfloat16)
            if q_per_kv > 1:
                v = pltpu.repeat(v, q_per_kv, axis=1)
            if quantized:
                p = p * sv  # dequant folds INTO p before the PV reduction
            # expand p's minor dim in fp32 (Mosaic 32-bit rule), then cast so
            # the multiply runs packed
            pv = jnp.sum(
                (p[:, :, None].astype(v.dtype) * v).astype(jnp.float32),
                axis=0,
                keepdims=True,
            )  # (1, hq, d)
            acc_scr[...] = acc_scr[...] * alpha[0][:, None] + pv[0]

        @pl.when(i == nb - 1)
        def _store():
            l = l_scr[...]  # (1, hq)
            m_fin = m_scr[...]
            # length-0 sequences: m never left the mask floor and l holds
            # garbage exp2(0)==1 sums — out 0 / lse +inf (flash_api.cpp:401-407)
            dead = jnp.logical_or(l == 0.0, m_fin <= 0.5 * mask_value)
            l_inv = jnp.where(dead, 0.0, 1.0 / l)
            o_ref[...] = (acc_scr[...] * l_inv[0][:, None]).astype(o_ref.dtype)
            if lse_ref is not None:
                # m is log2-domain; natural-log LSE out (flash_api.cpp:418)
                lse = jnp.where(dead, jnp.inf, m_fin * LN2 + jnp.log(l))
                lse_ref[...] = jnp.broadcast_to(
                    lse[0][:, None], lse_ref.shape
                )


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale",
        "window",
        "softcap",
        "pages_per_compute_block",
        "return_lse",
        "interpret",
        "qpv",
    ),
)
def paged_attention(
    q: jax.Array,  # (batch, num_q_heads, head_dim)
    k_pages: jax.Array,  # (num_pages, page_size, num_kv_heads, head_dim)
    v_pages: jax.Array,
    lengths: jax.Array,  # (batch,) int32 — keys in cache per sequence
    block_tables: jax.Array,  # (batch, max_pages_per_seq) int32
    alibi_slopes: Optional[jax.Array] = None,
    *,
    sm_scale: Optional[float] = None,
    window: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    pages_per_compute_block: Optional[int] = None,
    return_lse: bool = False,
    col_base: Optional[jax.Array] = None,  # (b,) split-KV global col offsets
    total_lens: Optional[jax.Array] = None,  # (b,) full lengths (q position)
    k_new: Optional[jax.Array] = None,  # (b, h_kv, d): fused in-kernel append
    v_new: Optional[jax.Array] = None,
    append_mask: Optional[jax.Array] = None,  # (b,) rows that append (def all)
    interpret: Optional[bool] = None,
    qpv: Optional[bool] = None,  # int8 MXU PV (None -> PD_QPV env default)
):
    """Single-token decode over a paged KV cache (reference cache layout).

    With k_new/v_new, the kernel itself writes each row's new token into its
    page slot at position lengths-1 BEFORE the sweep (in-kernel append,
    flash_fwd_kernel.h:671-785 analog; rows with lengths 0 skip the write);
    `lengths` must then already INCLUDE the new token, and the (donated,
    aliased) updated pools are returned after the attention output:
    (out[, lse], k_pages, v_pages).

    Returns out (batch, num_q_heads, head_dim) [, lse (batch, num_q_heads)].
    """
    from vllm_flash_attn_tpu.kernels.kv_quant import (
        QuantizedPages,
        scales_packed,
    )

    quantized = isinstance(k_pages, QuantizedPages)
    append = k_new is not None
    packed = False
    h_kv_real = k_pages.h_real if quantized else k_pages.shape[2]
    if append:
        assert v_new is not None
        assert not quantized, (
            "fused in-kernel append requires a bf16/fp32 cache (quantized "
            "caches append via append_kv_paged_quantized)"
        )
    if quantized:
        packed = scales_packed(k_pages, v_pages)
        k_scales = k_pages.scales
        # packed layout: v scales ride the k tile — pass a dummy so the
        # shared array is not shipped twice
        v_scales = (
            jnp.zeros((1, 1, 1), jnp.float32) if packed else v_pages.scales
        )
        k_pages, v_pages = k_pages.data, v_pages.data
    else:
        k_scales = v_scales = jnp.zeros((1, 1, 1), jnp.float32)

    batch, h_q, d = q.shape
    num_pages, page_size, h_kv, d_pool = k_pages.shape
    max_pages = block_tables.shape[1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)

    # --- q-head lane assignment (static). The kernel pairs lane l with pool
    # head row l % h_kv; pool rows may be BLOCK-REPLICATED padding (row g
    # stores real head g // rep — kv_quant padded layout for int8 sublane
    # tiling), and the lane count must be a multiple of the pool head count
    # (plus 8 for the int8 x int8 QK path's operand tiling). A static
    # permutation places each real q head on a lane whose pool row holds its
    # real kv head; surplus lanes carry zero q heads whose garbage softmax
    # stays in their own lanes and is sliced off the output. For unpadded
    # pools this reduces to the classic tiled shuffle (lane r*h_kv+g <-> q
    # head g*q_per_kv+r); it is what lets MQA / any-h_q serve quantized.
    import numpy as _np

    h_q_orig = h_q
    assert h_q % h_kv_real == 0, (h_q, h_kv_real)
    group_real = h_q // h_kv_real  # q heads per REAL kv head
    rep = h_kv // h_kv_real  # pool head replication factor
    want_qint8 = quantized and _QINT8 and k_pages.dtype == jnp.int8
    if qpv is None:
        qpv = _QPV
    want_qpv = quantized and qpv and v_pages.dtype == jnp.int8
    q_per_kv = max(1, -(-group_real // rep))
    if want_qint8 or want_qpv:
        # int8 x int8 MXU matmuls need the lane count 8-aligned (operand
        # tiling) — QK's weight columns and PV's requantized-p rows alike
        while (q_per_kv * h_kv) % 8:
            q_per_kv += 1
    h_q = q_per_kv * h_kv  # kernel lane count
    perm = -_np.ones(h_q, _np.int64)  # lane -> q head (-1 = zero pad)
    counts = _np.zeros(h_kv_real, _np.int64)
    for lane in range(h_q):
        hr = (lane % h_kv) // rep
        if counts[hr] < group_real:
            perm[lane] = hr * group_real + counts[hr]
            counts[hr] += 1
    assert counts.sum() == h_q_orig
    inv = _np.argsort(_np.where(perm < 0, _np.iinfo(_np.int64).max, perm))
    inv = inv[:h_q_orig]  # output lane of q head j
    identity = h_q == h_q_orig and (perm == _np.arange(h_q)).all()
    if not identity:
        qz = jnp.concatenate(
            [q, jnp.zeros((batch, 1, d), q.dtype)], axis=1
        )
        q = jnp.take(qz, jnp.asarray(_np.where(perm < 0, h_q_orig, perm)), axis=1)
        if alibi_slopes is not None:
            a = jnp.asarray(alibi_slopes, jnp.float32)
            if a.ndim == 2:  # per-batch (batch, nheads) slopes
                az = jnp.concatenate(
                    [a, jnp.zeros((batch, 1), jnp.float32)], axis=1
                )
                alibi_slopes = jnp.take(
                    az, jnp.asarray(_np.where(perm < 0, h_q_orig, perm)),
                    axis=1,
                )
            else:
                az = jnp.concatenate(
                    [a.reshape(h_q_orig), jnp.zeros((1,), jnp.float32)]
                )
                alibi_slopes = jnp.take(
                    az, jnp.asarray(_np.where(perm < 0, h_q_orig, perm))
                )

    # arbitrary head dims. Fast path: the pool was allocated lane-padded
    # (kv_quant.lane_pad / PagedState.allocate) — only q needs padding, no
    # pool copy, fused append stays available. Legacy path (unpadded pool,
    # d % 128 != 0): pad the pool per call — a correctness escape hatch for
    # exotic dims on user-constructed pools (flash_api.cpp:312-320 analog).
    d_orig = d
    if d_pool != d:
        assert d_pool % 128 == 0 and d_pool > d, (d_pool, d)
        q = jnp.pad(q, [(0, 0), (0, 0), (0, d_pool - d)])
        if append:
            nw = [(0, 0), (0, 0), (0, d_pool - d)]
            k_new = jnp.pad(k_new, nw)
            v_new = jnp.pad(v_new, nw)
        d = d_pool
    elif d % 128 != 0:
        assert not append, (
            "fused append requires a lane-aligned head dim (the pad path "
            "copies the pool, defeating in-place aliasing); allocate the "
            "pool lane-padded (PagedState.allocate) or use append_kv_paged"
        )
        d = pl.cdiv(d, 128) * 128
        q = jnp.pad(q, [(0, 0), (0, 0), (0, d - d_orig)])
        kv_pw = [(0, 0), (0, 0), (0, 0), (0, d - d_orig)]
        k_pages = jnp.pad(k_pages, kv_pw)
        v_pages = jnp.pad(v_pages, kv_pw)
    if interpret is None:
        interpret = use_interpret()
    if pages_per_compute_block is None:
        pages_per_compute_block = max(1, min(max_pages, 512 // page_size))
    ppb = min(pages_per_compute_block, max_pages)
    num_blocks_grid = pl.cdiv(max_pages, ppb)
    lengths = lengths.astype(jnp.int32)
    block_tables = block_tables.astype(jnp.int32)
    # split-KV plumbing: global column base + full length per (virtual) row;
    # plain decode rows start at column 0 with total == local length
    col_base = (
        jnp.zeros_like(lengths) if col_base is None
        else col_base.astype(jnp.int32)
    )
    total_lens = (
        lengths if total_lens is None else total_lens.astype(jnp.int32)
    )
    if append_mask is None:
        append_mask = (
            jnp.ones_like(lengths) if append else jnp.zeros_like(lengths)
        )
    else:
        append_mask = append_mask.astype(jnp.int32)

    # Fold sm_scale*log2(e) into q so the kernel runs no per-block scale pass
    # and uses native exp2 (scale_softmax_log2, flash_api.cpp:21-137).
    q = (q * jnp.asarray(sm_scale * LOG2E, q.dtype)).astype(q.dtype)

    # (q heads were already placed on their lanes by the static permutation
    # above — pltpu.repeat tiles ([k0..kh, k0..kh]), so lane l pairs with kv
    # row l % h_kv, which the permutation guarantees holds head l's data)
    # Block-diagonal query weight for the kernel's one-matmul QK: column j
    # (= q head j) carries its q vector in rows [(j%h_kv)*d, (j%h_kv+1)*d) so
    # that (bk, h_kv*d) @ (h_kv*d, hq) contracts each token row against
    # exactly its own kv head (see _decode_kernel).
    eye = (
        jnp.arange(h_kv)[:, None] == jnp.arange(h_q)[None, :] % h_kv
    ).astype(q.dtype)
    q_blk = jnp.einsum("bjr,gj->bgrj", q, eye).reshape(batch, h_kv * d, h_q)
    q_scales = jnp.ones((1, h_q), jnp.float32)
    # int8 operands carry (32,128)-tiled packing: the block-diagonal weight's
    # minor dims must be 4-sublane-aligned; the lane-assignment step above
    # already padded h_q to a multiple of 8 whenever qint8 is wanted
    if want_qint8 and h_q % 8 == 0:
        # per-(batch, q-head) absmax quantization of the block-diagonal
        # weight; sm_scale*log2e is already folded in, so the scale carries
        # it. Scales broadcast per batch via a (batch, 1, hq) -> take the
        # kernel's per-b block? keep it simple: quantize per COLUMN ACROSS
        # batch is wrong — use per-batch scales folded into... the kernel
        # reads a (1, hq) operand per grid b via BlockSpec.
        absmax = jnp.max(
            jnp.abs(q_blk.astype(jnp.float32)), axis=1, keepdims=True
        )  # (batch, 1, hq)
        scale = jnp.maximum(absmax, 1e-30) / 127.0
        q_blk = jnp.clip(
            jnp.round(q_blk.astype(jnp.float32) / scale), -127, 127
        ).astype(jnp.int8)
        q_scales = scale  # (batch, 1, hq)
    elif quantized:
        q_blk = q_blk.astype(jnp.bfloat16)
    has_alibi = alibi_slopes is not None
    if has_alibi:
        # already lane-permuted alongside q; kernel scores are log2-domain
        a = jnp.asarray(alibi_slopes, jnp.float32)
        if a.ndim == 2:
            # per-batch (batch, nheads) slopes (flash_api.cpp:221-237): ride
            # a per-b VMEM block like q_scales — SMEM holds scalars only, and
            # the kernel consumes the slopes as a (1, hq) vector
            assert a.shape[0] == batch, (a.shape, batch)
            alibi_slopes = a.reshape(batch, 1, h_q) * LOG2E
        else:
            alibi_slopes = a.reshape(1, h_q) * LOG2E
    else:
        alibi_slopes = jnp.zeros((1, 1), jnp.float32)

    kernel = functools.partial(
        _decode_kernel,
        batch=batch,
        page_size=page_size,
        pages_per_block=ppb,
        q_per_kv=q_per_kv,
        sm_scale=float(sm_scale),
        window=tuple(int(w) for w in window),
        has_alibi=has_alibi,
        softcap=float(softcap),
        quantized=quantized,
        packed_scales=packed,
        append=append,
        qpv=want_qpv,
    )
    if not return_lse:
        body = kernel

        def kernel(l_r, bt_r, cb_r, tl_r, am_r, q_r, k_r, v_r, ks_r, vs_r,
                   a_r, qs_r, kn_r, vn_r, o_r, *rest):  # noqa: F811
            body(
                l_r, bt_r, cb_r, tl_r, am_r, q_r, k_r, v_r, ks_r, vs_r, a_r,
                qs_r, kn_r, vn_r, o_r, None, *rest,
            )

    ncores = 1  # megacore split reserved (v5e has a single TensorCore)
    # (the in-kernel append prologue assumes one core — see _decode_kernel)
    grid = (ncores, batch, num_blocks_grid)

    out_shape = [jax.ShapeDtypeStruct((batch, h_q, d), q.dtype)]
    out_specs = [
        pl.BlockSpec(
            (1, h_q, d), lambda c, b, i, *refs, nc=ncores: (b * nc + c, 0, 0)
        )
    ]
    if return_lse:
        out_shape.append(
            jax.ShapeDtypeStruct((batch, h_q, MIN_LANES), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, h_q, MIN_LANES),
                lambda c, b, i, *refs, nc=ncores: (b * nc + c, 0, 0),
            )
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, h_kv * d, h_q),
                lambda c, b, i, *refs, nc=ncores: (b * nc + c, 0, 0),
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),  # k_scales
            pl.BlockSpec(memory_space=pl.ANY),  # v_scales
            (  # alibi: per-b (1, 1, hq) VMEM block for (batch, nheads)
               # slopes; shared SMEM row for the classic (nheads,) shape
                pl.BlockSpec(
                    (1, 1, h_q),
                    lambda c, b, i, *refs, nc=ncores: (b * nc + c, 0, 0),
                )
                if alibi_slopes.ndim == 3
                else pl.BlockSpec(memory_space=pltpu.SMEM)
            ),
            (  # q_scales: per-b (1, 1, hq) block when qint8; ones otherwise
                pl.BlockSpec(
                    (1, 1, h_q),
                    lambda c, b, i, *refs, nc=ncores: (b * nc + c, 0, 0),
                )
                if q_scales.ndim == 3
                else pl.BlockSpec(memory_space=pl.ANY)
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # k_new
            pl.BlockSpec(memory_space=pl.ANY),  # v_new
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, ppb, page_size, h_kv, d), k_pages.dtype),
            pltpu.VMEM((2, ppb, page_size, h_kv, d), v_pages.dtype),
            pltpu.VMEM(
                (2, ppb, page_size, 128) if quantized else (1, 1, 1, 1),
                jnp.float32,
            ),
            pltpu.VMEM(
                (2, ppb, page_size, 128)
                if (quantized and not packed)
                else (1, 1, 1, 1),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1, h_q), jnp.float32),
            pltpu.VMEM((1, h_q), jnp.float32),
            pltpu.VMEM((1, h_q, d), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )

    if append:
        k_new = k_new.astype(k_pages.dtype)
        v_new = v_new.astype(v_pages.dtype)
        # aliased pool passthrough: the kernel's append DMAs write the input
        # refs; aliasing makes those the same buffers as these outputs
        out_shape = out_shape + [
            jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
            jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
        ]
        out_specs = out_specs + [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=grid,
            in_specs=grid_spec.in_specs,
            out_specs=out_specs,
            scratch_shapes=grid_spec.scratch_shapes,
        )
        body2 = kernel

        def kernel(l_r, bt_r, cb_r, tl_r, am_r, q_r, k_r, v_r, ks_r, vs_r,
                   a_r, qs_r, kn_r, vn_r, o_r, *rest):  # noqa: F811
            # The aliased pool OUTPUT refs replace the input pool refs for
            # the whole kernel: on hardware they are the same HBM buffers
            # (input_output_aliases); in interpret mode the outputs are
            # seeded with the input values, so append writes and sweep
            # reads both see a consistent, mutating pool either way.
            nlse = 1 if return_lse else 0
            lse_outs = rest[:nlse]
            kp_out, vp_out = rest[nlse], rest[nlse + 1]
            scr = rest[nlse + 2:]
            body2(
                l_r, bt_r, cb_r, tl_r, am_r, q_r, kp_out, vp_out, ks_r, vs_r,
                a_r, qs_r, kn_r, vn_r, o_r, *lse_outs, *scr,
            )
    else:
        k_new = jnp.zeros((1, 1, 1), k_pages.dtype)
        v_new = jnp.zeros((1, 1, 1), v_pages.dtype)

    # input_output_aliases indices count ALL pallas_call operands including
    # the scalar-prefetch ones: k_pages is operand 6, v_pages 7
    aliases = {6: 1 + (1 if return_lse else 0),
               7: 2 + (1 if return_lse else 0)} if append else {}
    results = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        lengths, block_tables, col_base, total_lens, append_mask, q_blk,
        k_pages, v_pages, k_scales, v_scales, alibi_slopes, q_scales,
        k_new, v_new,
    )

    inv_idx = None if identity else jnp.asarray(inv)

    def unshuffle(x):
        # inverse of the static lane permutation; surplus zero-q lanes
        # (garbage softmax) are dropped by the gather
        if inv_idx is None:
            return x
        return jnp.take(x, inv_idx, axis=1)

    if append:
        pools = tuple(results[-2:])
        results = results[:-2]
        if return_lse:
            out, lse = results
            return (
                unshuffle(out)[..., :d_orig],
                unshuffle(lse[..., 0:1])[..., 0],
            ) + pools
        return (unshuffle(results[0])[..., :d_orig],) + pools
    if return_lse:
        out, lse = results
        return unshuffle(out)[..., :d_orig], unshuffle(lse[..., 0:1])[..., 0]
    return unshuffle(results[0])[..., :d_orig]


def num_splits_heuristic(
    batch: int, max_pages: int, n_cores: int = 1, max_splits: int = 128
) -> int:
    """Pick the KV split count for decode (the reference's occupancy
    heuristic, flash_api.cpp:154-192, re-derived for TPU cost structure).

    GPU splits exist to fill idle SMs. The TPU analogs of "idle SMs" are
    idle TensorCores (v5p megacore: 2); within one core the sequential
    page-DMA walk already saturates HBM, so extra splits only add merge
    work. Split therefore only when there are fewer batch rows than cores,
    and never beyond the page count.
    """
    if batch >= n_cores:
        return 1
    want = -(-n_cores // max(batch, 1))
    return max(1, min(want, max_pages, max_splits))


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_splits",
        "sm_scale",
        "window",
        "softcap",
        "pages_per_compute_block",
        "return_lse",
        "interpret",
    ),
)
def paged_attention_splitkv(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    lengths: jax.Array,
    block_tables: jax.Array,
    alibi_slopes: Optional[jax.Array] = None,
    *,
    num_splits: int = 0,
    sm_scale: Optional[float] = None,
    window: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    pages_per_compute_block: Optional[int] = None,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
):
    """Split-KV decode in ONE kernel invocation: each (split, sequence) pair
    becomes a virtual batch row of the decode kernel sweeping only its slice
    of the page table, with fp32 partial (out, LSE) outputs LSE-merged by a
    combine pass — the TPU analog of the reference's flash-decoding split
    grid + combine kernel (flash_fwd_kernel.h:475-1055, 1093-1252). Window
    and ALiBi are supported: the kernel receives each row's global column
    base so positions are absolute (flash_fwd_kernel.h:505-512 semantics).

    num_splits=0 picks automatically (num_splits_heuristic): on a
    1-TensorCore chip (v5e) the sequential DMA walk already saturates HBM
    and a single pallas_call has ONE fixed dispatch cost, so auto never
    splits there; on multi-core parts splits map to real cores. Works for
    bf16 and quantized (QuantizedPages) caches.
    """
    batch, h_q, d = q.shape
    from vllm_flash_attn_tpu.kernels.kv_quant import QuantizedPages

    page_size = (
        k_pages.data.shape[1]
        if isinstance(k_pages, QuantizedPages) else k_pages.shape[1]
    )
    max_pages = block_tables.shape[1]
    if num_splits <= 0:
        num_splits = num_splits_heuristic(batch, max_pages)
    S = min(num_splits, max_pages)
    common = dict(
        sm_scale=sm_scale, window=window, softcap=softcap,
        pages_per_compute_block=pages_per_compute_block, interpret=interpret,
    )
    if S <= 1:
        return paged_attention(
            q, k_pages, v_pages, lengths, block_tables, alibi_slopes,
            return_lse=return_lse, **common,
        )

    cp = pl.cdiv(max_pages, S)  # pages per split
    S = pl.cdiv(max_pages, cp)
    lengths = lengths.astype(jnp.int32)
    block_tables = block_tables.astype(jnp.int32)

    # virtual rows r = sp*batch + bb
    pad = S * cp - max_pages
    tables_p = jnp.pad(block_tables, [(0, 0), (0, pad)])
    tables_v = (
        tables_p.reshape(batch, S, cp).swapaxes(0, 1).reshape(S * batch, cp)
    )
    starts = (
        jnp.arange(S, dtype=jnp.int32)[:, None] * (cp * page_size)
    )  # (S, 1)
    lens_v = jnp.clip(lengths[None] - starts, 0, cp * page_size).reshape(-1)
    col_base_v = jnp.broadcast_to(starts, (S, batch)).reshape(-1)
    tot_v = jnp.tile(lengths, (S,))
    q_v = jnp.tile(q, (S, 1, 1))
    alibi_v = None
    if alibi_slopes is not None:
        a = jnp.asarray(alibi_slopes, jnp.float32)
        if a.ndim == 2:
            # per-batch (batch, nheads) slopes (flash_api.cpp:221-237):
            # virtual row r = sp*batch + bb reads row bb's slopes
            alibi_v = jnp.tile(a, (S, 1))
        else:
            alibi_v = a

    out_v, lse_v = paged_attention(
        q_v, k_pages, v_pages, lens_v, tables_v, alibi_v,
        return_lse=True, col_base=col_base_v, total_lens=tot_v, **common,
    )
    out_v = out_v.astype(jnp.float32).reshape(S, batch, h_q, d)
    lse = lse_v.reshape(S, batch, h_q)

    # -inf-safe LSE merge (flash_fwd_kernel.h:1156-1164 semantics: empty
    # splits carry lse=+inf/out=0 from the kernel's zero-length convention —
    # mask them out of the max)
    valid = jnp.isfinite(lse)
    neg = jnp.where(valid, lse, -jnp.inf)
    m = jnp.max(neg, axis=0)  # (b, h)
    w = jnp.where(valid, jnp.exp(neg - m[None]), 0.0)  # (S, b, h)
    denom = jnp.maximum(jnp.sum(w, axis=0), 1e-38)
    merged = jnp.sum(out_v * w[..., None], axis=0) / denom[..., None]
    none_valid = jnp.all(~valid, axis=0)
    merged = jnp.where(none_valid[..., None], 0.0, merged)
    if return_lse:
        mlse = jnp.where(none_valid, jnp.inf, m + jnp.log(denom))
        return merged.astype(q.dtype), mlse
    return merged.astype(q.dtype)
