"""Pallas TPU paged-KV decode attention (the `flash_attn_with_kvcache` core).

TPU-native re-design of the reference split-KV decode path
(/root/reference/csrc/flash_attn/flash_api.cpp:671-936,
csrc/flash_attn/src/flash_fwd_kernel.h:475-1055):

- per-thread page-slice resolution (utils.h:412-428)  -> one async DMA per page,
  all started concurrently, double-buffered against compute
- CUDA split-KV + combine kernel                      -> sequential kv-block walk
  per (batch, kv_head) with online softmax in VMEM; parallelism comes from the
  (batch x kv_head x megacore) grid, and the DMA pipeline hides HBM latency
- GQA ngroups<->seqlen_q swap (flash_api.cpp:298-305) -> the q-head group IS the
  matmul row dimension: q arrives as (b, h_kv, q_per_kv, d)

Cache layout is head-major `(num_kv_heads, num_pages, page_size, head_dim)` so a
page DMA is one contiguous HBM stream (the reference's (num_blocks, page,
h_k, d) layout interleaves heads; see flash_attn_interface.py:1183-1187).

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

from vllm_flash_attn_tpu.config import use_interpret
from vllm_flash_attn_tpu.kernels.flash_prefill import DEFAULT_MASK_VALUE, MIN_LANES


class _PageGather:
    """Issue one async copy per KV page of a compute block (pages are
    non-contiguous in HBM, so one strided DMA cannot fetch them)."""

    def __init__(self, pages_hbm_ref, vmem_buf, sem, block_tables_ref, h, b,
                 start_page, num_pages):
        self._copies = []
        for i in range(num_pages):
            page_idx = block_tables_ref[b, start_page + i]
            self._copies.append(
                pltpu.make_async_copy(
                    pages_hbm_ref.at[h, page_idx],
                    vmem_buf.at[i],
                    sem,
                )
            )

    def start(self):
        for c in self._copies:
            c.start()

    def wait(self):
        for c in self._copies:
            c.wait()


def _decode_kernel(
    # scalar prefetch
    lengths_ref,  # (b,)
    block_tables_ref,  # (b, max_pages)
    # inputs
    q_ref,  # (1, 1, q_rows, d) VMEM
    k_pages_ref,  # (h_kv, num_pages, page_size, d) ANY/HBM
    v_pages_ref,
    alibi_ref,  # SMEM (1, h_q)
    # outputs
    o_ref,  # (1, 1, q_rows, d)
    lse_ref,  # (1, 1, q_rows, MIN_LANES) or None
    # scratch
    k_buf,  # (2, ppb, page_size, d)
    v_buf,
    sems,  # DMA (2, 2)
    m_scr,
    l_scr,
    acc_scr,
    buf_idx_ref,  # SMEM (1,)
    *,
    batch: int,
    num_kv_heads: int,
    q_per_kv: int,
    page_size: int,
    pages_per_block: int,
    num_blocks_grid: int,
    sm_scale: float,
    window: Tuple[int, int],
    has_alibi: bool,
    softcap: float,
    mask_value: float = DEFAULT_MASK_VALUE,
):
    core = pl.program_id(0)
    ncores = pl.num_programs(0)
    b = pl.program_id(1) * ncores + core
    h = pl.program_id(2)
    i = pl.program_id(3)
    bk = page_size * pages_per_block

    length = jnp.where(b < batch, lengths_ref[jnp.minimum(b, batch - 1)], 0)
    nb = jnp.maximum(pl.cdiv(length, bk), 1)  # empty seq still runs 1 masked block

    def next_indices(b_, h_, i_):
        # grid order: b outer, h middle, i inner; advance past invalid i
        len_n = jnp.where(
            b_ < batch, lengths_ref[jnp.minimum(b_, batch - 1)], 0
        )
        nb_n = jnp.maximum(pl.cdiv(len_n, bk), 1)
        roll_i = i_ >= nb_n
        h2 = jnp.where(roll_i, h_ + 1, h_)
        i2 = jnp.where(roll_i, 0, i_)
        roll_h = h2 >= num_kv_heads
        b2 = jnp.where(roll_h, b_ + ncores, b_)
        h3 = jnp.where(roll_h, 0, h2)
        return b2, h3, i2

    def start_fetch(b_, h_, i_, slot):
        @pl.when(b_ < batch)
        def _():
            start_page = i_ * pages_per_block
            _PageGather(
                k_pages_ref, k_buf.at[slot], sems.at[slot, 0],
                block_tables_ref, h_, b_, start_page, pages_per_block,
            ).start()
            _PageGather(
                v_pages_ref, v_buf.at[slot], sems.at[slot, 1],
                block_tables_ref, h_, b_, start_page, pages_per_block,
            ).start()

    is_first_step = jnp.logical_and(
        jnp.logical_and(pl.program_id(1) == 0, h == 0), i == 0
    )

    @pl.when(jnp.logical_and(i < nb, b < batch))
    def _run():
        @pl.when(is_first_step)
        def _prefetch_first():
            buf_idx_ref[0] = 0
            start_fetch(b, h, i, 0)

        slot = buf_idx_ref[0]

        # prefetch next valid block into the other buffer
        nb_, nh, ni = next_indices(b, h, i + 1)

        @pl.when(nb_ < batch)
        def _prefetch_next():
            start_fetch(nb_, nh, ni, 1 - slot)

        buf_idx_ref[0] = 1 - slot

        @pl.when(i == 0)
        def _init():
            m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
            l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
            acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

        # wait for all K page DMAs (each wait matches one page-sized copy)
        for pg in range(pages_per_block):
            pltpu.make_async_copy(
                k_pages_ref.at[h, 0], k_buf.at[slot, pg], sems.at[slot, 0]
            ).wait()
        k = k_buf[slot].reshape(bk, k_buf.shape[-1])  # (bk, d)

        q = q_ref[0, 0]  # (q_rows, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (q_rows, bk)
        s *= sm_scale
        if softcap > 0.0:
            s = jnp.tanh(s / softcap) * softcap

        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * bk
        mask = col < length
        wl, wr = window
        # decode row position is length-1 (single new token per sequence)
        if wl >= 0:
            mask &= col >= length - 1 - wl
        if wr >= 0:
            mask &= col <= length - 1 + wr

        if has_alibi:
            # slope per q head: rows are the q heads of this kv-head group
            slopes = alibi_ref[0, pl.ds(h * q_per_kv, q_per_kv)]
            dist = jnp.abs((length - 1) - col).astype(jnp.float32)
            s = s - slopes[:, None] * dist

        s = jnp.where(mask, s, mask_value)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        p = jnp.where(mask, p, 0.0)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = l_next

        # wait V, compute PV
        for pg in range(pages_per_block):
            pltpu.make_async_copy(
                v_pages_ref.at[h, 0], v_buf.at[slot, pg], sems.at[slot, 1]
            ).wait()
        v = v_buf[slot].reshape(bk, v_buf.shape[-1])
        pv = jax.lax.dot(
            p.astype(jnp.float32), v.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

        @pl.when(i == nb - 1)
        def _store():
            l = l_scr[...][:, :1]
            l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
            o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
            if lse_ref is not None:
                m_fin = m_scr[...][:, :1]
                lse = jnp.where(l == 0.0, jnp.inf, m_fin + jnp.log(l))
                lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale",
        "window",
        "softcap",
        "pages_per_compute_block",
        "return_lse",
        "interpret",
    ),
)
def paged_attention(
    q: jax.Array,  # (batch, num_q_heads, head_dim)
    k_pages: jax.Array,  # (num_kv_heads, num_pages, page_size, head_dim)
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
    interpret: Optional[bool] = None,
):
    """Single-token decode over a paged KV cache.

    Returns out (batch, num_q_heads, head_dim) [, lse (batch, num_q_heads)].
    """
    batch, h_q, d = q.shape
    h_kv, num_pages, page_size, _ = k_pages.shape
    assert h_q % h_kv == 0
    q_per_kv = h_q // h_kv
    max_pages = block_tables.shape[1]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = use_interpret()
    if pages_per_compute_block is None:
        # target ~512-token compute blocks
        pages_per_compute_block = max(1, min(max_pages, 512 // page_size))
    ppb = pages_per_compute_block
    num_blocks_grid = pl.cdiv(max_pages, ppb)
    lengths = lengths.astype(jnp.int32)
    block_tables = block_tables.astype(jnp.int32)

    has_alibi = alibi_slopes is not None
    if has_alibi:
        alibi_slopes = jnp.asarray(alibi_slopes, jnp.float32).reshape(1, h_q)
    else:
        alibi_slopes = jnp.zeros((1, 1), jnp.float32)

    q4 = q.reshape(batch, h_kv, q_per_kv, d)

    kernel = functools.partial(
        _decode_kernel,
        batch=batch,
        num_kv_heads=h_kv,
        q_per_kv=q_per_kv,
        page_size=page_size,
        pages_per_block=ppb,
        num_blocks_grid=num_blocks_grid,
        sm_scale=float(sm_scale),
        window=tuple(int(w) for w in window),
        has_alibi=has_alibi,
        softcap=float(softcap),
    )
    if not return_lse:
        body = kernel

        def kernel(l_r, bt_r, q_r, k_r, v_r, a_r, o_r, *scr):  # noqa: F811
            body(l_r, bt_r, q_r, k_r, v_r, a_r, o_r, None, *scr)

    ncores = 1  # megacore split reserved (v5e has a single TensorCore)
    grid = (ncores, batch, h_kv, num_blocks_grid)

    out_shape = [jax.ShapeDtypeStruct((batch, h_kv, q_per_kv, d), q.dtype)]
    out_specs = [
        pl.BlockSpec(
            (1, 1, q_per_kv, d),
            lambda c, b, h, i, *refs, nc=ncores: (b * nc + c, h, 0, 0),
        )
    ]
    if return_lse:
        out_shape.append(
            jax.ShapeDtypeStruct((batch, h_kv, q_per_kv, MIN_LANES), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, 1, q_per_kv, MIN_LANES),
                lambda c, b, h, i, *refs, nc=ncores: (b * nc + c, h, 0, 0),
            )
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, q_per_kv, d),
                lambda c, b, h, i, *refs, nc=ncores: (b * nc + c, h, 0, 0),
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, ppb, page_size, d), k_pages.dtype),
            pltpu.VMEM((2, ppb, page_size, d), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((q_per_kv, MIN_LANES), jnp.float32),
            pltpu.VMEM((q_per_kv, MIN_LANES), jnp.float32),
            pltpu.VMEM((q_per_kv, d), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )

    results = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, block_tables, q4, k_pages, v_pages, alibi_slopes)

    if return_lse:
        out, lse = results
        return out.reshape(batch, h_q, d), lse[..., 0].reshape(batch, h_q)
    return results[0].reshape(batch, h_q, d)
