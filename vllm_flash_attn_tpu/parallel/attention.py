"""Sharded attention wrappers (shard_map over the mesh).

The TPU-native replacement for the reference's single-device kernels invoked
per-rank under torch.distributed: attention heads (and the paged KV pool) are
sharded over the 'model' axis, batch over 'data'; the kernels run unmodified
on each shard (zero communication inside attention — GQA co-location,
SURVEY.md §2.7 / SNIPPETS.md [1]-[2] patterns).

Also provides ring attention over a context axis — sequence-dimension
parallelism for contexts that exceed one device's HBM (an extension beyond the
reference, which caps at single-device 100k keys; SURVEY.md §5.7).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from vllm_flash_attn_tpu.kernels.flash_prefill import flash_attention
from vllm_flash_attn_tpu.kernels.paged_decode import paged_attention


def sharded_flash_attention(
    mesh: Mesh,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    window: Tuple[int, int] = (-1, -1),
    data_axis: str = "data",
    model_axis: str = "model",
):
    """flash_attention with batch on data axis, heads on model axis.

    q/k/v: (b, h, s, d) global; h and h_kv must divide the model-axis size.
    """

    def _attn(q, k, v):
        return flash_attention(
            q, k, v, causal=causal, sm_scale=sm_scale, window=window
        )

    spec = P(data_axis, model_axis, None, None)
    return jax.jit(
        shard_map(
            _attn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )
    )


def sharded_paged_attention(
    mesh: Mesh,
    *,
    sm_scale: Optional[float] = None,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """paged_attention with q heads + KV page pool sharded over 'model',
    batch over 'data' (each data shard owns its requests' pages)."""

    def _attn(q, k_pages, v_pages, lengths, block_tables):
        return paged_attention(
            q, k_pages, v_pages, lengths, block_tables, sm_scale=sm_scale
        )

    return jax.jit(
        shard_map(
            _attn,
            mesh=mesh,
            in_specs=(
                P(data_axis, model_axis, None),       # q (b, h, d)
                P(None, None, model_axis, None),      # k_pages (pages, ps, h_kv, d)
                P(None, None, model_axis, None),      # v_pages
                P(data_axis),                         # lengths
                P(data_axis, None),                   # block_tables
            ),
            out_specs=P(data_axis, model_axis, None),
            check_vma=False,
        )
    )


def ring_attention(
    q: jax.Array,  # (b, h, s_local, d) — seq sharded over axis_name
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    causal: bool = False,
    sm_scale: Optional[float] = None,
):
    """Ring attention over a context-parallel axis (must run inside shard_map).

    KV blocks rotate around the ring via ppermute while each step's partial
    attention (with LSE) merges online — communication fully overlapped with
    the local flash kernel. Bottom-right causal alignment is preserved by
    tracking each block's global offset.
    """
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    b, h, s_loc, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    perm = [(i, (i + 1) % n) for i in range(n)]
    NEG = -0.7 * float(jnp.finfo(jnp.float32).max)

    def partial_attn(q_, k_, v_, shift):
        """Returns unnormalized (o, m, l) for one block pair; shift = global
        column offset minus row offset (None = no causal mask)."""
        s = jnp.einsum(
            "bhqd,bhkd->bhqk",
            q_.astype(jnp.float32), k_.astype(jnp.float32),
        ) * sm_scale
        if shift is not None:
            row = jax.lax.broadcasted_iota(jnp.int32, (s_loc, s_loc), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (s_loc, s_loc), 1)
            mask = (col + shift) <= row
            s = jnp.where(mask[None, None], s, NEG)
        m = jnp.max(s, axis=-1)
        p = jnp.exp(s - m[..., None])
        if shift is not None:
            p = jnp.where(mask[None, None], p, 0.0)
        l = jnp.sum(p, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v_.astype(jnp.float32))
        return o, m, l

    acc = jnp.zeros((b, h, s_loc, d), jnp.float32)
    m_run = jnp.full((b, h, s_loc), -jnp.inf, jnp.float32)
    l_run = jnp.zeros((b, h, s_loc), jnp.float32)
    k_blk, v_blk = k, v
    q_off = my * s_loc

    for step in range(n):
        src = (my - step) % n
        shift = src * s_loc - q_off if causal else None
        o_p, m_p, l_p = partial_attn(q, k_blk, v_blk, shift)
        m_new = jnp.maximum(m_run, m_p)
        a_old = jnp.exp(m_run - m_new)
        a_p = jnp.exp(m_p - m_new)
        acc = acc * a_old[..., None] + o_p * a_p[..., None]
        l_run = l_run * a_old + l_p * a_p
        m_run = m_new
        if step < n - 1:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)

    out = acc / jnp.maximum(l_run, 1e-38)[..., None]
    return out.astype(q.dtype)
