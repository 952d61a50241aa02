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

    KV blocks rotate around the ring via ppermute; each ring step runs the
    LOCAL FLASH KERNEL (O(s_loc·d) memory — no s_loc² score matrix) and its
    normalized partial output merges into the running result via the
    -inf-safe LSE merge (same math as the reference's split-KV combine,
    flash_fwd_kernel.h:1156-1164). The next block's ppermute is issued
    before the current step's kernel so XLA's latency-hiding scheduler can
    overlap communication with compute. Under causal, ring steps whose KV
    block is entirely in the masked future are skipped via lax.cond
    (compute only; the rotation still happens). Forward-only (the merge
    consumes the kernel's LSE output, which bypasses the custom-VJP path).

    Block-to-rank causal geometry: q rows of rank r span
    [r·s_loc, (r+1)·s_loc); at ring step t the resident KV block came from
    rank src = (r - t) % n. src == r is the causal diagonal (local flash
    causal), src < r is fully visible, src > r fully masked.
    """
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    b, h, s_loc, d = q.shape
    perm = [(i, (i + 1) % n) for i in range(n)]

    def flash_part(q_, k_, v_, diag: bool):
        return flash_attention(
            q_, k_, v_, causal=(causal and diag), sm_scale=sm_scale,
            return_lse=True,
        )

    # step 0: the local (diagonal) block
    o0, lse_run = flash_part(q, k, v, diag=True)
    acc = o0.astype(jnp.float32)
    k_blk, v_blk = k, v

    for step in range(1, n):
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        src = (my - step) % n

        if causal:
            o_p, lse_p = jax.lax.cond(
                src < my,
                lambda k_=k_blk, v_=v_blk: tuple(
                    (x.astype(jnp.float32) if i == 0 else x)
                    for i, x in enumerate(flash_part(q, k_, v_, diag=False))
                ),
                lambda: (
                    jnp.zeros((b, h, s_loc, d), jnp.float32),
                    jnp.full((b, h, s_loc), -jnp.inf, jnp.float32),
                ),
            )
        else:
            o_p, lse_p = flash_part(q, k_blk, v_blk, diag=False)
            o_p = o_p.astype(jnp.float32)

        # merge two normalized partials by their LSEs (stable; lse_run is
        # finite after step 0 — every causal row sees >=1 key on the diagonal)
        m = jnp.maximum(lse_run, lse_p)
        w_run = jnp.exp(lse_run - m)
        w_p = jnp.where(jnp.isfinite(lse_p), jnp.exp(lse_p - m), 0.0)
        denom = w_run + w_p
        acc = (acc * w_run[..., None] + o_p * w_p[..., None]) / denom[..., None]
        lse_run = m + jnp.log(denom)

    return acc.astype(q.dtype)
