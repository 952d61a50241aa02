"""Paged KV-cache update ops.

The reference appends new K/V inside the decode kernel with a benign
duplicate-write race across GQA CTAs
(/root/reference/csrc/flash_attn/src/flash_fwd_kernel.h:671-785). The TPU-native
equivalent is a functional scatter that XLA performs in place when the cache
buffer is donated (`jax.jit(..., donate_argnums)`): no copy, no race, same
single-pass cost — the append writes s_new tokens, negligible next to the
cache-read traffic of attention.

Cache layout: (num_pages, page_size, num_kv_heads, head_dim) — the reference's
own layout (flash_attn_interface.py:1183-1187), which on TPU makes each page a
single contiguous DMA covering all kv heads (see paged_decode.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def append_kv_paged(
    k_pages: jax.Array,  # (num_pages, page_size, h_k, d)
    v_pages: jax.Array,
    k_new: jax.Array,  # (b, s_new, h_k, d)
    v_new: jax.Array,
    lengths: jax.Array,  # (b,) int32: tokens already in cache (append offset)
    block_tables: jax.Array,  # (b, max_pages) int32
    num_new: Optional[jax.Array] = None,  # (b,) int32; default s_new for all
) -> Tuple[jax.Array, jax.Array]:
    """Scatter new tokens into the paged cache at per-sequence offsets.

    Mirrors `mha_fwd_kvcache`'s knew/vnew in-place append
    (flash_api.cpp:830-868). Returns updated (k_pages, v_pages).
    """
    num_pages, page_size, h_k, d = k_pages.shape
    b, s_new = k_new.shape[:2]
    if k_new.shape[-1] != d:
        # lane-padded pool (PagedState.allocate): zero-pad the new tokens
        dw = [(0, 0)] * (k_new.ndim - 1) + [(0, d - k_new.shape[-1])]
        k_new = jnp.pad(k_new, dw)
        v_new = jnp.pad(v_new, dw)
    lengths = lengths.astype(jnp.int32)

    pos = lengths[:, None] + jnp.arange(s_new, dtype=jnp.int32)[None]  # (b, s_new)
    page = jnp.take_along_axis(
        block_tables.astype(jnp.int32), pos // page_size, axis=1
    )
    slot = pos % page_size
    flat_idx = (page * page_size + slot).reshape(-1)  # (b*s_new,) token rows

    if num_new is not None:
        valid = (
            jnp.arange(s_new, dtype=jnp.int32)[None]
            < num_new[:, None].astype(jnp.int32)
        )
        # invalid tokens write to the (clipped-off) end: mode="drop" drops them
        flat_idx = jnp.where(
            valid.reshape(-1), flat_idx, num_pages * page_size
        )

    k_flat = k_pages.reshape(num_pages * page_size, h_k, d)
    v_flat = v_pages.reshape(num_pages * page_size, h_k, d)
    k_vals = k_new.astype(k_pages.dtype).reshape(-1, h_k, d)
    v_vals = v_new.astype(v_pages.dtype).reshape(-1, h_k, d)
    mode = "drop" if num_new is not None else "promise_in_bounds"
    k_flat = k_flat.at[flat_idx].set(k_vals, mode=mode)
    v_flat = v_flat.at[flat_idx].set(v_vals, mode=mode)
    return (
        k_flat.reshape(num_pages, page_size, h_k, d),
        v_flat.reshape(num_pages, page_size, h_k, d),
    )


def gather_kv_paged(
    k_pages: jax.Array,  # (num_pages, page_size, h_k, d)
    v_pages: jax.Array,
    block_tables: jax.Array,  # (b, max_pages)
    max_len: int,
) -> Tuple[jax.Array, jax.Array]:
    """Gather a contiguous (b, h_k, max_len, d) view of the paged cache.

    Used by the multi-token-query kvcache path (speculative verify / chunked
    prefill), where the varlen kernel then runs on the gathered keys.
    """
    num_pages, page_size, h_k, d = k_pages.shape
    b = block_tables.shape[0]
    npg = -(-max_len // page_size)
    tbl = block_tables[:, :npg].astype(jnp.int32).reshape(-1)
    k = jnp.take(k_pages, tbl, axis=0)  # (b*npg, ps, h_k, d)
    v = jnp.take(v_pages, tbl, axis=0)
    k = k.reshape(b, npg * page_size, h_k, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, npg * page_size, h_k, d).transpose(0, 2, 1, 3)
    return k[:, :, :max_len], v[:, :, :max_len]
