"""Paged KV-cache update ops.

The reference appends new K/V inside the decode kernel with a benign
duplicate-write race across GQA CTAs
(/root/reference/csrc/flash_attn/src/flash_fwd_kernel.h:671-785). The TPU-native
equivalent is a functional scatter that XLA performs in place when the cache
buffer is donated (`jax.jit(..., donate_argnums)`): no copy, no race, same
single-pass cost — the append writes s_new tokens, negligible next to the
cache-read traffic of attention.

Cache layout: (num_kv_heads, num_pages, page_size, head_dim) — head-major so
the decode kernel's page DMAs are contiguous (see paged_decode.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def append_kv_paged(
    k_pages: jax.Array,  # (h_k, num_pages, page_size, d)
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
    h_k, num_pages, page_size, d = k_pages.shape
    b, s_new = k_new.shape[:2]
    lengths = lengths.astype(jnp.int32)

    pos = lengths[:, None] + jnp.arange(s_new, dtype=jnp.int32)[None]  # (b, s_new)
    page = jnp.take_along_axis(
        block_tables.astype(jnp.int32), pos // page_size, axis=1
    )  # (b, s_new)
    slot = pos % page_size
    flat_idx = (page * page_size + slot).reshape(-1)  # (b*s_new,)

    if num_new is not None:
        valid = jnp.arange(s_new, dtype=jnp.int32)[None] < num_new[:, None].astype(jnp.int32)
        # out-of-range writes dropped by scatter when index out of bounds is
        # clipped; redirect invalid tokens to a sacrificial index instead
        flat_idx = jnp.where(valid.reshape(-1), flat_idx, num_pages * page_size)

    k_flat = k_pages.reshape(h_k, num_pages * page_size, d)
    v_flat = v_pages.reshape(h_k, num_pages * page_size, d)
    k_vals = k_new.astype(k_pages.dtype).transpose(2, 0, 1, 3).reshape(h_k, -1, d)
    v_vals = v_new.astype(v_pages.dtype).transpose(2, 0, 1, 3).reshape(h_k, -1, d)
    mode = "drop" if num_new is not None else "promise_in_bounds"
    k_flat = k_flat.at[:, flat_idx].set(k_vals, mode=mode)
    v_flat = v_flat.at[:, flat_idx].set(v_vals, mode=mode)
    return (
        k_flat.reshape(h_k, num_pages, page_size, d),
        v_flat.reshape(h_k, num_pages, page_size, d),
    )


def gather_kv_paged(
    k_pages: jax.Array,
    v_pages: jax.Array,
    block_tables: jax.Array,  # (b, max_pages)
    max_len: int,
) -> Tuple[jax.Array, jax.Array]:
    """Gather a contiguous (b, h_k, max_len, d) view of the paged cache.

    Used by the multi-token-query kvcache path (speculative verify / chunked
    prefill), where the dense prefill kernel then runs on the gathered keys.
    """
    h_k, num_pages, page_size, d = k_pages.shape
    b, max_pages = block_tables.shape
    npages_needed = -(-max_len // page_size)
    tbl = block_tables[:, :npages_needed].astype(jnp.int32)  # (b, p)
    k = jnp.take(k_pages, tbl.reshape(-1), axis=1)  # (h_k, b*p, ps, d)
    v = jnp.take(v_pages, tbl.reshape(-1), axis=1)
    k = k.reshape(h_k, b, npages_needed * page_size, d).transpose(1, 0, 2, 3)
    v = v.reshape(h_k, b, npages_needed * page_size, d).transpose(1, 0, 2, 3)
    return k[:, :, :max_len], v[:, :, :max_len]
