"""Paged KV-cache container threaded through jitted serving steps.

The device-side half of the continuous-batching runtime: per-layer page pools
stacked into single arrays (n_layer, num_pages, page_size, h_kv, head_dim) so
a whole-model step is one pytree in / one pytree out, with the cache buffers
donated for in-place XLA updates. Host-side page accounting lives in
serving/page_allocator.py (C++).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class PagedState:
    """Per-step view of the paged cache (a jax pytree; `mode` is static).

    mode: "decode" (one new token per active sequence), "prefill"
    (multi-token into an EMPTY per-seq cache; `num_new` masks padded tail
    tokens out of the append), or "chunked_prefill" (multi-token into a
    non-empty cache at offset `lengths` — vLLM-style chunked prefill).
    """

    k_pages: jax.Array  # (n_layer, num_pages, page_size, h_kv, d)
    v_pages: jax.Array
    lengths: jax.Array  # (b,) int32 — tokens in cache BEFORE this step
    block_tables: jax.Array  # (b, max_pages) int32
    num_new: jax.Array  # (b,) int32 — tokens this step appends per sequence
    mode: str = "decode"

    @property
    def max_seqlen(self) -> int:
        return self.block_tables.shape[1] * self.k_pages.shape[2]

    @staticmethod
    def allocate(
        n_layer: int,
        num_pages: int,
        page_size: int,
        n_heads_kv: int,
        head_dim: int,
        dtype=jnp.bfloat16,
        pad_head_dim: bool = True,
    ):
        """pad_head_dim lane-pads head_dim to a multiple of 128 at
        ALLOCATION time (flash_api.cpp:312-320 pads to 8 at the same spot):
        the decode/varlen-paged kernels then pad only q per call instead of
        copying the whole pool — the fast path for d = 16/64/odd. Costs
        (128/d)x pool memory for short head dims; pass False to keep the
        exact shape (per-call pool-copy correctness path)."""
        if pad_head_dim:
            head_dim = -(-head_dim // 128) * 128
        shape = (n_layer, num_pages, page_size, n_heads_kv, head_dim)
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


jax.tree_util.register_dataclass(
    PagedState,
    data_fields=["k_pages", "v_pages", "lengths", "block_tables", "num_new"],
    meta_fields=["mode"],
)
