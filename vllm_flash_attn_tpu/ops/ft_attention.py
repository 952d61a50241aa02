"""Single-query attention (the `csrc/ft_attention` extension surface).

The reference ships FasterTransformer's decode kernel as a separate extension
(/root/reference/csrc/ft_attention/ft_attention.cpp:119-131:
`single_query_attention(q, k, v, k_cache, v_cache, length_per_sample,
rotary_cos, rotary_sin, ..., rotary_dim, rotary_base, neox_style)`), marked
superseded by flash_attn_with_kvcache (csrc/ft_attention/README.md:11-14) but
still part of the surface. Here it is a thin adapter over the same paged/
contiguous decode path — one code path to optimize instead of two kernels.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vllm_flash_attn_tpu.api.interface import flash_attn_with_kvcache
from vllm_flash_attn_tpu.layers.rotary import RotaryEmbedding


def single_query_attention(
    q: jax.Array,  # (b, h, d) — the new token's query
    k: jax.Array,  # (b, h_k, d) — the new token's key
    v: jax.Array,
    k_cache: jax.Array,  # (b, s_max, h_k, d)
    v_cache: jax.Array,
    length_per_sample: Optional[jax.Array],  # (b,) int32 or None (=timestep)
    timestep: int = 0,
    rotary_dim: int = 0,
    rotary_base: float = 10000.0,
    neox_style: bool = True,
):
    """Returns (out (b, h, d), k_cache, v_cache) with the token appended."""
    b = q.shape[0]
    lens = (
        jnp.asarray(length_per_sample, jnp.int32)
        if length_per_sample is not None
        else jnp.full((b,), timestep, jnp.int32)
    )
    if rotary_dim > 0:
        rot = RotaryEmbedding(rotary_dim, rotary_base, interleaved=not neox_style)
        cos, sin = rot.tables(k_cache.shape[1])
    else:
        cos = sin = None
    out, (k_cache, v_cache) = flash_attn_with_kvcache(
        q[:, None], k_cache, v_cache, k[:, None], v[:, None],
        rotary_cos=cos, rotary_sin=sin, cache_seqlens=lens, causal=True,
        rotary_interleaved=not neox_style,
    )
    return out[:, 0], k_cache, v_cache
