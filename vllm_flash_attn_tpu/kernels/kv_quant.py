"""Quantized KV-cache support (int8 / fp8-e4m3, per-token-per-head scales).

BASELINE.json north star: FP8/INT8 KV cache with dequant fused into the
attention matmuls. The TPU form avoids materializing dequantized K/V entirely:
for scores  s[t,j] = scale_k[t,j] * sum_d k_q[t,j,d]*q[j,d]  the scale folds in
AFTER the d-reduction (one (block, heads) multiply), and for the output the
scale folds INTO p before the PV reduction — two tiny VPU passes instead of a
full-block dequant (see paged_decode.py).

Quantization grain: one scale per (token, kv_head) — the grain the reference's
int8 path uses per page row (boom guide §13) and fine enough for <=0.05 ppl
delta on weights-range activations.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

INT8_MAX = 127.0
FP8_MAX = 448.0  # float8_e4m3fn
# scales are stored lane-padded so one page of scales is a (page_size, 128)
# tile — HBM DMA slices must be 128-aligned in their last dimension
SCALE_LANES = 128


@dataclasses.dataclass
class QuantizedPages:
    """Paged cache payload + scales (a jax pytree; dtype tag is static)."""

    data: jax.Array  # (num_pages, page_size, h_k, d) int8 or float8_e4m3fn
    scales: jax.Array  # (num_pages, page_size, SCALE_LANES) fp32, first h_k used

    def __getitem__(self, idx):
        """Index the leading (layer) dim — keeps the container type so the
        per-layer slice flows straight into the kernels."""
        return QuantizedPages(self.data[idx], self.scales[idx])

    @property
    def shape(self):
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype


jax.tree_util.register_dataclass(
    QuantizedPages, data_fields=["data", "scales"], meta_fields=[]
)


def _qmax(dtype) -> float:
    return INT8_MAX if dtype == jnp.int8 else FP8_MAX


def quantize_kv(x: jax.Array, dtype=jnp.int8) -> Tuple[jax.Array, jax.Array]:
    """Per-(…, head) absmax quantization over the trailing feature dim.

    x: (..., d) -> (values (..., d) in `dtype`, scales (...) fp32).
    """
    qmax = _qmax(dtype)
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax / qmax, 1e-8)
    scaled = x.astype(jnp.float32) / scale[..., None]
    if dtype == jnp.int8:
        vals = jnp.clip(jnp.round(scaled), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    else:
        vals = scaled.astype(dtype)
    return vals, scale


def dequantize_kv(vals: jax.Array, scales: jax.Array) -> jax.Array:
    return vals.astype(jnp.float32) * scales[..., None]


def _pad_scales(scales: jax.Array) -> jax.Array:
    h_k = scales.shape[-1]
    return jnp.pad(scales, [(0, 0)] * (scales.ndim - 1) + [(0, SCALE_LANES - h_k)])


def quantize_pages(
    k_pages: jax.Array, v_pages: jax.Array, dtype=jnp.int8
) -> Tuple[QuantizedPages, QuantizedPages]:
    kq, ks = quantize_kv(k_pages, dtype)
    vq, vs = quantize_kv(v_pages, dtype)
    return (
        QuantizedPages(kq, _pad_scales(ks)),
        QuantizedPages(vq, _pad_scales(vs)),
    )


def page_scales_view(pages: QuantizedPages) -> jax.Array:
    """(num_pages, page_size, h_k) fp32 view of the lane-padded scales."""
    return pages.scales[..., : pages.data.shape[2]]


def append_kv_paged_quantized(
    k_pages: QuantizedPages,
    v_pages: QuantizedPages,
    k_new: jax.Array,  # (b, s_new, h_k, d) float
    v_new: jax.Array,
    lengths: jax.Array,
    block_tables: jax.Array,
    num_new: Optional[jax.Array] = None,
) -> Tuple[QuantizedPages, QuantizedPages]:
    """Quantize-on-append (the serving path: tokens are quantized once as they
    enter the cache; mirrors kv_cache.append_kv_paged)."""
    num_pages, page_size, h_k, d = k_pages.data.shape
    b, s_new = k_new.shape[:2]
    lengths = lengths.astype(jnp.int32)
    pos = lengths[:, None] + jnp.arange(s_new, dtype=jnp.int32)[None]
    page = jnp.take_along_axis(
        block_tables.astype(jnp.int32), pos // page_size, axis=1
    )
    slot = pos % page_size
    flat_idx = (page * page_size + slot).reshape(-1)
    if num_new is not None:
        valid = (
            jnp.arange(s_new, dtype=jnp.int32)[None]
            < num_new[:, None].astype(jnp.int32)
        )
        flat_idx = jnp.where(valid.reshape(-1), flat_idx, num_pages * page_size)
    mode = "drop" if num_new is not None else "promise_in_bounds"

    def put(pages: QuantizedPages, new):
        vals, scales = quantize_kv(new, pages.data.dtype)
        dflat = pages.data.reshape(num_pages * page_size, h_k, d)
        sflat = pages.scales.reshape(num_pages * page_size, SCALE_LANES)
        dflat = dflat.at[flat_idx].set(vals.reshape(-1, h_k, d), mode=mode)
        sflat = sflat.at[flat_idx].set(
            _pad_scales(scales.reshape(-1, h_k)), mode=mode
        )
        return QuantizedPages(
            dflat.reshape(num_pages, page_size, h_k, d),
            sflat.reshape(num_pages, page_size, SCALE_LANES),
        )

    return put(k_pages, k_new), put(v_pages, v_new)
