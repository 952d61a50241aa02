"""Quantized KV-cache support (int8 / fp8-e4m3, per-token-per-head scales).

Production guidance for v5e: use INT8. Measured decode marginal step time vs
bf16 (round-5 in-process A/B, llama-7B MHA shape): int8 0.49x (int8 x int8
MXU QK/PV paths), fp8 5.6x SLOWER — v5e has no native fp8 arithmetic, so the
in-kernel fp8->bf16 cast lowers to scalar bit manipulation that dwarfs the
halved HBM traffic. fp8 remains supported for accuracy studies (ppl delta
-0.018 vs int8's +0.005) and for chips with native fp8.

BASELINE.json north star: FP8/INT8 KV cache with dequant fused into the
attention matmuls. The TPU form avoids materializing dequantized K/V entirely:
for scores  s[t,j] = scale_k[t,j] * sum_d k_q[t,j,d]*q[j,d]  the scale folds in
AFTER the d-reduction (one (block, heads) multiply), and for the output the
scale folds INTO p before the PV reduction — two tiny VPU passes instead of a
full-block dequant (see paged_decode.py).

Quantization grain: one scale per (token, kv_head) — the grain the reference's
int8 path uses per page row and fine enough for <=0.05 ppl delta.

Pool layout (round 4):

- **Packed scales**: k and v scales share ONE (num_pages, page_size, 128)
  fp32 array — k at lanes [0:h], v at lanes [V_SCALE_LANE:V_SCALE_LANE+h] —
  so the decode kernel issues ONE scale DMA per page instead of two (the
  round-3 isolation showed the doubled per-page scale-DMA waits were a large
  part of the int8 marginal-rate gap). The two QuantizedPages views reference
  the same array; `scale_offset` says which lanes belong to this pool.
- **Padded kv heads**: int8/fp8 page DMAs need the head dim 4-sublane-aligned
  on TPU (Mosaic (32,128) int8 tiling), which rejected MQA/tiny-h_kv pools.
  Pools are now allocated with h padded to a 4-aligned multiple of the real
  head count and the data BLOCK-REPLICATED across the padding (pool row g
  stores real head g // (h_pad // h_real)), which keeps the decode kernel's
  lane<->row pairing exactly correct with zero kernel changes. Memory cost:
  h_pad/h_real x on the quantized payload (MQA h_kv=1 -> 4x; still <= bf16
  at int8 for h_kv >= 2 and a capacity win via halved d-bytes elsewhere).
- **Padded head dim**: d is lane-padded (multiple of 128) at allocation so
  odd/short head dims (59, 64, 111...) never trigger the per-call pool-copy
  path in paged_decode (flash_api.cpp:312-320 pads to 8 at the same spot).

All padding is applied by `quantize_pages` / engine allocation; directly
constructed QuantizedPages (old layout) keep working via the meta defaults.
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
# lane where the V scales start inside a packed k/v scale tile
V_SCALE_LANE = 64


def kv_head_pad(h_kv: int) -> int:
    """Smallest multiple of h_kv that is 4-sublane-aligned (int8 tiling)."""
    m = h_kv
    while m % 4:
        m += h_kv
    return m


def lane_pad(d: int) -> int:
    return -(-d // 128) * 128


@dataclasses.dataclass
class QuantizedPages:
    """Paged cache payload + scales (a jax pytree; meta fields are static).

    data: (num_pages, page_size, h_pad, d_pad) int8 or float8_e4m3fn.
    scales: (num_pages, page_size, SCALE_LANES) fp32. This pool's scales
        live at lanes [scale_offset : scale_offset + h_pad]; when k and v
        share a packed array, the k view has scale_offset 0 and the v view
        V_SCALE_LANE (same underlying array — one DMA serves both).
    num_kv_heads: REAL head count (0 = data head dim, no replication). When
        h_pad > num_kv_heads the payload rows are block-replicated copies.
    head_dim: REAL head dim (0 = data head dim, no lane padding).
    """

    data: jax.Array
    scales: jax.Array
    scale_offset: int = 0
    num_kv_heads: int = 0
    head_dim: int = 0

    def __getitem__(self, idx):
        """Index the leading (layer) dim — keeps the container type so the
        per-layer slice flows straight into the kernels."""
        return QuantizedPages(
            self.data[idx], self.scales[idx], self.scale_offset,
            self.num_kv_heads, self.head_dim,
        )

    @property
    def shape(self):
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def h_real(self) -> int:
        return self.num_kv_heads or self.data.shape[-2]

    @property
    def d_real(self) -> int:
        return self.head_dim or self.data.shape[-1]


jax.tree_util.register_dataclass(
    QuantizedPages,
    data_fields=["data", "scales"],
    meta_fields=["scale_offset", "num_kv_heads", "head_dim"],
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


def _replicate_heads(x: jax.Array, h_real: int, h_pad: int, axis: int):
    """Block-replicate the head axis: padded row g = real head
    g // (h_pad // h_real). With the decode kernel pairing q lane l with
    pool row l % h_pad, block replication reproduces the real GQA mapping
    (q head j -> kv head j // (h_q / h_real)) exactly."""
    if h_pad == h_real:
        return x
    return jnp.repeat(x, h_pad // h_real, axis=axis)


def _pack_scales(
    ks: jax.Array, vs: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Pack per-(token, head) k and v scales into one lane-tile, or fall
    back to two separate tiles when the head count doesn't fit."""
    h = ks.shape[-1]
    zpad = [(0, 0)] * (ks.ndim - 1)
    if h <= V_SCALE_LANE:
        packed = jnp.concatenate(
            [
                jnp.pad(ks, zpad + [(0, V_SCALE_LANE - h)]),
                jnp.pad(vs, zpad + [(0, SCALE_LANES - V_SCALE_LANE - h)]),
            ],
            axis=-1,
        )
        return packed, packed
    kp = jnp.pad(ks, zpad + [(0, SCALE_LANES - h)])
    vp = jnp.pad(vs, zpad + [(0, SCALE_LANES - h)])
    return kp, vp


def quantize_pages(
    k_pages: jax.Array, v_pages: jax.Array, dtype=jnp.int8
) -> Tuple[QuantizedPages, QuantizedPages]:
    """Quantize float pools (num_pages, page_size, h_kv, d) into the padded,
    packed-scale layout (see module docstring)."""
    *_, h_kv, d = k_pages.shape
    h_pad = kv_head_pad(h_kv)
    d_pad = lane_pad(d)
    kq, ks = quantize_kv(k_pages, dtype)
    vq, vs = quantize_kv(v_pages, dtype)
    kq = _replicate_heads(kq, h_kv, h_pad, axis=-2)
    vq = _replicate_heads(vq, h_kv, h_pad, axis=-2)
    ks = _replicate_heads(ks, h_kv, h_pad, axis=-1)
    vs = _replicate_heads(vs, h_kv, h_pad, axis=-1)
    if d_pad != d:
        dw = [(0, 0)] * (kq.ndim - 1) + [(0, d_pad - d)]
        kq = jnp.pad(kq, dw)
        vq = jnp.pad(vq, dw)
    ksp, vsp = _pack_scales(ks, vs)
    v_off = V_SCALE_LANE if h_pad <= V_SCALE_LANE else 0
    return (
        QuantizedPages(kq, ksp, 0, h_kv, d),
        QuantizedPages(vq, vsp, v_off, h_kv, d),
    )


def page_scales_view(pages: QuantizedPages) -> jax.Array:
    """(num_pages, page_size, h_pad) fp32 view of this pool's scales."""
    off = pages.scale_offset
    return pages.scales[..., off : off + pages.data.shape[-2]]


def dequantize_pages(pages: QuantizedPages) -> jax.Array:
    """Float pool in the REAL shape (num_pages, page_size, h_real, d_real):
    undoes head block-replication (real head h lives at padded row
    h * (h_pad // h_real)) and d lane padding."""
    h_pad = pages.data.shape[-2]
    h_real = pages.h_real
    d_real = pages.d_real
    full = dequantize_kv(pages.data, page_scales_view(pages))
    if h_pad != h_real:
        rep = h_pad // h_real
        full = full[..., ::rep, :]
    return full[..., :d_real]


def scales_packed(k_pages: QuantizedPages, v_pages: QuantizedPages) -> bool:
    """True when k and v share one packed scale array (one DMA serves both)."""
    return v_pages.scale_offset == V_SCALE_LANE and k_pages.scale_offset == 0


def allocate_quantized_pages(
    num_pages: int,
    page_size: int,
    h_kv: int,
    d: int,
    dtype=jnp.int8,
    n_layer: Optional[int] = None,
) -> Tuple[QuantizedPages, QuantizedPages]:
    """Zero-initialized padded/packed pools (the engine's allocation path).

    With n_layer, the leading dim stacks per-layer pools (index a layer via
    pages[li], which keeps the container type)."""
    h_pad = kv_head_pad(h_kv)
    d_pad = lane_pad(d)
    lead = () if n_layer is None else (n_layer,)
    shape = lead + (num_pages, page_size, h_pad, d_pad)
    sshape = lead + (num_pages, page_size, SCALE_LANES)
    scales = jnp.zeros(sshape, jnp.float32)
    v_off = V_SCALE_LANE if h_pad <= V_SCALE_LANE else 0
    if v_off == 0 and h_pad > V_SCALE_LANE:
        vscales = jnp.zeros(sshape, jnp.float32)
    else:
        vscales = scales
    return (
        QuantizedPages(jnp.zeros(shape, dtype), scales, 0, h_kv, d),
        QuantizedPages(jnp.zeros(shape, dtype), vscales, v_off, h_kv, d),
    )


def append_kv_paged_quantized(
    k_pages: QuantizedPages,
    v_pages: QuantizedPages,
    k_new: jax.Array,  # (b, s_new, h_real, d_real) float
    v_new: jax.Array,
    lengths: jax.Array,
    block_tables: jax.Array,
    num_new: Optional[jax.Array] = None,
) -> Tuple[QuantizedPages, QuantizedPages]:
    """Quantize-on-append (the serving path: tokens are quantized once as they
    enter the cache; mirrors kv_cache.append_kv_paged). Handles head
    replication, d lane padding, and packed scale tiles."""
    num_pages, page_size, h_pad, d_pad = k_pages.data.shape
    h_real = k_new.shape[-2]
    d_real = k_new.shape[-1]
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
    packed = scales_packed(k_pages, v_pages)

    def prep(pages: QuantizedPages, new):
        vals, scales = quantize_kv(new, pages.data.dtype)  # (b,s,h,d),(b,s,h)
        vals = _replicate_heads(vals, h_real, h_pad, axis=-2)
        scales = _replicate_heads(scales, h_real, h_pad, axis=-1)
        if d_pad != d_real:
            vals = jnp.pad(
                vals, [(0, 0), (0, 0), (0, 0), (0, d_pad - d_real)]
            )
        return vals.reshape(-1, h_pad, d_pad), scales.reshape(-1, h_pad)

    kv_vals, ks = prep(k_pages, k_new)
    vv_vals, vs = prep(v_pages, v_new)
    k_dat = k_pages.data.reshape(num_pages * page_size, h_pad, d_pad)
    v_dat = v_pages.data.reshape(num_pages * page_size, h_pad, d_pad)
    k_dat = k_dat.at[flat_idx].set(kv_vals, mode=mode)
    v_dat = v_dat.at[flat_idx].set(vv_vals, mode=mode)
    zpad = [(0, 0)]
    if packed:
        row = jnp.concatenate(
            [
                jnp.pad(ks, zpad + [(0, V_SCALE_LANE - h_pad)]),
                jnp.pad(vs, zpad + [(0, SCALE_LANES - V_SCALE_LANE - h_pad)]),
            ],
            axis=-1,
        )
        sflat = k_pages.scales.reshape(num_pages * page_size, SCALE_LANES)
        sflat = sflat.at[flat_idx].set(row, mode=mode)
        k_scales = v_scales = sflat.reshape(num_pages, page_size, SCALE_LANES)
    else:
        ksf = k_pages.scales.reshape(num_pages * page_size, SCALE_LANES)
        vsf = v_pages.scales.reshape(num_pages * page_size, SCALE_LANES)
        ksf = ksf.at[flat_idx].set(
            jnp.pad(ks, zpad + [(0, SCALE_LANES - h_pad)]), mode=mode
        )
        vsf = vsf.at[flat_idx].set(
            jnp.pad(vs, zpad + [(0, SCALE_LANES - h_pad)]), mode=mode
        )
        k_scales = ksf.reshape(num_pages, page_size, SCALE_LANES)
        v_scales = vsf.reshape(num_pages, page_size, SCALE_LANES)

    return (
        QuantizedPages(
            k_dat.reshape(num_pages, page_size, h_pad, d_pad), k_scales,
            k_pages.scale_offset, k_pages.num_kv_heads, k_pages.head_dim,
        ),
        QuantizedPages(
            v_dat.reshape(num_pages, page_size, h_pad, d_pad), v_scales,
            v_pages.scale_offset, v_pages.num_kv_heads, v_pages.head_dim,
        ),
    )
