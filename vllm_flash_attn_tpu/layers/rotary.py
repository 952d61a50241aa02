"""Rotary position embeddings (RoPE).

Re-implements the surface of `flash_attn.layers.rotary` pinned by
/root/reference/tests/test_rotary.py and the fused in-kernel rotary of
`mha_fwd_kvcache` (/root/reference/csrc/flash_attn/flash_api.cpp:881-905,
csrc/flash_attn/src/rotary.h). Two styles:

- interleaved=False (GPT-NeoX): rotate halves [0:r/2] and [r/2:r]
- interleaved=True (GPT-J): rotate even/odd element pairs

Only the first `rotary_dim` features are rotated; the rest pass through
(rotary_dim % 16 == 0 required by the reference kernel; here any even dim
works). On TPU this is pure-XLA: it fuses into neighbouring matmuls, so a
dedicated kernel (csrc/rotary) is unnecessary.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _rotate_half(x, cos, sin, conj=False):
    r2 = cos.shape[-1]
    x1, x2, rest = x[..., :r2], x[..., r2 : 2 * r2], x[..., 2 * r2 :]
    if conj:
        sin = -sin
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    return jnp.concatenate([o1.astype(x.dtype), o2.astype(x.dtype), rest], axis=-1)


def _rotate_interleaved(x, cos, sin, conj=False):
    r2 = cos.shape[-1]
    xr, rest = x[..., : 2 * r2], x[..., 2 * r2 :]
    shp = xr.shape
    xr = xr.reshape(shp[:-1] + (r2, 2))
    x1, x2 = xr[..., 0], xr[..., 1]
    if conj:
        sin = -sin
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    out = jnp.stack([o1, o2], axis=-1).reshape(shp).astype(x.dtype)
    return jnp.concatenate([out, rest], axis=-1)


def apply_rotary_emb(
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    interleaved: bool = False,
    conj: bool = False,
    positions: Optional[jax.Array] = None,
):
    """Apply RoPE.

    Args:
        x: (..., seqlen, nheads, head_dim) or (batch, seqlen, nheads, head_dim)
        cos/sin: (max_seqlen, rotary_dim/2) fp32 tables.
        positions: optional int32 positions; shape broadcastable to x's
            leading-seq dims, e.g. (batch,) for decode offset or
            (batch, seqlen). Defaults to arange(seqlen).
    """
    seq_axis = x.ndim - 3
    seqlen = x.shape[seq_axis]
    if positions is None:
        pos = jnp.arange(seqlen, dtype=jnp.int32)
    else:
        positions = jnp.asarray(positions, jnp.int32)
        if positions.ndim == 1 and positions.shape[0] == x.shape[0] and x.ndim == 4:
            pos = positions[:, None] + jnp.arange(seqlen, dtype=jnp.int32)[None]
        else:
            pos = positions
    c = jnp.take(cos, pos, axis=0).astype(jnp.float32)  # (..., seq, r/2)
    s = jnp.take(sin, pos, axis=0).astype(jnp.float32)
    # align to (..., seq, 1, r/2) for the heads axis
    c = c[..., :, None, :]
    s = s[..., :, None, :]
    fn = _rotate_interleaved if interleaved else _rotate_half
    return fn(x, c, s, conj=conj)


class RotaryEmbedding:
    """cos/sin table provider (flash_attn.layers.rotary.RotaryEmbedding surface)."""

    def __init__(
        self,
        dim: int,
        base: float = 10000.0,
        interleaved: bool = False,
        scale_base: Optional[float] = None,
    ):
        assert dim % 2 == 0
        self.dim = dim
        self.base = float(base)
        self.interleaved = interleaved
        self.scale_base = scale_base
        self._tables: Tuple[int, Optional[jax.Array], Optional[jax.Array]] = (0, None, None)

    def tables(self, seqlen: int, dtype=jnp.float32):
        # computed in numpy so cached tables are trace-safe constants
        import numpy as np

        cached_len, cos, sin = self._tables
        if cached_len < seqlen:
            inv_freq = 1.0 / (
                self.base
                ** (np.arange(0, self.dim, 2, dtype=np.float32) / self.dim)
            )
            t = np.arange(seqlen, dtype=np.float32)
            freqs = np.outer(t, inv_freq)
            cos, sin = np.cos(freqs), np.sin(freqs)
            self._tables = (seqlen, cos, sin)
        return (
            jnp.asarray(self._tables[1][:seqlen]),
            jnp.asarray(self._tables[2][:seqlen]),
        )

    def __call__(self, qkv: jax.Array, seqlen_offset=0):
        """Rotate q and k of a packed (b, s, 3, h, d) qkv tensor."""
        b, s = qkv.shape[:2]
        cos, sin = self.tables(s + (seqlen_offset if isinstance(seqlen_offset, int) else 0))
        q = apply_rotary_emb(qkv[:, :, 0], cos, sin, self.interleaved)
        k = apply_rotary_emb(qkv[:, :, 1], cos, sin, self.interleaved)
        return jnp.stack([q, k, qkv[:, :, 2]], axis=2)
