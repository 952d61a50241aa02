"""Megatron-style fused scaled (masked) softmax.

Covers `csrc/fused_softmax` (/root/reference/csrc/fused_softmax/
fused_softmax.cpp:128-147: scaled_masked_softmax_{forward,backward},
scaled_upper_triang_masked_softmax_{forward,backward}).

These exist on GPU to fuse scale+mask+softmax into one warp-level kernel; XLA
performs the identical fusion for the expression below, and the backward comes
from AD, so the TPU-native form is just the math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scaled_masked_softmax(x, mask, scale: float):
    """x: (b, h, sq, sk); mask: broadcastable bool, True = masked OUT."""
    s = x.astype(jnp.float32) * scale
    if mask is not None:
        s = jnp.where(mask, -10000.0, s)
    return jax.nn.softmax(s, axis=-1).astype(x.dtype)


def scaled_upper_triang_masked_softmax(x, scale: float):
    """Causal (upper-triangular masked) variant; x: (b, sq, sk) with sq == sk."""
    sq, sk = x.shape[-2], x.shape[-1]
    mask = (
        jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        > jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
    )
    s = jnp.where(mask, -10000.0, x.astype(jnp.float32) * scale)
    return jax.nn.softmax(s, axis=-1).astype(x.dtype)
