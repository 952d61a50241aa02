"""Flash-attention backward pass (XLA, linear memory).

The reference fork ships NO attention backward (forward-only build,
/root/reference/setup.py:154-171,285-286); its training framework relies on the
external flash_attn package. Here training is first-class: the forward Pallas
kernel gets a custom_vjp whose backward recomputes per-KV-block score tiles
inside a lax.scan — the FlashAttention-2 backward dataflow (dQ/dK/dV from
saved LSE + O), expressed as XLA ops so the fuser tiles it onto the MXU. Peak
memory is O(sq * block_k) per (b, h), never O(s^2).

Supports the full forward feature set: bottom-right causal, sliding window,
ALiBi, softcap, GQA (dK/dV summed over the query-head group).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

MASK_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def mha_backward(
    q: jax.Array,  # (b, h, sq, d)
    k: jax.Array,  # (b, h_k, sk, d)
    v: jax.Array,
    out: jax.Array,  # (b, h, sq, d)
    lse: jax.Array,  # (b, h, sq) fp32
    do: jax.Array,  # (b, h, sq, d)
    alibi_slopes: Optional[jax.Array],  # (b, h) fp32 or None
    *,
    causal: bool,
    sm_scale: float,
    window: Tuple[int, int],
    softcap: float,
    block_k: int = 512,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    b, h, sq, d = q.shape
    h_k, sk = k.shape[1], k.shape[2]
    qpk = h // h_k
    wl, wr = window
    if causal:
        wr = 0
    offset = sk - sq

    kf = jnp.repeat(k, qpk, axis=1).astype(jnp.float32)
    vf = jnp.repeat(v, qpk, axis=1).astype(jnp.float32)
    qf = q.astype(jnp.float32)
    dof = do.astype(jnp.float32)
    D = jnp.sum(dof * out.astype(jnp.float32), axis=-1)  # (b, h, sq)

    nk = -(-sk // block_k)
    pad = nk * block_k - sk
    if pad:
        kf = jnp.pad(kf, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kb = kf.reshape(b, h, nk, block_k, d).transpose(2, 0, 1, 3, 4)
    vb = vf.reshape(b, h, nk, block_k, d).transpose(2, 0, 1, 3, 4)

    row = jnp.arange(sq, dtype=jnp.int32)[:, None]
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if slopes.ndim == 1:
            slopes = jnp.broadcast_to(slopes[None], (b, h))
    else:
        slopes = None

    def block(carry, inputs):
        dq_acc, j = carry
        k_j, v_j = inputs  # (b, h, bk, d)
        col = jnp.arange(block_k, dtype=jnp.int32)[None, :] + j * block_k

        s_pre = jnp.einsum("bhqd,bhkd->bhqk", qf, k_j) * sm_scale
        if softcap > 0.0:
            s_capped = jnp.tanh(s_pre / softcap) * softcap
        else:
            s_capped = s_pre
        if slopes is not None:
            bias = -slopes[:, :, None, None] * jnp.abs(
                row + offset - col
            ).astype(jnp.float32)
            s_b = s_capped + bias
        else:
            s_b = s_capped

        mask = col < sk
        if wr >= 0:
            mask = mask & (col <= row + offset + wr)
        if wl >= 0:
            mask = mask & (col >= row + offset - wl)
        p = jnp.exp(jnp.where(mask, s_b, MASK_NEG) - lse[..., None])
        p = jnp.where(mask, p, 0.0)  # rows with lse=+inf give p=0 already

        dv_j = jnp.einsum("bhqk,bhqd->bhkd", p, dof)
        dp = jnp.einsum("bhqd,bhkd->bhqk", dof, v_j)
        ds = p * (dp - D[..., None])
        if softcap > 0.0:
            ds = ds * (1.0 - jnp.square(s_capped / softcap))
        dq_acc = dq_acc + jnp.einsum("bhqk,bhkd->bhqd", ds, k_j) * sm_scale
        dk_j = jnp.einsum("bhqk,bhqd->bhkd", ds, qf) * sm_scale
        return (dq_acc, j + 1), (dk_j, dv_j)

    (dq, _), (dk_blocks, dv_blocks) = jax.lax.scan(
        block, (jnp.zeros_like(qf), jnp.int32(0)), (kb, vb)
    )
    dk_full = dk_blocks.transpose(1, 2, 0, 3, 4).reshape(b, h, nk * block_k, d)
    dv_full = dv_blocks.transpose(1, 2, 0, 3, 4).reshape(b, h, nk * block_k, d)
    dk_full = dk_full[:, :, :sk]
    dv_full = dv_full[:, :, :sk]
    # GQA: sum gradient over the query-head group
    dk = dk_full.reshape(b, h_k, qpk, sk, d).sum(axis=2)
    dv = dv_full.reshape(b, h_k, qpk, sk, d).sum(axis=2)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)
