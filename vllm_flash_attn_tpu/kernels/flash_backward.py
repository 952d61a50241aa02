"""Flash-attention backward pass (XLA, linear memory).

The reference fork ships NO attention backward (forward-only build,
/root/reference/setup.py:154-171,285-286); its training framework relies on the
external flash_attn package. Here training is first-class: the forward Pallas
kernel gets a custom_vjp whose backward recomputes per-KV-block score tiles
inside a lax.scan — the FlashAttention-2 backward dataflow (dQ/dK/dV from
saved LSE + O), expressed as XLA ops so the fuser tiles it onto the MXU. Peak
memory is O(sq * block_k) per (b, h), never O(s^2).

GQA stays GROUPED: q/do/lse are viewed (b, h_k, q_per_kv, sq, d) and contract
K/V (b, h_k, sk, d) directly, so K/V are never repeated h/h_k-fold (and the
dK/dV group-sum is fused into the einsum contraction). Inputs keep their
native dtype; every contraction accumulates fp32 via preferred_element_type.

Supports the full forward feature set: bottom-right causal, sliding window,
ALiBi, softcap. KV blocks that fall entirely outside the window/causal band
are skipped with a lax.cond (matters for sliding-window training and sk>sq).
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

    f32 = jnp.float32
    qg = q.reshape(b, h_k, qpk, sq, d)
    dog = do.reshape(b, h_k, qpk, sq, d)
    outg = out.reshape(b, h_k, qpk, sq, d)
    lseg = lse.reshape(b, h_k, qpk, sq)
    D = jnp.einsum(
        "bgpqd,bgpqd->bgpq", dog, outg, preferred_element_type=f32
    )  # (b, h_k, qpk, sq)

    nk = -(-sk // block_k)
    pad = nk * block_k - sk
    kp, vp = k, v
    if pad:
        kp = jnp.pad(kp, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(vp, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kb = kp.reshape(b, h_k, nk, block_k, d).transpose(2, 0, 1, 3, 4)
    vb = vp.reshape(b, h_k, nk, block_k, d).transpose(2, 0, 1, 3, 4)

    row = jnp.arange(sq, dtype=jnp.int32)[:, None]
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if slopes.ndim == 1:
            slopes = jnp.broadcast_to(slopes[None], (b, h))
        slopes = slopes.reshape(b, h_k, qpk)
    else:
        slopes = None

    def compute_block(dq_acc, j, k_j, v_j):
        col = jnp.arange(block_k, dtype=jnp.int32)[None, :] + j * block_k

        s_pre = (
            jnp.einsum("bgpqd,bgkd->bgpqk", qg, k_j, preferred_element_type=f32)
            * sm_scale
        )
        if softcap > 0.0:
            s_capped = jnp.tanh(s_pre / softcap) * softcap
        else:
            s_capped = s_pre
        if slopes is not None:
            bias = -slopes[:, :, :, None, None] * jnp.abs(
                row + offset - col
            ).astype(f32)
            s_b = s_capped + bias
        else:
            s_b = s_capped

        mask = col < sk
        if wr >= 0:
            mask = mask & (col <= row + offset + wr)
        if wl >= 0:
            mask = mask & (col >= row + offset - wl)
        p = jnp.exp(jnp.where(mask, s_b, MASK_NEG) - lseg[..., None])
        p = jnp.where(mask, p, 0.0)  # rows with lse=+inf give p=0 already

        # dK/dV group-sum over qpk fused into the contraction (GQA)
        dv_j = jnp.einsum(
            "bgpqk,bgpqd->bgkd", p, dog, preferred_element_type=f32
        )
        dp = jnp.einsum(
            "bgpqd,bgkd->bgpqk", dog, v_j, preferred_element_type=f32
        )
        ds = p * (dp - D[..., None])
        if softcap > 0.0:
            ds = ds * (1.0 - jnp.square(s_capped / softcap))
        dq_acc = dq_acc + (
            jnp.einsum("bgpqk,bgkd->bgpqd", ds, k_j, preferred_element_type=f32)
            * sm_scale
        )
        dk_j = (
            jnp.einsum("bgpqk,bgpqd->bgkd", ds, qg, preferred_element_type=f32)
            * sm_scale
        )
        return dq_acc, dk_j, dv_j

    def block(carry, inputs):
        dq_acc, j = carry
        k_j, v_j = inputs  # (b, h_k, bk, d)
        # skip KV blocks entirely outside the attended band (sliding window /
        # bottom-right causal with sk > sq) — the CUDA early-exit analog
        lo = j * block_k
        hi = lo + block_k - 1
        active = lo < sk
        if wr >= 0:
            active = jnp.logical_and(active, lo <= (sq - 1) + offset + wr)
        if wl >= 0:
            active = jnp.logical_and(active, hi >= offset - wl)

        def live(_):
            return compute_block(dq_acc, j, k_j, v_j)

        def dead(_):
            z = jnp.zeros((b, h_k, block_k, d), f32)
            return dq_acc, z, z

        dq_acc, dk_j, dv_j = jax.lax.cond(active, live, dead, None)
        return (dq_acc, j + 1), (dk_j, dv_j)

    (dqg, _), (dk_blocks, dv_blocks) = jax.lax.scan(
        block,
        (jnp.zeros((b, h_k, qpk, sq, d), f32), jnp.int32(0)),
        (kb, vb),
    )
    dk = dk_blocks.transpose(1, 2, 0, 3, 4).reshape(b, h_k, nk * block_k, d)
    dv = dv_blocks.transpose(1, 2, 0, 3, 4).reshape(b, h_k, nk * block_k, d)
    dq = dqg.reshape(b, h, sq, d)
    return (
        dq.astype(q.dtype),
        dk[:, :, :sk].astype(k.dtype),
        dv[:, :, :sk].astype(v.dtype),
    )


def mha_backward_varlen(
    q: jax.Array,  # (h, total_q, d) head-major packed
    k: jax.Array,  # (h_k, total_k, d)
    v: jax.Array,
    out: jax.Array,  # (h, total_q, d)
    lse: jax.Array,  # (h, total_q) fp32 (+inf on padding rows)
    do: jax.Array,
    q_info: jax.Array,  # (2, total_q) int32 [seg (-1 pad), pos_aligned]
    k_info: jax.Array,  # (2, total_k) int32 [seg (-2 pad), pos_in_seq]
    alibi_slopes: Optional[jax.Array],  # (h,) fp32 or None
    *,
    window: Tuple[int, int],
    softcap: float,
    sm_scale: float,
    causal: bool,
    block_k: int = 512,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Segment-aware flash backward over packed ragged batches: the varlen
    analog of mha_backward, masking by (q_seg == k_seg) & window(q_pos_aligned,
    k_pos) exactly as the forward kernel does (flash_varlen.py) — so BERT's
    unpad path and packed-batch training backprop through the flash path.
    The reference ships no varlen backward at all (setup.py:154-171)."""
    h, tq, d = q.shape
    h_k, tk = k.shape[0], k.shape[1]
    qpk = h // h_k
    wl, wr = window
    if causal:
        wr = 0

    f32 = jnp.float32
    qg = q.reshape(h_k, qpk, tq, d)
    dog = do.reshape(h_k, qpk, tq, d)
    outg = out.reshape(h_k, qpk, tq, d)
    lseg = lse.reshape(h_k, qpk, tq)
    D = jnp.einsum("gptd,gptd->gpt", dog, outg, preferred_element_type=f32)

    nk = -(-tk // block_k)
    pad = nk * block_k - tk
    kp, vp = k, v
    k_seg, k_pos = k_info[0], k_info[1]
    if pad:
        kp = jnp.pad(kp, ((0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(vp, ((0, 0), (0, pad), (0, 0)))
        k_seg = jnp.pad(k_seg, (0, pad), constant_values=-2)
        k_pos = jnp.pad(k_pos, (0, pad))
    kb = kp.reshape(h_k, nk, block_k, d).transpose(1, 0, 2, 3)
    vb = vp.reshape(h_k, nk, block_k, d).transpose(1, 0, 2, 3)
    ksb = k_seg.reshape(nk, block_k)
    kpb = k_pos.reshape(nk, block_k)

    q_seg = q_info[0][None, :]  # (1, tq) -> broadcast rows
    q_pos = q_info[1][None, :]
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, f32).reshape(h_k, qpk)
    else:
        slopes = None

    def block(dq_acc, inputs):
        k_j, v_j, seg_j, pos_j = inputs
        s_pre = (
            jnp.einsum("gptd,gkd->gptk", qg, k_j, preferred_element_type=f32)
            * sm_scale
        )
        if softcap > 0.0:
            s_capped = jnp.tanh(s_pre / softcap) * softcap
        else:
            s_capped = s_pre
        dist = jnp.abs(q_pos.T - pos_j[None, :]).astype(f32)  # (tq, bk)
        if slopes is not None:
            s_b = s_capped - slopes[:, :, None, None] * dist
        else:
            s_b = s_capped

        mask = q_seg.T == seg_j[None, :]  # (tq, bk)
        if wr >= 0:
            mask = mask & (pos_j[None, :] <= q_pos.T + wr)
        if wl >= 0:
            mask = mask & (pos_j[None, :] >= q_pos.T - wl)
        p = jnp.exp(jnp.where(mask, s_b, MASK_NEG) - lseg[..., None])
        p = jnp.where(mask, p, 0.0)  # padding rows carry lse=+inf -> p=0

        dv_j = jnp.einsum("gptk,gptd->gkd", p, dog, preferred_element_type=f32)
        dp = jnp.einsum("gptd,gkd->gptk", dog, v_j, preferred_element_type=f32)
        ds = p * (dp - D[..., None])
        if softcap > 0.0:
            ds = ds * (1.0 - jnp.square(s_capped / softcap))
        dq_acc = dq_acc + (
            jnp.einsum("gptk,gkd->gptd", ds, k_j, preferred_element_type=f32)
            * sm_scale
        )
        dk_j = (
            jnp.einsum("gptk,gptd->gkd", ds, qg, preferred_element_type=f32)
            * sm_scale
        )
        return dq_acc, (dk_j, dv_j)

    dqg, (dk_blocks, dv_blocks) = jax.lax.scan(
        block,
        jnp.zeros((h_k, qpk, tq, d), f32),
        (kb, vb, ksb, kpb),
    )
    dk = dk_blocks.transpose(1, 0, 2, 3).reshape(h_k, nk * block_k, d)
    dv = dv_blocks.transpose(1, 0, 2, 3).reshape(h_k, nk * block_k, d)
    dq = dqg.reshape(h, tq, d)
    return (
        dq.astype(q.dtype),
        dk[:, :tk].astype(k.dtype),
        dv[:, :tk].astype(v.dtype),
    )
