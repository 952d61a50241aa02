"""Pure-JAX reference attention: the numerical oracle for the whole framework.

Re-implements the semantics pinned by the reference test oracle
(`/root/reference/tests/test_flash_attn.py:208-290` ``attention_ref``) in JAX:

- MQA/GQA head broadcast (h % h_k == 0).
- Bottom-right-aligned causal mask for seqlen_q != seqlen_k
  (`flash_attn_interface.py:1051-1061`).
- Sliding-window key range [i + sk - sq - wl, i + sk - sq + wr] inclusive
  (`flash_attn_interface.py:1063-1065`).
- ALiBi bias -slope * |i + sk - sq - j| (`flash_attn_interface.py:1082-1084`).
- Fully-masked rows produce zero output.
- ``upcast`` / ``reorder_ops`` dual-baseline knobs for the 2x-error-budget test
  philosophy (SURVEY.md §4).

This module is deliberately simple, O(s^2)-memory XLA code — it exists to be
obviously correct, not fast.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def construct_local_mask(
    seqlen_q: int,
    seqlen_k: int,
    window_size=(-1, -1),
    query_padding_mask=None,
    key_padding_mask=None,
    key_leftpad=None,
):
    """Boolean mask (True = masked OUT) of shape broadcastable to (b, 1, sq, sk)."""
    row_idx = jnp.arange(seqlen_q, dtype=jnp.int32)[:, None]
    col_idx = jnp.arange(seqlen_k, dtype=jnp.int32)[None, :]
    if key_leftpad is not None:
        key_leftpad = key_leftpad[:, None, None, None]
        col_idx = jnp.broadcast_to(col_idx, (key_leftpad.shape[0], 1, seqlen_q, seqlen_k))
        col_idx = jnp.where(col_idx >= key_leftpad, col_idx - key_leftpad, jnp.iinfo(jnp.int32).max)
    # Effective per-sample k/q lengths for the bottom-right alignment offset.
    if key_padding_mask is None:
        sk = jnp.array(seqlen_k, dtype=jnp.int32)
    else:
        sk = jnp.sum(key_padding_mask.astype(jnp.int32), axis=-1)[:, None, None, None]
    if query_padding_mask is None:
        sq = jnp.array(seqlen_q, dtype=jnp.int32)
    else:
        sq = jnp.sum(query_padding_mask.astype(jnp.int32), axis=-1)[:, None, None, None]
    if window_size[0] < 0:
        return col_idx > row_idx + sk - sq + window_size[1]
    else:
        sk_full = jnp.full_like(col_idx, seqlen_k) if key_padding_mask is None else sk
        return jnp.logical_or(
            col_idx > jnp.minimum(row_idx + sk - sq + window_size[1], sk_full),
            col_idx < row_idx + sk - sq - window_size[0],
        )


def attention_ref(
    q,
    k,
    v,
    query_padding_mask=None,
    key_padding_mask=None,
    attn_bias=None,
    dropout_p: float = 0.0,
    dropout_mask=None,
    causal: bool = False,
    window_size=(-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,
    softmax_scale=None,
    upcast: bool = True,
    reorder_ops: bool = False,
    key_leftpad=None,
):
    """Reference attention.

    Arguments:
        q: (batch, seqlen_q, nheads, head_dim)
        k/v: (batch, seqlen_k, nheads_k, head_dim)
        query_padding_mask: (batch, seqlen_q), bool, True = valid token
        key_padding_mask: (batch, seqlen_k), bool, True = valid token
        attn_bias: broadcastable to (batch, nheads, seqlen_q, seqlen_k)
        dropout_mask: (batch, nheads, seqlen_q, seqlen_k), True = keep
        causal: causal mask, bottom-right aligned
        window_size: (left, right) inclusive sliding window; -1 = infinite
        alibi_slopes: (nheads,) or (batch, nheads)
        upcast: compute in fp32 then cast back (the "gold" oracle)
        reorder_ops: scale K instead of Q before the matmul without upcasting
            (estimates intrinsic low-precision error; "silver" baseline)

    Returns:
        out: (batch, seqlen_q, nheads, head_dim)
        attn: (batch, nheads, seqlen_q, seqlen_k) post-dropout-encoded probs
    """
    if causal:
        window_size = (window_size[0], 0)
    # Normalize one-sided windows the way the reference host layer does
    # (/root/reference/csrc/flash_attn/flash_api.cpp:123-124,289-290): a negative
    # bound paired with a non-negative one means "unbounded on that side".
    _sk = k.shape[1]
    wl, wr = window_size
    if wl >= _sk:
        wl = -1
    if wr >= _sk:
        wr = -1
    if wl < 0 and wr >= 0:
        wl = _sk
    elif wl >= 0 and wr < 0:
        wr = _sk
    window_size = (wl, wr)
    dtype_og = q.dtype
    if upcast:
        q, k, v = q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    b, seqlen_q, h, d = q.shape
    seqlen_k = k.shape[1]
    h_k = k.shape[2]
    if h_k != h:
        k = jnp.repeat(k, h // h_k, axis=2)
        v = jnp.repeat(v, h // h_k, axis=2)
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    if not reorder_ops:
        scores = jnp.einsum("bthd,bshd->bhts", q * softmax_scale, k)
    else:
        scores = jnp.einsum("bthd,bshd->bhts", q, k * softmax_scale)
    if softcap > 0:
        scores = jnp.tanh(scores / softcap) * softcap
    if key_padding_mask is not None:
        scores = jnp.where(key_padding_mask[:, None, None, :], scores, -jnp.inf)
    local_mask = None
    if window_size[0] >= 0 or window_size[1] >= 0:
        local_mask = construct_local_mask(
            seqlen_q, seqlen_k, window_size, query_padding_mask, key_padding_mask, key_leftpad
        )
        scores = jnp.where(local_mask, -jnp.inf, scores)
    if alibi_slopes is not None:
        alibi_slopes = jnp.asarray(alibi_slopes, dtype=jnp.float32)
        if alibi_slopes.ndim == 1:
            alibi_slopes = jnp.broadcast_to(alibi_slopes[None, :], (b, h))
        row_idx = jnp.arange(seqlen_q, dtype=jnp.int32)[:, None]
        col_idx = jnp.arange(seqlen_k, dtype=jnp.int32)[None, :]
        if key_padding_mask is None:
            sk = seqlen_k
        else:
            sk = jnp.sum(key_padding_mask.astype(jnp.int32), axis=-1)[:, None, None, None]
        if query_padding_mask is None:
            sq = seqlen_q
        else:
            sq = jnp.sum(query_padding_mask.astype(jnp.int32), axis=-1)[:, None, None, None]
        relative_pos = jnp.abs(row_idx + sk - sq - col_idx)
        bias = -alibi_slopes[:, :, None, None] * relative_pos.astype(jnp.float32)
        scores = scores + bias.astype(scores.dtype)
    if attn_bias is not None:
        scores = scores + attn_bias
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)
    # Rows that are completely masked (softmax of all -inf -> NaN) output 0.
    if local_mask is not None:
        all_masked = jnp.all(local_mask, axis=-1, keepdims=True)
        attn = jnp.where(all_masked, 0.0, attn)
    if key_padding_mask is not None:
        none_valid = ~jnp.any(key_padding_mask, axis=-1)[:, None, None, None]
        attn = jnp.where(none_valid, 0.0, attn)
    attn = jnp.nan_to_num(attn, nan=0.0)

    dropout_scaling = 1.0 / (1 - dropout_p)
    if dropout_mask is not None:
        attn_drop = jnp.where(dropout_mask, attn, 0.0)
    else:
        attn_drop = attn
    out = jnp.einsum("bhts,bshd->bthd", attn_drop * dropout_scaling, v)
    if query_padding_mask is not None:
        out = jnp.where(query_padding_mask[:, :, None, None], out, 0.0)
    if dropout_mask is not None:
        attn = jnp.where(dropout_mask, attn, -attn)
    return out.astype(dtype_og), attn


def attention_kvpacked_ref(q, kv, *args, **kwargs):
    return attention_ref(q, kv[:, :, 0], kv[:, :, 1], *args, **kwargs)


def attention_qkvpacked_ref(qkv, *args, **kwargs):
    return attention_ref(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], *args, **kwargs)
