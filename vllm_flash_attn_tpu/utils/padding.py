"""Pack/unpack ragged batches (the `flash_attn.bert_padding` surface).

The reference pins `pad_input` / `unpad_input` via `tests/test_flash_attn.py:16`.
These helpers run on *concrete* arrays (host side, outside jit): continuous-batching
servers compute cu_seqlens/indices on the host anyway, and XLA needs static shapes,
so the jitted kernels consume the packed result, never these helpers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def generate_cu_seqlens(seqlens) -> jnp.ndarray:
    """[s0, s1, ...] -> int32 [0, s0, s0+s1, ...] (shape (b+1,)).

    Mirrors the `cu_seqlens_q/k` convention of `mha_varlen_fwd`
    (/root/reference/csrc/flash_attn/flash_api.cpp:423-436).
    """
    seqlens = np.asarray(seqlens, dtype=np.int32)
    return jnp.asarray(np.concatenate([[0], np.cumsum(seqlens)]).astype(np.int32))


def unpad_input(hidden_states, attention_mask):
    """Remove padding tokens.

    Arguments:
        hidden_states: (batch, seqlen, ...)
        attention_mask: (batch, seqlen) bool/int, 1 = valid token.

    Returns:
        (packed (total, ...), indices (total,), cu_seqlens (b+1,), max_seqlen)

    Matches the semantics of `flash_attn.bert_padding.unpad_input` as exercised by
    `/root/reference/tests/test_flash_attn.py` `generate_qkv`.
    """
    mask = np.asarray(attention_mask).astype(bool)
    seqlens = mask.sum(axis=-1).astype(np.int32)
    indices = np.nonzero(mask.reshape(-1))[0].astype(np.int32)
    cu_seqlens = generate_cu_seqlens(seqlens)
    max_seqlen = int(seqlens.max()) if seqlens.size else 0
    flat = jnp.reshape(hidden_states, (-1,) + hidden_states.shape[2:])
    return flat[indices], jnp.asarray(indices), cu_seqlens, max_seqlen


def pad_input(packed, indices, batch, seqlen):
    """Inverse of `unpad_input`: scatter packed tokens back to (batch, seqlen, ...)."""
    flat_shape = (batch * seqlen,) + packed.shape[1:]
    out = jnp.zeros(flat_shape, dtype=packed.dtype)
    out = out.at[jnp.asarray(indices)].set(packed)
    return out.reshape((batch, seqlen) + packed.shape[1:])
