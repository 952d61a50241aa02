"""Public functional attention API.

Mirrors the 7-function surface of the reference package
(/root/reference/vllm_flash_attn/__init__.py:3-12,
flash_attn_interface.py:658-1253) with JAX arrays. Differences forced by the
functional model, all documented per-function:

- no in-place mutation: `flash_attn_with_kvcache` *returns* the updated caches
  when it appends (donate the cache buffers at your jit boundary to make the
  update in-place at the XLA level).
- `dropout_p` must be 0: this fork compiles dropout out anyway
  (/root/reference/setup.py:204-206).
- `deterministic` is accepted and ignored: the TPU kernels are deterministic by
  construction (fixed reduction order).
- `return_attn_probs` returns the fp32 LSE in place of the dropout-encoded S
  matrix (which only existed for dropout verification,
  flash_api.cpp:352-356).
- `out=` (the reference's pre-allocated output buffer,
  flash_attn_interface.py:1137) is accepted for signature parity but the
  result is RETURNED, never written into `out` — under XLA, buffer reuse is
  what donation does; pass `donate_argnums` at your jit boundary instead.

Layouts follow the reference: batch APIs take (batch, seqlen, nheads, d),
varlen APIs take (total, nheads, d), paged caches are
(num_blocks, page_block_size, nheads_k, d) (flash_attn_interface.py:1183-1187).
The paged cache layout is shared verbatim with the kernels (a page is one
contiguous DMA covering all kv heads), so the kvcache path is zero-copy.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vllm_flash_attn_tpu.kernels.flash_prefill import flash_attention
from vllm_flash_attn_tpu.kernels.flash_varlen import flash_attention_varlen
from vllm_flash_attn_tpu.kernels.kv_cache import append_kv_paged
from vllm_flash_attn_tpu.kernels.paged_decode import paged_attention
from vllm_flash_attn_tpu.kernels.varlen_paged import flash_attention_varlen_paged
from vllm_flash_attn_tpu.layers.rotary import apply_rotary_emb


def _check_dropout(dropout_p):
    if dropout_p != 0.0:
        raise NotImplementedError(
            "dropout_p != 0 is not supported: the reference build is forward-only "
            "with dropout compiled out (setup.py:204-206)."
        )


def _bshd_to_bhsd(x):
    return x.transpose(0, 2, 1, 3)


def flash_attn_func(
    q,
    k,
    v,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,
    deterministic: bool = False,
    return_attn_probs: bool = False,
    out=None,
):
    """Batch fixed-length attention (flash_attn_interface.py:793-869 semantics).

    q: (b, sq, h, d); k/v: (b, sk, h_k, d), h % h_k == 0.
    Returns out (b, sq, h, d); with return_attn_probs, (out, lse, None).
    """
    _check_dropout(dropout_p)
    out = flash_attention(
        _bshd_to_bhsd(q),
        _bshd_to_bhsd(k),
        _bshd_to_bhsd(v),
        alibi_slopes,
        causal=causal,
        sm_scale=softmax_scale,
        window=tuple(window_size),
        softcap=softcap,
        return_lse=return_attn_probs,
    )
    if return_attn_probs:
        o, lse = out
        return _bshd_to_bhsd(o), lse, None
    return _bshd_to_bhsd(out)


def flash_attn_qkvpacked_func(
    qkv,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,
    deterministic: bool = False,
    return_attn_probs: bool = False,
    out=None,
):
    """qkv: (b, s, 3, h, d) (flash_attn_interface.py:658-715)."""
    return flash_attn_func(
        qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
        dropout_p, softmax_scale, causal, window_size, softcap,
        alibi_slopes, deterministic, return_attn_probs,
    )


def flash_attn_kvpacked_func(
    q,
    kv,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,
    deterministic: bool = False,
    return_attn_probs: bool = False,
    out=None,
):
    """kv: (b, s, 2, h_k, d) (flash_attn_interface.py:716-792)."""
    return flash_attn_func(
        q, kv[:, :, 0], kv[:, :, 1],
        dropout_p, softmax_scale, causal, window_size, softcap,
        alibi_slopes, deterministic, return_attn_probs,
    )


def _thd_to_htd(x):
    return x.transpose(1, 0, 2)


def flash_attn_varlen_func(
    q,
    k,
    v,
    cu_seqlens_q,
    cu_seqlens_k,
    max_seqlen_q: int,
    max_seqlen_k: int,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,
    deterministic: bool = False,
    return_attn_probs: bool = False,
    block_table=None,
    seqused_k=None,
    out=None,
):
    """Packed ragged-batch attention (flash_attn_interface.py:1026-1118).

    q: (total_q, h, d). Without `block_table`, k/v: (total_k, h_k, d) packed by
    `cu_seqlens_k`. With `block_table` (b, max_pages), k/v are paged caches
    (num_blocks, page_block_size, h_k, d) and per-sequence key counts come from
    `seqused_k` (or cu_seqlens_k deltas), matching mha_varlen_fwd
    (flash_api.cpp:467-540).
    """
    _check_dropout(dropout_p)
    cu_q = jnp.asarray(cu_seqlens_q, jnp.int32)
    cu_k = jnp.asarray(cu_seqlens_k, jnp.int32)

    if block_table is not None:
        # paged varlen: the ragged paged kernel walks the block table
        # directly — no dense gather (utils.h:412-428 analog); LSE comes
        # straight from the kernel
        lens = (
            jnp.asarray(seqused_k, jnp.int32)
            if seqused_k is not None
            else cu_k[1:] - cu_k[:-1]
        )
        out = flash_attention_varlen_paged(
            _thd_to_htd(q), k, v, cu_q, lens, block_table, max_seqlen_q,
            alibi_slopes, causal=causal, sm_scale=softmax_scale,
            window=tuple(window_size), softcap=softcap,
            return_lse=return_attn_probs,
        )
    else:
        out = flash_attention_varlen(
            _thd_to_htd(q), _thd_to_htd(k), _thd_to_htd(v),
            cu_q, cu_k, seqused_k=seqused_k, alibi_slopes=alibi_slopes,
            causal=causal, sm_scale=softmax_scale, window=tuple(window_size),
            softcap=softcap, return_lse=return_attn_probs,
            max_seqlen_q=int(max_seqlen_q), max_seqlen_k=int(max_seqlen_k),
        )
    if return_attn_probs:
        o, lse = out
        return _thd_to_htd(o), lse, None
    return _thd_to_htd(out)


def flash_attn_varlen_qkvpacked_func(
    qkv,
    cu_seqlens,
    max_seqlen: int,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,
    deterministic: bool = False,
    return_attn_probs: bool = False,
    out=None,
):
    """qkv: (total, 3, h, d) (flash_attn_interface.py:870-934)."""
    return flash_attn_varlen_func(
        qkv[:, 0], qkv[:, 1], qkv[:, 2], cu_seqlens, cu_seqlens,
        max_seqlen, max_seqlen, dropout_p, softmax_scale, causal,
        window_size, softcap, alibi_slopes, deterministic, return_attn_probs,
    )


def flash_attn_varlen_kvpacked_func(
    q,
    kv,
    cu_seqlens_q,
    cu_seqlens_k,
    max_seqlen_q: int,
    max_seqlen_k: int,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,
    deterministic: bool = False,
    return_attn_probs: bool = False,
    out=None,
):
    """kv: (total_k, 2, h_k, d) (flash_attn_interface.py:935-1025)."""
    return flash_attn_varlen_func(
        q, kv[:, 0], kv[:, 1], cu_seqlens_q, cu_seqlens_k,
        max_seqlen_q, max_seqlen_k, dropout_p, softmax_scale, causal,
        window_size, softcap, alibi_slopes, deterministic, return_attn_probs,
    )


def _pick_page_view(s_max: int) -> int:
    for ps in (512, 256, 128, 64, 32, 16, 8):
        if s_max % ps == 0:
            return ps
    return s_max


def flash_attn_with_kvcache(
    q,
    k_cache,
    v_cache,
    k=None,
    v=None,
    rotary_cos=None,
    rotary_sin=None,
    cache_seqlens=None,
    cache_batch_idx=None,
    block_table=None,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    rotary_interleaved: bool = False,
    alibi_slopes=None,
    num_splits: int = 0,
    return_softmax_lse: bool = False,
    out=None,
):
    """Decode/incremental attention over a KV cache
    (flash_attn_interface.py:1119-1253, mha_fwd_kvcache flash_api.cpp:671-936).

    q: (b, sq, h, d). Paged: k_cache (num_blocks, page_block_size, h_k, d) +
    block_table (b, max_pages). Contiguous: k_cache (b_c, s_max, h_k, d) with
    optional cache_batch_idx (mutually exclusive with block_table,
    flash_api.cpp:719). k/v: optional (b, s_new, h_k, d) appended at
    cache_seqlens offsets; rotary_cos/sin (max_s, rotary_dim/2) are fused onto
    q and the appended k.

    Functional-JAX divergence: when k/v are given the updated caches are
    RETURNED — `(out, (k_cache, v_cache))` (+lse first if requested) — instead
    of mutated. `num_splits` routes the single-token path through the
    split-KV kernel (0 = auto via num_splits_heuristic, matching the intent
    of flash_api.cpp:154-192: split only onto idle TensorCores — on v5e the
    kernel's DMA pipeline already saturates HBM without splitting).
    """
    b, sq, h, d = q.shape
    paged = block_table is not None
    if paged:
        assert cache_batch_idx is None, "paged cache excludes cache_batch_idx"
        nb_, ps, h_k, _ = k_cache.shape
        k_pages = k_cache  # reference layout IS the kernel layout — zero copy
        v_pages = v_cache
        tables = jnp.asarray(block_table, jnp.int32)
    else:
        # contiguous cache (b_c, s_max, h_k, d): a pure reshape makes it a
        # paged cache with implicit per-row tables — zero copy.
        b_c, s_max, h_k, _ = k_cache.shape
        ps = _pick_page_view(s_max)
        npg = s_max // ps
        k_pages = k_cache.reshape(b_c * npg, ps, h_k, d)
        v_pages = v_cache.reshape(b_c * npg, ps, h_k, d)
        idx = (
            jnp.asarray(cache_batch_idx, jnp.int32)
            if cache_batch_idx is not None
            else jnp.arange(b, dtype=jnp.int32)
        )
        tables = idx[:, None] * npg + jnp.arange(npg, dtype=jnp.int32)[None]

    if cache_seqlens is None:
        lens = jnp.zeros((b,), jnp.int32)
    elif jnp.ndim(cache_seqlens) == 0:
        lens = jnp.full((b,), cache_seqlens, jnp.int32)
    else:
        lens = jnp.asarray(cache_seqlens, jnp.int32)

    # --- fused rotary on q and appended k (flash_api.cpp:881-905) ---
    # The reference rotates K in flight during the cache copy (src/rotary.h);
    # here rotary runs as an XLA op on the tiny new-token operand before the
    # kernel. Measured equivalent on v5e (round 5, b=8/h=32/d=128 decode with
    # fused append, chained-scan timing): 855us/step with rotary vs 862us
    # without — the 2KB operand's rotation fuses into XLA's pre-kernel pass
    # and costs nothing at large batch.
    if rotary_cos is not None:
        if causal or window_size[1] >= 0 or sq == 1:
            q_pos = lens[:, None] + jnp.arange(sq, dtype=jnp.int32)[None]
        else:
            q_pos = jnp.broadcast_to(lens[:, None], (b, sq))
        q = apply_rotary_emb(
            q, rotary_cos, rotary_sin, interleaved=rotary_interleaved,
            positions=q_pos,
        )
        if k is not None:
            k_pos = lens[:, None] + jnp.arange(k.shape[1], dtype=jnp.int32)[None]
            k = apply_rotary_emb(
                k, rotary_cos, rotary_sin, interleaved=rotary_interleaved,
                positions=k_pos,
            )

    # --- append (flash_api.cpp:830-868) ---
    appended = k is not None
    # single-token decode + single-token append fuses into the kernel (the
    # reference's Append_KV prologue, flash_fwd_kernel.h:671-785): one less
    # XLA pass per step; multi-token/odd-d/split appends use the functional
    # scatter
    from vllm_flash_attn_tpu.config import knob as _config_knob

    fused_append = (
        appended and sq == 1 and k.shape[1] == 1 and num_splits <= 1
        and d % 128 == 0
        # default ON (see modules/mha.py: fused measured free on hardware);
        # VFA_FUSED_APPEND=0 falls back to the XLA scatter
        and _config_knob("fused_append")
    )
    # multi-token append + multi-token query (speculative verify / chunked
    # prefill): the varlen-paged kernel appends in its prologue — ONE device
    # program instead of scatter + attention (the reference Append_KV
    # prologue for seqlen_knew > 1, flash_fwd_kernel.h:671-785)
    fused_append_multi = (
        appended and not fused_append and sq > 1 and d % 128 == 0
        and _config_knob("fused_append")
    )
    if appended and not fused_append and not fused_append_multi:
        assert v is not None
        k_pages, v_pages = append_kv_paged(k_pages, v_pages, k, v, lens, tables)
        total_lens = lens + k.shape[1]
    elif appended:
        total_lens = lens + k.shape[1]
    else:
        total_lens = lens

    # --- attention ---
    if sq == 1 and fused_append:
        out = paged_attention(
            q[:, 0], k_pages, v_pages, total_lens, tables, alibi_slopes,
            sm_scale=softmax_scale, window=tuple(window_size), softcap=softcap,
            return_lse=return_softmax_lse,
            k_new=k[:, 0], v_new=v[:, 0],
        )
        if return_softmax_lse:
            out, lse, k_pages, v_pages = out
            lse = lse[:, None, :].transpose(0, 2, 1)  # (b, h, sq=1)
        else:
            out, k_pages, v_pages = out
        out = out[:, None]  # (b, 1, h, d)
    elif sq == 1:
        from vllm_flash_attn_tpu.kernels.paged_decode import (
            paged_attention_splitkv,
        )

        out = paged_attention_splitkv(
            q[:, 0], k_pages, v_pages, total_lens, tables, alibi_slopes,
            num_splits=num_splits,
            sm_scale=softmax_scale, window=tuple(window_size), softcap=softcap,
            return_lse=return_softmax_lse,
        )
        if return_softmax_lse:
            out, lse = out
            lse = lse[:, None, :].transpose(0, 2, 1)  # (b, h, sq=1)
        out = out[:, None]  # (b, 1, h, d)
    elif not return_softmax_lse:
        # multi-token query (speculative verify / chunked prefill): ragged
        # paged kernel reads exactly the pages it attends to — no dense
        # gather (reference does this in-kernel via the page table,
        # utils.h:412-428); with fused_append_multi the same kernel also
        # writes the new tokens in its prologue
        cu_q = jnp.arange(b + 1, dtype=jnp.int32) * sq
        q_stream = q.reshape(b * sq, h, d).transpose(1, 0, 2)
        app_kw = dict(k_new=k, v_new=v) if fused_append_multi else {}
        o = flash_attention_varlen_paged(
            q_stream, k_pages, v_pages, cu_q, total_lens, tables, sq,
            alibi_slopes, causal=causal, sm_scale=softmax_scale,
            window=tuple(window_size), softcap=softcap, **app_kw,
        )
        if fused_append_multi:
            o, k_pages, v_pages = o
        out = o.transpose(1, 0, 2).reshape(b, sq, h, d)
    else:
        # multi-token + LSE: the ragged paged kernel emits LSE directly —
        # no dense cache gather
        cu_q = jnp.arange(b + 1, dtype=jnp.int32) * sq
        q_stream = q.reshape(b * sq, h, d).transpose(1, 0, 2)
        app_kw = dict(k_new=k, v_new=v) if fused_append_multi else {}
        res = flash_attention_varlen_paged(
            q_stream, k_pages, v_pages, cu_q, total_lens, tables, sq,
            alibi_slopes, causal=causal, sm_scale=softmax_scale,
            window=tuple(window_size), softcap=softcap, return_lse=True,
            **app_kw,
        )
        if fused_append_multi:
            o, lse_flat, k_pages, v_pages = res
        else:
            o, lse_flat = res
        lse = lse_flat.reshape(h, b, sq).transpose(1, 0, 2)
        out = o.transpose(1, 0, 2).reshape(b, sq, h, d)

    results = [out]
    if return_softmax_lse:
        results = [out, lse]
    if appended:
        if paged:
            results.append((k_pages, v_pages))
        else:
            results.append(
                (
                    k_pages.reshape(b_c, s_max, h_k, d),
                    v_pages.reshape(b_c, s_max, h_k, d),
                )
            )
    return tuple(results) if len(results) > 1 else results[0]
