"""Multi-head attention modules (the `flash_attn.modules.mha` surface:
MHA / ParallelMHA, pinned by /root/reference/tests/modules/test_mha_parallel.py).

Functional param-dict style: `init(key)` builds the parameter pytree,
`apply(params, x, ...)` runs the module. ParallelMHA is written for use inside
`shard_map` with an explicit tensor-parallel axis name: Wqkv is head-sharded
(column-parallel), out_proj is row-parallel with a trailing psum — the
Megatron layout (SURVEY.md §2.7), with GQA KV heads co-located with their query
group so attention itself needs zero communication.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_flash_attn_tpu.api.interface import flash_attn_func, flash_attn_with_kvcache
from vllm_flash_attn_tpu.kernels.flash_prefill import flash_attention
from vllm_flash_attn_tpu.layers.rotary import RotaryEmbedding, apply_rotary_emb


def standard_alibi_slopes(num_heads: int) -> np.ndarray:
    """The canonical geometric ALiBi slopes (press et al.; matches the HF
    implementations for baichuan-13B / BTLM / falcon-alibi)."""
    import math

    def pow2(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(num_heads).is_integer():
        return np.asarray(pow2(num_heads), np.float32)
    closest = 2 ** math.floor(math.log2(num_heads))
    base = pow2(closest)
    extra = pow2(2 * closest)[0::2][: num_heads - closest]
    return np.asarray(base + extra, np.float32)


def paged_cache_attention(
    q, k, v, state, layer_idx, rotary, rotary_interleaved, softmax_scale,
    window_size, causal, alibi_slopes=None,
):
    """Shared paged-serving attention core (serial MHA and ParallelMHA — in
    the parallel case q/k/v and the page pools hold this model shard's heads).

    decode: fused RoPE at position length, append one token, paged kernel.
    prefill: RoPE over the prompt, bulk-append (padded tail masked via
    num_new), causal flash attention over the prompt itself — the cache
    starts empty for the admitted sequence, so no cache read is needed.
    Mutates `state`'s page pools in place (functionally).
    """
    from vllm_flash_attn_tpu.kernels.flash_prefill import flash_attention
    from vllm_flash_attn_tpu.kernels.kv_cache import append_kv_paged
    from vllm_flash_attn_tpu.kernels.kv_quant import (
        QuantizedPages,
        append_kv_paged_quantized,
        scales_packed,
    )
    from vllm_flash_attn_tpu.kernels.paged_decode import paged_attention

    li = layer_idx
    s_len = q.shape[1]
    if rotary is not None:
        cos, sin = rotary.tables(state.max_seqlen)
        pos = state.lengths[:, None] + jnp.arange(s_len, dtype=jnp.int32)[None]
        q = apply_rotary_emb(q, cos, sin, rotary_interleaved, positions=pos)
        k = apply_rotary_emb(k, cos, sin, rotary_interleaved, positions=pos)

    quantized = isinstance(state.k_pages, QuantizedPages)
    d_model = q.shape[-1]
    from vllm_flash_attn_tpu.config import knob as _config_knob

    if (
        state.mode == "decode"
        and not quantized
        # lane-aligned POOL (allocation-padded or naturally aligned): the
        # kernel pads q host-side, so fused append works for any model d
        and state.k_pages.shape[-1] % 128 == 0
        # default ON: the clean one-process hardware comparison measured
        # fused append+attend at 1497us/step vs 1586us attend-only (b8,
        # ctx2048) — the in-kernel prologue is free; VFA_FUSED_APPEND=0
        # falls back to the XLA scatter
        and _config_knob("fused_append")
    ):
        # fused in-kernel append + attention (flash_fwd_kernel.h:671-785
        # analog): the kernel writes each active row's new token into its
        # page slot before the sweep — no separate XLA scatter pass.
        # Mid-prefill / inactive slots are masked out via num_new.
        out, kp, vp = paged_attention(
            q[:, 0], state.k_pages[li], state.v_pages[li],
            state.lengths + state.num_new, state.block_tables, alibi_slopes,
            sm_scale=softmax_scale, window=window_size,
            k_new=k[:, 0], v_new=v[:, 0], append_mask=state.num_new,
        )
        state.k_pages = jax.lax.dynamic_update_index_in_dim(
            state.k_pages, kp, li, 0
        )
        state.v_pages = jax.lax.dynamic_update_index_in_dim(
            state.v_pages, vp, li, 0
        )
        return out[:, None]  # (b, 1, h, d)
    if quantized:
        kp, vp = append_kv_paged_quantized(
            state.k_pages[li], state.v_pages[li], k, v,
            state.lengths, state.block_tables, num_new=state.num_new,
        )
        upd = jax.lax.dynamic_update_index_in_dim
        new_k_scales = upd(state.k_pages.scales, kp.scales, li, 0)
        # packed layout: k and v share ONE scale array — update it once and
        # reference it from both views (a second update would drop the k half)
        packed = scales_packed(state.k_pages, state.v_pages)
        new_v_scales = (
            new_k_scales
            if packed
            else upd(state.v_pages.scales, vp.scales, li, 0)
        )
        state.k_pages = QuantizedPages(
            upd(state.k_pages.data, kp.data, li, 0), new_k_scales,
            state.k_pages.scale_offset, state.k_pages.num_kv_heads,
            state.k_pages.head_dim,
        )
        state.v_pages = QuantizedPages(
            upd(state.v_pages.data, vp.data, li, 0), new_v_scales,
            state.v_pages.scale_offset, state.v_pages.num_kv_heads,
            state.v_pages.head_dim,
        )
    else:
        kp, vp = append_kv_paged(
            state.k_pages[li], state.v_pages[li], k, v,
            state.lengths, state.block_tables, num_new=state.num_new,
        )
        state.k_pages = jax.lax.dynamic_update_index_in_dim(state.k_pages, kp, li, 0)
        state.v_pages = jax.lax.dynamic_update_index_in_dim(state.v_pages, vp, li, 0)

    if state.mode == "decode":
        return paged_attention(
            q[:, 0], kp, vp, state.lengths + state.num_new,
            state.block_tables, alibi_slopes,
            sm_scale=softmax_scale, window=window_size,
        )[:, None]  # (b, 1, h, d)
    if state.mode == "chunked_prefill":
        # incremental prefill over a NON-empty cache: the chunk's rows attend
        # to all cached keys plus the intra-chunk causal prefix via the
        # ragged paged kernel. Alignment trick for padded tails: len_k is
        # taken as lengths + s_len (the PADDED chunk), so real row t lands at
        # global position lengths + t regardless of each row's true num_new;
        # causal then stops real rows at their own position (never inside
        # the unappended tail), and padded rows' garbage is discarded by the
        # engine. Kernel clamps page ids, so reads past the allocation are
        # defined.
        from vllm_flash_attn_tpu.kernels.varlen_paged import (
            flash_attention_varlen_paged,
        )

        assert not quantized, (
            "chunked prefill over a quantized cache is not wired (the "
            "varlen-paged kernel reads bf16 pools); admit short prompts or "
            "use a bf16 cache"
        )
        b, s_len = q.shape[:2]
        h = q.shape[2]
        cu_q = jnp.arange(b + 1, dtype=jnp.int32) * s_len
        q_stream = q.reshape(b * s_len, h, -1).transpose(1, 0, 2)
        o = flash_attention_varlen_paged(
            q_stream, kp, vp, cu_q, state.lengths + s_len,
            state.block_tables, s_len, alibi_slopes,
            causal=causal, sm_scale=softmax_scale, window=window_size,
        )
        return o.transpose(1, 0, 2).reshape(b, s_len, h, -1)
    # prefill over the prompt itself (padded tail rows are discarded by the
    # engine; under causal masking they cannot affect earlier rows)
    return flash_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        alibi_slopes,
        causal=causal,
        sm_scale=softmax_scale,
        window=window_size,
    ).transpose(0, 2, 1, 3)


@dataclasses.dataclass
class MHA:
    embed_dim: int
    num_heads: int
    num_heads_kv: Optional[int] = None
    head_dim: Optional[int] = None
    qkv_proj_bias: bool = True
    out_proj_bias: bool = True
    causal: bool = True
    softmax_scale: Optional[float] = None
    window_size: Tuple[int, int] = (-1, -1)
    rotary_emb_dim: int = 0
    rotary_base: float = 10000.0
    rotary_interleaved: bool = False
    use_alibi: bool = False  # standard geometric slopes computed per head
    layer_idx: Optional[int] = None

    def __post_init__(self):
        self.h_kv = self.num_heads_kv or self.num_heads
        self.dh = self.head_dim or self.embed_dim // self.num_heads
        self.qkv_out = (self.num_heads + 2 * self.h_kv) * self.dh
        self.rotary = (
            RotaryEmbedding(
                self.rotary_emb_dim, self.rotary_base, self.rotary_interleaved
            )
            if self.rotary_emb_dim > 0
            else None
        )

    def init(self, key, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        std = 1.0 / math.sqrt(self.embed_dim)
        p = {
            "Wqkv": {
                "weight": jax.random.normal(
                    k1, (self.qkv_out, self.embed_dim), dtype
                )
                * std
            },
            "out_proj": {
                "weight": jax.random.normal(
                    k2, (self.embed_dim, self.num_heads * self.dh), dtype
                )
                * std
            },
        }
        if self.qkv_proj_bias:
            p["Wqkv"]["bias"] = jnp.zeros((self.qkv_out,), dtype)
        if self.out_proj_bias:
            p["out_proj"]["bias"] = jnp.zeros((self.embed_dim,), dtype)
        return p

    def _split_qkv(self, qkv, b, s):
        h, hk, dh = self.num_heads, self.h_kv, self.dh
        q = qkv[..., : h * dh].reshape(b, s, h, dh)
        k = qkv[..., h * dh : (h + hk) * dh].reshape(b, s, hk, dh)
        v = qkv[..., (h + hk) * dh :].reshape(b, s, hk, dh)
        return q, k, v

    def apply(self, params, x, inference_params=None, alibi_slopes=None):
        """x: (b, s, embed_dim). inference_params: either
        utils.generation.InferenceParams (contiguous cache) or
        serving.cache.PagedState (paged continuous-batching cache)."""
        b, s, _ = x.shape
        if alibi_slopes is None and self.use_alibi:
            alibi_slopes = jnp.asarray(standard_alibi_slopes(self.num_heads))
        qkv = jnp.einsum("bsd,od->bso", x, params["Wqkv"]["weight"])
        if "bias" in params["Wqkv"]:
            qkv = qkv + params["Wqkv"]["bias"]
        q, k, v = self._split_qkv(qkv, b, s)

        if inference_params is not None and hasattr(inference_params, "k_pages"):
            return self._apply_paged(
                params, q, k, v, inference_params, b, s, alibi_slopes
            )

        if inference_params is None:
            if self.rotary is not None:
                cos, sin = self.rotary.tables(s)
                q = apply_rotary_emb(q, cos, sin, self.rotary_interleaved)
                k = apply_rotary_emb(k, cos, sin, self.rotary_interleaved)
            ctx = flash_attn_func(
                q, k, v, causal=self.causal, softmax_scale=self.softmax_scale,
                window_size=self.window_size, alibi_slopes=alibi_slopes,
            )
        else:
            kc, vc, lens = inference_params.layer_cache(self.layer_idx)
            if self.rotary is not None:
                cos, sin = self.rotary.tables(inference_params.max_seqlen)
            else:
                cos = sin = None
            ctx, (kc2, vc2) = flash_attn_with_kvcache(
                q, kc, vc, k, v,
                rotary_cos=cos, rotary_sin=sin,
                cache_seqlens=lens, causal=self.causal,
                softmax_scale=self.softmax_scale, window_size=self.window_size,
                rotary_interleaved=self.rotary_interleaved,
                alibi_slopes=alibi_slopes,
            )
            inference_params.update_layer_cache(self.layer_idx, kc2, vc2)

        ctx = ctx.reshape(b, s, self.num_heads * self.dh)
        out = jnp.einsum("bso,do->bsd", ctx, params["out_proj"]["weight"])
        if "bias" in params["out_proj"]:
            out = out + params["out_proj"]["bias"]
        return out

    def _apply_paged(self, params, q, k, v, state, b, s, alibi_slopes=None):
        """Continuous-batching paged path (serving.cache.PagedState)."""
        ctx = paged_cache_attention(
            q, k, v, state, self.layer_idx, self.rotary,
            self.rotary_interleaved, self.softmax_scale, self.window_size,
            self.causal, alibi_slopes=alibi_slopes,
        )
        ctx = ctx.reshape(b, s, self.num_heads * self.dh)
        out = jnp.einsum("bso,do->bsd", ctx, params["out_proj"]["weight"])
        if "bias" in params["out_proj"]:
            out = out + params["out_proj"]["bias"]
        return out


@dataclasses.dataclass
class ParallelMHA(MHA):
    """Tensor-parallel MHA for shard_map bodies (Megatron ParallelMHA analog).

    Params hold this shard's slice: Wqkv rows for `num_heads/axis_size` query
    heads (+ their KV heads), out_proj columns likewise. sequence_parallel
    all-gathers the seq-sharded input and reduce-scatters the output
    (tests/modules/test_mha_parallel.py:20,49-56 semantics).
    """

    axis_name: str = "model"
    sequence_parallel: bool = False

    def shard_params(self, params, axis_size: int, index: int):
        """Slice full params to this shard (shard_state_dict_tp analog)."""
        h, hk, dh = self.num_heads, self.h_kv, self.dh
        assert h % axis_size == 0 and hk % axis_size == 0
        hl, hkl = h // axis_size, hk // axis_size
        w = params["Wqkv"]["weight"]
        qw = w[: h * dh].reshape(h, dh, -1)[index * hl : (index + 1) * hl]
        kw = w[h * dh : (h + hk) * dh].reshape(hk, dh, -1)[
            index * hkl : (index + 1) * hkl
        ]
        vw = w[(h + hk) * dh :].reshape(hk, dh, -1)[
            index * hkl : (index + 1) * hkl
        ]
        out = {
            "Wqkv": {
                "weight": jnp.concatenate(
                    [
                        qw.reshape(hl * dh, -1),
                        kw.reshape(hkl * dh, -1),
                        vw.reshape(hkl * dh, -1),
                    ]
                )
            },
            "out_proj": {
                "weight": params["out_proj"]["weight"]
                .reshape(-1, h, dh)[:, index * hl : (index + 1) * hl]
                .reshape(-1, hl * dh)
            },
        }
        if "bias" in params["Wqkv"]:
            bias = params["Wqkv"]["bias"]
            qb = bias[: h * dh].reshape(h, dh)[index * hl : (index + 1) * hl]
            kb = bias[h * dh : (h + hk) * dh].reshape(hk, dh)[
                index * hkl : (index + 1) * hkl
            ]
            vb = bias[(h + hk) * dh :].reshape(hk, dh)[
                index * hkl : (index + 1) * hkl
            ]
            out["Wqkv"]["bias"] = jnp.concatenate(
                [qb.reshape(-1), kb.reshape(-1), vb.reshape(-1)]
            )
        if "bias" in params["out_proj"]:
            out["out_proj"]["bias"] = params["out_proj"]["bias"]
        return out

    def apply(self, params, x, inference_params=None, alibi_slopes=None):
        axis_size = jax.lax.psum(1, self.axis_name)
        serving = inference_params is not None
        if serving:
            assert hasattr(inference_params, "k_pages"), (
                "ParallelMHA inference supports the paged serving cache "
                "(serving.cache.PagedState with shard-local head pools)"
            )
        if self.sequence_parallel and not serving:
            x = jax.lax.all_gather(x, self.axis_name, axis=1, tiled=True)
        b, s, _ = x.shape
        hl = self.num_heads // axis_size
        hkl = self.h_kv // axis_size
        if alibi_slopes is None and self.use_alibi:
            full = jnp.asarray(standard_alibi_slopes(self.num_heads))
            idx = jax.lax.axis_index(self.axis_name)
            alibi_slopes = jax.lax.dynamic_slice_in_dim(full, idx * hl, hl)
        qkv = jnp.einsum("bsd,od->bso", x, params["Wqkv"]["weight"])
        if "bias" in params["Wqkv"]:
            qkv = qkv + params["Wqkv"]["bias"]
        dh = self.dh
        q = qkv[..., : hl * dh].reshape(b, s, hl, dh)
        k = qkv[..., hl * dh : (hl + hkl) * dh].reshape(b, s, hkl, dh)
        v = qkv[..., (hl + hkl) * dh :].reshape(b, s, hkl, dh)
        if serving:
            # paged continuous-batching cache, shard-local heads; rotary is
            # applied inside at the cached positions
            ctx = paged_cache_attention(
                q, k, v, inference_params, self.layer_idx, self.rotary,
                self.rotary_interleaved, self.softmax_scale, self.window_size,
                self.causal, alibi_slopes=alibi_slopes,
            )
        else:
            if self.rotary is not None:
                cos, sin = self.rotary.tables(s)
                q = apply_rotary_emb(q, cos, sin, self.rotary_interleaved)
                k = apply_rotary_emb(k, cos, sin, self.rotary_interleaved)
            ctx = flash_attention(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                alibi_slopes,
                causal=self.causal,
                sm_scale=self.softmax_scale,
                window=self.window_size,
            ).transpose(0, 2, 1, 3)
        ctx = ctx.reshape(b, s, hl * dh)
        partial = jnp.einsum("bso,do->bsd", ctx, params["out_proj"]["weight"])
        if self.sequence_parallel and not serving:
            out = jax.lax.psum_scatter(
                partial, self.axis_name, scatter_dimension=1, tiled=True
            )
        else:
            out = jax.lax.psum(partial, self.axis_name)
        if "bias" in params["out_proj"]:
            out = out + params["out_proj"]["bias"]
        return out
