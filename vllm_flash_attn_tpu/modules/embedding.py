"""Embedding modules (`flash_attn.modules.embedding` surface:
GPT2Embeddings / ParallelGPT2Embeddings, pinned by
/root/reference/tests/modules/test_embedding_parallel.py)."""

from __future__ import annotations

import dataclasses


import jax
import jax.numpy as jnp
import numpy as np


@jax.custom_vjp
def _lookup_matmul_grad(table, ids):
    """`table[ids]` whose backward is a one-hot MXU matmul instead of XLA's
    scatter-add. fp32 accumulation in the dot is also strictly better
    numerics than the scatter's bf16 elementwise adds."""
    return jnp.take(table, ids, axis=0)


def _lookup_fwd(table, ids):
    # the table rides the residuals only for its static shape/dtype (params
    # stay alive through the backward anyway — no extra memory)
    return jnp.take(table, ids, axis=0), (ids, table)


def _lookup_bwd(res, g):
    ids, table = res
    flat = ids.reshape(-1)
    gf = g.reshape(-1, g.shape[-1])
    onehot = (
        flat[None, :] == jnp.arange(table.shape[0], dtype=flat.dtype)[:, None]
    ).astype(gf.dtype)
    dtab = jax.lax.dot_general(
        onehot, gf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(table.dtype)
    return dtab, np.zeros(ids.shape, dtype=jax.dtypes.float0)


_lookup_matmul_grad.defvjp(_lookup_fwd, _lookup_bwd)

# Embedding widths where XLA's TPU scatter emitter degenerates (v5e, jax
# 0.9; measured in-process round 5, T=8192/V=32000 grad-scatter ms):
#   fast scatter: d = 640(1.8) 1024(2.4) 1280(2.5) 2048(4.3) 2176(4.8)
#                     2304(6.0) 3072(5.8) 4096(5.9)
#   degenerate:   d = 1920(11.6) 2560(16.0) 4480(13.9) 5120(63.9) 6144(14.4)
# The degenerate set is deterministic per width (two trials each) but has no
# clean closed form; (d//128) % 5 == 0 covers all measured cases except
# 6144, which is special-cased. The one-hot matmul is shape-PREDICTABLE
# (~180 TF => 2*T*V*d/180e12), so "auto" prefers it exactly where the
# scatter degenerates — at the GPT-3 2.7B/13B widths this is 12% of the
# whole train step (benchmarks/profile_train_hw.py).
_SCATTER_DEGENERATE_DIMS = frozenset({6144})


def _use_matmul_grad(vocab: int, d: int) -> bool:
    from vllm_flash_attn_tpu.config import get_config

    mode = getattr(get_config(), "embed_grad", "auto")
    if mode == "matmul":
        return True
    if mode == "scatter":
        return False
    return (d % 128 == 0 and (d // 128) % 5 == 0) or d in _SCATTER_DEGENERATE_DIMS


def embedding_lookup(table, ids):
    """`table[ids]` picking the faster gradient path per (vocab, width).

    XLA's TPU scatter-add serializes one dynamic-update-slice per token at
    certain embedding widths (see table above) — 13.3 ms/step = 12% of the
    2.7B-shape train step. The same segment-sum is `one_hot(ids).T @ grad`
    on the MXU at ~180 TFLOP/s with the iota-compare one-hot fused into the
    dot (no (vocab, tokens) materialization). Config `embed_grad`
    (auto|matmul|scatter) overrides the width heuristic."""
    if _use_matmul_grad(table.shape[0], table.shape[-1]):
        return _lookup_matmul_grad(table, ids)
    return jnp.take(table, ids, axis=0)


@dataclasses.dataclass
class GPT2Embeddings:
    embed_dim: int
    vocab_size: int
    max_position_embeddings: int = 0  # 0 => no learned positions (rotary models)

    def init(self, key, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        p = {"word_embeddings": jax.random.normal(k1, (self.vocab_size, self.embed_dim), dtype) * 0.02}
        if self.max_position_embeddings > 0:
            p["position_embeddings"] = (
                jax.random.normal(k2, (self.max_position_embeddings, self.embed_dim), dtype) * 0.02
            )
        return p

    def apply(self, params, input_ids, position_ids=None):
        x = embedding_lookup(params["word_embeddings"], input_ids)
        if self.max_position_embeddings > 0:
            if position_ids is None:
                position_ids = jnp.arange(input_ids.shape[1], dtype=jnp.int32)[None]
            x = x + embedding_lookup(
                params["position_embeddings"], position_ids
            )
        return x


@dataclasses.dataclass
class ParallelGPT2Embeddings(GPT2Embeddings):
    """Vocab-parallel embeddings for shard_map bodies: each shard holds a
    contiguous vocab slice; out-of-shard tokens embed to 0 and a psum combines
    (Megatron VocabParallelEmbedding semantics)."""

    axis_name: str = "model"
    sequence_parallel: bool = False

    def shard_params(self, params, axis_size: int, index: int):
        vs = self.vocab_size // axis_size
        out = {"word_embeddings": params["word_embeddings"][index * vs : (index + 1) * vs]}
        if "position_embeddings" in params:
            out["position_embeddings"] = params["position_embeddings"]
        return out

    def apply(self, params, input_ids, position_ids=None):
        axis_size = jax.lax.psum(1, self.axis_name)
        index = jax.lax.axis_index(self.axis_name)
        vs = self.vocab_size // axis_size
        local = input_ids - index * vs
        in_shard = (local >= 0) & (local < vs)
        safe = jnp.clip(local, 0, vs - 1)
        x = embedding_lookup(params["word_embeddings"], safe)
        x = jnp.where(in_shard[..., None], x, 0.0)
        x = jax.lax.psum(x, self.axis_name)
        if self.max_position_embeddings > 0:
            if position_ids is None:
                position_ids = jnp.arange(input_ids.shape[1], dtype=jnp.int32)[None]
            x = x + embedding_lookup(
                params["position_embeddings"], position_ids
            )
        if self.sequence_parallel:
            x = x.reshape(x.shape)  # scatter happens in the first block's all-gather
        return x
