"""Embedding modules (`flash_attn.modules.embedding` surface:
GPT2Embeddings / ParallelGPT2Embeddings, pinned by
/root/reference/tests/modules/test_embedding_parallel.py)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


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
        x = jnp.take(params["word_embeddings"], input_ids, axis=0)
        if self.max_position_embeddings > 0:
            if position_ids is None:
                position_ids = jnp.arange(input_ids.shape[1], dtype=jnp.int32)[None]
            x = x + jnp.take(params["position_embeddings"], position_ids, axis=0)
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
        x = jnp.take(params["word_embeddings"], safe, axis=0)
        x = jnp.where(in_shard[..., None], x, 0.0)
        x = jax.lax.psum(x, self.axis_name)
        if self.max_position_embeddings > 0:
            if position_ids is None:
                position_ids = jnp.arange(input_ids.shape[1], dtype=jnp.int32)[None]
            x = x + jnp.take(params["position_embeddings"], position_ids, axis=0)
        if self.sequence_parallel:
            x = x.reshape(x.shape)  # scatter happens in the first block's all-gather
        return x
