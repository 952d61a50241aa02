"""Tensor/sequence-parallel GPT for shard_map execution.

The reference runs TP via apex `parallel_state` process groups spanning
multiple CUDA processes (/root/reference/tests/models/test_gpt_parallel.py:
10-14,42-44). The TPU-native form is one shard_map over a
`Mesh(('data','model'))`: every parallel module holds its shard and issues
explicit collectives (psum / all_gather / psum_scatter) that XLA overlaps with
compute over ICI.

Sharding layout (Megatron, SURVEY.md §2.7):
- embeddings: vocab-parallel over 'model' (+ psum), positions replicated
- Wqkv: head-sharded column-parallel; out_proj row-parallel (+psum, or
  reduce-scatter along seq when sequence_parallel)
- MLP fc1 column / fc2 row
- lm_head: vocab-parallel, loss via vocab-parallel cross-entropy (one psum)
- sequence_parallel=True keeps activations seq-sharded between attention/MLP
  regions (the Megatron SP memory optimization,
  tests/modules/test_mha_parallel.py:20,49-56)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from vllm_flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from vllm_flash_attn_tpu.modules.block import Block
from vllm_flash_attn_tpu.modules.embedding import ParallelGPT2Embeddings
from vllm_flash_attn_tpu.modules.mha import ParallelMHA
from vllm_flash_attn_tpu.modules.mlp import ParallelGatedMlp, ParallelMLP
from vllm_flash_attn_tpu.ops.cross_entropy import cross_entropy_loss
from vllm_flash_attn_tpu.ops.layer_norm import dropout_add_layer_norm


class ParallelGPTLMHeadModel:
    """Per-shard GPT; apply() must run inside shard_map with `axis_name`."""

    def __init__(self, config: GPTConfig, axis_name: str = "model",
                 sequence_parallel: bool = False):
        self.config = config
        self.axis_name = axis_name
        self.sequence_parallel = sequence_parallel
        c = config
        self.embeddings = ParallelGPT2Embeddings(
            c.n_embd, c.padded_vocab,
            c.n_positions if c.rotary_emb_dim == 0 else 0,
            axis_name=axis_name,
        )
        self.blocks = []
        for i in range(c.n_layer):
            mha = ParallelMHA(
                embed_dim=c.n_embd, num_heads=c.n_head, num_heads_kv=c.n_head_kv,
                qkv_proj_bias=c.qkv_proj_bias, out_proj_bias=c.out_proj_bias,
                causal=True, softmax_scale=c.attn_softmax_scale or None,
                window_size=c.window_size,
                rotary_emb_dim=c.rotary_emb_dim, rotary_base=c.rotary_base,
                rotary_interleaved=c.rotary_interleaved, use_alibi=c.use_alibi,
                layer_idx=i,
                axis_name=axis_name, sequence_parallel=sequence_parallel,
            )
            if c.gated_mlp:
                mlp = ParallelGatedMlp(
                    c.n_embd, c.n_inner, activation=c.activation_function,
                    bias1=c.mlp_fc1_bias, bias2=c.mlp_fc2_bias,
                    axis_name=axis_name, sequence_parallel=sequence_parallel,
                )
            else:
                mlp = ParallelMLP(
                    c.n_embd, c.n_inner or 4 * c.n_embd,
                    activation=c.activation_function,
                    bias1=c.mlp_fc1_bias, bias2=c.mlp_fc2_bias,
                    axis_name=axis_name, sequence_parallel=sequence_parallel,
                )
            self.blocks.append(
                Block(
                    dim=c.n_embd, mha=mha, mlp=mlp,
                    parallel_block=c.parallel_block,
                    residual_in_fp32=c.residual_in_fp32,
                    rms_norm=c.rms_norm, norm_epsilon=c.layer_norm_epsilon,
                )
            )

    def shard_params(self, full_params, axis_size: int, index: int):
        """Slice a full (replicated) param tree to this model-parallel shard."""
        out = {
            "embeddings": self.embeddings.shard_params(
                full_params["embeddings"], axis_size, index
            ),
            "layers": [],
            "ln_f": full_params["ln_f"],
        }
        for i, blk in enumerate(self.blocks):
            lp = full_params["layers"][i]
            out["layers"].append(
                {
                    "mixer": blk.mha.shard_params(lp["mixer"], axis_size, index),
                    "mlp": blk.mlp.shard_params(lp["mlp"], axis_size, index),
                    "norm1": lp["norm1"],
                    "norm2": lp["norm2"],
                }
            )
        if "lm_head" in full_params:
            vs = self.config.padded_vocab // axis_size
            out["lm_head"] = {
                "weight": full_params["lm_head"]["weight"][
                    index * vs : (index + 1) * vs
                ]
            }
        return out

    def apply(
        self,
        params,
        input_ids,
        position_ids=None,
        inference_params=None,
        num_last_tokens: int = 0,
    ):
        """Returns vocab-SHARDED logits; inference_params must be a
        serving.cache.PagedState whose page pools hold this model shard's
        h_kv/axis_size heads (see serving engine tp wiring)."""
        c = self.config
        hidden = self.embeddings.apply(params["embeddings"], input_ids, position_ids)
        if c.embeddings_scale != 1.0:
            hidden = hidden * c.embeddings_scale
        if self.sequence_parallel and inference_params is None:
            idx = jax.lax.axis_index(self.axis_name)
            size = jax.lax.psum(1, self.axis_name)
            chunk = hidden.shape[1] // size
            hidden = jax.lax.dynamic_slice_in_dim(hidden, idx * chunk, chunk, 1)
        residual = None
        for i, blk in enumerate(self.blocks):
            hidden, residual = blk.apply(
                params["layers"][i], hidden, residual,
                inference_params=inference_params,
            )
        hidden = dropout_add_layer_norm(
            hidden, residual, params["ln_f"]["weight"], params["ln_f"].get("bias"),
            epsilon=c.layer_norm_epsilon, residual_in_fp32=c.residual_in_fp32,
            is_rms_norm=c.rms_norm,
        )
        if self.sequence_parallel and inference_params is None:
            hidden = jax.lax.all_gather(hidden, self.axis_name, axis=1, tiled=True)
        if num_last_tokens > 0:
            hidden = hidden[:, -num_last_tokens:]
        w = (
            params["lm_head"]["weight"]
            if "lm_head" in params
            else params["embeddings"]["word_embeddings"]
        )
        logits = jnp.einsum("bsd,vd->bsv", hidden, w)  # vocab-sharded
        if c.logits_scale != 1.0:
            logits = logits * c.logits_scale
        return logits

    def loss(self, params, input_ids, labels):
        """Vocab-parallel CE over the sharded logits (one psum per reduction).
        `labels` are position-aligned (pre-shifted) targets."""
        c = self.config
        logits = self.apply(params, input_ids)
        idx = jax.lax.axis_index(self.axis_name)
        vs = c.padded_vocab // jax.lax.psum(1, self.axis_name)
        return cross_entropy_loss(
            logits.reshape(-1, vs),
            labels.reshape(-1),
            axis_name=self.axis_name,
            vocab_start=idx * vs,
        )
