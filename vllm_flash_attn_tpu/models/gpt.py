"""GPT-family language model (the `flash_attn.models.gpt.GPTLMHeadModel`
surface, pinned by /root/reference/tests/models/test_gpt.py and
training/configs/model/gpt2.yaml:5).

One config covers the model families the reference tests pin
(tests/models/test_{llama,falcon,gpt_neox,gptj,opt,bigcode,baichuan,btlm}.py)
via knobs: rotary vs learned positions, LayerNorm vs RMSNorm, Mlp vs GatedMlp,
MHA/GQA/MQA head counts, sequential vs parallel (GPT-J) blocks, tied or
separate lm_head. Family presets + HF weight remappers live in
models/hf_convert.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from vllm_flash_attn_tpu.modules.block import Block
from vllm_flash_attn_tpu.modules.embedding import GPT2Embeddings
from vllm_flash_attn_tpu.modules.mha import MHA
from vllm_flash_attn_tpu.modules.mlp import GatedMlp, Mlp
from vllm_flash_attn_tpu.ops.cross_entropy import (
    cross_entropy_loss,
    fused_linear_cross_entropy,
)
from vllm_flash_attn_tpu.ops.layer_norm import dropout_add_layer_norm


@dataclasses.dataclass
class GPTConfig:
    vocab_size: int = 50257
    n_positions: int = 1024  # 0 => rotary-only
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    n_head_kv: Optional[int] = None
    n_inner: Optional[int] = None
    activation_function: str = "gelu_approx"
    gated_mlp: bool = False
    rms_norm: bool = False
    layer_norm_epsilon: float = 1e-5
    rotary_emb_dim: int = 0  # 0 => learned positions
    rotary_base: float = 10000.0
    rotary_interleaved: bool = False
    parallel_block: bool = False
    use_alibi: bool = False  # standard geometric slopes (baichuan-13B, BTLM)
    # muP-style scaling knobs (BTLM, cerebras muP models)
    embeddings_scale: float = 1.0
    logits_scale: float = 1.0
    attn_softmax_scale: float = 0.0  # 0 = default 1/sqrt(head_dim)
    qkv_proj_bias: bool = True
    out_proj_bias: bool = True
    mlp_fc1_bias: bool = True
    mlp_fc2_bias: bool = True
    tie_word_embeddings: bool = True
    residual_in_fp32: bool = False
    resid_pdrop: float = 0.0
    embd_pdrop: float = 0.0
    pad_vocab_size_multiple: int = 1
    window_size: tuple = (-1, -1)
    # rows per chunk for the fused LM-head+CE loss path (0 = unfused): the
    # (rows, vocab) logits are never materialized in HBM — each chunk's
    # logits are recomputed in the backward under jax.checkpoint
    # (the csrc/xentropy fusion idea taken one level higher)
    fused_ce_chunk: int = 0
    # per-block rematerialization during training: "none" keeps all
    # activations; "dots" saves matmul outputs only
    # (dots_with_no_batch_dims_saveable); "full" saves nothing — the
    # activation-memory/FLOPs trade the reference gets from PL's
    # activation checkpointing configs
    remat: str = "none"

    @property
    def padded_vocab(self) -> int:
        m = self.pad_vocab_size_multiple
        return -(-self.vocab_size // m) * m


class GPTLMHeadModel:
    def __init__(self, config: GPTConfig):
        self.config = config
        c = config
        self.embeddings = GPT2Embeddings(
            c.n_embd, c.padded_vocab, c.n_positions if c.rotary_emb_dim == 0 else 0
        )
        self.blocks = []
        for i in range(c.n_layer):
            mha = MHA(
                embed_dim=c.n_embd,
                num_heads=c.n_head,
                num_heads_kv=c.n_head_kv,
                qkv_proj_bias=c.qkv_proj_bias,
                out_proj_bias=c.out_proj_bias,
                causal=True,
                softmax_scale=c.attn_softmax_scale or None,
                window_size=c.window_size,
                rotary_emb_dim=c.rotary_emb_dim,
                rotary_base=c.rotary_base,
                rotary_interleaved=c.rotary_interleaved,
                use_alibi=c.use_alibi,
                layer_idx=i,
            )
            if c.gated_mlp:
                mlp = GatedMlp(
                    c.n_embd, c.n_inner, activation=c.activation_function,
                    bias1=c.mlp_fc1_bias, bias2=c.mlp_fc2_bias,
                )
            else:
                mlp = Mlp(
                    c.n_embd, c.n_inner or 4 * c.n_embd,
                    activation=c.activation_function,
                    bias1=c.mlp_fc1_bias, bias2=c.mlp_fc2_bias,
                )
            self.blocks.append(
                Block(
                    dim=c.n_embd, mha=mha, mlp=mlp,
                    resid_dropout1=c.embd_pdrop if i == 0 else c.resid_pdrop,
                    resid_dropout2=c.resid_pdrop,
                    parallel_block=c.parallel_block,
                    residual_in_fp32=c.residual_in_fp32,
                    rms_norm=c.rms_norm,
                    norm_epsilon=c.layer_norm_epsilon,
                )
            )

    def init(self, key, dtype=jnp.float32) -> Dict[str, Any]:
        c = self.config
        keys = jax.random.split(key, c.n_layer + 2)
        params = {
            "embeddings": self.embeddings.init(keys[0], dtype),
            "layers": [
                blk.init(keys[i + 1], dtype) for i, blk in enumerate(self.blocks)
            ],
            "ln_f": {"weight": jnp.ones((c.n_embd,), dtype)},
        }
        if not c.rms_norm:
            params["ln_f"]["bias"] = jnp.zeros((c.n_embd,), dtype)
        if not c.tie_word_embeddings:
            params["lm_head"] = {
                "weight": jax.random.normal(
                    keys[-1], (c.padded_vocab, c.n_embd), dtype
                )
                * 0.02
            }
        return params

    def hidden_states(
        self,
        params,
        input_ids,  # (b, s) int32
        position_ids=None,
        inference_params=None,
        rngs=None,
        train: bool = False,
        inputs_embeds_delta=None,
    ):
        """Final-norm hidden states (b, s, n_embd) — the LM head's input.

        inputs_embeds_delta: optional (b, s, n_embd) additive perturbation on
        the embedding output — the differentiable probe point used by the
        causality monitor (reference
        training/src/callbacks/causality_monitor.py: grad of early outputs
        wrt future input embeddings must be zero)."""
        c = self.config
        hidden = self.embeddings.apply(
            params["embeddings"], input_ids, position_ids
        )
        if inputs_embeds_delta is not None:
            hidden = hidden + inputs_embeds_delta.astype(hidden.dtype)
        if c.embeddings_scale != 1.0:
            hidden = hidden * c.embeddings_scale
        residual = None
        use_remat = (
            c.remat != "none" and train and inference_params is None
        )
        if use_remat:
            policy = (
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                if c.remat == "dots" else None
            )
        for i, blk in enumerate(self.blocks):
            layer_rngs = (
                jax.random.split(rngs[i], 2) if rngs is not None else None
            )
            if use_remat:
                def blk_fn(p_, h_, r_, rng_, blk=blk):
                    return blk.apply(
                        p_, h_, r_, inference_params=None, rngs=rng_,
                        train=True,
                    )

                hidden, residual = jax.checkpoint(
                    blk_fn, policy=policy
                )(params["layers"][i], hidden, residual, layer_rngs)
            else:
                hidden, residual = blk.apply(
                    params["layers"][i], hidden, residual,
                    inference_params=inference_params, rngs=layer_rngs,
                    train=train,
                )
        return dropout_add_layer_norm(
            hidden, residual,
            params["ln_f"]["weight"], params["ln_f"].get("bias"),
            dropout_p=0.0, epsilon=c.layer_norm_epsilon,
            residual_in_fp32=c.residual_in_fp32, is_rms_norm=c.rms_norm,
        )

    def apply(
        self,
        params,
        input_ids,  # (b, s) int32
        position_ids=None,
        inference_params=None,
        rngs=None,
        train: bool = False,
        num_last_tokens: int = 0,
        inputs_embeds_delta=None,
    ):
        """Returns logits (b, s[, num_last_tokens], padded_vocab)."""
        c = self.config
        hidden = self.hidden_states(
            params, input_ids, position_ids=position_ids,
            inference_params=inference_params, rngs=rngs, train=train,
            inputs_embeds_delta=inputs_embeds_delta,
        )
        if num_last_tokens > 0:
            hidden = hidden[:, -num_last_tokens:]
        w = (
            params["lm_head"]["weight"]
            if "lm_head" in params
            else params["embeddings"]["word_embeddings"]
        )
        logits = jnp.einsum("bsd,vd->bsv", hidden, w)
        if c.logits_scale != 1.0:
            logits = logits * c.logits_scale
        if "lm_head" in params and "bias" in params["lm_head"]:
            logits = logits + params["lm_head"]["bias"]
        return logits

    def loss(self, params, input_ids, labels, rngs=None, train: bool = True):
        """labels are position-aligned targets (already shifted: labels[t] is
        the next token after input_ids[t]); ignore_index=-100 masks positions."""
        c = self.config
        if c.fused_ce_chunk > 0:
            hidden = self.hidden_states(params, input_ids, rngs=rngs, train=train)
            w = (
                params["lm_head"]["weight"]
                if "lm_head" in params
                else params["embeddings"]["word_embeddings"]
            )
            bias = params.get("lm_head", {}).get("bias")
            return fused_linear_cross_entropy(
                hidden.reshape(-1, hidden.shape[-1]), w, labels.reshape(-1),
                bias=bias, logit_scale=c.logits_scale,
                chunk_rows=c.fused_ce_chunk,
            )
        logits = self.apply(params, input_ids, rngs=rngs, train=train)
        return cross_entropy_loss(
            logits.reshape(-1, logits.shape[-1]), labels.reshape(-1)
        )


# --- TP checkpoint shard/merge (flash_attn.models.gpt surface,
# tests/models/test_gpt_parallel.py:13,109) ---


def shard_state_dict_tp(model: GPTLMHeadModel, params, world_size: int, rank: int):
    """Slice a full param tree to one tensor-parallel shard."""
    from vllm_flash_attn_tpu.modules.mha import ParallelMHA
    from vllm_flash_attn_tpu.modules.mlp import ParallelGatedMlp, ParallelMLP

    c = model.config
    out = {"layers": []}
    vs = c.padded_vocab // world_size
    emb = {
        "word_embeddings": params["embeddings"]["word_embeddings"][
            rank * vs : (rank + 1) * vs
        ]
    }
    if "position_embeddings" in params["embeddings"]:
        emb["position_embeddings"] = params["embeddings"]["position_embeddings"]
    out["embeddings"] = emb
    for i, blk in enumerate(model.blocks):
        pmha = ParallelMHA(**{
            f.name: getattr(blk.mha, f.name)
            for f in dataclasses.fields(MHA)
        })
        mlp_p = params["layers"][i]["mlp"]
        if isinstance(blk.mlp, GatedMlp):
            pmlp = ParallelGatedMlp(**{
                f.name: getattr(blk.mlp, f.name)
                for f in dataclasses.fields(GatedMlp)
            })
        else:
            pmlp = ParallelMLP(**{
                f.name: getattr(blk.mlp, f.name)
                for f in dataclasses.fields(Mlp)
            })
        out["layers"].append(
            {
                "mixer": pmha.shard_params(
                    params["layers"][i]["mixer"], world_size, rank
                ),
                "mlp": pmlp.shard_params(mlp_p, world_size, rank),
                "norm1": params["layers"][i]["norm1"],
                "norm2": params["layers"][i]["norm2"],
            }
        )
    out["ln_f"] = params["ln_f"]
    if "lm_head" in params:
        out["lm_head"] = {
            "weight": params["lm_head"]["weight"][rank * vs : (rank + 1) * vs]
        }
    return out


def combine_state_dicts_tp(model: GPTLMHeadModel, shards):
    """Inverse of shard_state_dict_tp: merge TP shards into a full tree."""
    c = model.config
    h, dh = c.n_head, c.n_embd // c.n_head
    hk = c.n_head_kv or c.n_head
    ws = len(shards)
    hl, hkl = h // ws, hk // ws

    def cat(path_fn, axis=0):
        return jnp.concatenate([path_fn(s) for s in shards], axis=axis)

    out = {
        "embeddings": {"word_embeddings": cat(lambda s: s["embeddings"]["word_embeddings"])},
        "layers": [],
        "ln_f": shards[0]["ln_f"],
    }
    if "position_embeddings" in shards[0]["embeddings"]:
        out["embeddings"]["position_embeddings"] = shards[0]["embeddings"][
            "position_embeddings"
        ]
    for i in range(c.n_layer):
        qw, kw, vw, qb, kb, vb = [], [], [], [], [], []
        for s in shards:
            w = s["layers"][i]["mixer"]["Wqkv"]["weight"]
            qw.append(w[: hl * dh])
            kw.append(w[hl * dh : (hl + hkl) * dh])
            vw.append(w[(hl + hkl) * dh :])
            if "bias" in s["layers"][i]["mixer"]["Wqkv"]:
                b = s["layers"][i]["mixer"]["Wqkv"]["bias"]
                qb.append(b[: hl * dh])
                kb.append(b[hl * dh : (hl + hkl) * dh])
                vb.append(b[(hl + hkl) * dh :])
        mixer = {
            "Wqkv": {"weight": jnp.concatenate(qw + kw + vw)},
            "out_proj": {
                "weight": cat(
                    lambda s: s["layers"][i]["mixer"]["out_proj"]["weight"], axis=1
                )
            },
        }
        if qb:
            mixer["Wqkv"]["bias"] = jnp.concatenate(qb + kb + vb)
        if "bias" in shards[0]["layers"][i]["mixer"]["out_proj"]:
            mixer["out_proj"]["bias"] = shards[0]["layers"][i]["mixer"]["out_proj"]["bias"]
        gated = isinstance(model.blocks[i].mlp, GatedMlp)
        if gated:
            hidden_l = model.blocks[i].mlp.hidden // ws
            gates = [s["layers"][i]["mlp"]["fc1"]["weight"][:hidden_l] for s in shards]
            ups = [s["layers"][i]["mlp"]["fc1"]["weight"][hidden_l:] for s in shards]
            fc1 = {"weight": jnp.concatenate(gates + ups)}
        else:
            fc1 = {"weight": cat(lambda s: s["layers"][i]["mlp"]["fc1"]["weight"])}
            if "bias" in shards[0]["layers"][i]["mlp"]["fc1"]:
                fc1["bias"] = cat(lambda s: s["layers"][i]["mlp"]["fc1"]["bias"])
        fc2 = {
            "weight": cat(lambda s: s["layers"][i]["mlp"]["fc2"]["weight"], axis=1)
        }
        if "bias" in shards[0]["layers"][i]["mlp"]["fc2"]:
            fc2["bias"] = shards[0]["layers"][i]["mlp"]["fc2"]["bias"]
        out["layers"].append(
            {
                "mixer": mixer,
                "mlp": {"fc1": fc1, "fc2": fc2},
                "norm1": shards[0]["layers"][i]["norm1"],
                "norm2": shards[0]["layers"][i]["norm2"],
            }
        )
    if "lm_head" in shards[0]:
        out["lm_head"] = {"weight": cat(lambda s: s["lm_head"]["weight"])}
    return out
