"""BERT encoder (the `flash_attn.models.bert` surface, pinned by
/root/reference/tests/models/test_bert.py:1-40).

Post-norm encoder blocks over the same attention kernels: full (padded)
batches run the dense flash kernel; ragged batches are unpadded host-side and
run the varlen kernel — exactly the reference's `bert_padding.unpad_input`
dataflow (tests/test_flash_attn.py:16). ViT shares this encoder shape (no
token types, patch embed instead of word embed) and reuses BertEncoder.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_flash_attn_tpu.kernels.flash_prefill import flash_attention
from vllm_flash_attn_tpu.kernels.flash_varlen import flash_attention_varlen
from vllm_flash_attn_tpu.ops.fused_dense import _ACT
from vllm_flash_attn_tpu.ops.layer_norm import layer_norm
from vllm_flash_attn_tpu.utils.padding import generate_cu_seqlens


@dataclasses.dataclass
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu_approx"


class BertModel:
    def __init__(self, config: BertConfig):
        self.config = config

    def init(self, key, dtype=jnp.float32) -> Dict[str, Any]:
        c = self.config
        keys = iter(jax.random.split(key, 6 + 6 * c.num_hidden_layers))
        h, dh = c.num_attention_heads, c.hidden_size // c.num_attention_heads
        std = 0.02

        def lin(k, o, i):
            return {
                "weight": jax.random.normal(k, (o, i), dtype) * std,
                "bias": jnp.zeros((o,), dtype),
            }

        def ln():
            return {
                "weight": jnp.ones((c.hidden_size,), dtype),
                "bias": jnp.zeros((c.hidden_size,), dtype),
            }

        params = {
            "embeddings": {
                "word_embeddings": jax.random.normal(
                    next(keys), (c.vocab_size, c.hidden_size), dtype) * std,
                "position_embeddings": jax.random.normal(
                    next(keys), (c.max_position_embeddings, c.hidden_size), dtype) * std,
                "token_type_embeddings": jax.random.normal(
                    next(keys), (c.type_vocab_size, c.hidden_size), dtype) * std,
                "norm": ln(),
            },
            "layers": [],
            "pooler": lin(next(keys), c.hidden_size, c.hidden_size),
        }
        for _ in range(c.num_hidden_layers):
            params["layers"].append(
                {
                    "mixer": {
                        "Wqkv": lin(next(keys), 3 * c.hidden_size, c.hidden_size),
                        "out_proj": lin(next(keys), c.hidden_size, c.hidden_size),
                    },
                    "norm1": ln(),
                    "mlp": {
                        "fc1": lin(next(keys), c.intermediate_size, c.hidden_size),
                        "fc2": lin(next(keys), c.hidden_size, c.intermediate_size),
                    },
                    "norm2": ln(),
                }
            )
        return params

    def _attention(self, lp, x, attention_mask):
        c = self.config
        h, dh = c.num_attention_heads, c.hidden_size // c.num_attention_heads
        b, s, _ = x.shape
        qkv = jnp.einsum("bsd,od->bso", x, lp["Wqkv"]["weight"]) + lp["Wqkv"]["bias"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, h, dh)
        k = k.reshape(b, s, h, dh)
        v = v.reshape(b, s, h, dh)
        if attention_mask is None:
            ctx = flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), causal=False,
            ).transpose(0, 2, 1, 3)
        else:
            # unpad -> varlen kernel -> repad (bert_padding dataflow)
            mask = np.asarray(attention_mask).astype(bool)
            lens = mask.sum(-1)
            cu = generate_cu_seqlens(lens)
            idx = np.nonzero(mask.reshape(-1))[0]
            flat = lambda t: t.reshape(b * s, h, dh)[idx].transpose(1, 0, 2)
            out_p = flash_attention_varlen(
                flat(q), flat(k), flat(v), cu, cu, causal=False
            ).transpose(1, 0, 2)
            ctx = (
                jnp.zeros((b * s, h, dh), x.dtype).at[jnp.asarray(idx)].set(out_p)
            ).reshape(b, s, h, dh)
        ctx = ctx.reshape(b, s, h * dh)
        return (
            jnp.einsum("bso,do->bsd", ctx, lp["out_proj"]["weight"])
            + lp["out_proj"]["bias"]
        )

    def apply(self, params, input_ids, attention_mask=None, token_type_ids=None):
        """Returns (sequence_output (b, s, d), pooled_output (b, d))."""
        c = self.config
        b, s = input_ids.shape
        emb = params["embeddings"]
        from vllm_flash_attn_tpu.modules.embedding import embedding_lookup

        x = embedding_lookup(emb["word_embeddings"], input_ids)
        x = x + emb["position_embeddings"][None, :s]
        tt = token_type_ids if token_type_ids is not None else jnp.zeros_like(input_ids)
        x = x + jnp.take(emb["token_type_embeddings"], tt, axis=0)
        x = layer_norm(x, emb["norm"]["weight"], emb["norm"]["bias"], c.layer_norm_eps)

        for lp in params["layers"]:
            attn = self._attention(lp["mixer"], x, attention_mask)
            x = layer_norm(
                x + attn, lp["norm1"]["weight"], lp["norm1"]["bias"], c.layer_norm_eps
            )
            hmid = _ACT[c.hidden_act](
                jnp.einsum("bsd,od->bso", x, lp["mlp"]["fc1"]["weight"])
                + lp["mlp"]["fc1"]["bias"]
            )
            mlp = (
                jnp.einsum("bso,do->bsd", hmid, lp["mlp"]["fc2"]["weight"])
                + lp["mlp"]["fc2"]["bias"]
            )
            x = layer_norm(
                x + mlp, lp["norm2"]["weight"], lp["norm2"]["bias"], c.layer_norm_eps
            )
        pooled = jnp.tanh(
            jnp.einsum("bd,od->bo", x[:, 0], params["pooler"]["weight"])
            + params["pooler"]["bias"]
        )
        return x, pooled


def config_from_hf_bert(hf_config) -> BertConfig:
    return BertConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_hidden_layers=hf_config.num_hidden_layers,
        num_attention_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        max_position_embeddings=hf_config.max_position_embeddings,
        type_vocab_size=hf_config.type_vocab_size,
        layer_norm_eps=hf_config.layer_norm_eps,
        hidden_act={"gelu": "gelu", "gelu_new": "gelu_approx"}.get(
            hf_config.hidden_act, "gelu_approx"
        ),
    )


def remap_state_dict_hf_bert(sd, config: BertConfig):
    """HF bert -> param pytree (flash_attn.models.bert remapper analog)."""

    def t(name):
        v = sd[name]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v))

    p = {
        "embeddings": {
            "word_embeddings": t("bert.embeddings.word_embeddings.weight"),
            "position_embeddings": t("bert.embeddings.position_embeddings.weight"),
            "token_type_embeddings": t("bert.embeddings.token_type_embeddings.weight"),
            "norm": {
                "weight": t("bert.embeddings.LayerNorm.weight"),
                "bias": t("bert.embeddings.LayerNorm.bias"),
            },
        },
        "layers": [],
        "pooler": {
            "weight": t("bert.pooler.dense.weight"),
            "bias": t("bert.pooler.dense.bias"),
        },
    }
    for i in range(config.num_hidden_layers):
        pre = f"bert.encoder.layer.{i}."
        qw = t(pre + "attention.self.query.weight")
        kw = t(pre + "attention.self.key.weight")
        vw = t(pre + "attention.self.value.weight")
        qb = t(pre + "attention.self.query.bias")
        kb = t(pre + "attention.self.key.bias")
        vb = t(pre + "attention.self.value.bias")
        p["layers"].append(
            {
                "mixer": {
                    "Wqkv": {
                        "weight": jnp.concatenate([qw, kw, vw]),
                        "bias": jnp.concatenate([qb, kb, vb]),
                    },
                    "out_proj": {
                        "weight": t(pre + "attention.output.dense.weight"),
                        "bias": t(pre + "attention.output.dense.bias"),
                    },
                },
                "norm1": {
                    "weight": t(pre + "attention.output.LayerNorm.weight"),
                    "bias": t(pre + "attention.output.LayerNorm.bias"),
                },
                "mlp": {
                    "fc1": {
                        "weight": t(pre + "intermediate.dense.weight"),
                        "bias": t(pre + "intermediate.dense.bias"),
                    },
                    "fc2": {
                        "weight": t(pre + "output.dense.weight"),
                        "bias": t(pre + "output.dense.bias"),
                    },
                },
                "norm2": {
                    "weight": t(pre + "output.LayerNorm.weight"),
                    "bias": t(pre + "output.LayerNorm.bias"),
                },
            }
        )
    return p
