"""Vision Transformer (the `flash_attn.models.vit` surface, pinned by
/root/reference/tests/models/test_vit.py).

Pre-norm encoder over the same flash attention kernel (non-causal, dense —
images have no padding). The patch "convolution" is stride == kernel, so on
TPU it is a pure reshape + one fat matmul onto the MXU (no conv lowering
needed): (B,C,H,W) -> (B, np, C*P*P) @ W^T.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vllm_flash_attn_tpu.kernels.flash_prefill import flash_attention
from vllm_flash_attn_tpu.ops.fused_dense import _ACT
from vllm_flash_attn_tpu.ops.layer_norm import layer_norm


@dataclasses.dataclass
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"
    num_classes: int = 0  # 0 = no classification head

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


class ViTModel:
    def __init__(self, config: ViTConfig):
        self.config = config

    def init(self, key, dtype=jnp.float32) -> Dict[str, Any]:
        c = self.config
        keys = iter(jax.random.split(key, 4 + 6 * c.num_hidden_layers))
        std = 0.02
        D = c.hidden_size

        def lin(k, o, i):
            return {
                "weight": jax.random.normal(k, (o, i), dtype) * std,
                "bias": jnp.zeros((o,), dtype),
            }

        def ln():
            return {"weight": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)}

        p: Dict[str, Any] = {
            "cls_token": jax.random.normal(next(keys), (1, 1, D), dtype) * std,
            "pos_emb": jax.random.normal(
                next(keys), (1, c.num_patches + 1, D), dtype
            )
            * std,
            "patch_proj": lin(
                next(keys), D, c.num_channels * c.patch_size**2
            ),
            "layers": [],
            "ln_f": ln(),
        }
        for _ in range(c.num_hidden_layers):
            p["layers"].append(
                {
                    "norm1": ln(),
                    "mixer": {
                        "Wqkv": lin(next(keys), 3 * D, D),
                        "out_proj": lin(next(keys), D, D),
                    },
                    "norm2": ln(),
                    "mlp": {
                        "fc1": lin(next(keys), c.intermediate_size, D),
                        "fc2": lin(next(keys), D, c.intermediate_size),
                    },
                }
            )
        if c.num_classes:
            p["head"] = lin(next(keys), c.num_classes, D)
        return p

    def _patchify(self, params, pixels):
        """(B, C, H, W) -> (B, num_patches, D) via reshape + matmul."""
        c = self.config
        B, C, H, W = pixels.shape
        P = c.patch_size
        x = pixels.reshape(B, C, H // P, P, W // P, P)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, (H // P) * (W // P), -1)
        w = params["patch_proj"]["weight"]  # (D, C*P*P)
        return jnp.einsum("bnp,dp->bnd", x, w) + params["patch_proj"]["bias"]

    def apply(self, params, pixels):
        """pixels (B, C, H, W) -> hidden states (B, np+1, D) after final LN
        (plus (B, num_classes) logits from the cls token if a head exists)."""
        c = self.config
        h = c.num_attention_heads
        dh = c.hidden_size // h
        x = self._patchify(params, pixels)
        B = x.shape[0]
        cls = jnp.broadcast_to(params["cls_token"], (B, 1, c.hidden_size))
        x = jnp.concatenate([cls, x], axis=1) + params["pos_emb"]

        for lp in params["layers"]:
            normed = layer_norm(
                x, lp["norm1"]["weight"], lp["norm1"]["bias"], c.layer_norm_eps
            )
            qkv = (
                jnp.einsum("bsd,od->bso", normed, lp["mixer"]["Wqkv"]["weight"])
                + lp["mixer"]["Wqkv"]["bias"]
            )
            s = qkv.shape[1]
            q, k, v = (
                qkv[..., :c.hidden_size],
                qkv[..., c.hidden_size : 2 * c.hidden_size],
                qkv[..., 2 * c.hidden_size :],
            )
            ctx = flash_attention(
                q.reshape(B, s, h, dh).transpose(0, 2, 1, 3),
                k.reshape(B, s, h, dh).transpose(0, 2, 1, 3),
                v.reshape(B, s, h, dh).transpose(0, 2, 1, 3),
                causal=False,
            ).transpose(0, 2, 1, 3).reshape(B, s, c.hidden_size)
            attn_out = (
                jnp.einsum("bso,do->bsd", ctx, lp["mixer"]["out_proj"]["weight"])
                + lp["mixer"]["out_proj"]["bias"]
            )
            x = x + attn_out
            normed2 = layer_norm(
                x, lp["norm2"]["weight"], lp["norm2"]["bias"], c.layer_norm_eps
            )
            y = (
                jnp.einsum("bsd,od->bso", normed2, lp["mlp"]["fc1"]["weight"])
                + lp["mlp"]["fc1"]["bias"]
            )
            y = _ACT[c.hidden_act](y)
            y = (
                jnp.einsum("bso,do->bsd", y, lp["mlp"]["fc2"]["weight"])
                + lp["mlp"]["fc2"]["bias"]
            )
            x = x + y

        x = layer_norm(
            x, params["ln_f"]["weight"], params["ln_f"]["bias"], c.layer_norm_eps
        )
        if "head" in params:
            logits = (
                x[:, 0] @ params["head"]["weight"].T + params["head"]["bias"]
            )
            return x, logits
        return x


# ------------------------------------------------------------------ HF bridge


def config_from_hf_vit(hf_config) -> ViTConfig:
    return ViTConfig(
        image_size=hf_config.image_size,
        patch_size=hf_config.patch_size,
        num_channels=hf_config.num_channels,
        hidden_size=hf_config.hidden_size,
        num_hidden_layers=hf_config.num_hidden_layers,
        num_attention_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        layer_norm_eps=hf_config.layer_norm_eps,
        hidden_act="gelu" if hf_config.hidden_act == "gelu" else "gelu_approx",
        num_classes=getattr(hf_config, "num_labels", 0) or 0,
    )


def remap_state_dict_hf_vit(sd, config: ViTConfig):
    """HF ViTModel / ViTForImageClassification -> param pytree."""

    def _np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    def pre(name):
        return name if name in sd else "vit." + name

    def lin(name):
        return {
            "weight": jnp.asarray(_np(sd[pre(name + ".weight")])),
            "bias": jnp.asarray(_np(sd[pre(name + ".bias")])),
        }

    conv_w = _np(sd[pre("embeddings.patch_embeddings.projection.weight")])
    D = conv_w.shape[0]
    p: Dict[str, Any] = {
        "cls_token": jnp.asarray(_np(sd[pre("embeddings.cls_token")])),
        "pos_emb": jnp.asarray(_np(sd[pre("embeddings.position_embeddings")])),
        "patch_proj": {
            "weight": jnp.asarray(conv_w.reshape(D, -1)),
            "bias": jnp.asarray(
                _np(sd[pre("embeddings.patch_embeddings.projection.bias")])
            ),
        },
        "layers": [],
        "ln_f": lin("layernorm"),
    }
    for i in range(config.num_hidden_layers):
        b = f"encoder.layer.{i}."
        qw = _np(sd[pre(b + "attention.attention.query.weight")])
        kw = _np(sd[pre(b + "attention.attention.key.weight")])
        vw = _np(sd[pre(b + "attention.attention.value.weight")])
        qb = _np(sd[pre(b + "attention.attention.query.bias")])
        kb = _np(sd[pre(b + "attention.attention.key.bias")])
        vb = _np(sd[pre(b + "attention.attention.value.bias")])
        p["layers"].append(
            {
                "norm1": lin(b + "layernorm_before"),
                "mixer": {
                    "Wqkv": {
                        "weight": jnp.asarray(np.concatenate([qw, kw, vw])),
                        "bias": jnp.asarray(np.concatenate([qb, kb, vb])),
                    },
                    "out_proj": lin(b + "attention.output.dense"),
                },
                "norm2": lin(b + "layernorm_after"),
                "mlp": {
                    "fc1": lin(b + "intermediate.dense"),
                    "fc2": lin(b + "output.dense"),
                },
            }
        )
    if config.num_classes and "classifier.weight" in sd:
        p["head"] = {
            "weight": jnp.asarray(_np(sd["classifier.weight"])),
            "bias": jnp.asarray(_np(sd["classifier.bias"])),
        }
    return p
