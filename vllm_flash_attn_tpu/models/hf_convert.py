"""HF config converters + weight remappers for the supported model families.

The reference pins one converter per family via tests/models/*
(/root/reference/tests/models/test_{llama,falcon,gpt_neox,gptj,opt,bigcode,
baichuan,btlm}.py, e.g. `remap_state_dict_hf_gpt2` in flash_attn.models.gpt).
Here every family maps onto the single knob-driven GPTConfig
(models/gpt.py); the remappers translate HuggingFace state dicts (torch or
numpy tensors) into our param pytree.

Weight layout notes:
- our linears store (out, in) like torch.nn.Linear; HF gpt2 uses Conv1D
  (in, out) so gpt2 weights are transposed on the way in.
- Wqkv is [q; k; v] rows (q heads, then kv heads); families that interleave
  per-head qkv (gpt_neox) or pack MQA tails (falcon, bigcode) are de-interleaved.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from vllm_flash_attn_tpu.models.gpt import GPTConfig


_ACT_MAP = {
    "gelu_new": "gelu_approx", "gelu_pytorch_tanh": "gelu_approx",
    "gelu_fast": "gelu_approx", "gelu": "gelu", "relu": "relu", "silu": "silu",
}


def _act(name: str) -> str:
    return _ACT_MAP.get(name, "gelu_approx")


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


# ------------------------------------------------------------------ configs


def config_from_hf(hf_config) -> GPTConfig:
    """Map a HuggingFace config object to GPTConfig by model_type."""
    mt = hf_config.model_type
    if mt == "gpt2":
        return GPTConfig(
            vocab_size=hf_config.vocab_size,
            n_positions=hf_config.n_positions,
            n_embd=hf_config.n_embd,
            n_layer=hf_config.n_layer,
            n_head=hf_config.n_head,
            n_inner=hf_config.n_inner or 4 * hf_config.n_embd,
            activation_function=_act(hf_config.activation_function),
            layer_norm_epsilon=hf_config.layer_norm_epsilon,
        )
    if mt == "llama":
        return GPTConfig(
            vocab_size=hf_config.vocab_size,
            n_positions=0,
            n_embd=hf_config.hidden_size,
            n_layer=hf_config.num_hidden_layers,
            n_head=hf_config.num_attention_heads,
            n_head_kv=getattr(
                hf_config, "num_key_value_heads", hf_config.num_attention_heads
            ),
            n_inner=hf_config.intermediate_size,
            activation_function="silu",
            gated_mlp=True,
            rms_norm=True,
            layer_norm_epsilon=hf_config.rms_norm_eps,
            rotary_emb_dim=hf_config.hidden_size // hf_config.num_attention_heads,
            rotary_base=getattr(hf_config, "rope_theta", 10000.0),
            qkv_proj_bias=False,
            out_proj_bias=False,
            mlp_fc1_bias=False,
            mlp_fc2_bias=False,
            tie_word_embeddings=getattr(hf_config, "tie_word_embeddings", False),
        )
    if mt == "gpt_neox":
        return GPTConfig(
            vocab_size=hf_config.vocab_size,
            n_positions=0,
            n_embd=hf_config.hidden_size,
            n_layer=hf_config.num_hidden_layers,
            n_head=hf_config.num_attention_heads,
            n_inner=hf_config.intermediate_size,
            activation_function=_act(hf_config.hidden_act),
            layer_norm_epsilon=hf_config.layer_norm_eps,
            rotary_emb_dim=int(
                hf_config.rotary_pct
                * (hf_config.hidden_size // hf_config.num_attention_heads)
            ),
            rotary_base=hf_config.rotary_emb_base,
            parallel_block=hf_config.use_parallel_residual,
            tie_word_embeddings=False,
        )
    if mt == "gptj":
        return GPTConfig(
            vocab_size=hf_config.vocab_size,
            n_positions=0,
            n_embd=hf_config.n_embd,
            n_layer=hf_config.n_layer,
            n_head=hf_config.n_head,
            n_inner=hf_config.n_inner or 4 * hf_config.n_embd,
            activation_function="gelu_approx",
            layer_norm_epsilon=hf_config.layer_norm_epsilon,
            rotary_emb_dim=hf_config.rotary_dim,
            rotary_interleaved=True,
            parallel_block=True,
            qkv_proj_bias=False,
            out_proj_bias=False,
            tie_word_embeddings=False,
        )
    if mt == "opt":
        # OPT-350m-style checkpoints (post-LN, word_embed_proj_dim !=
        # hidden_size via project_in/out) would convert to a structurally
        # wrong model — refuse loudly rather than silently mis-map.
        if not getattr(hf_config, "do_layer_norm_before", True):
            raise NotImplementedError(
                "OPT with do_layer_norm_before=False (post-LN, e.g. OPT-350m) "
                "is not supported"
            )
        wepd = getattr(hf_config, "word_embed_proj_dim", hf_config.hidden_size)
        if wepd != hf_config.hidden_size:
            raise NotImplementedError(
                "OPT with word_embed_proj_dim != hidden_size (project_in/out, "
                "e.g. OPT-350m) is not supported"
            )
        return GPTConfig(
            vocab_size=hf_config.vocab_size,
            n_positions=hf_config.max_position_embeddings,
            n_embd=hf_config.hidden_size,
            n_layer=hf_config.num_hidden_layers,
            n_head=hf_config.num_attention_heads,
            n_inner=hf_config.ffn_dim,
            activation_function=_act(hf_config.activation_function),
        )
    if mt == "falcon":
        return GPTConfig(
            vocab_size=hf_config.vocab_size,
            n_positions=0,
            n_embd=hf_config.hidden_size,
            n_layer=hf_config.num_hidden_layers,
            n_head=hf_config.num_attention_heads,
            n_head_kv=(
                hf_config.num_kv_heads
                if getattr(hf_config, "new_decoder_architecture", False)
                else (1 if getattr(hf_config, "multi_query", True) else None)
            ),
            n_inner=4 * hf_config.hidden_size,
            activation_function="gelu",  # falcon's MLP uses exact nn.GELU
            layer_norm_epsilon=hf_config.layer_norm_epsilon,
            rotary_emb_dim=hf_config.hidden_size // hf_config.num_attention_heads,
            parallel_block=getattr(hf_config, "parallel_attn", True),
            qkv_proj_bias=getattr(hf_config, "bias", False),
            out_proj_bias=getattr(hf_config, "bias", False),
            mlp_fc1_bias=getattr(hf_config, "bias", False),
            mlp_fc2_bias=getattr(hf_config, "bias", False),
        )
    if mt == "baichuan":
        # 7B uses rotary, 13B uses ALiBi (hidden 5120/40 heads); Baichuan2
        # raises the vocab to 125696 and L2-normalizes the lm_head (NormHead)
        use_alibi = hf_config.hidden_size == 5120 or getattr(
            hf_config, "use_alibi", False
        )
        return GPTConfig(
            vocab_size=hf_config.vocab_size,
            n_positions=0,
            n_embd=hf_config.hidden_size,
            n_layer=hf_config.num_hidden_layers,
            n_head=hf_config.num_attention_heads,
            n_inner=hf_config.intermediate_size,
            activation_function="silu",
            gated_mlp=True,
            rms_norm=True,
            layer_norm_epsilon=hf_config.rms_norm_eps,
            rotary_emb_dim=(
                0
                if use_alibi
                else hf_config.hidden_size // hf_config.num_attention_heads
            ),
            use_alibi=use_alibi,
            qkv_proj_bias=False,
            out_proj_bias=False,
            mlp_fc1_bias=False,
            mlp_fc2_bias=False,
            tie_word_embeddings=False,
        )
    if mt == "btlm":
        # Cerebras BTLM-3B: gpt2 skeleton + SwiGLU + ALiBi + muP scaling
        width_scale = getattr(hf_config, "mup_width_scale", 1.0)
        return GPTConfig(
            vocab_size=hf_config.vocab_size,
            n_positions=0,  # ALiBi: no learned positions
            n_embd=hf_config.hidden_size,
            n_layer=hf_config.num_hidden_layers,
            n_head=hf_config.num_attention_heads,
            n_inner=hf_config.n_inner,
            activation_function="silu",
            gated_mlp=True,  # swiglu
            layer_norm_epsilon=hf_config.layer_norm_epsilon,
            use_alibi=True,
            embeddings_scale=getattr(hf_config, "mup_embeddings_scale", 1.0),
            logits_scale=(
                getattr(hf_config, "mup_output_alpha", 1.0) * width_scale
            ),
            # muP scales qk dot by 1/d instead of 1/sqrt(d)
            attn_softmax_scale=(
                1.0
                / (hf_config.hidden_size // hf_config.num_attention_heads)
                if getattr(hf_config, "mup_scale_qk_dot_by_d", False)
                else 0.0
            ),
        )
    if mt == "gpt_bigcode":
        return GPTConfig(
            vocab_size=hf_config.vocab_size,
            n_positions=hf_config.n_positions,
            n_embd=hf_config.n_embd,
            n_layer=hf_config.n_layer,
            n_head=hf_config.n_head,
            n_head_kv=1 if hf_config.multi_query else None,
            n_inner=hf_config.n_inner or 4 * hf_config.n_embd,
            activation_function="gelu_approx",
            layer_norm_epsilon=hf_config.layer_norm_epsilon,
        )
    raise NotImplementedError(f"model_type {mt}")


# ------------------------------------------------------------------ remappers


def _pad_vocab(w: np.ndarray, padded: int) -> np.ndarray:
    if w.shape[0] == padded:
        return w
    return np.pad(w, ((0, padded - w.shape[0]),) + ((0, 0),) * (w.ndim - 1))


def remap_state_dict_hf_gpt2(sd: Dict[str, Any], config: GPTConfig):
    """HF gpt2 -> param pytree (flash_attn.models.gpt.remap_state_dict_hf_gpt2
    analog). HF gpt2 Conv1D stores (in, out): transpose."""
    p: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": jnp.asarray(
                _pad_vocab(_np(sd["transformer.wte.weight"]), config.padded_vocab)
            ),
            "position_embeddings": jnp.asarray(_np(sd["transformer.wpe.weight"])),
        },
        "layers": [],
        "ln_f": {
            "weight": jnp.asarray(_np(sd["transformer.ln_f.weight"])),
            "bias": jnp.asarray(_np(sd["transformer.ln_f.bias"])),
        },
    }
    for i in range(config.n_layer):
        pre = f"transformer.h.{i}."
        layer = {
            "mixer": {
                "Wqkv": {
                    "weight": jnp.asarray(_np(sd[pre + "attn.c_attn.weight"]).T),
                    "bias": jnp.asarray(_np(sd[pre + "attn.c_attn.bias"])),
                },
                "out_proj": {
                    "weight": jnp.asarray(_np(sd[pre + "attn.c_proj.weight"]).T),
                    "bias": jnp.asarray(_np(sd[pre + "attn.c_proj.bias"])),
                },
            },
            "mlp": {
                "fc1": {
                    "weight": jnp.asarray(_np(sd[pre + "mlp.c_fc.weight"]).T),
                    "bias": jnp.asarray(_np(sd[pre + "mlp.c_fc.bias"])),
                },
                "fc2": {
                    "weight": jnp.asarray(_np(sd[pre + "mlp.c_proj.weight"]).T),
                    "bias": jnp.asarray(_np(sd[pre + "mlp.c_proj.bias"])),
                },
            },
            "norm1": {
                "weight": jnp.asarray(_np(sd[pre + "ln_1.weight"])),
                "bias": jnp.asarray(_np(sd[pre + "ln_1.bias"])),
            },
            "norm2": {
                "weight": jnp.asarray(_np(sd[pre + "ln_2.weight"])),
                "bias": jnp.asarray(_np(sd[pre + "ln_2.bias"])),
            },
        }
        p["layers"].append(layer)
    return p


def remap_state_dict_hf_llama(sd: Dict[str, Any], config: GPTConfig):
    """HF llama -> param pytree (flash_attn.models.llama analog)."""
    p: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": jnp.asarray(
                _pad_vocab(
                    _np(sd["model.embed_tokens.weight"]), config.padded_vocab
                )
            )
        },
        "layers": [],
        "ln_f": {"weight": jnp.asarray(_np(sd["model.norm.weight"]))},
    }
    for i in range(config.n_layer):
        pre = f"model.layers.{i}."
        qw = _np(sd[pre + "self_attn.q_proj.weight"])
        kw = _np(sd[pre + "self_attn.k_proj.weight"])
        vw = _np(sd[pre + "self_attn.v_proj.weight"])
        gate = _np(sd[pre + "mlp.gate_proj.weight"])
        up = _np(sd[pre + "mlp.up_proj.weight"])
        layer = {
            "mixer": {
                "Wqkv": {"weight": jnp.asarray(np.concatenate([qw, kw, vw]))},
                "out_proj": {
                    "weight": jnp.asarray(_np(sd[pre + "self_attn.o_proj.weight"]))
                },
            },
            "mlp": {
                "fc1": {"weight": jnp.asarray(np.concatenate([gate, up]))},
                "fc2": {
                    "weight": jnp.asarray(_np(sd[pre + "mlp.down_proj.weight"]))
                },
            },
            "norm1": {
                "weight": jnp.asarray(_np(sd[pre + "input_layernorm.weight"]))
            },
            "norm2": {
                "weight": jnp.asarray(
                    _np(sd[pre + "post_attention_layernorm.weight"])
                )
            },
        }
        p["layers"].append(layer)
    if not config.tie_word_embeddings:
        p["lm_head"] = {
            "weight": jnp.asarray(
                _pad_vocab(_np(sd["lm_head.weight"]), config.padded_vocab)
            )
        }
    return p


def remap_state_dict_hf_gpt_neox(sd: Dict[str, Any], config: GPTConfig):
    """HF gpt_neox -> param pytree. NeoX packs qkv per-head interleaved:
    (h, 3, dh, in) -> de-interleave into [q; k; v]."""
    h, dh = config.n_head, config.n_embd // config.n_head
    p: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": jnp.asarray(
                _pad_vocab(_np(sd["gpt_neox.embed_in.weight"]), config.padded_vocab)
            )
        },
        "layers": [],
        "ln_f": {
            "weight": jnp.asarray(_np(sd["gpt_neox.final_layer_norm.weight"])),
            "bias": jnp.asarray(_np(sd["gpt_neox.final_layer_norm.bias"])),
        },
        "lm_head": {
            "weight": jnp.asarray(
                _pad_vocab(_np(sd["embed_out.weight"]), config.padded_vocab)
            )
        },
    }
    for i in range(config.n_layer):
        pre = f"gpt_neox.layers.{i}."
        w = _np(sd[pre + "attention.query_key_value.weight"])  # (3*h*dh, in)
        b = _np(sd[pre + "attention.query_key_value.bias"])
        w = w.reshape(h, 3, dh, -1)
        b = b.reshape(h, 3, dh)
        qw, kw, vw = (w[:, j].reshape(h * dh, -1) for j in range(3))
        qb, kb, vb = (b[:, j].reshape(h * dh) for j in range(3))
        layer = {
            "mixer": {
                "Wqkv": {
                    "weight": jnp.asarray(np.concatenate([qw, kw, vw])),
                    "bias": jnp.asarray(np.concatenate([qb, kb, vb])),
                },
                "out_proj": {
                    "weight": jnp.asarray(_np(sd[pre + "attention.dense.weight"])),
                    "bias": jnp.asarray(_np(sd[pre + "attention.dense.bias"])),
                },
            },
            "mlp": {
                "fc1": {
                    "weight": jnp.asarray(
                        _np(sd[pre + "mlp.dense_h_to_4h.weight"])
                    ),
                    "bias": jnp.asarray(_np(sd[pre + "mlp.dense_h_to_4h.bias"])),
                },
                "fc2": {
                    "weight": jnp.asarray(
                        _np(sd[pre + "mlp.dense_4h_to_h.weight"])
                    ),
                    "bias": jnp.asarray(_np(sd[pre + "mlp.dense_4h_to_h.bias"])),
                },
            },
            "norm1": {
                "weight": jnp.asarray(_np(sd[pre + "input_layernorm.weight"])),
                "bias": jnp.asarray(_np(sd[pre + "input_layernorm.bias"])),
            },
            "norm2": {
                "weight": jnp.asarray(
                    _np(sd[pre + "post_attention_layernorm.weight"])
                ),
                "bias": jnp.asarray(
                    _np(sd[pre + "post_attention_layernorm.bias"])
                ),
            },
        }
        p["layers"].append(layer)
    return p


def remap_state_dict_hf_opt(sd: Dict[str, Any], config: GPTConfig):
    """HF opt -> param pytree. OPT quirk: learned positions carry a +2 offset
    (HF OPTLearnedPositionalEmbedding), so rows 2: are the real table."""
    pre = "model.decoder."
    pos = _np(sd[pre + "embed_positions.weight"])[2:]
    p: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": jnp.asarray(
                _pad_vocab(_np(sd[pre + "embed_tokens.weight"]), config.padded_vocab)
            ),
            "position_embeddings": jnp.asarray(pos),
        },
        "layers": [],
        "ln_f": {
            "weight": jnp.asarray(_np(sd[pre + "final_layer_norm.weight"])),
            "bias": jnp.asarray(_np(sd[pre + "final_layer_norm.bias"])),
        },
    }
    for i in range(config.n_layer):
        lp = f"{pre}layers.{i}."
        qw = _np(sd[lp + "self_attn.q_proj.weight"])
        kw = _np(sd[lp + "self_attn.k_proj.weight"])
        vw = _np(sd[lp + "self_attn.v_proj.weight"])
        qb = _np(sd[lp + "self_attn.q_proj.bias"])
        kb = _np(sd[lp + "self_attn.k_proj.bias"])
        vb = _np(sd[lp + "self_attn.v_proj.bias"])
        p["layers"].append(
            {
                "mixer": {
                    "Wqkv": {
                        "weight": jnp.asarray(np.concatenate([qw, kw, vw])),
                        "bias": jnp.asarray(np.concatenate([qb, kb, vb])),
                    },
                    "out_proj": {
                        "weight": jnp.asarray(_np(sd[lp + "self_attn.out_proj.weight"])),
                        "bias": jnp.asarray(_np(sd[lp + "self_attn.out_proj.bias"])),
                    },
                },
                "mlp": {
                    "fc1": {
                        "weight": jnp.asarray(_np(sd[lp + "fc1.weight"])),
                        "bias": jnp.asarray(_np(sd[lp + "fc1.bias"])),
                    },
                    "fc2": {
                        "weight": jnp.asarray(_np(sd[lp + "fc2.weight"])),
                        "bias": jnp.asarray(_np(sd[lp + "fc2.bias"])),
                    },
                },
                "norm1": {
                    "weight": jnp.asarray(_np(sd[lp + "self_attn_layer_norm.weight"])),
                    "bias": jnp.asarray(_np(sd[lp + "self_attn_layer_norm.bias"])),
                },
                "norm2": {
                    "weight": jnp.asarray(_np(sd[lp + "final_layer_norm.weight"])),
                    "bias": jnp.asarray(_np(sd[lp + "final_layer_norm.bias"])),
                },
            }
        )
    return p


def remap_state_dict_hf_gptj(sd: Dict[str, Any], config: GPTConfig):
    """HF gptj -> param pytree (parallel block, interleaved rotary, separate
    lm_head with bias folded away — our lm_head is bias-free like the matmul)."""
    p: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": jnp.asarray(
                _pad_vocab(_np(sd["transformer.wte.weight"]), config.padded_vocab)
            )
        },
        "layers": [],
        "ln_f": {
            "weight": jnp.asarray(_np(sd["transformer.ln_f.weight"])),
            "bias": jnp.asarray(_np(sd["transformer.ln_f.bias"])),
        },
        "lm_head": {
            "weight": jnp.asarray(
                _pad_vocab(_np(sd["lm_head.weight"]), config.padded_vocab)
            ),
            "bias": jnp.asarray(
                np.pad(
                    _np(sd["lm_head.bias"]),
                    (0, config.padded_vocab - config.vocab_size),
                )
            ),
        },
    }
    for i in range(config.n_layer):
        pre = f"transformer.h.{i}."
        qw = _np(sd[pre + "attn.q_proj.weight"])
        kw = _np(sd[pre + "attn.k_proj.weight"])
        vw = _np(sd[pre + "attn.v_proj.weight"])
        p["layers"].append(
            {
                "mixer": {
                    "Wqkv": {"weight": jnp.asarray(np.concatenate([qw, kw, vw]))},
                    "out_proj": {
                        "weight": jnp.asarray(_np(sd[pre + "attn.out_proj.weight"]))
                    },
                },
                "mlp": {
                    "fc1": {
                        "weight": jnp.asarray(_np(sd[pre + "mlp.fc_in.weight"])),
                        "bias": jnp.asarray(_np(sd[pre + "mlp.fc_in.bias"])),
                    },
                    "fc2": {
                        "weight": jnp.asarray(_np(sd[pre + "mlp.fc_out.weight"])),
                        "bias": jnp.asarray(_np(sd[pre + "mlp.fc_out.bias"])),
                    },
                },
                # gptj parallel block: one LayerNorm feeds both branches; our
                # parallel Block has norm1/norm2 — duplicate the weights
                "norm1": {
                    "weight": jnp.asarray(_np(sd[pre + "ln_1.weight"])),
                    "bias": jnp.asarray(_np(sd[pre + "ln_1.bias"])),
                },
                "norm2": {
                    "weight": jnp.asarray(_np(sd[pre + "ln_1.weight"])),
                    "bias": jnp.asarray(_np(sd[pre + "ln_1.bias"])),
                },
            }
        )
    return p


def remap_state_dict_hf_falcon(sd: Dict[str, Any], config: GPTConfig):
    """HF falcon -> param pytree (tests/models/test_falcon.py parity target).

    The fused query_key_value packing differs per falcon generation but is
    fully determined by the head counts:
    - n_head_kv == n_head  (RW models / new-arch MHA): per-head interleaved
      (h, 3, dh) like gpt_neox
    - n_head_kv == 1       (falcon-7b multi-query): [q*h ; k ; v]
    - 1 < n_head_kv < h    (falcon-40b new arch): kv groups of
      (q_per_kv + 2, dh) — de-interleave per group
    Norm layout is detected from the checkpoint keys: ln_attn/ln_mlp (new
    arch), single input_layernorm (parallel 7b — duplicated into both norms),
    or input+post_attention (sequential RW).
    """
    h, dh = config.n_head, config.n_embd // config.n_head
    h_kv = config.n_head_kv or config.n_head
    q_per_kv = h // h_kv
    p: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": jnp.asarray(
                _pad_vocab(
                    _np(sd["transformer.word_embeddings.weight"]),
                    config.padded_vocab,
                )
            )
        },
        "layers": [],
        "ln_f": {
            "weight": jnp.asarray(_np(sd["transformer.ln_f.weight"])),
            "bias": jnp.asarray(_np(sd["transformer.ln_f.bias"])),
        },
    }
    if not config.tie_word_embeddings:
        p["lm_head"] = {
            "weight": jnp.asarray(
                _pad_vocab(_np(sd["lm_head.weight"]), config.padded_vocab)
            )
        }

    def _unpack_qkv(w):
        """(rows, in) fused weight -> [q; k; v] rows in our layout."""
        n_in = w.shape[-1]
        if h_kv == 1:
            return w  # already [q*h ; k ; v]
        g = w.reshape(h_kv, q_per_kv + 2, dh, *w.shape[1:])
        q = g[:, :-2].reshape(h * dh, *w.shape[1:])
        k = g[:, -2].reshape(h_kv * dh, *w.shape[1:])
        v = g[:, -1].reshape(h_kv * dh, *w.shape[1:])
        del n_in
        return np.concatenate([q, k, v])

    for i in range(config.n_layer):
        pre = f"transformer.h.{i}."
        mixer = {
            "Wqkv": {
                "weight": jnp.asarray(
                    _unpack_qkv(_np(sd[pre + "self_attention.query_key_value.weight"]))
                )
            },
            "out_proj": {
                "weight": jnp.asarray(_np(sd[pre + "self_attention.dense.weight"]))
            },
        }
        if pre + "self_attention.query_key_value.bias" in sd:
            mixer["Wqkv"]["bias"] = jnp.asarray(
                _unpack_qkv(_np(sd[pre + "self_attention.query_key_value.bias"]))
            )
            mixer["out_proj"]["bias"] = jnp.asarray(
                _np(sd[pre + "self_attention.dense.bias"])
            )
        mlp = {
            "fc1": {
                "weight": jnp.asarray(_np(sd[pre + "mlp.dense_h_to_4h.weight"]))
            },
            "fc2": {
                "weight": jnp.asarray(_np(sd[pre + "mlp.dense_4h_to_h.weight"]))
            },
        }
        if pre + "mlp.dense_h_to_4h.bias" in sd:
            mlp["fc1"]["bias"] = jnp.asarray(_np(sd[pre + "mlp.dense_h_to_4h.bias"]))
            mlp["fc2"]["bias"] = jnp.asarray(_np(sd[pre + "mlp.dense_4h_to_h.bias"]))

        def _norm(key):
            out = {"weight": jnp.asarray(_np(sd[pre + key + ".weight"]))}
            if pre + key + ".bias" in sd:
                out["bias"] = jnp.asarray(_np(sd[pre + key + ".bias"]))
            return out

        if pre + "ln_attn.weight" in sd:  # new decoder architecture
            norm1, norm2 = _norm("ln_attn"), _norm("ln_mlp")
        elif config.parallel_block:  # falcon-7b: one LN feeds both branches
            norm1, norm2 = _norm("input_layernorm"), _norm("input_layernorm")
        else:  # sequential RW models
            norm1 = _norm("input_layernorm")
            norm2 = _norm("post_attention_layernorm")
        p["layers"].append(
            {"mixer": mixer, "mlp": mlp, "norm1": norm1, "norm2": norm2}
        )
    return p


def remap_state_dict_hf_bigcode(sd: Dict[str, Any], config: GPTConfig):
    """HF gpt_bigcode (santacoder/starcoder) -> param pytree
    (tests/models/test_gpt.py bigcode entries parity target). nn.Linear
    weights throughout (unlike gpt2's transposed Conv1D); multi-query c_attn
    packs [q (n_embd) ; k (dh) ; v (dh)] which matches our Wqkv layout
    directly, while the MHA variant packs per-head interleaved (h, 3, dh)
    (modeling_gpt_bigcode.py view(num_heads, 3*head_dim)) and is
    de-interleaved like gpt_neox."""
    h, dh = config.n_head, config.n_embd // config.n_head
    multi_query = config.n_head_kv == 1

    def _unpack(w):
        if multi_query:
            return w
        g = w.reshape(h, 3, dh, *w.shape[1:])
        return np.concatenate(
            [g[:, j].reshape(h * dh, *w.shape[1:]) for j in range(3)]
        )
    p: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": jnp.asarray(
                _pad_vocab(_np(sd["transformer.wte.weight"]), config.padded_vocab)
            ),
            "position_embeddings": jnp.asarray(
                _np(sd["transformer.wpe.weight"])[: config.n_positions]
            ),
        },
        "layers": [],
        "ln_f": {
            "weight": jnp.asarray(_np(sd["transformer.ln_f.weight"])),
            "bias": jnp.asarray(_np(sd["transformer.ln_f.bias"])),
        },
    }
    for i in range(config.n_layer):
        pre = f"transformer.h.{i}."
        p["layers"].append(
            {
                "mixer": {
                    "Wqkv": {
                        "weight": jnp.asarray(
                            _unpack(_np(sd[pre + "attn.c_attn.weight"]))
                        ),
                        "bias": jnp.asarray(
                            _unpack(_np(sd[pre + "attn.c_attn.bias"]))
                        ),
                    },
                    "out_proj": {
                        "weight": jnp.asarray(_np(sd[pre + "attn.c_proj.weight"])),
                        "bias": jnp.asarray(_np(sd[pre + "attn.c_proj.bias"])),
                    },
                },
                "mlp": {
                    "fc1": {
                        "weight": jnp.asarray(_np(sd[pre + "mlp.c_fc.weight"])),
                        "bias": jnp.asarray(_np(sd[pre + "mlp.c_fc.bias"])),
                    },
                    "fc2": {
                        "weight": jnp.asarray(_np(sd[pre + "mlp.c_proj.weight"])),
                        "bias": jnp.asarray(_np(sd[pre + "mlp.c_proj.bias"])),
                    },
                },
                "norm1": {
                    "weight": jnp.asarray(_np(sd[pre + "ln_1.weight"])),
                    "bias": jnp.asarray(_np(sd[pre + "ln_1.bias"])),
                },
                "norm2": {
                    "weight": jnp.asarray(_np(sd[pre + "ln_2.weight"])),
                    "bias": jnp.asarray(_np(sd[pre + "ln_2.bias"])),
                },
            }
        )
    return p


def remap_state_dict_hf_baichuan(sd: Dict[str, Any], config: GPTConfig):
    """HF baichuan -> param pytree (tests/models/test_baichuan.py target).

    Llama layout except the fused W_pack [q; k; v] (already our Wqkv order).
    Baichuan2's NormHead stores an unnormalized lm_head that the forward
    L2-normalizes per row — fold the normalization into the weights here
    (detected by the Baichuan2 vocab size)."""
    p: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": jnp.asarray(
                _pad_vocab(
                    _np(sd["model.embed_tokens.weight"]), config.padded_vocab
                )
            )
        },
        "layers": [],
        "ln_f": {"weight": jnp.asarray(_np(sd["model.norm.weight"]))},
    }
    for i in range(config.n_layer):
        pre = f"model.layers.{i}."
        gate = _np(sd[pre + "mlp.gate_proj.weight"])
        up = _np(sd[pre + "mlp.up_proj.weight"])
        p["layers"].append(
            {
                "mixer": {
                    "Wqkv": {
                        "weight": jnp.asarray(
                            _np(sd[pre + "self_attn.W_pack.weight"])
                        )
                    },
                    "out_proj": {
                        "weight": jnp.asarray(
                            _np(sd[pre + "self_attn.o_proj.weight"])
                        )
                    },
                },
                "mlp": {
                    "fc1": {"weight": jnp.asarray(np.concatenate([gate, up]))},
                    "fc2": {
                        "weight": jnp.asarray(
                            _np(sd[pre + "mlp.down_proj.weight"])
                        )
                    },
                },
                "norm1": {
                    "weight": jnp.asarray(_np(sd[pre + "input_layernorm.weight"]))
                },
                "norm2": {
                    "weight": jnp.asarray(
                        _np(sd[pre + "post_attention_layernorm.weight"])
                    )
                },
            }
        )
    head = _np(sd["lm_head.weight"])
    if config.vocab_size > 100_000:  # Baichuan2 NormHead
        head = head / np.maximum(
            np.linalg.norm(head, axis=-1, keepdims=True), 1e-7
        )
    p["lm_head"] = {
        "weight": jnp.asarray(_pad_vocab(head, config.padded_vocab))
    }
    return p


def remap_state_dict_hf_btlm(sd: Dict[str, Any], config: GPTConfig):
    """HF BTLM (cerebras) -> param pytree (tests/models/test_btlm.py target).

    gpt2-style Conv1D weights (transposed), swiglu mlp split as
    [c_fc (gate); c_fc2 (up)], no position embeddings (ALiBi)."""
    p: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": jnp.asarray(
                _pad_vocab(_np(sd["transformer.wte.weight"]), config.padded_vocab)
            )
        },
        "layers": [],
        "ln_f": {
            "weight": jnp.asarray(_np(sd["transformer.ln_f.weight"])),
            "bias": jnp.asarray(_np(sd["transformer.ln_f.bias"])),
        },
    }
    for i in range(config.n_layer):
        pre = f"transformer.h.{i}."
        qkv_w = _np(sd[pre + "attn.c_attn.weight"]).T  # Conv1D -> Linear
        gate_w = _np(sd[pre + "mlp.c_fc.weight"]).T
        up_w = _np(sd[pre + "mlp.c_fc2.weight"]).T
        layer = {
            "mixer": {
                "Wqkv": {
                    "weight": jnp.asarray(qkv_w),
                    "bias": jnp.asarray(_np(sd[pre + "attn.c_attn.bias"])),
                },
                "out_proj": {
                    "weight": jnp.asarray(_np(sd[pre + "attn.c_proj.weight"]).T),
                    "bias": jnp.asarray(_np(sd[pre + "attn.c_proj.bias"])),
                },
            },
            "mlp": {
                "fc1": {
                    "weight": jnp.asarray(np.concatenate([gate_w, up_w])),
                    "bias": jnp.asarray(
                        np.concatenate(
                            [
                                _np(sd[pre + "mlp.c_fc.bias"]),
                                _np(sd[pre + "mlp.c_fc2.bias"]),
                            ]
                        )
                    ),
                },
                "fc2": {
                    "weight": jnp.asarray(_np(sd[pre + "mlp.c_proj.weight"]).T),
                    "bias": jnp.asarray(_np(sd[pre + "mlp.c_proj.bias"])),
                },
            },
            "norm1": {
                "weight": jnp.asarray(_np(sd[pre + "ln_1.weight"])),
                "bias": jnp.asarray(_np(sd[pre + "ln_1.bias"])),
            },
            "norm2": {
                "weight": jnp.asarray(_np(sd[pre + "ln_2.weight"])),
                "bias": jnp.asarray(_np(sd[pre + "ln_2.bias"])),
            },
        }
        p["layers"].append(layer)
    return p


REMAPPERS = {
    "gpt2": remap_state_dict_hf_gpt2,
    "llama": remap_state_dict_hf_llama,
    "gpt_neox": remap_state_dict_hf_gpt_neox,
    "opt": remap_state_dict_hf_opt,
    "gptj": remap_state_dict_hf_gptj,
    "falcon": remap_state_dict_hf_falcon,
    "gpt_bigcode": remap_state_dict_hf_bigcode,
    "baichuan": remap_state_dict_hf_baichuan,
    "btlm": remap_state_dict_hf_btlm,
}


def from_hf(hf_model):
    """(GPTConfig, params) from an in-memory HF model (any supported family)."""
    config = config_from_hf(hf_model.config)
    remap = REMAPPERS[hf_model.config.model_type]
    sd = hf_model.state_dict()
    return config, remap(sd, config)
