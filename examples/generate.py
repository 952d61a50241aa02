#!/usr/bin/env python
"""Greedy generation with the contiguous KV cache (reference usage.md analog)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vllm_flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from vllm_flash_attn_tpu.utils.generation import generate

cfg = GPTConfig(
    vocab_size=1000, n_positions=0, n_embd=256, n_layer=4, n_head=8,
    n_head_kv=4, rotary_emb_dim=32, gated_mlp=True, rms_norm=True,
    qkv_proj_bias=False, out_proj_bias=False, mlp_fc1_bias=False,
    mlp_fc2_bias=False, activation_function="silu", n_inner=512,
)
model = GPTLMHeadModel(cfg)
params = model.init(jax.random.PRNGKey(0), jnp.bfloat16)
prompt = jnp.asarray(np.random.default_rng(0).integers(0, 1000, (2, 16)), jnp.int32)
out = generate(model, params, prompt, max_new_tokens=32, temperature=0.8, top_k=50)
print("generated shape:", out.shape)
print(np.asarray(out))
