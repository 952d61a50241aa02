#!/usr/bin/env python
"""Speculative decoding: a small draft model proposes, the target verifies
K tokens in ONE multi-token kvcache forward; both models keep KV caches
(rejections roll the cache back by moving the committed length)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vllm_flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from vllm_flash_attn_tpu.utils.generation import decode_speculative, generate

common = dict(
    vocab_size=512, n_positions=0, rotary_emb_dim=16, gated_mlp=True,
    rms_norm=True, qkv_proj_bias=False, out_proj_bias=False,
    mlp_fc1_bias=False, mlp_fc2_bias=False, activation_function="silu",
)
target_cfg = GPTConfig(n_embd=128, n_layer=4, n_head=8, n_inner=256, **common)
draft_cfg = GPTConfig(n_embd=64, n_layer=1, n_head=4, n_inner=128, **common)

target = GPTLMHeadModel(target_cfg)
draft = GPTLMHeadModel(draft_cfg)
tp = target.init(jax.random.PRNGKey(0))
dp = draft.init(jax.random.PRNGKey(1))

prompt = jnp.asarray(
    np.random.default_rng(0).integers(0, 512, (1, 16)), jnp.int32
)

t0 = time.time()
ref = generate(target, tp, prompt, max_new_tokens=24)
t_ref = time.time() - t0

t0 = time.time()
out = decode_speculative(
    target, tp, draft, dp, prompt, max_new_tokens=24, speculative_lookahead=4
)
t_spec = time.time() - t0

match = np.array_equal(np.asarray(ref), np.asarray(out))
print(f"greedy   : {np.asarray(ref)[0, 16:].tolist()}  ({t_ref:.2f}s)")
print(f"spec(K=4): {np.asarray(out)[0, 16:].tolist()}  ({t_spec:.2f}s)")
print(f"outputs identical: {match}")
assert match
