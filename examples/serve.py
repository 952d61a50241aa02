#!/usr/bin/env python
"""Continuous-batching serving with the paged KV cache + C++ page allocator."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from vllm_flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from vllm_flash_attn_tpu.serving import LLMEngine, Request

cfg = GPTConfig(
    vocab_size=1000, n_positions=0, n_embd=256, n_layer=4, n_head=8,
    n_head_kv=4, rotary_emb_dim=32, gated_mlp=True, rms_norm=True,
    qkv_proj_bias=False, out_proj_bias=False, mlp_fc1_bias=False,
    mlp_fc2_bias=False, activation_function="silu", n_inner=512,
)
model = GPTLMHeadModel(cfg)
params = model.init(jax.random.PRNGKey(0), jnp.bfloat16)

engine = LLMEngine(model, params, page_size=16, num_pages=1024, max_seqs=8)
print("page allocator native (C++):", engine.allocator.native)

rng = np.random.default_rng(0)
requests = [
    Request(i, rng.integers(0, 1000, (n,)).tolist(), max_new_tokens=24)
    for i, n in enumerate([5, 40, 120, 17, 64])
]
done = engine.run(requests)
for r in sorted(done, key=lambda r: r.request_id):
    print(f"req {r.request_id}: prompt {len(r.prompt_tokens)} tokens -> "
          f"{len(r.output_tokens)} generated")

# --- speculative decoding + automatic prefix caching (greedy requests) ---
# A small draft model proposes k tokens per tick; the target verifies all of
# them in ONE multi-token device step (outputs stay bit-identical to plain
# greedy). prefix_cache shares full prompt pages across requests: repeated
# system prompts adopt cached pages and prefill only the suffix.
draft_cfg = GPTConfig(
    vocab_size=1000, n_positions=0, n_embd=128, n_layer=1, n_head=2,
    n_head_kv=2, rotary_emb_dim=64, gated_mlp=True, rms_norm=True,
    qkv_proj_bias=False, out_proj_bias=False, mlp_fc1_bias=False,
    mlp_fc2_bias=False, activation_function="silu", n_inner=256,
)
draft = GPTLMHeadModel(draft_cfg)
draft_params = draft.init(jax.random.PRNGKey(1), jnp.bfloat16)

engine2 = LLMEngine(
    model, params, page_size=16, num_pages=1024, max_seqs=8,
    draft_model=draft, draft_params=draft_params, speculate_k=4,
    prefix_cache=True,
)
system_prompt = rng.integers(0, 1000, (48,)).tolist()
# two waves: the second wave's prompts adopt the first wave's cached
# system-prompt pages (same-wave requests register only after their joint
# prefill, so sharing kicks in from the next admission onward)
done = engine2.run([
    Request(i, system_prompt + rng.integers(0, 1000, (9,)).tolist(),
            max_new_tokens=16)
    for i in range(2)
])
done += engine2.run([
    Request(2 + i, system_prompt + rng.integers(0, 1000, (9,)).tolist(),
            max_new_tokens=16)
    for i in range(2)
])
print(f"speculative+prefix: {len(done)} requests, "
      f"prefix hits {engine2.prefix_hits} pages")
