#!/usr/bin/env python
"""Speculative-decoding engine on real hardware: lowering smoke (small
models, perfect + adversarial drafts) and the tick decomposition at the
llama-7B target shape with a 2-layer draft.

Spec throughput = batch * (1 + accepted) / tick, where tick = draft k+1
greedy steps (ONE device call) + target multi-token verify (ONE device
call) + host. Acceptance is a property of the draft/target MODEL PAIR
(random-weight pairs have degenerate dynamics), so the tick TIME is the
datum; tok/s is reported at the measured and the 100%%-acceptance points.
Exactness is pinned by test_engine_speculative_matches_greedy. Measured
round 5: tick 87 ms at k=4 (two relay round trips ~64 ms of it) =>
184-230 tok/s vs ~75 tok/s plain-decode raw on this rig.

Usage: python benchmarks/bench_spec_hw.py [k]
"""
import os
import sys
import time
from pathlib import Path

import jax

_cache = os.path.expanduser("~/.cache/jax_comp_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vllm_flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from vllm_flash_attn_tpu.serving.engine import LLMEngine, Request


def small_cfg(n_layer, n_embd, n_head, n_head_kv=None):
    return GPTConfig(
        vocab_size=32000, n_positions=0, n_embd=n_embd, n_layer=n_layer,
        n_head=n_head, n_head_kv=n_head_kv or n_head,
        rotary_emb_dim=n_embd // n_head, rms_norm=True, gated_mlp=True,
        qkv_proj_bias=False, out_proj_bias=False, mlp_fc1_bias=False,
        mlp_fc2_bias=False, activation_function="silu",
        n_inner=int(8 * n_embd / 3) // 128 * 128,
    )


def smoke(k):
    # fp32: the exactness property is spec == greedy; in bf16 the 1-token
    # decode kernel and the multi-token verify kernel can break argmax
    # NEAR-TIES differently (random weights make 32000-way near-uniform
    # logits — measured: fp32 exact on hardware, bf16 flips at the first
    # verify token on one of two random prompts). Trained-model logit
    # margins make this immaterial; the spec stream stays deterministic.
    cfg = small_cfg(2, 512, 4)
    model = GPTLMHeadModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.float32)
    bad = model.init(jax.random.PRNGKey(9), jnp.float32)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 32000, (n,)).tolist() for n in (7, 19)]

    def run(**kw):
        eng = LLMEngine(model, params, page_size=16, num_pages=64,
                        max_seqs=2, max_pages_per_seq=8, **kw)
        done = eng.run([Request(i, p, max_new_tokens=8)
                        for i, p in enumerate(prompts)])
        return {r.request_id: r.output_tokens for r in done}

    base = run()
    perfect = run(draft_model=model, draft_params=params, speculate_k=k)
    badr = run(draft_model=model, draft_params=bad, speculate_k=k)
    ok = base == perfect == badr
    print(f"smoke k={k}: spec==greedy (perfect AND adversarial draft): {ok}",
          flush=True)
    return ok


def tick_decomposition(k, n_ticks=24):
    tcfg = small_cfg(32, 4096, 32)
    dcfg = small_cfg(2, 2048, 16)
    target = GPTLMHeadModel(tcfg)
    tparams = target.init(jax.random.PRNGKey(0), jnp.bfloat16)
    draft = GPTLMHeadModel(dcfg)
    dparams = draft.init(jax.random.PRNGKey(1), jnp.bfloat16)
    jax.block_until_ready(tparams["ln_f"]["weight"])
    print("params ready (target 32L/4096d, draft 2L/2048d)", flush=True)

    rng = np.random.default_rng(0)
    B = 4
    eng = LLMEngine(
        target, tparams, page_size=16, num_pages=B * 16 + 8, max_seqs=B,
        max_pages_per_seq=16, draft_model=draft, draft_params=dparams,
        speculate_k=k,
    )
    for i in range(B):
        eng.add_request(Request(
            i, rng.integers(0, 32000, (32,)).tolist(),
            max_new_tokens=(n_ticks + 8) * (k + 1),
        ))
    t0 = time.time()
    eng.step(); eng.step()
    print(f"spec warm (compiles) {time.time()-t0:.0f}s", flush=True)
    tok0 = sum(len(r.output_tokens) for r in eng.active.values())
    t0 = time.time()
    for _ in range(n_ticks):
        eng.step()
    dt = (time.time() - t0) / n_ticks
    committed = (
        sum(len(r.output_tokens) for r in eng.active.values()) - tok0
    ) / n_ticks
    print(f"spec tick (k={k}): {dt*1e3:.1f} ms, {committed:.2f} committed "
          f"tokens/seq/tick (random-weight models have degenerate "
          f"near-fixed-point greedy dynamics, so acceptance here is not "
          f"meaningful — the tick TIME is the datum)", flush=True)
    print(f"  -> tok/s at measured acceptance: {B*committed/dt:8.1f}",
          flush=True)
    print(f"  -> tok/s at 100% acceptance:     {B*(k+1)/dt:8.1f} "
          f"(vs ~75 tok/s plain-decode raw on this rig)", flush=True)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    if not smoke(min(k, 3)):
        raise SystemExit(1)
    tick_decomposition(k)


if __name__ == "__main__":
    main()
