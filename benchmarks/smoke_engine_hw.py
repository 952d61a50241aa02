#!/usr/bin/env python
"""Real-TPU end-to-end smoke of the serving engine (NOT part of the CPU
suite): bf16 + fused in-kernel append, int8 cache + qint8 QK, and chunked
prefill, each through LLMEngine.run on actual hardware.

Interpret mode cannot catch Mosaic lowering constraints; this smoke found
two real round-3 bugs: the varlen-paged kernel's unaligned q-window DMAs
(fixed via 8-aligned host repack) and the int8 pool h_kv % 4 tiling
requirement (now a clear engine error). Run it after touching any decode/
varlen kernel or engine device function.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/smoke_engine_hw.py
"""
import os
import time

import jax

_cache = os.path.expanduser("~/.cache/jax_comp_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

from vllm_flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from vllm_flash_attn_tpu.serving.engine import LLMEngine, Request


def main():
    cfg = GPTConfig(
        vocab_size=512, n_positions=0, n_embd=1024, n_layer=2, n_head=8,
        n_head_kv=8, rotary_emb_dim=128, rms_norm=True, gated_mlp=True,
        qkv_proj_bias=False, out_proj_bias=False, mlp_fc1_bias=False,
        mlp_fc2_bias=False, activation_function="silu", n_inner=2048,
    )
    model = GPTLMHeadModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.bfloat16)
    # MQA model (falcon-7B shape class: n_head_kv=1): exercises the round-4
    # padded quantized pool layout (block-replicated heads, packed scales)
    cfg_mqa = GPTConfig(
        vocab_size=512, n_positions=0, n_embd=1024, n_layer=2, n_head=8,
        n_head_kv=1, rotary_emb_dim=128, rms_norm=True, gated_mlp=True,
        qkv_proj_bias=False, out_proj_bias=False, mlp_fc1_bias=False,
        mlp_fc2_bias=False, activation_function="silu", n_inner=2048,
    )
    model_mqa = GPTLMHeadModel(cfg_mqa)
    params_mqa = model_mqa.init(jax.random.PRNGKey(1), jnp.bfloat16)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 512, (n,)).tolist() for n in (7, 19, 40)]

    failures = 0
    for label, mdl, prm, kw in (
        ("bf16+fused-append", model, params, {}),
        ("int8+qint8", model, params, {"cache_dtype": "int8"}),
        ("chunked-prefill", model, params, {"prefill_chunk": 16}),
        ("mqa-int8", model_mqa, params_mqa, {"cache_dtype": "int8"}),
        ("speculative", model, params,
         {"draft_model": model, "draft_params": params, "speculate_k": 2}),
        ("prefix-cache", model, params, {"prefix_cache": True}),
        ("spec+prefix", model, params,
         {"draft_model": model, "draft_params": params, "speculate_k": 2,
          "prefix_cache": True}),
    ):
        try:
            t0 = time.time()
            eng = LLMEngine(
                mdl, prm, page_size=16, num_pages=128, max_seqs=4,
                max_pages_per_seq=16, **kw,
            )
            done = eng.run([
                Request(i, p, max_new_tokens=6, seed=i)
                for i, p in enumerate(prompts)
            ])
            ok = all(
                len(r.output_tokens) == 6 and r.error is None for r in done
            )
            failures += 0 if ok else 1
            print(f"{label}: ok={ok} ({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:  # report every config
            failures += 1
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    raise SystemExit(failures)


if __name__ == "__main__":
    main()
