#!/usr/bin/env python
"""End-to-end serving throughput of the FULL llama-7B-shape model on one
chip (VERDICT r04 weak #6): the fork's signature use case is the serving
decode loop (flash_api.cpp:671-936 exists for it), and with a ~0.5 ms
per-pallas_call dispatch gap on this rig a 32-layer decode step pays it
32x — this measures whether sustained serving survives that.

Two numbers:
- raw:        wall-clock of real `LLMEngine.step()` ticks (host sampling,
              allocator tick, one jitted device step per tick) — what a
              user of the engine actually gets on this rig.
- sustained:  the same 32-layer decode device program chained inside ONE
              jit with greedy argmax feedback (lax.scan) — the device-side
              model step rate with the per-tick dispatch gap amortized, i.e.
              what the engine sustains on a rig without the relay's
              dispatch overhead.

Memory: 32L/4096d bf16 params = 13.5 GB of the 16 GB HBM, so the KV pool is
kept small (the measurement is compute/dispatch-bound, not capacity-bound).
VFA_ENG_LAYERS overrides the layer count if the params do not fit.

Usage: python benchmarks/bench_engine_hw.py [n_layer]
"""
import functools
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
from vllm_flash_attn_tpu.serving.cache import PagedState
from vllm_flash_attn_tpu.serving.engine import LLMEngine, Request

MAX_SEQS = 32  # round-5 sweep: sustained tok/s scales 187 (B=4) -> 353
# (B=8) -> 589 (B=16) -> 809 (B=32, after donating the pools into the jit —
# the un-donated scan-carry copy OOM'd next to the 13.5GB params).
PROMPT = 32
PAGE = 16


def build(n_layer: int):
    cfg = GPTConfig(
        vocab_size=32000, n_positions=0, n_embd=4096, n_layer=n_layer,
        n_head=32, n_head_kv=32, rotary_emb_dim=128, rms_norm=True,
        gated_mlp=True, qkv_proj_bias=False, out_proj_bias=False,
        mlp_fc1_bias=False, mlp_fc2_bias=False,
        activation_function="silu", n_inner=11008,
    )
    model = GPTLMHeadModel(cfg)
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(0), jnp.bfloat16)
    jax.block_until_ready(params["ln_f"]["weight"])
    print(f"params init {time.time()-t0:.0f}s "
          f"(~{sum(x.size for x in jax.tree_util.tree_leaves(params))*2/2**30:.1f} GiB)",
          flush=True)
    return cfg, model, params


def bench_engine_raw(model, params, n_decode=48):
    eng = LLMEngine(
        model, params, page_size=PAGE, num_pages=MAX_SEQS * 8 + 8,
        max_seqs=MAX_SEQS, max_pages_per_seq=8,  # 128-token budget per seq
        # (prompt 32 + 64 decode); 16-page tables OOM'd at B=32 next to the
        # 13.5GB params
    )
    rng = np.random.default_rng(0)
    for i in range(MAX_SEQS):
        eng.add_request(Request(
            i, rng.integers(0, 32000, (PROMPT,)).tolist(),
            max_new_tokens=n_decode + 16,
        ))
    t0 = time.time()
    eng.step()  # admit + prefill + first decode (compiles both programs)
    eng.step()
    print(f"engine warm (prefill+decode compile) {time.time()-t0:.0f}s",
          flush=True)
    t0 = time.time()
    for _ in range(n_decode):
        eng.step()
    dt = (time.time() - t0) / n_decode
    return MAX_SEQS / dt, dt


def bench_engine_sustained(cfg, model, params, n_iter=32):
    """The engine's decode device program chained in ONE jit with greedy
    argmax feedback — no host between steps."""
    pages_per_seq = 8  # the un-donated scan carry copies the pools: keep
    # them small next to the 13.5GB params (prompt 32 + 32 iters < 128)
    num_pages = MAX_SEQS * pages_per_seq
    kc, vc = PagedState.allocate(
        cfg.n_layer, num_pages, PAGE, cfg.n_head_kv or cfg.n_head,
        cfg.n_embd // cfg.n_head, jnp.bfloat16,
    )
    tables = jnp.asarray(
        np.arange(num_pages, dtype=np.int32).reshape(MAX_SEQS, pages_per_seq)
    )
    lens0 = jnp.full((MAX_SEQS,), PROMPT, jnp.int32)
    tok0 = jnp.asarray(
        np.random.default_rng(0).integers(0, 32000, (MAX_SEQS, 1)), jnp.int32
    )
    ones = jnp.ones((MAX_SEQS,), jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def many(params, tok, kc, vc, lens, tables):
        # pools donated: without it XLA copies both 0.5-1GB pools into the
        # scan carry, which OOMs next to the 13.5GB params at batch 32
        def body(carry, _):
            tok, kc, vc, lens = carry
            state = PagedState(kc, vc, lens, tables, ones, "decode")
            logits = model.apply(
                params, tok, inference_params=state, num_last_tokens=1
            )
            nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)[:, None]
            return (nxt, state.k_pages, state.v_pages, lens + 1), None

        (tok, kc, vc, lens), _ = jax.lax.scan(
            body, (tok, kc, vc, lens), None, length=n_iter
        )
        return jnp.sum(tok), kc, vc

    t0 = time.time()
    out, kc, vc = many(params, tok0, kc, vc, lens0, tables)
    float(out)
    print(f"sustained-loop compile+warm {time.time()-t0:.0f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out, kc, vc = many(params, tok0, kc, vc, lens0, tables)
        float(out)
        best = min(best, time.time() - t0)
    dt = best / n_iter
    return MAX_SEQS / dt, dt


def main():
    n_layer = int(sys.argv[1]) if len(sys.argv) > 1 else int(
        os.environ.get("VFA_ENG_LAYERS", "32")
    )
    print(f"device: {jax.devices()[0].device_kind}, n_layer={n_layer}",
          flush=True)
    cfg, model, params = build(n_layer)
    tok_s_sus, dt_sus = bench_engine_sustained(cfg, model, params)
    print(f"sustained (in-jit greedy loop): {tok_s_sus:8.1f} tok/s "
          f"({dt_sus*1e3:.2f} ms/step, batch {MAX_SEQS})", flush=True)
    tok_s_raw, dt_raw = bench_engine_raw(model, params)
    print(f"raw (engine.step ticks):        {tok_s_raw:8.1f} tok/s "
          f"({dt_raw*1e3:.2f} ms/step, batch {MAX_SEQS})", flush=True)
    # per-step dispatch accounting: the gap the relay adds per tick
    print(f"tick overhead vs in-jit loop: {(dt_raw-dt_sus)*1e3:.2f} ms/step",
          flush=True)


if __name__ == "__main__":
    main()
