#!/usr/bin/env python
"""Hardware train-step decomposition: fwd, fwd+bwd, full step MFU at a
configurable GPT shape (VERDICT r2 item 3 — find where the MFU goes).

Usage: python benchmarks/bench_train_hw.py [n_layer n_embd seq batch]
"""
import os
import sys
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

PEAK = 197.0  # v5e bf16 TFLOP/s


def main():
    args = [int(x) for x in sys.argv[1:]]
    n_layer, n_embd, seq, batch = (args + [4, 2048, 2048, 4])[:4]
    n_head = n_embd // 128

    from vllm_flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
    from vllm_flash_attn_tpu.training.callbacks import model_flops_per_token
    from vllm_flash_attn_tpu.training.train_step import make_optimizer

    cfg = GPTConfig(
        vocab_size=32000, n_positions=0, n_embd=n_embd, n_layer=n_layer,
        n_head=n_head, rotary_emb_dim=128, gated_mlp=True,
        rms_norm=True, qkv_proj_bias=False, out_proj_bias=False,
        mlp_fc1_bias=False, mlp_fc2_bias=False, activation_function="silu",
        n_inner=int(8 * n_embd / 3) // 128 * 128,
        fused_ce_chunk=int(os.environ.get("TB_CE_CHUNK", "0")),
        remat=os.environ.get("TB_REMAT", "none"),
    )
    model = GPTLMHeadModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.bfloat16)
    opt = make_optimizer(lr=1e-4, warmup_steps=10, total_steps=1000)
    opt_state = jax.jit(opt.init)(params)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 32000, (batch, seq)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 32000, (batch, seq)), jnp.int32)

    fpt = model_flops_per_token(
        n_layer, n_embd, n_head, seq, cfg.padded_vocab,
        n_inner=cfg.n_inner, gated=True,
    )
    tok = batch * seq
    NIT = 4

    def timed(fn, *a):
        @jax.jit
        def many(*a):
            def body(c, _):
                return fn(*c), None

            c, _ = jax.lax.scan(body, a, None, length=NIT)
            return jax.tree_util.tree_reduce(
                lambda x, y: x + jnp.sum(y.astype(jnp.float32)), c, 0.0
            )

        t0 = time.time()
        float(many(*a))
        t_c = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            float(many(*a))
            best = min(best, time.time() - t0)
        return best / NIT, t_c

    def fwd2(p, ids_, acc):
        return (p, ids_, acc + model.loss(p, ids_, labels))

    def fwdbwd(p, ids_, acc):
        loss, g = jax.value_and_grad(model.loss)(p, ids_, labels)
        p2 = jax.tree_util.tree_map(
            lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g
        )
        return (p2, ids_, acc + loss)

    def step_state():
        it0 = jnp.zeros((), jnp.int32)

        def full(p, os_, it):
            loss, g = jax.value_and_grad(model.loss)(p, ids, labels)
            p2, os2, _ = opt.update(g, os_, p, it)
            return (p2, os2, it + 1)

        return full, (params, opt_state, it0)

    acc0 = jnp.zeros((), jnp.float32)
    # NOTE: a pure-fwd scan is loop-invariant (same params every iter) and
    # XLA hoists it -> meaningless time; only fwd+bwd and fullstep are real
    t_f, c_f = float("inf"), 0.0
    t_b, c_b = timed(fwdbwd, params, ids, acc0)
    full, st = step_state()
    t_s, c_s = timed(full, *st)

    def mfu(t, mult):
        return tok * fpt * mult / 3 / t / (PEAK * 1e12)

    # fpt convention is fwd+bwd (6N => 2N fwd + 4N bwd); report fwd at 1/3
    print(
        f"shape L{n_layer}/d{n_embd}/s{seq}/b{batch} ce_chunk={cfg.fused_ce_chunk}\n"
        f"fwd      {t_f*1e3:7.1f} ms  {mfu(t_f,1)*100:5.1f}% MFU-equiv (compile {c_f:.0f}s)\n"
        f"fwd+bwd  {t_b*1e3:7.1f} ms  {mfu(t_b,3)*100:5.1f}% MFU (compile {c_b:.0f}s)\n"
        f"fullstep {t_s*1e3:7.1f} ms  {mfu(t_s,3)*100:5.1f}% MFU (compile {c_s:.0f}s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
