#!/usr/bin/env python
"""Hardware A/B harness for the prefill kernel (real TPU).

Usage: python benchmarks/bench_prefill_hw.py [variant ...]
Variants: base rowsum bq512 bk512 bq2048 s2048 (default: base rowsum)
Prints raw TFLOP/s at causal 4k for each, all in ONE process so the
numbers are comparable (cross-process variance is ~30%).
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


def timed(fn, chain_arg, *args, n_iter=20):
    @jax.jit
    def many(y, *a):
        def body(y, _):
            return fn(y, *a).astype(y.dtype), None

        y, _ = jax.lax.scan(body, y, None, length=n_iter)
        return jnp.sum(y.astype(jnp.float32))

    t0 = time.time()
    float(many(chain_arg, *args))  # warm + compile
    t_compile = time.time() - t0
    best = min(
        _run_once(many, chain_arg, *args) for _ in range(3)
    )
    return best / n_iter, t_compile


def _run_once(many, chain_arg, *args):
    t0 = time.time()
    float(many(chain_arg, *args))
    return time.time() - t0


VARIANTS = {
    "base": dict(),
    # round-4 experiments (see flash_prefill.py): two-pass lse-then-pv and
    # statically unrolled multi-k-tile grid steps
    "twopass": dict(two_pass=True),
    "twopass_b512": dict(two_pass=True, block_q=512, block_k=512),
    "twopass_bk2048": dict(two_pass=True, block_k=2048),
    "twopass_bq512": dict(two_pass=True, block_q=512),
    "unroll2": dict(unroll=2),
    "unroll4": dict(unroll=4),
    "unroll2_bk512": dict(unroll=2, block_k=512),
    "unroll4_bk512": dict(unroll=4, block_k=512),
    "unroll8_bk512": dict(unroll=8, block_k=512),
    "unroll4_b512": dict(unroll=4, block_q=512, block_k=512),
    # composed: two-pass structure x multi-k-tile steps (both passes)
    "tp_unroll2": dict(two_pass=True, unroll=2),
    "tp_unroll4": dict(two_pass=True, unroll=4),
    "tp_unroll4_bk512": dict(two_pass=True, unroll=4, block_k=512),
    "tp_unroll8_bk512": dict(two_pass=True, unroll=8, block_k=512),
    # round-4 flat manual-DMA structure (one grid step per q block, hand
    # double-buffered HBM->VMEM k/v ring; see _fwd_kernel_flat)
    "flat": dict(cp=("flat",)),
    "flat_nb": dict(cp=("flat", "nobounds")),
    "flat_bk512": dict(cp=("flat",), block_k=512),
    "flat_bk2048": dict(cp=("flat",), block_k=2048),
    "flat_b512": dict(cp=("flat",), block_q=512, block_k=512),
    "flat_bq2048": dict(cp=("flat",), block_q=2048),
    "tp_flat": dict(two_pass=True, cp=("flat",)),
    "tp_flat_nb": dict(two_pass=True, cp=("flat", "nobounds")),
    "tp_flat_bk512": dict(two_pass=True, cp=("flat",), block_k=512),
    # ring depth: d3/d4 deepen the DMA prefetch pipeline
    "flat_d3": dict(cp=("flat", "d3")),
    "flat_d4": dict(cp=("flat", "d4")),
    "flat_d3_bk512": dict(cp=("flat", "d3"), block_k=512),
    # round-4 Mosaic compiler knobs (see flash_prefill._cparams)
    # 2048 blocks OOM scoped-vmem under allow_input_fusion: nobounds-only
    "b2048_nb": dict(block_q=2048, block_k=2048, cp=("nobounds",)),
    "bq2048_nb": dict(block_q=2048, cp=("nobounds",)),
    "bk2048_nb": dict(block_k=2048, cp=("nobounds",)),
    "nobounds": dict(cp=("nobounds",)),
    "fusein": dict(cp=("fusein",)),
    "cpboth": dict(cp=("nobounds", "fusein")),
    # round-5: structure x the winning compiler knobs, for the b=4 A/Bs
    # (every earlier structure A/B ran b=1 where the ~1.4ms dispatch gap
    # polluted ~50% of wall — VERDICT r04 #1)
    "tp_cpboth": dict(two_pass=True, cp=("nobounds", "fusein")),
    "unroll2_cpboth": dict(unroll=2, cp=("nobounds", "fusein")),
    "unroll4_cpboth": dict(unroll=4, cp=("nobounds", "fusein")),
    "tp_unroll2_cpboth": dict(two_pass=True, unroll=2,
                              cp=("nobounds", "fusein")),
    "tp_unroll4_cpboth": dict(two_pass=True, unroll=4,
                              cp=("nobounds", "fusein")),
    "bk2048_cpboth": dict(block_k=2048, cp=("nobounds", "fusein")),
    "bq512_cpboth": dict(block_q=512, cp=("nobounds", "fusein")),
    "bk512_cpboth": dict(block_k=512, cp=("nobounds", "fusein")),
    "bq2048_cpboth": dict(block_q=2048, cp=("nobounds", "fusein")),
    "unroll8_bk512_cpboth": dict(unroll=8, block_k=512,
                                 cp=("nobounds", "fusein")),
    "tp_unroll4_nb": dict(two_pass=True, unroll=4, cp=("nobounds",)),
    "unroll4_nb": dict(unroll=4, cp=("nobounds",)),
    "rowsum": dict(fuse_rowsum=True),
    "bq512": dict(block_q=512),
    "bk512": dict(block_k=512),
    "b512": dict(block_q=512, block_k=512),
    "bq2048": dict(block_q=2048),
    "bk2048": dict(block_k=2048),
    "b2048": dict(block_q=2048, block_k=2048),
    "nc": dict(causal=False),
}

# env-knob variants (read at trace time inside _flash_attention_impl; each
# variant gets a fresh jit trace, so setting os.environ between variants
# works within one process)
ENV_VARIANTS = {
    "il2": {"PF_INTERLEAVE": "2"},
    "il4": {"PF_INTERLEAVE": "4"},
    "il8": {"PF_INTERLEAVE": "8"},
    "pbf16": {"PF_PBF16": "1"},
    "il4p": {"PF_INTERLEAVE": "4", "PF_PBF16": "1"},
    "il2p": {"PF_INTERLEAVE": "2", "PF_PBF16": "1"},
    "dense": {"PF_DENSE": "1"},
    "il4bq512": {"PF_INTERLEAVE": "4"},
    # stage isolation: what's left when a stage is skipped
    "sk_sm": {"PF_SKIP": "softmax"},        # overhead+DMA+both GEMMs
    "sk_qkpv": {"PF_SKIP": "qk,pv"},        # overhead+DMA+softmax VPU
    "sk_smqk": {"PF_SKIP": "qk,softmax,pv"},  # overhead+DMA only
    # floor decomposition: per-STEP constant vs per-BYTE — bk512 doubles
    # step count at half the tile area; b2048 quarters steps at 4x area.
    # All three arms run cp=("nobounds",) (set below) so only block geometry
    # varies — a compiler knob on one arm would confound the decomposition.
    "sk_smqk_bk512": {"PF_SKIP": "qk,softmax,pv"},
    "sk_smqk_b2048": {"PF_SKIP": "qk,softmax,pv"},
    "sk_all_dense": {"PF_SKIP": "qk,softmax,pv", "PF_DENSE": "1"},
    # chunked-sweep kernel: kv tiles loop inside the grid step
    "ck2k": {"PF_CHUNK": "2048"},
    "ck4k": {"PF_CHUNK": "4096"},
    "ck8k": {"PF_CHUNK": "8192"},
    # + software-pipelined inner loop (QK of tile j+1 issued before
    # softmax/PV of tile j)
    "ckp4k": {"PF_CHUNK": "4096", "PF_PIPE": "1"},
    "ckp4kbk512": {"PF_CHUNK": "4096", "PF_PIPE": "1"},
    "ckp4kbq512": {"PF_CHUNK": "4096", "PF_PIPE": "1"},
    # combined VMEM-traffic cuts on the stepped kernel
    "pr": {"PF_PBF16": "1", "PF_ROWSUM": "1"},
    "nodiag": {"PF_NODIAG": "1"},  # disable the diagonal-bias fast path
    "prd": {"PF_PBF16": "1", "PF_ROWSUM": "1", "PF_DENSE": "1"},
    # env knob x winning compiler params (names ending "cp" get
    # cp=("nobounds","fusein") below) — the round-5 b=4 sweep
    "pbf16cp": {"PF_PBF16": "1"},
    "prcp": {"PF_PBF16": "1", "PF_ROWSUM": "1"},
    "il2cp": {"PF_INTERLEAVE": "2"},
    "il4cp": {"PF_INTERLEAVE": "4"},
    "densecp": {"PF_DENSE": "1"},
}
_ENV_KEYS = (
    "PF_INTERLEAVE", "PF_PBF16", "PF_DENSE", "PF_ROWSUM", "PF_SKIP",
    "PF_CHUNK", "PF_PIPE", "PF_NODIAG",
)


def main():
    from vllm_flash_attn_tpu.kernels.flash_prefill import flash_attention

    names = sys.argv[1:] or ["base", "rowsum"]
    # VFA_PF_B/VFA_PF_S: run the sweep at another (batch, seqlen) — the
    # round-5 headline shape is b=4 (dispatch gap amortized; every earlier
    # b=1 A/B had the ~1.4ms constant polluting ~50% of the wall clock)
    b = int(os.environ.get("VFA_PF_B", "1"))
    s = int(os.environ.get("VFA_PF_S", "4096"))
    h, d = 32, 128
    rng = np.random.default_rng(1)
    q0 = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    flops = 4 * b * s * s * h * d / 2

    for name in names:
        for ek in _ENV_KEYS:
            os.environ.pop(ek, None)
        if name in ENV_VARIANTS:
            os.environ.update(ENV_VARIANTS[name])
            kw = dict()
            if name.endswith("bq512") and name != "il4bq512":
                kw = dict(block_q=512)
            elif name == "il4bq512":
                kw = dict(block_q=512)
            elif name.endswith("bk512"):
                kw = dict(block_k=512)
            elif name.endswith("b2048"):
                kw = dict(block_q=2048, block_k=2048)
            if name.startswith("sk_smqk"):
                kw["cp"] = ("nobounds",)  # same cp across all three arms
            if name.endswith("cp") and not name.startswith("sk_"):
                kw["cp"] = ("nobounds", "fusein")
        else:
            kw = dict(VARIANTS[name])  # copy: pop below must not mutate the table

        causal = kw.pop("causal", True) if isinstance(kw, dict) else True

        def step(q, k, v, kw=kw, causal=causal):
            return flash_attention(q, k, v, causal=causal, **kw)

        try:
            dt, t_c = timed(step, q0, k, v)
        except Exception as e:
            # one variant failing to compile (e.g. VMEM OOM at big blocks
            # under allow_input_fusion) must not kill the rest of the sweep
            print(f"{name:8s} causal 4k: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]})", flush=True)
            continue
        print(
            f"{name:8s} causal 4k: {flops/dt/1e12:6.1f} TFLOP/s raw  "
            f"({dt*1e3:.2f} ms/step, compile {t_c:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
