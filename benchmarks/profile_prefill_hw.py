#!/usr/bin/env python
"""Profile the prefill bench loop on hardware: device-time split between
the pallas kernel and everything around it (copies, fusions, scan carry).

The round-4 floor mystery: with QK+softmax+PV all skipped the kernel call
still costs ~1.7 ms at causal 4k, INVARIANT to block size AND step count —
neither per-step machinery nor per-DMA-byte. This prints where the time
actually sits. Usage: python benchmarks/profile_prefill_hw.py [variant]
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import jax

_cache = os.path.expanduser("~/.cache/jax_comp_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))


def main():
    from vllm_flash_attn_tpu.kernels.flash_prefill import flash_attention

    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    kw = {}
    if variant == "sk_smqk":
        os.environ["PF_SKIP"] = "qk,softmax,pv"
    elif variant == "cpboth":
        kw = dict(cp=("nobounds", "fusein"))
    elif variant != "base":
        # silently profiling 'base' under a typo'd name poisons A/B notes
        raise SystemExit(f"unknown variant {variant!r} (base|sk_smqk|cpboth)")

    b, h, s, d = 1, 32, 4096, 128
    if len(sys.argv) > 2:
        s = int(sys.argv[2])
    if len(sys.argv) > 3:
        b = int(sys.argv[3])
    rng = np.random.default_rng(1)
    q0 = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)

    NIT = 20

    @jax.jit
    def many(q, k, v):
        def body(q, _):
            return flash_attention(q, k, v, causal=True, **kw).astype(
                q.dtype
            ), None

        y, _ = jax.lax.scan(body, q, None, length=NIT)
        return jnp.sum(y.astype(jnp.float32))

    t0 = time.time()
    float(many(q0, k, v))
    print(f"compile+warm {time.time()-t0:.0f}s", flush=True)

    tdir = "/tmp/prefill_profile"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        t0 = time.time()
        float(many(q0, k, v))
        wall = time.time() - t0
    print(f"traced wall {wall*1e3:.1f} ms for {NIT} iters "
          f"({wall/NIT*1e3:.2f} ms/iter)", flush=True)

    paths = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        print("NO TRACE FILE", glob.glob(f"{tdir}/**", recursive=True))
        return
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pid_name = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = {p for p, n in pid_name.items() if "TPU" in n}
    by = defaultdict(lambda: [0.0, 0])
    tot = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev:
            n = e.get("name", "?")
            if n.startswith(("jit_", "while")) or n == "" or n == "0":
                continue
            by[n][0] += float(e.get("dur", 0))
            by[n][1] += 1
            tot += float(e.get("dur", 0))
    print(f"leaf device total {tot/1e3:.1f} ms ({tot/NIT/1e3:.2f} ms/iter)")
    for n, (dur, c) in sorted(by.items(), key=lambda kv: -kv[1][0])[:20]:
        print(f"{dur/1e3:8.2f} ms {c:4d}x {dur/max(c,1):8.1f} us/ea  {n[:80]}")


if __name__ == "__main__":
    main()
