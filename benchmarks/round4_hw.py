#!/usr/bin/env python
"""Round-4 hardware measurement runbook (run when the axon relay answers).

Sequences every pending hardware A/B with per-step timeouts so one wedged
kernel (Mosaic run-time failures can stall the relay ~10 min) does not eat
the session. Order: correctness smokes first (they catch lowering rejects
at small shapes), then the perf A/Bs, then the driver bench.

Usage: python benchmarks/round4_hw.py [--quick]
"""
import subprocess
import sys
import time

STEPS = [
    # 1. hardware smokes: padded/packed quantized pools, MQA int8, fused
    #    append, chunked prefill (each tiny; catches Mosaic-only failures)
    # 0. tiny-shape flat-kernel smoke FIRST: bench.py's prefill auto-tune
    #    also tries the flat lowering, so resolve its run-or-wedge risk at
    #    the smallest shape before anything else touches it
    ("flat-smoke", ["python", "benchmarks/smoke_flat_hw.py"], 2400),
    ("smoke", ["python", "benchmarks/smoke_engine_hw.py"], 2400),
    # 1b. bank a driver-format number EARLY (bench.py self-preserves to
    #     BENCH_LOCAL_r*.json) in case the relay window closes mid-runbook;
    #     it runs again at the end after the A/Bs
    ("bench-early", ["python", "bench.py"], 2400),
    # 2. prefill A/B: round-4 structures vs base, one process
    (
        "prefill-ab",
        [
            "python", "benchmarks/bench_prefill_hw.py",
            "base", "twopass", "twopass_b512", "unroll2", "unroll4",
            "unroll4_bk512", "tp_unroll2", "tp_unroll4", "tp_unroll4_bk512",
            "nobounds", "fusein", "cpboth", "unroll4_nb", "tp_unroll4_nb",
        ],
        5400,
    ),
    # 2b. flat manual-DMA structure — SEPARATE steps: it is the riskiest new
    #     Mosaic surface (manual DMA ring); a run-time failure wedging the
    #     relay must not poison the core A/Bs above (tiny smoke ran at step 0)
    (
        "prefill-flat",
        [
            "python", "benchmarks/bench_prefill_hw.py",
            "base", "flat", "flat_nb", "flat_d3", "flat_bk512",
            "flat_d3_bk512", "flat_b512", "flat_bq2048", "tp_flat",
            "tp_flat_nb",
        ],
        5400,
    ),
    # 3. decode: bf16 vs int8 (packed scales) marginal ratio
    ("decode-int8", ["python", "benchmarks/benchmark_decode.py"], 2400),
    # 3b. int8 PV experiment: qpv on/off in ONE process (MHA + GQA points)
    ("decode-qpv", ["python", "benchmarks/bench_qpv_hw.py"], 2400),
    # 3c. splash folded varlen grid vs dense skipped-step grid (also the
    #     Mosaic dynamic-grid-bound lowering smoke)
    ("varlen-splash", ["python", "benchmarks/bench_varlen_splash_hw.py"], 2400),
    # 3d. split-KV merge-overhead + first hardware numerics for the split path
    ("splitkv", ["python", "benchmarks/bench_splitkv_hw.py"], 2400),
    # 3d2. packed-batch varlen backward: Pallas pad-per-seq route vs XLA
    ("varlen-bwd", ["python", "benchmarks/bench_varlen_bwd_hw.py"], 2400),
    # 3e. train-step A/B: Mosaic bounds checks off in the backward pair
    #     (per-process knob, so a separate process per arm)
    ("train-base", ["python", "benchmarks/bench_train_hw.py"], 2400),
    (
        "train-nb",
        ["env", "PB_CP=nobounds", "python", "benchmarks/bench_train_hw.py"],
        2400,
    ),
    (
        "train-flat",
        ["env", "PB_CP=flat", "python", "benchmarks/bench_train_hw.py"],
        2400,
    ),
    # 4. the driver metric end-to-end
    ("bench", ["python", "bench.py"], 2400),
]


def main():
    quick = "--quick" in sys.argv
    results = {}
    for name, cmd, tmo in STEPS:
        if quick and name == "decode-int8":
            continue
        t0 = time.time()
        print(f"== {name}: {' '.join(cmd)}", flush=True)
        try:
            r = subprocess.run(
                cmd, timeout=tmo, capture_output=True, text=True,
                cwd="/root/repo",
            )
            out = (r.stdout or "") + (r.stderr or "")
            results[name] = r.returncode
        except subprocess.TimeoutExpired as e:
            out = ((e.stdout or b"").decode() if e.stdout else "") + "\nTIMEOUT"
            results[name] = "timeout"
        print(out[-4000:], flush=True)
        print(f"== {name} done rc={results[name]} ({time.time()-t0:.0f}s)\n",
              flush=True)
    print("SUMMARY:", results, flush=True)


if __name__ == "__main__":
    main()
