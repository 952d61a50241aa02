#!/usr/bin/env python
"""Train-MFU knob sweep (VERDICT r3 item 6: >=65% MFU at 4L/2048d/2048s/b8).

Each arm is a fresh subprocess of bench_train_hw.py (the Pallas-backward
block sizes and Mosaic compiler knobs are per-process trace-time statics),
with env knobs:
  PB_CP       backward-pair structure (''|nobounds|flat|flat,nobounds)
  PB_BQ/PB_BK backward-pair block sizes (default 1024x1024 from round 3)
  TB_CE_CHUNK fused LM-head CE chunk rows (0 = unfused)
  TB_REMAT    per-block remat policy (none|dots|full)

Prints a ranked table of fullstep MFU. Usage:
  python benchmarks/bench_train_sweep_hw.py [--quick] [L d s b]
"""
import os
import re
import subprocess
import sys
import time

ARMS = [
    # name, env
    ("base", {}),
    ("nb", {"PB_CP": "nobounds"}),
    ("fi", {"PB_CP": "fusein"}),
    ("nb_fi", {"PB_CP": "nobounds,fusein"}),
    ("flat_nb", {"PB_CP": "flat,nobounds"}),
    ("ce2048", {"TB_CE_CHUNK": "2048"}),
    ("ce8192", {"TB_CE_CHUNK": "8192"}),
    ("remat_dots", {"TB_REMAT": "dots"}),
    ("bq512_bk1024", {"PB_BQ": "512", "PB_BK": "1024"}),
    ("bq1024_bk2048", {"PB_BQ": "1024", "PB_BK": "2048"}),
    ("bq2048_bk1024", {"PB_BQ": "2048", "PB_BK": "1024"}),
    # combinations of the likely winners (refined after first results)
    ("nb_ce2048", {"PB_CP": "nobounds", "TB_CE_CHUNK": "2048"}),
]

QUICK_ARMS = {"base", "nb", "ce2048", "remat_dots"}

PAT = re.compile(r"fullstep\s+([\d.]+) ms\s+([\d.]+)% MFU")


def main():
    quick = "--quick" in sys.argv
    shape = [a for a in sys.argv[1:] if not a.startswith("-")]
    shape = shape or ["4", "2048", "2048", "8"]
    rows = []
    for name, env in ARMS:
        if quick and name not in QUICK_ARMS:
            continue
        e = dict(os.environ, **env)
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "benchmarks/bench_train_hw.py", *shape],
                env=e, timeout=1500, capture_output=True, text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            out = (r.stdout or "") + (r.stderr or "")
            m = PAT.search(out)
            if m:
                rows.append((float(m.group(2)), float(m.group(1)), name))
                print(f"{name:16s} fullstep {m.group(1)}ms {m.group(2)}% MFU "
                      f"({time.time()-t0:.0f}s)", flush=True)
            else:
                print(f"{name:16s} NO PARSE rc={r.returncode}\n{out[-1500:]}",
                      flush=True)
        except subprocess.TimeoutExpired:
            print(f"{name:16s} TIMEOUT", flush=True)
    rows.sort(reverse=True)
    print("\n== ranked (fullstep MFU) ==")
    for mfu, ms, name in rows:
        print(f"{mfu:5.1f}%  {ms:7.1f} ms  {name}")


if __name__ == "__main__":
    main()
