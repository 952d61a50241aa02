"""Dual-baseline tolerance harness (SURVEY.md §4).

Pass criterion mirrors the reference test philosophy
(/root/reference/tests/test_flash_attn.py:681-683): the kernel's max abs error
vs an fp32-upcast oracle must be <= `mult` x the error of the *same* computation
run in native dtype with reordered ops (which estimates intrinsic fp error).
"""

import numpy as np


def check_close(out, out_ref, out_pt, mult=2.0, abs_floor=1e-5, what="out"):
    out = np.asarray(out, dtype=np.float64)
    out_ref = np.asarray(out_ref, dtype=np.float64)
    out_pt = np.asarray(out_pt, dtype=np.float64)
    err = np.abs(out - out_ref).max()
    err_base = np.abs(out_pt - out_ref).max()
    assert err <= mult * err_base + abs_floor, (
        f"{what}: err {err:.3e} > {mult} * baseline {err_base:.3e} + {abs_floor}"
    )
    return err, err_base
