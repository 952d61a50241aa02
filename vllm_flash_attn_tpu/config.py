"""Global configuration for the TPU flash-attention framework.

The reference build funnels runtime flags into compile-time template switches
(csrc/flash_attn/src/static_switch.h). On TPU, JAX retraces per static
argument, so the equivalent is passing Python-level flags; this module holds
the process-wide knobs (interpret mode for CPU testing, default block sizes)
AND the single documented registry of every kernel perf knob.

## Kernel knob surface (the ONE place they are all defined)

Every knob is a `Config` field (programmatic surface: mutate
`get_config().<name>`), with an env-var override of the same meaning for
shell-level A/Bs (`knob(name)` returns env if set, else the config value).
Explicit kernel kwargs always win over both.

Resolution discipline: kernel entry points resolve knobs OUTSIDE their jit
and pass them as static arguments, so every distinct value gets its own
executable — changing a knob mid-process takes effect on the next call.
Exception: `pd_*` knobs are read ONCE at kernel-module import (they steer
trace-time structure inside the jitted decode path); set them before the
first import, or via env at process start.

Defaults are the measured v5e winners (rounds 2-5 hardware A/Bs):
- pf_cp default auto = ("nobounds", "fusein"): +26% prefill raw (round 4).
- pf_unroll/pf_two_pass/pf_pbf16/pf_rowsum/pf_interleave/pf_dense default
  off: every one measured neutral-or-loss at the b=4 headline shape
  (round 5; two_pass -22%, pbf16 -5%, il4 -15%).
- pb_bq/pb_bk = 1024: round-3 backward block sweep (59.9% -> 61% MFU).
- pd_qint8/pd_qpv ON: int8 decode marginal 1.43x -> 0.53x vs bf16.
- fused_append ON: in-kernel append measured free at decode shapes.
- embed_grad auto: one-hot MXU matmul where XLA's scatter degenerates
  (modules/embedding.py measurement table; 12% of the 2.7B-shape step).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax


@dataclasses.dataclass
class Config:
    # None = autodetect: run Pallas kernels in interpreter mode unless on TPU.
    interpret: bool | None = None
    # Default kernel tile sizes (tuned on v5e); overridable per-call.
    block_q: int = 1024
    block_k: int = 1024
    # Decode kernel: kv tokens gathered per compute block.
    decode_block_k: int = 512
    # Embedding-gradient path: "auto" (one-hot MXU matmul at widths where
    # XLA's TPU scatter degenerates — see modules/embedding.py measurement
    # table), "matmul", or "scatter".
    embed_grad: str = "auto"

    # ---- prefill kernel (kernels/flash_prefill.py) -------------------------
    pf_rowsum: bool = False      # fuse rowsum into PV via ones-column (loses at d=128)
    pf_pbf16: bool = False       # bf16 p matrix (measured -5% at b=4)
    pf_interleave: int = 1       # independent sub-q chains per grid step
    pf_dense: bool = False       # dense grid even for causal/window
    pf_skip: Tuple[str, ...] = ()  # stage isolation (WRONG RESULTS): qk,softmax,pv
    pf_chunk: int = 0            # kv tiles per grid step (chunked-sweep kernel)
    pf_pipe: bool = False        # software-pipelined inner loop (measured loss)
    pf_diag: bool = False        # enable the diagonal-bias experiment (neutral)
    pf_two_pass: bool = False    # lse-then-pv two kernels (-22% at b=4)
    pf_unroll: int = 0           # statically unrolled block_k tiles per step
    pf_cp: Optional[Tuple[str, ...]] = None  # Mosaic compiler knobs; None =
    #   auto: () in interpret, ("nobounds","fusein") on hardware (+26% r4)
    pf_diagsplit: bool = True  # causal diagonal-tile QUADRANT skip: when a
    #   chain's top half-rows cannot see the right half of k, the tile
    #   splits — top half-rows contract only k[:block_k//2] (the quadrant
    #   drops out of both GEMMs and the softmax), bottom half-rows run full
    #   width. Plain-causal only; bit-exact (the kept region computes
    #   identically). Hardware A/B at b=4 causal 4k: 78.3 -> 82.0 TF raw
    #   (+4.7%). Read ONCE at flash_prefill import.
    pf_nocond: bool = False  # replace the per-tile lax.cond dual path
    #   (masked vs unmasked online_update) with unconditional masking.
    #   A VMEM-resident MICRObenchmark showed the cond costing ~3 us/tile
    #   (both branches predicated: plain 3.28 / mask_all 3.62 / cond 6.57
    #   us per 1024x1024 tile), but in the REAL kernel the cond lowers as a
    #   cheap branch and unconditional masking LOSES ~3% (b=4 causal 4k
    #   interleaved A/B with cleared jit caches: cond 78.1/77.8 TF vs
    #   nocond 75.6/75.4). Default off; read ONCE at flash_prefill import.

    # ---- attention backward (kernels/flash_backward_pallas.py) -------------
    xla_bwd: bool = False        # force the XLA backward (no Pallas pair)
    pb_bq: int = 1024            # backward dQ/dKV block sizes (round-3 sweep)
    pb_bk: int = 1024
    pb_cp: Tuple[str, ...] = ()  # Mosaic compiler knobs for the backward pair

    # ---- paged decode (kernels/paged_decode.py; read ONCE at import) -------
    pd_skip: Tuple[str, ...] = ()  # stage isolation (WRONG RESULTS)
    pd_qint8: bool = True        # int8 x int8 MXU QK on quantized caches
    pd_qpv: bool = True          # int8 PV with requantized p (0.807 -> 0.547)

    # ---- varlen kernels ----------------------------------------------------
    vf_splash: bool = False      # folded active-pair grid (flash_varlen)
    vf_diagsplit: bool = False   # varlen diagonal quadrant skip (the
    #   prefill win ported): predicate computed FROM the metadata mask.
    #   MEASURED -8% on the packed mix — the mask reduction costs a
    #   full-tile pass on EVERY tile while mixed-length batches rarely
    #   qualify (bit-exact either way). Default off; pf_diagsplit's
    #   arithmetic predicate keeps the +4.7% on dense causal.
    vf_cp: Tuple[str, ...] = ()  # Mosaic compiler knobs (flash_varlen)
    vp_splash: bool = False      # folded grid (varlen_paged)
    vp_allheads: bool = True     # all-heads-per-step varlen_paged kernel:
    #   one full-page DMA shared by every head + static head loop (the
    #   decode kernel's pattern) vs the per-(head, page) 4KB-DMA grid

    # ---- API / serving -----------------------------------------------------
    fused_append: bool = True    # in-kernel cache append on the kvcache path


_config = Config()

# knob name -> env var override (same semantics; env wins over the config
# value so shell-level A/B harnesses need no code changes)
_KNOB_ENV = {
    "pf_rowsum": "PF_ROWSUM",
    "pf_pbf16": "PF_PBF16",
    "pf_interleave": "PF_INTERLEAVE",
    "pf_dense": "PF_DENSE",
    "pf_skip": "PF_SKIP",
    "pf_chunk": "PF_CHUNK",
    "pf_pipe": "PF_PIPE",
    "pf_diag": "PF_DIAG",
    "pf_two_pass": "PF_TWOPASS",
    "pf_unroll": "PF_UNROLL",
    "pf_cp": "PF_CP",
    "pf_nocond": "PF_NOCOND",
    "pf_diagsplit": "PF_DIAGSPLIT",
    "xla_bwd": "VFA_XLA_BWD",
    "pb_bq": "PB_BQ",
    "pb_bk": "PB_BK",
    "pb_cp": "PB_CP",
    "pd_skip": "PD_SKIP",
    "pd_qint8": "PD_QINT8",
    "pd_qpv": "PD_QPV",
    "vf_splash": "VF_SPLASH",
    "vf_diagsplit": "VF_DIAGSPLIT",
    "vf_cp": "VF_CP",
    "vp_splash": "VP_SPLASH",
    "vp_allheads": "VP_ALLHEADS",
    "fused_append": "VFA_FUSED_APPEND",
    "embed_grad": "VFA_EMBED_GRAD",
}


def knob(name: str):
    """Resolve one kernel knob: env override if set, else the Config field.

    Kernel entry points call this OUTSIDE their jit and pass the value as a
    static argument — each distinct value gets its own executable, so there
    is no stale-trace hazard at this layer. `pf_cp` returns None for "auto"
    (caller picks the interpret-aware default); env "none" forces empty."""
    cfg_val = getattr(_config, name)
    raw = os.environ.get(_KNOB_ENV[name])
    if raw is None:
        return cfg_val
    if name.endswith("_cp") or name.endswith("_skip"):
        return tuple(x for x in raw.split(",") if x and x != "none")
    if isinstance(cfg_val, bool) or name == "fused_append":
        return raw == "1"
    if isinstance(cfg_val, int):
        return int(raw)
    return raw


def get_config() -> Config:
    return _config


def use_interpret() -> bool:
    """Whether Pallas kernels should run in interpreter mode.

    TPU -> compiled Mosaic kernels. Anything else (CPU tests with a virtual
    device mesh) -> interpreter, which doubles as the "sanitizer" path
    (SURVEY.md §5.2).
    """
    if _config.interpret is not None:
        return _config.interpret
    if os.environ.get("VFA_TPU_FORCE_INTERPRET", "") == "1":
        return True
    return jax.default_backend() != "tpu"
