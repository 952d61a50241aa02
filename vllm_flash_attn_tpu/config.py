"""Global configuration for the TPU flash-attention framework.

The reference build funnels runtime flags into compile-time template switches
(csrc/flash_attn/src/static_switch.h). On TPU, JAX retraces per static argument,
so the equivalent is simply passing Python-level flags; this module only holds
process-wide knobs (interpret mode for CPU testing, default block sizes).
"""

from __future__ import annotations

import dataclasses
import os

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


_config = Config()


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
