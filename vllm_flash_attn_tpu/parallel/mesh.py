"""Device-mesh construction and multi-host initialization.

Replaces the reference's NCCL/Gloo process-group plumbing
(/root/reference/training/src/utils/distributed.py:23-111, apex
parallel_state): on TPU the mesh IS the process group — axis names address the
collectives, ICI carries intra-slice traffic, DCN inter-slice
(jax.distributed.initialize).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """jax.distributed.initialize wrapper (env:// rendezvous analog)."""
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a Mesh. Default: all devices on ('data','model') with model axis
    as large as divides the device count (favoring TP within a host)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if axis_sizes is None:
        model = 1
        for cand in (8, 4, 2, 1):
            if n % cand == 0:
                model = cand
                break
        axis_sizes = (n // model, model)
    assert int(np.prod(axis_sizes)) == n, (axis_sizes, n)
    return Mesh(devices.reshape(*axis_sizes), axis_names)
