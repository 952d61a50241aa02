"""Fused dense (matmul+bias+activation) ops and tensor-parallel linears.

Covers `csrc/fused_dense_lib` (/root/reference/csrc/fused_dense_lib/
fused_dense.cpp:40-216: linear_bias_wgrad / linear_act_forward /
bias_act_linear_dgrad_bgrad) and `flash_attn.ops.fused_dense`
(FusedDense, ColumnParallelLinear, RowParallelLinear, FusedMLP,
ParallelFusedMLP — surface pinned by tests/ops/test_fused_dense_parallel.py).

On TPU, matmul+bias+gelu is a single MXU pass with the epilogue fused by XLA —
the cuBLASLt epilogue machinery is the default here. The parallel variants use
explicit collectives so they compose with shard_map; `sequence_parallel=True`
all-gathers activations sharded along the sequence axis before the matmul and
reduce-scatters after, Megatron-style (SURVEY.md §2.7 SP row).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def gelu_approx(x):
    return jax.nn.gelu(x, approximate=True)


def sqrelu(x):
    r = jnp.maximum(x, 0.0)
    return r * r


def swiglu(gate, up):
    return jax.nn.silu(gate) * up


_ACT = {"gelu_approx": gelu_approx,
        # jax.nn.gelu defaults to the tanh approximation; "gelu" means exact
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "relu": jax.nn.relu,
        "sqrelu": sqrelu, "silu": jax.nn.silu, "id": lambda x: x}


def fused_dense_func(x, weight, bias=None, activation: str = "id"):
    """y = act(x @ w^T + b). Weight stored (out, in) like torch.nn.Linear."""
    y = jnp.einsum("...i,oi->...o", x, weight)
    if bias is not None:
        y = y + bias
    return _ACT[activation](y)


def fused_mlp_func(
    x, w1, b1, w2, b2, activation: str = "gelu_approx",
):
    """fc1 -> act -> fc2, the FusedMLP forward (fused_dense.cpp:93-155)."""
    return fused_dense_func(fused_dense_func(x, w1, b1, activation), w2, b2)


# --- tensor-parallel linears (explicit-collective form, for shard_map) ---


def column_parallel_linear(
    x, weight_shard, bias_shard=None, *, axis_name: str,
    sequence_parallel: bool = False, activation: str = "id",
):
    """Weight sharded on the output dim; output stays sharded (no collective on
    the forward path). With sequence_parallel, x arrives sharded along its
    second-to-last (sequence) axis and is all-gathered first."""
    if sequence_parallel:
        x = jax.lax.all_gather(x, axis_name, axis=x.ndim - 2, tiled=True)
    return fused_dense_func(x, weight_shard, bias_shard, activation)


def row_parallel_linear(
    x_shard, weight_shard, bias=None, *, axis_name: str,
    sequence_parallel: bool = False,
):
    """Weight sharded on the input dim; partial products are summed across the
    axis (psum), or reduce-scattered along the sequence axis when
    sequence_parallel (the Megatron SP trick that keeps activations sharded)."""
    partial = jnp.einsum("...i,oi->...o", x_shard, weight_shard)
    if sequence_parallel:
        full = jax.lax.psum_scatter(
            partial, axis_name, scatter_dimension=partial.ndim - 2, tiled=True
        )
    else:
        full = jax.lax.psum(partial, axis_name)
    if bias is not None:
        full = full + bias
    return full


class FusedDense:
    """Parameter container mirroring flash_attn.ops.fused_dense.FusedDense."""

    def __init__(self, in_features: int, out_features: int, use_bias: bool = True):
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = use_bias

    def init(self, key, dtype=jnp.float32):
        wk, bk = jax.random.split(key)
        bound = 1.0 / math.sqrt(self.in_features)
        p = {
            "weight": jax.random.uniform(
                wk, (self.out_features, self.in_features), dtype, -bound, bound
            )
        }
        if self.use_bias:
            p["bias"] = jax.random.uniform(
                bk, (self.out_features,), dtype, -bound, bound
            )
        return p

    def apply(self, params, x, activation: str = "id"):
        return fused_dense_func(x, params["weight"], params.get("bias"), activation)
