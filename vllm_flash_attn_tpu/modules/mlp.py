"""MLP modules (the `flash_attn.modules.mlp` surface: Mlp/FusedMLP, GatedMlp,
Parallel* variants — pinned by /root/reference/tests/modules/test_mlp_parallel.py).

FusedMLP == Mlp on TPU (XLA fuses bias+activation into the matmuls; that is all
csrc/fused_dense_lib buys). Parallel variants are Megatron column->row sharded
for shard_map bodies.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from vllm_flash_attn_tpu.ops.fused_dense import _ACT


@dataclasses.dataclass
class Mlp:
    in_features: int
    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    activation: str = "gelu_approx"
    bias1: bool = True
    bias2: bool = True

    def __post_init__(self):
        self.hidden = self.hidden_features or 4 * self.in_features
        self.out = self.out_features or self.in_features

    def init(self, key, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        s1 = 1.0 / math.sqrt(self.in_features)
        s2 = 1.0 / math.sqrt(self.hidden)
        p = {
            "fc1": {"weight": jax.random.normal(k1, (self.hidden, self.in_features), dtype) * s1},
            "fc2": {"weight": jax.random.normal(k2, (self.out, self.hidden), dtype) * s2},
        }
        if self.bias1:
            p["fc1"]["bias"] = jnp.zeros((self.hidden,), dtype)
        if self.bias2:
            p["fc2"]["bias"] = jnp.zeros((self.out,), dtype)
        return p

    def apply(self, params, x):
        y = jnp.einsum("...d,od->...o", x, params["fc1"]["weight"])
        if "bias" in params["fc1"]:
            y = y + params["fc1"]["bias"]
        y = _ACT[self.activation](y)
        y = jnp.einsum("...d,od->...o", y, params["fc2"]["weight"])
        if "bias" in params["fc2"]:
            y = y + params["fc2"]["bias"]
        return y


FusedMLP = Mlp  # XLA fuses the epilogues; kept as an alias for API parity.


@dataclasses.dataclass
class GatedMlp:
    """SwiGLU/GeGLU MLP (llama-style). fc1 produces [gate; up] stacked."""

    in_features: int
    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    activation: str = "silu"
    bias1: bool = False
    bias2: bool = False

    def __post_init__(self):
        self.hidden = self.hidden_features or int(8 * self.in_features / 3)
        self.out = self.out_features or self.in_features

    def init(self, key, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        s1 = 1.0 / math.sqrt(self.in_features)
        s2 = 1.0 / math.sqrt(self.hidden)
        p = {
            "fc1": {"weight": jax.random.normal(k1, (2 * self.hidden, self.in_features), dtype) * s1},
            "fc2": {"weight": jax.random.normal(k2, (self.out, self.hidden), dtype) * s2},
        }
        if self.bias1:
            p["fc1"]["bias"] = jnp.zeros((2 * self.hidden,), dtype)
        if self.bias2:
            p["fc2"]["bias"] = jnp.zeros((self.out,), dtype)
        return p

    def apply(self, params, x):
        y = jnp.einsum("...d,od->...o", x, params["fc1"]["weight"])
        if "bias" in params["fc1"]:
            y = y + params["fc1"]["bias"]
        gate, up = jnp.split(y, 2, axis=-1)
        y = _ACT[self.activation](gate) * up
        y = jnp.einsum("...d,od->...o", y, params["fc2"]["weight"])
        if "bias" in params["fc2"]:
            y = y + params["fc2"]["bias"]
        return y


@dataclasses.dataclass
class ParallelMLP(Mlp):
    """fc1 column-parallel, fc2 row-parallel + psum (ParallelFusedMLP analog)."""

    axis_name: str = "model"
    sequence_parallel: bool = False

    def shard_params(self, params, axis_size: int, index: int):
        hs = self.hidden // axis_size
        out = {
            "fc1": {"weight": params["fc1"]["weight"][index * hs : (index + 1) * hs]},
            "fc2": {"weight": params["fc2"]["weight"][:, index * hs : (index + 1) * hs]},
        }
        if "bias" in params["fc1"]:
            out["fc1"]["bias"] = params["fc1"]["bias"][index * hs : (index + 1) * hs]
        if "bias" in params["fc2"]:
            out["fc2"]["bias"] = params["fc2"]["bias"]
        return out

    def apply(self, params, x):
        if self.sequence_parallel:
            x = jax.lax.all_gather(x, self.axis_name, axis=1, tiled=True)
        y = jnp.einsum("...d,od->...o", x, params["fc1"]["weight"])
        if "bias" in params["fc1"]:
            y = y + params["fc1"]["bias"]
        y = _ACT[self.activation](y)
        partial = jnp.einsum("...d,od->...o", y, params["fc2"]["weight"])
        if self.sequence_parallel:
            out = jax.lax.psum_scatter(
                partial, self.axis_name, scatter_dimension=1, tiled=True
            )
        else:
            out = jax.lax.psum(partial, self.axis_name)
        if "bias" in params["fc2"]:
            out = out + params["fc2"]["bias"]
        return out


ParallelFusedMLP = ParallelMLP


@dataclasses.dataclass
class ParallelGatedMlp(GatedMlp):
    axis_name: str = "model"
    sequence_parallel: bool = False

    def shard_params(self, params, axis_size: int, index: int):
        hs = self.hidden // axis_size
        w1 = params["fc1"]["weight"]
        gate = w1[: self.hidden][index * hs : (index + 1) * hs]
        up = w1[self.hidden :][index * hs : (index + 1) * hs]
        out = {
            "fc1": {"weight": jnp.concatenate([gate, up])},
            "fc2": {"weight": params["fc2"]["weight"][:, index * hs : (index + 1) * hs]},
        }
        if "bias" in params["fc2"]:
            out["fc2"]["bias"] = params["fc2"]["bias"]
        return out

    def apply(self, params, x):
        if self.sequence_parallel:
            x = jax.lax.all_gather(x, self.axis_name, axis=1, tiled=True)
        y = jnp.einsum("...d,od->...o", x, params["fc1"]["weight"])
        gate, up = jnp.split(y, 2, axis=-1)
        y = _ACT[self.activation](gate) * up
        partial = jnp.einsum("...d,od->...o", y, params["fc2"]["weight"])
        if self.sequence_parallel:
            out = jax.lax.psum_scatter(
                partial, self.axis_name, scatter_dimension=1, tiled=True
            )
        else:
            out = jax.lax.psum(partial, self.axis_name)
        if "bias" in params["fc2"]:
            out = out + params["fc2"]["bias"]
        return out
