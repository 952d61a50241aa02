"""Transformer block (`flash_attn.modules.block.Block` surface, pinned by
/root/reference/tests/modules/test_block_parallel.py).

Pre-norm residual-carry design matching the reference's fused_dropout_add_ln
data flow: the residual stream is carried separately (optionally fp32,
configs/experiment/pile/gpt3s-flash.yaml:8) and each norm fuses the
dropout+add. Also supports the GPT-J parallel block (attn and mlp read the
same normed input; one residual add).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from vllm_flash_attn_tpu.ops.layer_norm import dropout_add_layer_norm


@dataclasses.dataclass
class Block:
    dim: int
    mha: object  # MHA-like module
    mlp: object  # Mlp-like module
    resid_dropout1: float = 0.0
    resid_dropout2: float = 0.0
    prenorm: bool = True
    parallel_block: bool = False
    residual_in_fp32: bool = False
    rms_norm: bool = False
    norm_epsilon: float = 1e-5

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, 4)
        p = {
            "mixer": self.mha.init(keys[0], dtype),
            "mlp": self.mlp.init(keys[1], dtype),
            "norm1": {"weight": jnp.ones((self.dim,), dtype)},
            "norm2": {"weight": jnp.ones((self.dim,), dtype)},
        }
        if not self.rms_norm:
            p["norm1"]["bias"] = jnp.zeros((self.dim,), dtype)
            p["norm2"]["bias"] = jnp.zeros((self.dim,), dtype)
        return p

    def apply(
        self,
        params,
        hidden_states,
        residual=None,
        inference_params=None,
        rngs=None,
        train: bool = False,
    ):
        """Returns (hidden_states, residual) in prenorm mode."""
        dp1 = self.resid_dropout1 if train else 0.0
        dp2 = self.resid_dropout2 if train else 0.0
        r1 = rngs[0] if rngs is not None else None
        r2 = rngs[1] if rngs is not None else None

        if self.parallel_block:
            # GPT-J/NeoX: two norms read the SAME residual stream
            # (ln_api.cpp:484-651 parallel-residual semantics)
            from vllm_flash_attn_tpu.ops.layer_norm import (
                dropout_add_layer_norm_parallel_residual,
            )

            normed1, normed2, residual = dropout_add_layer_norm_parallel_residual(
                hidden_states, None, residual,
                params["norm1"]["weight"], params["norm1"].get("bias"),
                params["norm2"]["weight"], params["norm2"].get("bias"),
                dropout_p=dp1, epsilon=self.norm_epsilon, prenorm=True,
                residual_in_fp32=self.residual_in_fp32,
                is_rms_norm=self.rms_norm, rng=r1,
            )
            attn_out = self.mha.apply(
                params["mixer"], normed1, inference_params=inference_params
            )
            mlp_out = self.mlp.apply(params["mlp"], normed2)
            return attn_out + mlp_out, residual

        normed, residual = dropout_add_layer_norm(
            hidden_states, residual,
            params["norm1"]["weight"], params["norm1"].get("bias"),
            dropout_p=dp1, epsilon=self.norm_epsilon, prenorm=True,
            residual_in_fp32=self.residual_in_fp32,
            is_rms_norm=self.rms_norm, rng=r1,
        )
        attn_out = self.mha.apply(
            params["mixer"], normed, inference_params=inference_params
        )
        normed2, residual = dropout_add_layer_norm(
            attn_out, residual,
            params["norm2"]["weight"], params["norm2"].get("bias"),
            dropout_p=dp2, epsilon=self.norm_epsilon, prenorm=True,
            residual_in_fp32=self.residual_in_fp32,
            is_rms_norm=self.rms_norm, rng=r2,
        )
        mlp_out = self.mlp.apply(params["mlp"], normed2)
        return mlp_out, residual
