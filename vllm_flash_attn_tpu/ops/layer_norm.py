"""Fused dropout + residual-add + LayerNorm/RMSNorm.

Covers the surface of the reference `csrc/layer_norm` extension
(/root/reference/csrc/layer_norm/ln_api.cpp:105-848: `dropout_add_ln_fwd/bwd`,
parallel-residual variants) and `flash_attn.ops.{layer_norm,rms_norm}`.

On TPU these are pure-XLA: the adds, dropout mask and normalization fuse into
one HBM-bound loop by the XLA fuser, which is exactly what the 56 hand-compiled
CUDA variants (`ln_{fwd,bwd}_{256..8192}.cu`) buy on GPU. Gradients come from
JAX AD over the same fused graph, so no custom bwd kernels are needed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _norm(x, weight, bias, eps, is_rms):
    x32 = x.astype(jnp.float32)
    if is_rms:
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + eps)
    else:
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


def layer_norm(x, weight, bias=None, epsilon: float = 1e-5):
    return _norm(x, weight, bias, epsilon, is_rms=False).astype(x.dtype)


def rms_norm(x, weight, epsilon: float = 1e-5):
    return _norm(x, weight, None, epsilon, is_rms=True).astype(x.dtype)


def dropout_add_layer_norm(
    x0,
    residual,
    weight,
    bias=None,
    dropout_p: float = 0.0,
    epsilon: float = 1e-5,
    prenorm: bool = False,
    residual_in_fp32: bool = False,
    is_rms_norm: bool = False,
    rng: Optional[jax.Array] = None,
):
    """out = norm(dropout(x0) + residual); prenorm also returns the new residual.

    Matches `dropout_add_ln_fwd` semantics (ln_api.cpp:105-280): residual may be
    None (first block), `residual_in_fp32` keeps the carried residual in fp32
    (configs/experiment/pile/gpt3s-flash.yaml:8).
    """
    if dropout_p > 0.0:
        if rng is None:
            raise ValueError("dropout requires an rng key")
        keep = jax.random.bernoulli(rng, 1.0 - dropout_p, x0.shape)
        x0 = jnp.where(keep, x0 / (1.0 - dropout_p), 0.0).astype(x0.dtype)
    res_dtype = jnp.float32 if residual_in_fp32 else x0.dtype
    new_residual = x0.astype(res_dtype)
    if residual is not None:
        new_residual = new_residual + residual.astype(res_dtype)
    out = _norm(new_residual, weight, bias, epsilon, is_rms_norm).astype(x0.dtype)
    if prenorm:
        return out, new_residual
    return out


def dropout_add_rms_norm(x0, residual, weight, bias=None, **kw):
    return dropout_add_layer_norm(x0, residual, weight, bias, is_rms_norm=True, **kw)


def dropout_add_layer_norm_parallel_residual(
    x0,
    x1,
    residual,
    weight0,
    bias0,
    weight1,
    bias1,
    dropout_p: float = 0.0,
    epsilon: float = 1e-5,
    prenorm: bool = True,
    residual_in_fp32: bool = False,
    is_rms_norm: bool = False,
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array], jax.Array]:
    """GPT-J/NeoX parallel-residual variant (ln_api.cpp:484-651): one residual
    stream feeds two norms (attn + mlp branches of the same block)."""
    if dropout_p > 0.0:
        if rng is None:
            raise ValueError("dropout requires an rng key")
        k0, k1 = jax.random.split(rng)
        keep0 = jax.random.bernoulli(k0, 1.0 - dropout_p, x0.shape)
        x0 = jnp.where(keep0, x0 / (1.0 - dropout_p), 0.0).astype(x0.dtype)
        if x1 is not None:
            keep1 = jax.random.bernoulli(k1, 1.0 - dropout_p, x1.shape)
            x1 = jnp.where(keep1, x1 / (1.0 - dropout_p), 0.0).astype(x1.dtype)
    res_dtype = jnp.float32 if residual_in_fp32 else x0.dtype
    new_residual = x0.astype(res_dtype)
    if x1 is not None:
        new_residual = new_residual + x1.astype(res_dtype)
    if residual is not None:
        new_residual = new_residual + residual.astype(res_dtype)
    out0 = _norm(new_residual, weight0, bias0, epsilon, is_rms_norm).astype(x0.dtype)
    out1 = (
        _norm(new_residual, weight1, bias1, epsilon, is_rms_norm).astype(x0.dtype)
        if weight1 is not None
        else None
    )
    if prenorm:
        return out0, out1, new_residual
    return out0, out1
