"""Benchmark helpers (`flash_attn.utils.benchmark` surface:
benchmark_forward/backward/combined/all + profiler hook).

Timing uses chained-dependency scan inside one jit plus a scalar readback —
through remote-dispatch runtimes (the axon relay) `block_until_ready` does not
observe device completion, and per-call dispatch costs ~0.7 ms (see bench.py).
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def _timed(fn: Callable, chain_arg, *args, n_iter: int = 30) -> float:
    @jax.jit
    def many(y, *a):
        def body(y, _):
            return fn(y, *a).astype(y.dtype), None

        y, _ = jax.lax.scan(body, y, None, length=n_iter)
        return jnp.sum(y.astype(jnp.float32))

    float(many(chain_arg, *args))
    t0 = time.time()
    float(many(chain_arg, *args))
    return (time.time() - t0) / n_iter


def benchmark_forward(fn, chain_arg, *args, n_iter: int = 30, desc: str = ""):
    """Returns (seconds/iter, result of one call)."""
    sec = _timed(fn, chain_arg, *args, n_iter=n_iter)
    return sec, fn(chain_arg, *args)


def benchmark_backward(fn, chain_arg, *args, n_iter: int = 30, desc: str = ""):
    """Time grad-of-sum of fn w.r.t. the first argument."""
    grad_fn = jax.grad(lambda y, *a: jnp.sum(fn(y, *a).astype(jnp.float32)))
    sec = _timed(grad_fn, chain_arg, *args, n_iter=n_iter)
    return sec, None


def benchmark_combined(fn, chain_arg, *args, n_iter: int = 30, desc: str = ""):
    """Forward + backward in one step (value_and_grad)."""

    def fwd_bwd(y, *a):
        val, g = jax.value_and_grad(
            lambda y_: jnp.sum(fn(y_, *a).astype(jnp.float32))
        )(y)
        return g

    sec = _timed(fwd_bwd, chain_arg, *args, n_iter=n_iter)
    return sec, None


def benchmark_all(fn, chain_arg, *args, n_iter: int = 30):
    f, _ = benchmark_forward(fn, chain_arg, *args, n_iter=n_iter)
    b, _ = benchmark_backward(fn, chain_arg, *args, n_iter=n_iter)
    fb, _ = benchmark_combined(fn, chain_arg, *args, n_iter=n_iter)
    return {"fwd": f, "bwd": b, "fwd_bwd": fb}


def attention_flops(batch, seqlen, headdim, nheads, causal, mode="fwd"):
    """The reference FLOPs convention
    (benchmarks/benchmark_flash_attention.py:27-34)."""
    f = 4 * batch * seqlen**2 * nheads * headdim // (2 if causal else 1)
    return f * {"fwd": 1, "bwd": 2.5, "fwd_bwd": 3.5}[mode]


def pytorch_profiler(fn, *args, trace_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace of one call (pytorch_profiler util analog);
    view with TensorBoard/Perfetto."""
    with jax.profiler.trace(trace_dir):
        out = fn(*args)
        jax.block_until_ready(out)
    return trace_dir
