"""Distributed helpers (`flash_attn.utils.distributed` surface:
all_gather_raw / reduce_scatter_raw / allreduce_sequence_parallel_grad,
pinned by /root/reference/tests/models/test_gpt_parallel.py:14).

On TPU these are axis-name collectives for use inside shard_map bodies; the
grad-sync variant is also wired into the train step automatically
(training/train_step.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def all_gather_raw(x: jax.Array, axis_name: str, axis: int = 0):
    """Gather shards along `axis` across the named mesh axis."""
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=True)


def reduce_scatter_raw(x: jax.Array, axis_name: str, axis: int = 0):
    """Sum across the axis, scatter the result along `axis`."""
    return jax.lax.psum_scatter(x, axis_name, scatter_dimension=axis, tiled=True)


def all_reduce_raw(x: jax.Array, axis_name: str):
    return jax.lax.psum(x, axis_name)


def all_reduce_item(x, axis_name: str):
    """Scalar all-reduce (src/utils/distributed.py all_reduce_item analog)."""
    return jax.lax.psum(jnp.asarray(x), axis_name)


def allreduce_sequence_parallel_grad(grads, replicated_paths, axis_name: str):
    """Sum gradients of sequence-parallel-replicated params across the model
    axis (Megatron allreduce_sequence_parallel_grad). `replicated_paths` is a
    predicate over tree paths."""
    return jax.tree_util.tree_map_with_path(
        lambda path, g: jax.lax.psum(g, axis_name)
        if replicated_paths(path)
        else g,
        grads,
    )


def get_world_size(axis_name: str) -> int:
    return jax.lax.psum(1, axis_name)


def get_rank(axis_name: str):
    return jax.lax.axis_index(axis_name)
