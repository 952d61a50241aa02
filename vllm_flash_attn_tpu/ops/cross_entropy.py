"""Softmax cross-entropy loss (the `csrc/xentropy` + `flash_attn.losses.
cross_entropy` surface: label smoothing, ignore_index, lse_square_scale,
logit scaling, and a vocab-parallel variant).

/root/reference/csrc/xentropy/interface.cpp:25-59 fuses softmax+CE fwd/bwd on
GPU; on TPU the fused fwd is one XLA reduction loop and the bwd comes from AD
over it (`inplace_backward` is meaningless under XLA buffer donation).

The vocab-parallel variant reproduces
`tests/losses/test_cross_entropy_parallel.py`'s semantics: logits sharded over
the vocab axis, one psum for the global max/sum and one for the target logit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits: jax.Array,  # (..., vocab)
    labels: jax.Array,  # (...,) int
    label_smoothing: float = 0.0,
    logit_scale: float = 1.0,
    lse_square_scale: float = 0.0,
    ignore_index: int = -100,
    reduction: str = "mean",
    axis_name: Optional[str] = None,
    vocab_start: int = 0,
):
    """Returns loss with `reduction` in {none, mean, sum}.

    With `axis_name`, logits hold only this shard's vocab slice starting at
    `vocab_start`; cross-shard reductions ride psum over `axis_name`.
    """
    logits = logits.astype(jnp.float32) * logit_scale
    vocab = logits.shape[-1]

    # stability max: constant w.r.t. gradients (and pmax has no JVP rule)
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    if axis_name is not None:
        m = jax.lax.stop_gradient(jax.lax.pmax(m, axis_name))
    sumexp = jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True)
    if axis_name is not None:
        sumexp = jax.lax.psum(sumexp, axis_name)
    lse = (m + jnp.log(sumexp))[..., 0]

    local_labels = labels - vocab_start
    in_shard = (local_labels >= 0) & (local_labels < vocab)
    safe = jnp.clip(local_labels, 0, vocab - 1)
    target_logit = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    target_logit = jnp.where(in_shard, target_logit, 0.0)
    if axis_name is not None:
        target_logit = jax.lax.psum(target_logit, axis_name)

    if label_smoothing > 0.0:
        mean_logit = jnp.mean(logits, axis=-1)
        if axis_name is not None:
            nshards = jax.lax.psum(1, axis_name)
            mean_logit = jax.lax.psum(mean_logit, axis_name) / nshards
        loss = lse - (1.0 - label_smoothing) * target_logit - label_smoothing * mean_logit
    else:
        loss = lse - target_logit

    if lse_square_scale > 0.0:
        loss = loss + lse_square_scale * jnp.square(lse)

    valid = labels != ignore_index
    loss = jnp.where(valid, loss, 0.0)
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(loss) / count


class CrossEntropyLoss:
    """Module-style wrapper (flash_attn.losses.cross_entropy.CrossEntropyLoss)."""

    def __init__(
        self,
        ignore_index: int = -100,
        reduction: str = "mean",
        label_smoothing: float = 0.0,
        logit_scale: float = 1.0,
        lse_square_scale: float = 0.0,
        inplace_backward: bool = False,  # accepted, meaningless under XLA
        process_group=None,  # axis name string for vocab-parallel
    ):
        self.ignore_index = ignore_index
        self.reduction = reduction
        self.label_smoothing = label_smoothing
        self.logit_scale = logit_scale
        self.lse_square_scale = lse_square_scale
        self.axis_name = process_group

    def __call__(self, logits, labels, vocab_start: int = 0):
        return cross_entropy_loss(
            logits,
            labels,
            label_smoothing=self.label_smoothing,
            logit_scale=self.logit_scale,
            lse_square_scale=self.lse_square_scale,
            ignore_index=self.ignore_index,
            reduction=self.reduction,
            axis_name=self.axis_name,
            vocab_start=vocab_start,
        )


def fused_linear_cross_entropy(
    hidden: jax.Array,  # (rows, d)
    weight: jax.Array,  # (vocab, d)
    labels: jax.Array,  # (rows,) int
    bias: Optional[jax.Array] = None,  # (vocab,) or None
    *,
    logit_scale: float = 1.0,
    label_smoothing: float = 0.0,
    ignore_index: int = -100,
    chunk_rows: int = 2048,
) -> jax.Array:
    """LM-head matmul + CE without materializing the (rows, vocab) logits.

    The full logits tensor is the dominant HBM tensor of a small-model train
    step (rows x vocab fp32 read/written several times in fwd+bwd); here rows
    are processed in chunks of `chunk_rows` inside a lax.scan whose body is
    jax.checkpoint'ed: forward keeps only per-chunk loss sums, backward
    recomputes each chunk's logits and feeds dW/dhidden straight into the
    matmul transposes. One chunk's logits live in VMEM-scale working set.
    This takes /root/reference/csrc/xentropy's softmax+CE fusion one level
    higher (fusing the matmul too); mean reduction over `labels !=
    ignore_index`, matching cross_entropy_loss.
    """
    rows, d = hidden.shape
    n = -(-rows // chunk_rows)
    pad = n * chunk_rows - rows
    if pad:
        hidden = jnp.pad(hidden, ((0, pad), (0, 0)))
        labels = jnp.pad(labels, (0, pad), constant_values=ignore_index)
    hs = hidden.reshape(n, chunk_rows, d)
    ls = labels.reshape(n, chunk_rows)

    @jax.checkpoint
    def chunk_loss(h_c, l_c):
        logits = jnp.einsum(
            "rd,vd->rv", h_c, weight, preferred_element_type=jnp.float32
        )
        if bias is not None:
            logits = logits + bias
        loss = cross_entropy_loss(
            logits, l_c, label_smoothing=label_smoothing,
            logit_scale=logit_scale, ignore_index=ignore_index,
            reduction="sum",
        )
        return loss, jnp.sum(l_c != ignore_index)

    def body(acc, xs):
        h_c, l_c = xs
        s, c = chunk_loss(h_c, l_c)
        return (acc[0] + s, acc[1] + c), None

    (total, count), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)), (hs, ls)
    )
    return total / jnp.maximum(count, 1)
