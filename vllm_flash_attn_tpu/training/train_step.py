"""Distributed training step (shard_map DP x TP x SP).

TPU-native replacement for the reference's Lightning DDP/ZeRO stack
(/root/reference/training/src/train.py:93-102, src/utils/ddp_zero1.py,
ddp_zero2.py):

- DDP bucketed all-reduce           -> one pmean of the grad tree over 'data';
  XLA's latency-hiding scheduler overlaps it with the backward (what
  gradient_as_bucket_view + fp16 comm hooks hand-tune on GPU)
- ZeRO-1 optimizer-state sharding   -> AdamW moments sharded over 'data'
  (zero_shard_opt_specs)
- apex param grouping               -> path-based weight-decay mask
  (training/src/optim/param_grouping.py: no decay for bias/norm/embeddings)
- sequence-parallel shared-grad sync-> psum over 'model' for replicated
  (norm) params — the allreduce_sequence_parallel_grad analog
  (tests/models/test_gpt_parallel.py:14)

The optimizer is a self-contained AdamW whose state is exactly two
params-shaped trees, so the TP PartitionSpec tree of the params doubles as the
spec tree of the optimizer state — no structure-matching gymnastics.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# ---------------------------------------------------------------- optimizer


def cosine_warmup_schedule(
    lr: float, warmup_steps: int, total_steps: int, min_lr_ratio: float = 0.1
):
    """Per-step cosine schedule with linear warmup (timm_lr_scheduler analog)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * step / jnp.maximum(warmup_steps, 1)
        prog = (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1)
        prog = jnp.clip(prog, 0.0, 1.0)
        cos = lr * (min_lr_ratio + (1 - min_lr_ratio) * 0.5 * (1 + jnp.cos(jnp.pi * prog)))
        return jnp.where(step < warmup_steps, warm, cos)

    return fn


def linear_warmup_schedule(lr, warmup_steps, total_steps, min_lr_ratio=0.0):
    """Linear warmup then linear decay (configs/scheduler/linear-warmup)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * step / jnp.maximum(warmup_steps, 1)
        prog = jnp.clip(
            (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1),
            0.0, 1.0,
        )
        dec = lr * (1.0 - (1.0 - min_lr_ratio) * prog)
        return jnp.where(step < warmup_steps, warm, dec)

    return fn


def constant_schedule(lr, warmup_steps=0, **_):
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * step / jnp.maximum(warmup_steps, 1)
        return jnp.where(step < warmup_steps, warm, lr) if warmup_steps else lr * jnp.ones_like(step)

    return fn


def invsqrt_schedule(lr, warmup_steps, **_):
    """Inverse-sqrt decay after warmup (transformer-classic)."""
    w = max(warmup_steps, 1)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(
            step < w, lr * step / w, lr * jnp.sqrt(w / jnp.maximum(step, 1.0))
        )

    return fn


def step_schedule(lr, milestones=(1000, 2000), gamma=0.1, **_):
    """Multi-step decay (configs/scheduler/multi-step)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        k = sum(jnp.asarray(step >= m, jnp.float32) for m in milestones)
        return lr * gamma ** k

    return fn


def poly_schedule(lr, warmup_steps, total_steps, power=1.0, min_lr_ratio=0.0):
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * step / jnp.maximum(warmup_steps, 1)
        prog = jnp.clip(
            (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1),
            0.0, 1.0,
        )
        dec = lr * (min_lr_ratio + (1 - min_lr_ratio) * (1 - prog) ** power)
        return jnp.where(step < warmup_steps, warm, dec)

    return fn


SCHEDULES = {
    "cosine": cosine_warmup_schedule,
    "linear": linear_warmup_schedule,
    "constant": constant_schedule,
    "invsqrt": invsqrt_schedule,
    "step": step_schedule,
    "poly": poly_schedule,
}


def decay_mask(params):
    """True = apply weight decay (param_grouping.py semantics)."""

    def mask_fn(path, leaf):
        s = "/".join(str(getattr(p, "key", p)) for p in path)
        if leaf.ndim < 2:
            return False
        if "embeddings" in s or "norm" in s or "ln_f" in s:
            return False
        return True

    return jax.tree_util.tree_map_with_path(mask_fn, params)


@dataclasses.dataclass
class AdamW:
    """Family of momentum optimizers over a fixed two-tree state
    {mu, nu} (so ZeRO sharding specs are kind-agnostic):
    kind = 'adamw' | 'lamb' (FusedLAMB analog, layerwise trust ratio) |
    'lion' (sign-momentum) | 'sgd' (momentum; nu unused).
    Mirrors the reference's optimizer zoo
    (training/configs/optimizer/{adamw,fusedlamb,sgd,...}.yaml)."""

    lr_fn: Callable
    b1: float = 0.9
    b2: float = 0.95
    eps: float = 1e-8
    weight_decay: float = 0.1
    grad_clip: float = 1.0
    kind: str = "adamw"
    # loss-reactive LR (ReduceLROnPlateau, configs/scheduler/plateau.yaml):
    # the state carries an lr_scale scalar the TRAINER lowers host-side when
    # the monitored loss plateaus (the jitted step just multiplies it in)
    plateau: bool = False

    def init(self, params):
        z = lambda p: jnp.zeros(p.shape, jnp.float32)
        state = {
            "mu": jax.tree_util.tree_map(z, params),
            "nu": jax.tree_util.tree_map(z, params),
        }
        if self.plateau:
            state["lr_scale"] = jnp.ones((), jnp.float32)
        return state

    def update(self, grads, state, params, step, gnorm=None):
        if gnorm is None:
            gnorm = jnp.sqrt(
                sum(
                    jnp.sum(jnp.square(g.astype(jnp.float32)))
                    for g in jax.tree_util.tree_leaves(grads)
                )
            )
        scale = jnp.minimum(1.0, self.grad_clip / (gnorm + 1e-6))
        lr = self.lr_fn(step)
        if "lr_scale" in state:
            lr = lr * state["lr_scale"]
        t = step.astype(jnp.float32) + 1.0
        bc1 = 1.0 - self.b1 ** t
        bc2 = 1.0 - self.b2 ** t
        mask = decay_mask(params)

        def upd(g, mu, nu, p, decay):
            g = g.astype(jnp.float32) * scale
            pf = p.astype(jnp.float32)
            wd = self.weight_decay if decay else 0.0
            if self.kind == "sgd":
                mu = self.b1 * mu + g
                step_ = mu + wd * pf
            elif self.kind == "lion":
                step_ = jnp.sign(self.b1 * mu + (1 - self.b1) * g) + wd * pf
                mu = self.b2 * mu + (1 - self.b2) * g
            else:  # adamw / lamb share the adam direction
                mu = self.b1 * mu + (1 - self.b1) * g
                nu = self.b2 * nu + (1 - self.b2) * jnp.square(g)
                step_ = (mu / bc1) / (jnp.sqrt(nu / bc2) + self.eps)
                step_ = step_ + wd * pf
                if self.kind == "lamb":
                    # layerwise trust ratio (FusedLAMB, apex semantics)
                    wn = jnp.sqrt(jnp.sum(jnp.square(pf)))
                    un = jnp.sqrt(jnp.sum(jnp.square(step_)))
                    trust = jnp.where(
                        (wn > 0) & (un > 0), wn / jnp.maximum(un, 1e-9), 1.0
                    )
                    step_ = trust * step_
            return (pf - lr * step_).astype(p.dtype), mu, nu

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = jax.tree_util.tree_leaves(grads)
        flat_mu = jax.tree_util.tree_leaves(state["mu"])
        flat_nu = jax.tree_util.tree_leaves(state["nu"])
        flat_mask = jax.tree_util.tree_leaves(mask)
        new_p, new_mu, new_nu = [], [], []
        for g, mu, nu, p, dc in zip(flat_g, flat_mu, flat_nu, flat_p, flat_mask):
            p2, mu2, nu2 = upd(g, mu, nu, p, dc)
            new_p.append(p2)
            new_mu.append(mu2)
            new_nu.append(nu2)
        new_state = {
            "mu": jax.tree_util.tree_unflatten(treedef, new_mu),
            "nu": jax.tree_util.tree_unflatten(treedef, new_nu),
        }
        if "lr_scale" in state:
            new_state["lr_scale"] = state["lr_scale"]
        return (
            jax.tree_util.tree_unflatten(treedef, new_p),
            new_state,
            gnorm,
        )


def make_optimizer(
    lr: float = 3e-4,
    weight_decay: float = 0.1,
    b1: float = 0.9,
    b2: float = 0.95,
    grad_clip: float = 1.0,
    warmup_steps: int = 100,
    total_steps: int = 10000,
    min_lr_ratio: float = 0.1,
    kind: str = "adamw",
    schedule: str = "cosine",
    milestones=(1000, 2000),
    gamma: float = 0.1,
) -> AdamW:
    if schedule == "plateau":
        # loss-reactive: constant base LR, trainer-driven lr_scale
        lr_fn = constant_schedule(lr, warmup_steps)
        return AdamW(
            lr_fn, b1, b2, 1e-8, weight_decay, grad_clip, kind=kind,
            plateau=True,
        )
    sched = SCHEDULES[schedule]
    if schedule in ("cosine", "linear", "poly"):
        lr_fn = sched(lr, warmup_steps, total_steps, min_lr_ratio)
    elif schedule in ("constant", "invsqrt"):
        lr_fn = sched(lr, warmup_steps)
    elif schedule == "step":
        lr_fn = sched(lr, tuple(milestones), gamma)
    else:
        lr_fn = sched(lr)
    return AdamW(lr_fn, b1, b2, 1e-8, weight_decay, grad_clip, kind=kind)


# ------------------------------------------------------------ sharding specs


def param_specs(model, model_axis: str = "model"):
    """PartitionSpec tree for ParallelGPT params in TP-major layout."""
    c = model.config
    col = P(model_axis, None)  # column-parallel weight (out dim sharded)
    row = P(None, model_axis)  # row-parallel weight (in dim sharded)
    colb = P(model_axis)
    rep = P()

    def norm_spec(p):
        return jax.tree_util.tree_map(lambda _: rep, p)

    layer = {
        "mixer": {
            "Wqkv": {"weight": col, "bias": colb} if c.qkv_proj_bias else {"weight": col},
            "out_proj": {"weight": row, "bias": rep} if c.out_proj_bias else {"weight": row},
        },
        "mlp": {
            "fc1": {"weight": col, "bias": colb} if c.mlp_fc1_bias else {"weight": col},
            "fc2": {"weight": row, "bias": rep} if c.mlp_fc2_bias else {"weight": row},
        },
        "norm1": {"weight": rep} if c.rms_norm else {"weight": rep, "bias": rep},
        "norm2": {"weight": rep} if c.rms_norm else {"weight": rep, "bias": rep},
    }
    specs = {
        "embeddings": {"word_embeddings": col},
        "layers": [layer for _ in range(c.n_layer)],
        "ln_f": {"weight": rep} if c.rms_norm else {"weight": rep, "bias": rep},
    }
    if c.rotary_emb_dim == 0 and c.n_positions > 0:
        specs["embeddings"]["position_embeddings"] = rep
    if not c.tie_word_embeddings:
        specs["lm_head"] = {"weight": col}
    return specs


def to_tp_layout(parallel_model, full_params, axis_size: int):
    """Rearrange full params so each model-parallel slice is contiguous
    (the layout `param_specs` describes): concat shard_params over ranks."""
    shards = [
        parallel_model.shard_params(full_params, axis_size, r)
        for r in range(axis_size)
    ]
    specs = param_specs(parallel_model)

    def cat(spec, *leaves):
        if all(s is None for s in spec):
            return leaves[0]
        axis = [i for i, s in enumerate(spec) if s is not None][0]
        return jnp.concatenate(leaves, axis=axis)

    return jax.tree_util.tree_map(
        cat, specs, *shards,
        is_leaf=lambda x: isinstance(x, P),
    )


# ------------------------------------------------------------------- step


@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any


def flat_param_size(local_param_example, dp: int) -> int:
    """Per-model-shard flattened param count, padded to the data-axis size
    (the ZeRO-1 shard grain). `local_param_example` is one TP shard's tree
    (arrays or ShapeDtypeStructs)."""
    total = sum(
        int(l.size) if hasattr(l, "size") else int(jnp.prod(jnp.asarray(l.shape)))
        for l in jax.tree_util.tree_leaves(local_param_example)
    )
    return -(-total // dp) * dp


def make_parallel_train_step(
    model,  # ParallelGPTLMHeadModel
    optimizer: AdamW,
    mesh: Mesh,
    sequence_parallel: bool = False,
    data_axis: str = "data",
    model_axis: str = "model",
    zero1: bool = False,
    zero2: bool = False,
    grad_compress_dtype=None,
) -> Callable:
    """Build jitted (state, input_ids, labels) -> (state, metrics).

    zero1: shard the AdamW moments over the data axis as ONE flat fp32 vector
    per model shard (ZeRO-1 / ZeroRedundancyOptimizer, ddp_zero1.py:24-106):
    each data rank updates its slice and the param deltas are all-gathered.
    zero2: additionally shard the GRADIENTS over the data axis — the DP
    all-reduce becomes a psum_scatter, so no rank materializes the full
    averaged gradient (DistributedFusedAdam, ddp_zero2.py:27-146). Implies
    the flat-sharded optimizer state.
    grad_compress_dtype: cast grads for the DP collective (the fp16_compress
    comm hook, ddp_comm_hooks.py:9-43 — use jnp.bfloat16 on TPU).
    """
    zero1 = zero1 or zero2
    if zero1:
        assert optimizer.kind == "adamw", (
            "ZeRO flat-sharded state implements the adamw update; use the "
            "replicated path for other optimizer kinds"
        )
    specs = param_specs(model, model_axis)
    opt_specs = (
        {"mu": P(model_axis, data_axis), "nu": P(model_axis, data_axis)}
        if zero1
        else {"mu": specs, "nu": specs}
    )
    if optimizer.plateau:
        assert not (zero1 or zero2), (
            "plateau schedule is not wired for ZeRO flat-sharded state"
        )
        opt_specs["lr_scale"] = P()

    def _is_replicated(path) -> bool:
        s = "/".join(str(getattr(p, "key", p)) for p in path)
        return "norm" in s or "ln_f" in s or "position_embeddings" in s

    flat_specs = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P)
    )
    sharded_leaf_flags = [
        model_axis in jax.tree_util.tree_leaves(tuple(sp)) for sp in flat_specs
    ]

    def step_fn(params, opt_state, step, input_ids, labels):
        loss, grads = jax.value_and_grad(model.loss)(params, input_ids, labels)
        loss = jax.lax.pmean(loss, data_axis)
        if not zero2:
            if grad_compress_dtype is not None:
                grads = jax.tree_util.tree_map(
                    lambda g: jax.lax.pmean(
                        g.astype(grad_compress_dtype), data_axis
                    ).astype(g.dtype),
                    grads,
                )
            else:
                grads = jax.lax.pmean(grads, data_axis)
        # Model-axis psum for REPLICATED params (norms, position embeddings):
        # inside the shard_map body each model shard only backprops through
        # its own heads/columns, so its grad for a replicated param is a
        # PARTIAL sum — without this psum the tp copies receive different
        # (and too-small) updates and silently de-sync. Required for ANY tp,
        # not just sequence parallelism (the allreduce_sequence_parallel_grad
        # analog, tests/models/test_gpt_parallel.py:14).
        grads = jax.tree_util.tree_map_with_path(
            lambda path, g: jax.lax.psum(g, model_axis)
            if _is_replicated(path)
            else g,
            grads,
        )
        if zero2:
            # grads stay local: the reduce happens fused with the shard
            # inside _zero_flat_update (psum_scatter), which also computes
            # the global grad norm from the owned chunks
            if grad_compress_dtype is not None:
                grads = jax.tree_util.tree_map(
                    lambda g: g.astype(grad_compress_dtype), grads
                )
            params, opt_state, gnorm = _zero_flat_update(
                optimizer, grads, opt_state, params, step, None, data_axis,
                model_axis, zero2=True, sharded_leaf_flags=sharded_leaf_flags,
            )
            return params, opt_state, step + 1, loss, gnorm
        # GLOBAL grad norm: model-sharded leaves contribute their slice summed
        # across the axis; replicated leaves once. A per-shard norm would give
        # each shard a different clip scale and silently de-sync replicated
        # params across the model axis.
        sq_sharded = 0.0
        sq_replicated = 0.0
        for g, sharded in zip(
            jax.tree_util.tree_leaves(grads), sharded_leaf_flags
        ):
            ss = jnp.sum(jnp.square(g.astype(jnp.float32)))
            if sharded:
                sq_sharded = sq_sharded + ss
            else:
                sq_replicated = sq_replicated + ss
        gnorm = jnp.sqrt(
            jax.lax.psum(sq_sharded, model_axis) + sq_replicated
        )
        if zero1:
            params, opt_state, _ = _zero_flat_update(
                optimizer, grads, opt_state, params, step, gnorm, data_axis,
                model_axis,
            )
        else:
            params, opt_state, _ = optimizer.update(
                grads, opt_state, params, step, gnorm=gnorm
            )
        return params, opt_state, step + 1, loss, gnorm

    stepped = shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(specs, opt_specs, P(), P(data_axis, None), P(data_axis, None)),
        out_specs=(specs, opt_specs, P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def wrapped(state: TrainState, input_ids, labels):
        params, opt_state, step, loss, gnorm = stepped(
            state.params, state.opt_state, state.step, input_ids, labels
        )
        return TrainState(step, params, opt_state), {"loss": loss, "grad_norm": gnorm}

    return wrapped


def init_train_state(
    parallel_model, full_params, optimizer: AdamW, mesh: Mesh,
    model_axis: str = "model",
    zero1: bool = False,
) -> TrainState:
    """Shard full params into TP layout on the mesh and init optimizer state."""
    axis_size = mesh.shape[model_axis]
    tp_params = to_tp_layout(parallel_model, full_params, axis_size)
    specs = param_specs(parallel_model, model_axis)
    tp_params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tp_params, specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    if zero1:
        opt_state = init_zero1_opt_state(parallel_model, full_params, mesh, model_axis)
    else:
        opt_state = jax.jit(optimizer.init)(tp_params)
    return TrainState(jnp.zeros((), jnp.int32), tp_params, opt_state)


jax.tree_util.register_dataclass(
    TrainState, data_fields=["step", "params", "opt_state"], meta_fields=[]
)


def _zero_flat_update(
    optimizer, grads, opt_state, params, step, gnorm, data_axis, model_axis,
    *, zero2: bool = False, sharded_leaf_flags=None,
):
    """ZeRO-1/2 flat-shard AdamW: moments live as (1, chunk) slices per data
    rank; each rank updates its slice of the flattened param vector and the
    deltas are all-gathered (elementwise math identical to the replicated
    optimizer; ddp_zero1.py:24-106 / ddp_zero2.py:27-146 analogs).

    Memory discipline: the flat views are concatenated in the leaves' NATIVE
    dtype and only the rank-owned chunk is upcast to fp32 (slicing commutes
    with the upcast, so the math is bit-identical to an fp32 concat while the
    transient is half the size and dies at the dynamic-slice).

    zero2: `grads` arrive UN-averaged (no pmean); a single psum_scatter over
    'data' both reduces and shards them, so no rank ever holds the full
    averaged gradient (the gradient-sharding half of DistributedFusedAdam).
    gnorm is then computed from the owned chunk (pass gnorm=None,
    sharded_leaf_flags = per-leaf bool "is model-axis sharded" for the psum
    bookkeeping) and returned.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    g_leaves = jax.tree_util.tree_leaves(grads)
    mask_leaves = jax.tree_util.tree_leaves(decay_mask(params))

    flat_g = jnp.concatenate([g.reshape(-1) for g in g_leaves])
    flat_decay = jnp.concatenate(
        [jnp.full((p.size,), bool(m)) for p, m in zip(leaves, mask_leaves)]
    )
    mu = opt_state["mu"][0]  # (chunk,)
    nu = opt_state["nu"][0]
    chunk = mu.shape[0]
    dp = jax.lax.psum(1, data_axis)
    total_padded = chunk * dp
    pad = total_padded - flat_g.shape[0]
    flat_g = jnp.pad(flat_g, (0, pad))
    flat_decay = jnp.pad(flat_decay, (0, pad))

    idx = jax.lax.axis_index(data_axis)
    if zero2:
        # reduce-and-shard in one collective: each rank owns the summed chunk.
        # The collective runs in flat_g's dtype so grad_compress_dtype=bf16
        # actually halves the wire traffic (the fp16_compress-hook analog);
        # the owned chunk is upcast (and averaged) after the scatter.
        g_s = jax.lax.psum_scatter(
            flat_g, data_axis, scatter_dimension=0, tiled=True,
        ).astype(jnp.float32) / dp
    else:
        g_s = jax.lax.dynamic_slice_in_dim(flat_g, idx * chunk, chunk).astype(
            jnp.float32
        )
    d_s = jax.lax.dynamic_slice_in_dim(flat_decay, idx * chunk, chunk)
    p_s = _flat_chunk(leaves, idx * chunk, chunk, total_padded)

    if gnorm is None:  # zero2: global grad norm from the owned chunks
        flat_sharded = jnp.pad(
            jnp.concatenate(
                [
                    jnp.full((p.size,), bool(f))
                    for p, f in zip(leaves, sharded_leaf_flags)
                ]
            ),
            (0, pad),
        )
        sh_s = jax.lax.dynamic_slice_in_dim(flat_sharded, idx * chunk, chunk)
        sq = jnp.square(g_s)
        sq_sh = jax.lax.psum(jnp.sum(jnp.where(sh_s, sq, 0.0)), data_axis)
        sq_rep = jax.lax.psum(jnp.sum(jnp.where(sh_s, 0.0, sq)), data_axis)
        gnorm = jnp.sqrt(jax.lax.psum(sq_sh, model_axis) + sq_rep)

    scale = jnp.minimum(1.0, optimizer.grad_clip / (gnorm + 1e-6))
    g_s = g_s * scale
    lr = optimizer.lr_fn(step)
    t = step.astype(jnp.float32) + 1.0
    bc1 = 1.0 - optimizer.b1 ** t
    bc2 = 1.0 - optimizer.b2 ** t
    mu = optimizer.b1 * mu + (1 - optimizer.b1) * g_s
    nu = optimizer.b2 * nu + (1 - optimizer.b2) * jnp.square(g_s)
    upd = (mu / bc1) / (jnp.sqrt(nu / bc2) + optimizer.eps)
    upd = upd + jnp.where(d_s, optimizer.weight_decay * p_s, 0.0)
    delta_s = lr * upd

    delta = jax.lax.all_gather(delta_s, data_axis, axis=0, tiled=True)
    out, off = [], 0
    for p in leaves:
        d = jax.lax.dynamic_slice_in_dim(delta, off, p.size)
        out.append(
            (p.astype(jnp.float32) - d.reshape(p.shape)).astype(p.dtype)
        )
        off += p.size
    new_params = jax.tree_util.tree_unflatten(treedef, out)
    return new_params, {"mu": mu[None], "nu": nu[None]}, gnorm


def _flat_chunk(leaves, start, chunk, total_padded):
    """fp32 [start, start+chunk) window of the concatenated flat param vector
    without materializing the full fp32 concat (native-dtype concat + slice +
    upcast; identical values, half the transient)."""
    flat = jnp.concatenate(
        [p.reshape(-1) for p in leaves]
        + [jnp.zeros((total_padded - sum(p.size for p in leaves),), leaves[0].dtype)]
    )
    return jax.lax.dynamic_slice_in_dim(flat, start, chunk).astype(jnp.float32)


def init_zero1_opt_state(model, full_params, mesh, model_axis: str = "model",
                         data_axis: str = "data"):
    """Global (tp, padded_total) fp32 moment arrays sharded P(model, data)."""
    tp = mesh.shape[model_axis]
    dp = mesh.shape[data_axis]
    local = model.shard_params(full_params, tp, 0)
    total = flat_param_size(local, dp)
    z = jnp.zeros((tp, total), jnp.float32)
    sh = NamedSharding(mesh, P(model_axis, data_axis))
    return {"mu": jax.device_put(z, sh), "nu": jax.device_put(z, sh)}
