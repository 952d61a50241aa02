"""Distributed tests on the virtual 8-device CPU mesh — improving on the
reference's torchrun-only strategy (SURVEY.md §4 implication): parallel module
outputs must match the single-device module on the same (unsharded) weights.
Mirrors tests/modules/test_mha_parallel.py, test_mlp_parallel.py,
test_gpt_parallel.py, test_cross_entropy_parallel.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from vllm_flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from vllm_flash_attn_tpu.models.gpt_parallel import ParallelGPTLMHeadModel
from vllm_flash_attn_tpu.ops.cross_entropy import cross_entropy_loss
from vllm_flash_attn_tpu.parallel.mesh import make_mesh
from vllm_flash_attn_tpu.parallel.attention import ring_attention
from vllm_flash_attn_tpu.training.train_step import (
    init_train_state,
    make_optimizer,
    make_parallel_train_step,
    param_specs,
    to_tp_layout,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

CFG = GPTConfig(
    vocab_size=256,
    n_positions=0,
    n_embd=64,
    n_layer=2,
    n_head=8,
    n_head_kv=4,
    rotary_emb_dim=8,
    gated_mlp=True,
    rms_norm=True,
    qkv_proj_bias=False,
    out_proj_bias=False,
    mlp_fc1_bias=False,
    mlp_fc2_bias=False,
    activation_function="silu",
    n_inner=128,
)


@pytest.mark.parametrize("sp", [False, True], ids=["tp", "tp+sp"])
def test_parallel_forward_matches_serial(sp):
    mesh = make_mesh((2, 4), ("data", "model"))
    base = GPTLMHeadModel(CFG)
    params = base.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (4, 64)), jnp.int32)

    logits_serial = base.apply(params, ids)

    pmodel = ParallelGPTLMHeadModel(CFG, sequence_parallel=sp)
    tp_params = to_tp_layout(pmodel, params, 4)
    specs = param_specs(pmodel)

    fwd = shard_map(
        pmodel.apply,
        mesh=mesh,
        in_specs=(specs, P("data", None)),
        out_specs=P("data", None, "model"),  # vocab-sharded logits
        check_vma=False,
    )
    logits_par = fwd(tp_params, ids)
    np.testing.assert_allclose(
        np.asarray(logits_par), np.asarray(logits_serial), atol=2e-3, rtol=2e-3
    )


def test_parallel_loss_matches_serial():
    mesh = make_mesh((2, 4), ("data", "model"))
    base = GPTLMHeadModel(CFG)
    params = base.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (4, 64)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, CFG.vocab_size, (4, 64)), jnp.int32)

    loss_serial = float(
        cross_entropy_loss(
            base.apply(params, ids).reshape(-1, CFG.padded_vocab),
            labels.reshape(-1),
        )
    )
    pmodel = ParallelGPTLMHeadModel(CFG)
    tp_params = to_tp_layout(pmodel, params, 4)
    loss_fn = shard_map(
        pmodel.loss,
        mesh=mesh,
        in_specs=(param_specs(pmodel), P("data", None), P("data", None)),
        out_specs=P(),
        check_vma=False,
    )
    # per-data-shard mean losses; average them like the train step's pmean
    loss_par = float(
        jnp.mean(loss_fn(tp_params, ids, labels))
    )
    assert abs(loss_par - loss_serial) < 8e-3, (loss_par, loss_serial)


def test_train_step_runs_and_descends():
    mesh = make_mesh((2, 4), ("data", "model"))
    base = GPTLMHeadModel(CFG)
    params = base.init(jax.random.PRNGKey(2))
    pmodel = ParallelGPTLMHeadModel(CFG, sequence_parallel=True)
    opt = make_optimizer(lr=1e-2, warmup_steps=0, total_steps=50)
    state = init_train_state(pmodel, params, opt, mesh)
    step = make_parallel_train_step(pmodel, opt, mesh, sequence_parallel=True)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (4, 64)), jnp.int32)
    labels = ids  # memorize-the-batch sanity objective
    losses = []
    for _ in range(5):
        state, metrics = step(state, ids, labels)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


def test_ring_attention_matches_dense():
    mesh = make_mesh((8,), ("ctx",))
    rng = np.random.default_rng(3)
    b, h, s, d = 1, 2, 256, 32
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)

    for causal in (False, True):
        ring = shard_map(
            lambda q_, k_, v_: ring_attention(
                q_, k_, v_, axis_name="ctx", causal=causal
            ),
            mesh=mesh,
            in_specs=(P(None, None, "ctx", None),) * 3,
            out_specs=P(None, None, "ctx", None),
            check_vma=False,
        )
        out = ring(q, k, v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
        if causal:
            row = jnp.arange(s)[:, None]
            col = jnp.arange(s)[None, :]
            scores = jnp.where(col > row, -jnp.inf, scores)
        ref = jnp.einsum(
            "bhqk,bhkd->bhqd", jax.nn.softmax(scores, axis=-1), v
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4,
            err_msg=f"causal={causal}",
        )


def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
