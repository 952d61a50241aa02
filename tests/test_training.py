"""Training framework tests: data pipeline, fault-tolerant resume, the full
Trainer loop on the virtual mesh, checkpoint round trip, crash autosave."""

import numpy as np
import pytest

import jax

from vllm_flash_attn_tpu.models.gpt import GPTConfig
from vllm_flash_attn_tpu.training.callbacks import EMA, NumTokens, Perplexity
from vllm_flash_attn_tpu.training.data import (
    FaultTolerantSampler,
    LMDataLoader,
    LMDataset,
    build_token_cache,
    synthetic_tokens,
)
from vllm_flash_attn_tpu.training.trainer import TrainConfig, Trainer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

TINY = GPTConfig(
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


def test_token_cache_roundtrip(tmp_path):
    texts = ["hello world", "foo bar baz"]
    tok = lambda t: [ord(c) % 250 for c in t]
    cache = build_token_cache(texts, tok, str(tmp_path / "cache.npy"), 256)
    assert cache.dtype == np.uint16
    assert len(cache) == len("hello world") + len("foo bar baz") + 2


def test_dataset_windows():
    ds = LMDataset(np.arange(100, dtype=np.uint16), seq_len=10)
    assert len(ds) == 9
    np.testing.assert_array_equal(ds[0], np.arange(11))
    np.testing.assert_array_equal(ds[3], np.arange(30, 41))


def test_sampler_exact_resume():
    s1 = FaultTolerantSampler(17, seed=3)
    it1 = iter(s1)
    first = [next(it1) for _ in range(10)]
    state = s1.state_dict()

    s2 = FaultTolerantSampler(17, seed=0)
    s2.load_state_dict(state)
    it2 = iter(s2)
    rest2 = [next(it2) for _ in range(10)]
    rest1 = [next(it1) for _ in range(10)]
    assert rest1 == rest2  # resume continues the exact stream
    # one epoch covers every sample exactly once
    seen = sorted(first + rest1[:7])
    assert seen == list(range(17))


def test_loader_sharding():
    ds = LMDataset(np.arange(1000, dtype=np.uint16), seq_len=10)
    l0 = LMDataLoader(ds, 4, FaultTolerantSampler(len(ds), shuffle=False),
                      shard_id=0, num_shards=2)
    l1 = LMDataLoader(ds, 4, FaultTolerantSampler(len(ds), shuffle=False),
                      shard_id=1, num_shards=2)
    b0 = next(iter(l0))
    b1 = next(iter(l1))
    assert b0.shape == (4, 11)
    assert not np.intersect1d(b0[:, 0], b1[:, 0]).size


def test_trainer_loss_descends_and_checkpoints(tmp_path):
    cfg = TrainConfig(
        model=TINY, seq_len=64, global_batch_size=4, max_steps=8,
        lr=1e-2, warmup_steps=0, tp=4, sequence_parallel=True,
        ckpt_dir=str(tmp_path / "ckpt"), ckpt_every=5, log_every=2,
        ema_decay=0.99,
    )
    tokens = synthetic_tokens(256, 50_000, 0)
    tr = Trainer(cfg, tokens)
    assert not tr.try_resume()
    final = tr.fit()
    assert np.isfinite(final["loss"])
    losses = [h["loss"] for h in tr.history]
    assert losses[-1] < losses[0] + 0.5  # descending-ish on random data

    # resume round trip: newest must be "last"; state restores bit-exact
    tr2 = Trainer(cfg, tokens)
    assert tr2.try_resume()
    assert int(tr2.state.step) == 8
    a = jax.tree_util.tree_leaves(tr.state.params)
    b = jax.tree_util.tree_leaves(tr2.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # evaluate runs
    ppl = tr2.evaluate(synthetic_tokens(256, 20_000, 1), max_batches=2)
    assert np.isfinite(ppl)


def test_crash_autosave(tmp_path):
    cfg = TrainConfig(
        model=TINY, seq_len=64, global_batch_size=4, max_steps=100,
        tp=4, ckpt_dir=str(tmp_path / "ckpt"),
    )
    tokens = synthetic_tokens(256, 50_000, 0)
    tr = Trainer(cfg, tokens)

    with pytest.raises(RuntimeError):
        with tr.ckpt.autosave_on_crash(lambda: tr.state, tr._extra):
            raise RuntimeError("boom")
    assert tr.ckpt.newest() == "auto_save"
    tr2 = Trainer(cfg, tokens)
    assert tr2.try_resume()


def test_metrics():
    p = Perplexity()
    p.update(np.log(4.0), 10)
    assert abs(p.compute() - 4.0) < 1e-6
    n = NumTokens()
    n.update(5)
    n.load_state_dict(n.state_dict())
    assert n.count == 5


def test_zero1_matches_replicated_optimizer():
    """ZeRO-1 flat-sharded moments must produce numerically identical params
    (elementwise math is the same; only the storage is sharded)."""
    from vllm_flash_attn_tpu.models.gpt import GPTLMHeadModel
    from vllm_flash_attn_tpu.models.gpt_parallel import ParallelGPTLMHeadModel
    from vllm_flash_attn_tpu.parallel.mesh import make_mesh
    from vllm_flash_attn_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        make_parallel_train_step,
    )
    import jax.numpy as jnp

    mesh = make_mesh((2, 4), ("data", "model"))
    base = GPTLMHeadModel(TINY)
    params = base.init(jax.random.PRNGKey(5))
    pmodel = ParallelGPTLMHeadModel(TINY)
    opt = make_optimizer(lr=1e-2, warmup_steps=0, total_steps=10)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, 256, (4, 64)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 256, (4, 64)), jnp.int32)

    s_a = init_train_state(pmodel, params, opt, mesh, zero1=False)
    step_a = make_parallel_train_step(pmodel, opt, mesh, zero1=False)
    s_b = init_train_state(pmodel, params, opt, mesh, zero1=True)
    step_b = make_parallel_train_step(pmodel, opt, mesh, zero1=True)
    for _ in range(3):
        s_a, m_a = step_a(s_a, ids, labels)
        s_b, m_b = step_b(s_b, ids, labels)
    assert abs(float(m_a["loss"]) - float(m_b["loss"])) < 1e-6
    for x, y in zip(
        jax.tree_util.tree_leaves(s_a.params),
        jax.tree_util.tree_leaves(s_b.params),
    ):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=2e-6, rtol=2e-6
        )


def test_zero2_matches_replicated_optimizer():
    """ZeRO-2 (psum_scatter-sharded grads + flat-sharded moments) must stay
    numerically indistinguishable from the replicated AdamW path — the grad
    average is reassociated (scatter-reduce vs tree pmean) so allow fp32
    reorder noise (ddp_zero2.py:27-146 parity)."""
    from vllm_flash_attn_tpu.models.gpt import GPTLMHeadModel
    from vllm_flash_attn_tpu.models.gpt_parallel import ParallelGPTLMHeadModel
    from vllm_flash_attn_tpu.parallel.mesh import make_mesh
    from vllm_flash_attn_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        make_parallel_train_step,
    )
    import jax.numpy as jnp

    mesh = make_mesh((2, 4), ("data", "model"))
    base = GPTLMHeadModel(TINY)
    params = base.init(jax.random.PRNGKey(6))
    pmodel = ParallelGPTLMHeadModel(TINY)
    opt = make_optimizer(lr=1e-2, warmup_steps=0, total_steps=10)
    rng = np.random.default_rng(6)
    ids = jnp.asarray(rng.integers(0, 256, (4, 64)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 256, (4, 64)), jnp.int32)

    s_a = init_train_state(pmodel, params, opt, mesh, zero1=False)
    step_a = make_parallel_train_step(pmodel, opt, mesh, zero1=False)
    s_b = init_train_state(pmodel, params, opt, mesh, zero1=True)
    step_b = make_parallel_train_step(pmodel, opt, mesh, zero2=True)
    for _ in range(5):
        s_a, m_a = step_a(s_a, ids, labels)
        s_b, m_b = step_b(s_b, ids, labels)
    assert abs(float(m_a["loss"]) - float(m_b["loss"])) < 1e-5
    assert abs(float(m_a["grad_norm"]) - float(m_b["grad_norm"])) < 1e-4
    for x, y in zip(
        jax.tree_util.tree_leaves(s_a.params),
        jax.tree_util.tree_leaves(s_b.params),
    ):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-5, rtol=1e-5
        )


def test_grad_compression_close_to_exact():
    from vllm_flash_attn_tpu.models.gpt import GPTLMHeadModel
    from vllm_flash_attn_tpu.models.gpt_parallel import ParallelGPTLMHeadModel
    from vllm_flash_attn_tpu.parallel.mesh import make_mesh
    from vllm_flash_attn_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        make_parallel_train_step,
    )
    import jax.numpy as jnp

    mesh = make_mesh((2, 4), ("data", "model"))
    base = GPTLMHeadModel(TINY)
    params = base.init(jax.random.PRNGKey(6))
    pmodel = ParallelGPTLMHeadModel(TINY)
    opt = make_optimizer(lr=1e-3, warmup_steps=0, total_steps=10)
    rng = np.random.default_rng(6)
    ids = jnp.asarray(rng.integers(0, 256, (4, 64)), jnp.int32)
    labels = ids
    state = init_train_state(pmodel, params, opt, mesh)
    step = make_parallel_train_step(
        pmodel, opt, mesh, grad_compress_dtype=jnp.bfloat16
    )
    state, metrics = step(state, ids, labels)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.parametrize("kind", ["sgd", "lion", "lamb"])
def test_optimizer_zoo_trains(kind):
    """Every optimizer kind must reduce loss on an overfit-one-batch probe
    (the reference ships a 9-optimizer config zoo, configs/optimizer/)."""
    from vllm_flash_attn_tpu.models.gpt import GPTLMHeadModel
    from vllm_flash_attn_tpu.training.train_step import make_optimizer
    import jax.numpy as jnp

    model = GPTLMHeadModel(TINY)
    params = model.init(jax.random.PRNGKey(0))
    lr = {"sgd": 0.05, "lion": 3e-3, "lamb": 0.05}[kind]
    opt = make_optimizer(lr=lr, warmup_steps=0, total_steps=50, kind=kind)
    state = jax.jit(opt.init)(params)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 256, (2, 32)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 256, (2, 32)), jnp.int32)

    @jax.jit
    def step(params, state, it):
        loss, grads = jax.value_and_grad(model.loss)(params, ids, labels)
        params, state, _ = opt.update(grads, state, params, it)
        return params, state, loss

    losses = []
    it = jnp.zeros((), jnp.int32)
    for i in range(12):
        params, state, loss = step(params, state, it)
        it = it + 1
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


@pytest.mark.parametrize(
    "schedule", ["cosine", "linear", "constant", "invsqrt", "step", "poly"]
)
def test_schedule_zoo_shapes(schedule):
    """Warmup + monotone-ish decay sanity for every schedule (the reference
    ships 8 scheduler configs, configs/scheduler/)."""
    from vllm_flash_attn_tpu.training.train_step import make_optimizer
    import jax.numpy as jnp

    opt = make_optimizer(
        lr=1.0, warmup_steps=10, total_steps=100, schedule=schedule
    )
    v0 = float(opt.lr_fn(jnp.int32(0)))
    v_warm = float(opt.lr_fn(jnp.int32(10)))
    v_end = float(opt.lr_fn(jnp.int32(99)))
    assert v0 <= v_warm + 1e-6
    assert 0.0 <= v_end <= v_warm + 1e-6


def test_load_pretrained_with_key_remap(tmp_path):
    """Eval-time / warm-start loader: params-only restore + key remapping
    (src/utils/checkpoint.py:8-29 analog)."""
    from vllm_flash_attn_tpu.training.checkpoint import load_pretrained_params
    import jax.numpy as jnp

    cfg = TrainConfig(
        model=TINY, seq_len=64, global_batch_size=4, max_steps=2,
        tp=4, ckpt_dir=str(tmp_path / "ckpt"),
    )
    tokens = synthetic_tokens(256, 30_000, 0)
    tr = Trainer(cfg, tokens)
    tr.fit()

    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tr.state.params
    )
    params = load_pretrained_params(cfg.ckpt_dir, abstract)
    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(tr.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    remapped = load_pretrained_params(
        cfg.ckpt_dir, abstract, key_remap={"ln_f": "final_norm"}
    )
    assert "final_norm" in remapped and "ln_f" not in remapped


def test_tp_replicated_params_stay_in_sync_without_sp():
    """Without sequence parallelism, replicated norm params must still get
    the model-axis psum of their partial grads — otherwise the tp copies
    drift apart (regression: the psum was conditioned on sequence_parallel
    and non-SP TP silently de-synced by ~1e-5/step)."""
    from vllm_flash_attn_tpu.training.data import synthetic_tokens

    cfg = TrainConfig(
        model=TINY, seq_len=64, global_batch_size=4, max_steps=3,
        tp=4, sequence_parallel=False,
    )
    tr = Trainer(cfg, synthetic_tokens(256, 30_000, 0))
    tr.fit()
    leaf = tr.state.params["ln_f"]["weight"]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    drift = max(float(np.abs(shards[0] - s).max()) for s in shards[1:])
    assert drift == 0.0, drift


def test_best_checkpoint_policy(tmp_path):
    from vllm_flash_attn_tpu.training.checkpoint import (
        BestCheckpointPolicy,
        CheckpointManager,
    )
    import jax.numpy as jnp

    mgr = CheckpointManager(str(tmp_path), max_to_keep=10)
    pol = BestCheckpointPolicy(mgr, top_k=2)
    state = {"w": jnp.ones((4,))}
    assert pol.maybe_save(3.0, 1, state)
    assert pol.maybe_save(2.0, 2, state)
    assert not pol.maybe_save(5.0, 3, state)  # worse than both kept
    assert pol.maybe_save(1.0, 4, state)  # evicts step 1
    assert pol.best()[0] == "best_step_4"
    assert not (tmp_path / "best_step_1").exists()
    assert (tmp_path / "best_step_2").exists()


def test_logger_backends(tmp_path):
    import json as _json

    from vllm_flash_attn_tpu.training.callbacks import (
        CsvLogger,
        JsonlLogger,
        LoggerCollection,
        StdoutLogger,
    )

    jl = tmp_path / "log.jsonl"
    cl = tmp_path / "log.csv"
    logs = LoggerCollection(
        [JsonlLogger(str(jl)), CsvLogger(str(cl)), StdoutLogger()]
    )
    logs.log(0, {"loss": 1.5, "ppl": 4.48})
    logs.log(10, {"loss": 1.2, "ppl": 3.32})
    logs.close()
    lines = jl.read_text().strip().splitlines()
    assert _json.loads(lines[1]) == {"step": 10, "loss": 1.2, "ppl": 3.32}
    rows = cl.read_text().strip().splitlines()
    assert rows[0] == "step,loss,ppl" and rows[2].startswith("10,")


def test_config_resolvers_and_overlays():
    """Hydra-resolver parity (training/run.py:11-15): ${eval:}, ${div_up:},
    dotted interpolation, and __scratch-key stripping, through the real
    experiment overlays."""
    import sys

    sys.path.insert(0, "/root/repo")
    from training_run import (
        _resolve_interpolations,
        _strip_scratch,
        load_experiment,
    )
    from vllm_flash_attn_tpu.training.trainer import TrainConfig

    t = {
        "__bs": 64,
        "model": {"n_embd": 768, "n_inner": "${eval:${model.n_embd}*4}"},
        "global_batch_size": "${__bs}",
        "accum": "${div_up:${__bs},12}",
        "name": "gpt-${model.n_embd}",
    }
    r = _strip_scratch(_resolve_interpolations(t))
    assert r["model"]["n_inner"] == 3072
    assert r["global_batch_size"] == 64 and r["accum"] == 6
    assert r["name"] == "gpt-768" and "__bs" not in r

    cfg = TrainConfig()
    load_experiment(cfg, "/root/repo/configs/experiments/gpt3/gpt3s-8k.yaml")
    assert cfg.seq_len == 8192
    assert cfg.global_batch_size == 64  # div_up(524288, 8192)
    assert cfg.model.n_embd == 768  # via nested include chain
    assert not hasattr(cfg, "__tokens_per_batch")

    # the reference's 2.7B long-context headline experiment
    # (configs/experiment/pile/gpt3-2.7B-flash-8k.yaml analog)
    cfg = TrainConfig()
    load_experiment(
        cfg, "/root/repo/configs/experiments/gpt3/gpt3-2.7b-8k.yaml"
    )
    assert cfg.seq_len == 8192 and cfg.model.n_positions == 8192
    assert cfg.model.n_embd == 2560 and cfg.model.n_layer == 32
    assert cfg.tp == 4 and cfg.sequence_parallel
    assert cfg.global_batch_size == 64


def test_config_groups_and_profile_mode(tmp_path):
    """Round-4 config-group overrides (mode= / scheduler= / optimizer=, the
    reference's Hydra group composition) and mode=profile producing a real
    jax.profiler trace (ref configs/mode/profile.yaml:1-23)."""
    import glob
    import sys

    sys.path.insert(0, "/root/repo")
    import training_run

    prof = str(tmp_path / "prof")
    training_run.main([
        "experiment=gpt3/gpt3s-125m", "mode=profile", "scheduler=invsqrt",
        "model.n_layer=1", "model.n_embd=64", "model.n_head=4",
        "model.vocab_size=128", "model.fused_ce_chunk=0",
        "seq_len=32", "global_batch_size=8", f"profile_dir={prof}",
    ])
    traces = glob.glob(f"{prof}/**/*.xplane.pb", recursive=True)
    assert traces, "mode=profile produced no trace"

    # every config-group dir is populated and loads (coverage of the tree)
    from pathlib import Path

    from vllm_flash_attn_tpu.training.trainer import TrainConfig

    for group in ("scheduler", "mode", "optimizer"):
        files = sorted(Path("/root/repo/configs", group).glob("*.yaml"))
        assert files, f"configs/{group}/ is empty"
        for f in files:
            cfg = TrainConfig()
            training_run.apply_group(cfg, group, f.stem)
    assert len(list(Path("/root/repo/configs/scheduler").glob("*.yaml"))) >= 8
    assert len(list(Path("/root/repo/configs/mode").glob("*.yaml"))) >= 5


def test_plateau_schedule_reduces_lr():
    """ReduceLROnPlateau analog: lr_scale drops by `factor` after `patience`
    non-improving log intervals and the run keeps training."""
    cfg = TrainConfig(
        model=TINY, seq_len=32, global_batch_size=8, max_steps=12,
        lr=1e-3, warmup_steps=0, schedule="plateau",
        plateau_patience=2, plateau_factor=0.5, plateau_min_delta=1e9,
        log_every=1,  # min_delta huge -> never "improves" -> scale decays
    )
    tr = Trainer(cfg, synthetic_tokens(256, 20_000, 3))
    tr.fit()
    scale = float(tr.state.opt_state["lr_scale"])
    assert scale <= 0.5 ** 2, scale  # >= 2 reductions in 12 logged steps


def test_callback_parity_tail():
    """Round-4 callback additions (reference src/callbacks/): causality
    probe (zero future-grad on the causal LM), params-log counts,
    loss-scale monitor, pluggable remote logger."""
    import jax.numpy as jnp

    from vllm_flash_attn_tpu.models.gpt import GPTLMHeadModel
    from vllm_flash_attn_tpu.training.callbacks import (
        LossScaleMonitor,
        RemoteLogger,
        causality_probe,
        params_log,
    )

    model = GPTLMHeadModel(TINY)
    params = model.init(jax.random.PRNGKey(0))
    ids = jnp.zeros((1, 16), jnp.int32)
    assert causality_probe(model, params, ids, k=8) == 0.0

    stats = params_log(params)
    manual = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params)
    )
    assert stats["params/total"] == manual > 0

    m = LossScaleMonitor(grad_clip=1.0)
    s = m.stats(grad_norm=4.0, lr_scale=0.5)
    assert abs(s["scale/grad_clip_coeff"] - 0.25) < 1e-4
    assert s["scale/lr_scale"] == 0.5

    sent, failed = [], []
    rl = RemoteLogger(post_fn=lambda step, row: sent.append((step, row)))
    rl.log(1, {"loss": 2.0})
    assert sent and sent[0][0] == 1 and rl.errors == 0
    rl_bad = RemoteLogger(post_fn=lambda *a: 1 / 0)
    rl_bad.log(2, {"loss": 1.0})  # failures counted, never raised
    assert rl_bad.errors == 1 and rl_bad.buffer


def test_remat_blocks_grad_parity():
    """config.remat in {dots, full} must not change loss or grads (pure
    recompute), only activation memory."""
    import dataclasses

    import jax.numpy as jnp

    from vllm_flash_attn_tpu.models.gpt import GPTLMHeadModel

    cfg = GPTConfig(
        vocab_size=128, n_positions=0, n_embd=64, n_layer=2, n_head=4,
        rotary_emb_dim=16,
    )
    model = GPTLMHeadModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 128, (2, 32)), jnp.int32)
    loss0, g0 = jax.value_and_grad(model.loss)(params, ids, ids)
    for mode in ("dots", "full"):
        m2 = GPTLMHeadModel(dataclasses.replace(cfg, remat=mode))
        loss1, g1 = jax.value_and_grad(m2.loss)(params, ids, ids)
        assert abs(float(loss0 - loss1)) < 1e-6, mode
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1
        )
        assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5, mode


def test_all_experiment_configs_load():
    """Every yaml under configs/experiments resolves through the include
    chain into a valid TrainConfig (the reference ships a 42-yaml experiment
    matrix; this pins ours loadable as the families grow)."""
    import glob
    import sys

    sys.path.insert(0, "/root/repo")
    from training_run import load_experiment

    files = sorted(
        glob.glob("/root/repo/configs/experiments/**/*.yaml", recursive=True)
    )
    files = [f for f in files if not f.endswith("base.yaml")]
    assert len(files) >= 20, files
    for f in files:
        cfg = TrainConfig()
        load_experiment(cfg, f)
        assert cfg.seq_len > 0 and cfg.global_batch_size > 0, f
        assert cfg.model.n_embd % cfg.model.n_head == 0, f
        if "rotary" in f:
            assert cfg.model.rotary_emb_dim > 0, f
        if "-8k" in f:
            assert cfg.seq_len == 8192, f
