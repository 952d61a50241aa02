"""Training loop (the reference's src/train.py + tasks/seq.py analog).

Wires: config -> model -> sharded train step (train_step.py) -> data loader ->
callbacks -> checkpoint manager, with crash-autosave and exact-batch resume
(SURVEY.md §5.3-5.4). Runs identically on the virtual CPU mesh and real TPU
slices; multi-host only needs jax.distributed.initialize first
(parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from vllm_flash_attn_tpu.models.gpt_parallel import ParallelGPTLMHeadModel
from vllm_flash_attn_tpu.parallel.mesh import make_mesh
from vllm_flash_attn_tpu.training.callbacks import (
    DeviceStatsMonitor,
    EMA,
    CsvLogger,
    FlopCounter,
    JsonlLogger,
    LoggerCollection,
    LossScaleMonitor,
    NumTokens,
    Perplexity,
    SpeedMonitor,
    StdoutLogger,
    causality_probe,
    params_log,
)
from vllm_flash_attn_tpu.training.checkpoint import CheckpointManager
from vllm_flash_attn_tpu.training.data import (
    FaultTolerantSampler,
    LMDataLoader,
    LMDataset,
)
from vllm_flash_attn_tpu.training.train_step import (
    TrainState,
    init_train_state,
    make_optimizer,
    make_parallel_train_step,
)


@dataclasses.dataclass
class TrainConfig:
    model: GPTConfig = dataclasses.field(default_factory=GPTConfig)
    seq_len: int = 512
    global_batch_size: int = 8
    max_steps: int = 100
    lr: float = 3e-4
    weight_decay: float = 0.1
    warmup_steps: int = 10
    grad_clip: float = 1.0
    # optimizer zoo (configs/optimizer/*: adamw|lamb|lion|sgd) and scheduler
    # zoo (configs/scheduler/*: cosine|linear|constant|invsqrt|step|poly|
    # plateau — the reference's 8-group analog)
    optimizer: str = "adamw"
    schedule: str = "cosine"
    min_lr_ratio: float = 0.1
    b1: float = 0.9
    b2: float = 0.95
    milestones: tuple = (1000, 2000)  # step/multi-step schedule
    gamma: float = 0.1
    # plateau schedule (ReduceLROnPlateau analog): on log steps, if the loss
    # has not improved by min_delta for `patience` consecutive logs, the
    # optimizer's lr_scale is multiplied by `factor` (host-side monitor)
    plateau_factor: float = 0.2
    plateau_patience: int = 20
    plateau_min_lr_ratio: float = 0.0
    plateau_min_delta: float = 1e-4
    # profiler windows (mode=profile; the reference wires
    # torch.profiler.schedule(wait=5, warmup=5, active=5) the same way,
    # training/configs/mode/profile.yaml:1-23). active > 0 enables: a
    # jax.profiler trace of steps [wait+warmup, wait+warmup+active) is
    # written to profile_dir
    profile_wait: int = 0
    profile_warmup: int = 0
    profile_active: int = 0
    profile_dir: str = "logs/profile"
    # causality probe at init (reference causality_monitor.py): backprop a
    # loss on early positions, assert future input embeddings get zero grad
    causality_check: bool = False
    dp: Optional[int] = None  # None = infer from mesh
    tp: int = 1
    sequence_parallel: bool = False
    seed: int = 0
    param_dtype: str = "float32"
    ckpt_dir: Optional[str] = None
    ckpt_every: int = 50
    log_every: int = 10
    ema_decay: Optional[float] = None
    zero1: bool = False
    zero2: bool = False  # grad sharding via psum_scatter (implies zero1 state)
    grad_compress: bool = False  # bf16 DP all-reduce (fp16_compress_hook analog)
    # logger backends (reference ships 7 logger configs, configs/logger/*)
    log_jsonl: Optional[str] = None
    log_csv: Optional[str] = None
    log_stdout: bool = False


class Trainer:
    def __init__(self, cfg: TrainConfig, tokens: np.ndarray):
        self.cfg = cfg
        n_dev = len(jax.devices())
        tp = cfg.tp
        dp = cfg.dp or (n_dev // tp)
        assert dp * tp <= n_dev, (dp, tp, n_dev)
        self.mesh = make_mesh((dp, tp), ("data", "model"))
        self.dp, self.tp = dp, tp

        base = GPTLMHeadModel(cfg.model)
        full_params = base.init(
            jax.random.PRNGKey(cfg.seed), getattr(jnp, cfg.param_dtype)
        )
        self.model = ParallelGPTLMHeadModel(
            cfg.model, sequence_parallel=cfg.sequence_parallel
        )
        self.optimizer = make_optimizer(
            lr=cfg.lr, weight_decay=cfg.weight_decay, grad_clip=cfg.grad_clip,
            warmup_steps=cfg.warmup_steps, total_steps=cfg.max_steps,
            b1=cfg.b1, b2=cfg.b2, min_lr_ratio=cfg.min_lr_ratio,
            kind=cfg.optimizer, schedule=cfg.schedule,
            milestones=tuple(cfg.milestones), gamma=cfg.gamma,
        )
        self.state = init_train_state(
            self.model, full_params, self.optimizer, self.mesh,
            zero1=cfg.zero1 or cfg.zero2,
        )
        self.step_fn = make_parallel_train_step(
            self.model, self.optimizer, self.mesh,
            sequence_parallel=cfg.sequence_parallel,
            zero1=cfg.zero1,
            zero2=cfg.zero2,
            grad_compress_dtype=jnp.bfloat16 if cfg.grad_compress else None,
        )

        dataset = LMDataset(tokens, cfg.seq_len)
        sampler = FaultTolerantSampler(len(dataset), seed=cfg.seed)
        self.loader = LMDataLoader(dataset, cfg.global_batch_size, sampler)

        self.speed = SpeedMonitor(cfg.log_every)
        self.device_stats = DeviceStatsMonitor(cfg.log_every)
        self.flops = FlopCounter(cfg.model, cfg.seq_len)
        self.ppl = Perplexity()
        self.num_tokens = NumTokens()
        self.loss_scale = LossScaleMonitor(cfg.grad_clip)
        self.param_stats = params_log(full_params)
        self.causality_max = None
        if cfg.causality_check:
            # one fwd+bwd on a tiny batch with the FULL (pre-shard) params:
            # grad of early outputs wrt future input embeddings must be 0
            probe_ids = jnp.zeros((1, min(cfg.seq_len, 32)), jnp.int32)
            self.causality_max = causality_probe(
                base, full_params, probe_ids, k=probe_ids.shape[1] // 2
            )
            assert self.causality_max == 0.0, (
                f"causality violated: max future-grad {self.causality_max}"
            )
        self.ema = EMA(cfg.ema_decay) if cfg.ema_decay else None
        self.ckpt = (
            CheckpointManager(cfg.ckpt_dir) if cfg.ckpt_dir else None
        )
        backends = []
        if cfg.log_jsonl:
            backends.append(JsonlLogger(cfg.log_jsonl))
        if cfg.log_csv:
            backends.append(CsvLogger(cfg.log_csv))
        if cfg.log_stdout:
            backends.append(StdoutLogger())
        self.loggers = LoggerCollection(backends)
        # param-norm probe, evaluated only on log steps (NormMonitor ethos:
        # no per-step .item() syncs)
        self._pnorm_fn = jax.jit(
            lambda p: jnp.sqrt(
                sum(
                    jnp.sum(jnp.square(x.astype(jnp.float32)))
                    for x in jax.tree_util.tree_leaves(p)
                )
            )
        )
        self.history: list = []

    # ------------------------------------------------------------- checkpoint

    def _extra(self) -> Dict[str, Any]:
        return {
            "sampler": self.loader.state_dict(),
            "num_tokens": self.num_tokens.state_dict(),
        }

    def try_resume(self) -> bool:
        """Resume from the newest checkpoint (autosave included)."""
        if self.ckpt is None:
            return False
        tag = self.ckpt.newest()
        if tag is None:
            return False
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            if hasattr(x, "sharding") else x,
            self.state,
        )
        self.state, extra = self.ckpt.restore(tag, abstract)
        if "sampler" in extra:
            self.loader.load_state_dict(extra["sampler"])
        if "num_tokens" in extra:
            self.num_tokens.load_state_dict(extra["num_tokens"])
        return True

    # ------------------------------------------------------------------ train

    def _plateau_tick(self, loss: float):
        """ReduceLROnPlateau host-side monitor (sampled on log steps): lower
        the optimizer state's lr_scale when the loss stops improving."""
        cfg = self.cfg
        if loss < self._plateau_best - cfg.plateau_min_delta:
            self._plateau_best = loss
            self._plateau_bad = 0
            return
        self._plateau_bad += 1
        if self._plateau_bad >= cfg.plateau_patience:
            self._plateau_bad = 0
            cur = float(self.state.opt_state["lr_scale"])
            new = max(cur * cfg.plateau_factor, cfg.plateau_min_lr_ratio)
            self.state = dataclasses.replace(
                self.state,
                opt_state={
                    **self.state.opt_state,
                    "lr_scale": jnp.asarray(new, jnp.float32),
                },
            )

    def fit(self, max_steps: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        max_steps = max_steps or cfg.max_steps
        it = iter(self.loader)
        run = (
            self.ckpt.autosave_on_crash(lambda: self.state, self._extra)
            if self.ckpt
            else _null_ctx()
        )
        self._plateau_best = float("inf")
        self._plateau_bad = 0
        # profiler schedule (mode=profile): trace steps
        # [wait+warmup, wait+warmup+active)
        prof_start = cfg.profile_wait + cfg.profile_warmup
        prof_stop = prof_start + cfg.profile_active
        prof_on = False
        with run:
            while int(self.state.step) < max_steps:
                step = int(self.state.step)
                if cfg.profile_active > 0:
                    # >= (not ==): a checkpoint-resumed run that lands past
                    # prof_start still opens/closes the window correctly
                    if step >= prof_stop and prof_on:
                        jax.profiler.stop_trace()
                        prof_on = False
                    elif prof_start <= step < prof_stop and not prof_on:
                        import os

                        os.makedirs(cfg.profile_dir, exist_ok=True)
                        jax.profiler.start_trace(cfg.profile_dir)
                        prof_on = True
                self.speed.on_step_start(step)
                batch = next(it)
                ids = jnp.asarray(batch[:, :-1], jnp.int32)
                labels = jnp.asarray(batch[:, 1:], jnp.int32)
                self.state, metrics = self.step_fn(self.state, ids, labels)
                loss = float(metrics["loss"])
                ntok = ids.size
                self.num_tokens.update(ntok)
                self.ppl.update(loss, ntok)
                self.speed.on_step_end(step, ntok)
                self.device_stats.on_step_end(step)
                if self.ema is not None:
                    self.ema.update(self.state.params)
                if step % cfg.log_every == 0:
                    if cfg.schedule == "plateau":
                        self._plateau_tick(loss)
                    gnorm = float(metrics["grad_norm"])
                    rec = {
                        "step": step,
                        "loss": loss,
                        "grad_norm": gnorm,
                        "ppl": self.ppl.compute(),
                        **self.speed.stats,
                        **self.device_stats.stats,
                        **self.loss_scale.stats(
                            gnorm,
                            float(self.state.opt_state["lr_scale"])
                            if "lr_scale" in self.state.opt_state
                            else 1.0,
                        ),
                    }
                    if step == 0:
                        rec.update(self.param_stats)
                        if self.causality_max is not None:
                            rec["causality/max_future_grad"] = (
                                self.causality_max
                            )
                    if "throughput/tokens_per_sec" in self.speed.stats:
                        rec["mfu"] = self.flops.mfu(
                            self.speed.stats["throughput/tokens_per_sec"]
                        )
                    rec["norm/param"] = float(self._pnorm_fn(self.state.params))
                    self.history.append(rec)
                    self.loggers.log(step, rec)
                if self.ckpt and step > 0 and step % cfg.ckpt_every == 0:
                    self.ckpt.save(f"step_{step}", self.state, self._extra())
        if prof_on:  # run ended inside the active window
            jax.profiler.stop_trace()
        if self.ckpt:
            self.ckpt.save("last", self.state, self._extra())
        return self.history[-1] if self.history else {}

    def evaluate(self, tokens: np.ndarray, max_batches: int = 10) -> float:
        """Validation perplexity over a held-out stream (src/eval.py analog)."""
        from vllm_flash_attn_tpu.training.train_step import param_specs
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def _sharded_loss(params, ids, labels):
            # model.loss only psums over 'model' (vocab-parallel CE); each data
            # rank sees a different batch shard, so the P() out_spec is only
            # honest after averaging over 'data' (mirrors the train step).
            return jax.lax.pmean(self.model.loss(params, ids, labels), "data")

        loss_fn = jax.jit(
            shard_map(
                _sharded_loss,
                mesh=self.mesh,
                in_specs=(param_specs(self.model), P("data", None), P("data", None)),
                out_specs=P(),
                check_vma=False,
            )
        )
        ds = LMDataset(tokens, self.cfg.seq_len)
        loader = LMDataLoader(
            ds, self.cfg.global_batch_size,
            FaultTolerantSampler(len(ds), shuffle=False),
        )
        ppl = Perplexity()
        for i, batch in enumerate(loader):
            if i >= max_batches:
                break
            ids = jnp.asarray(batch[:, :-1], jnp.int32)
            labels = jnp.asarray(batch[:, 1:], jnp.int32)
            loss = float(loss_fn(self.state.params, ids, labels))
            ppl.update(loss, ids.size)
        return ppl.compute()


class _null_ctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False
