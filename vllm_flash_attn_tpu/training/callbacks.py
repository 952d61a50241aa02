"""Training observability callbacks (SURVEY.md §5.1, §5.5).

- SpeedMonitor: intra/inter-step ms + tokens/s, sampled on log steps only
  (/root/reference/training/src/callbacks/speed_monitor.py:12-95)
- NormMonitor: total param/grad norms without extra device syncs — values are
  computed inside the jitted step and read back lazily
  (norm_monitor.py:1-4 documents the 6-7% .item() sync tax this avoids)
- FlopCounter: analytic model FLOPs/token + achieved MFU
  (flop_count.py + src/utils/flops.py:20-45)
- EMA: exponential moving average of params (src/utils/ema.py:19-280)
- Perplexity / NumTokens metrics (src/metrics/{perplexity,num_tokens}.py)
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class SpeedMonitor:
    def __init__(self, log_every: int = 10):
        self.log_every = log_every
        self._t_last: Optional[float] = None
        self._t_step_start: Optional[float] = None
        self.stats: Dict[str, float] = {}

    def on_step_start(self, step: int):
        now = time.time()
        if self._t_last is not None and step % self.log_every == 0:
            self.stats["time/inter_step_ms"] = (now - self._t_last) * 1e3
        self._t_step_start = now

    def on_step_end(self, step: int, tokens_in_batch: int = 0):
        now = time.time()
        if step % self.log_every == 0 and self._t_step_start is not None:
            dt = now - self._t_step_start
            self.stats["time/intra_step_ms"] = dt * 1e3
            if tokens_in_batch:
                self.stats["throughput/tokens_per_sec"] = tokens_in_batch / dt
        self._t_last = now


class DeviceStatsMonitor:
    """Device memory/utilization stats (the reference's GPUStatsMonitor
    analog, configs/callbacks/gpu-monitor.yaml): samples
    `device.memory_stats()` on log steps — bytes in use, peak, and pool
    limit, as fractions of the limit where available. No-op on backends
    without memory stats (CPU interpret tests)."""

    def __init__(self, log_every: int = 10, device=None):
        import jax

        self.log_every = log_every
        self.device = device or jax.local_devices()[0]
        self.stats: Dict[str, float] = {}

    def on_step_end(self, step: int, **_):
        if step % self.log_every != 0:
            return
        try:
            m = self.device.memory_stats()
        except Exception:
            m = None
        if not m:
            return
        in_use = m.get("bytes_in_use")
        peak = m.get("peak_bytes_in_use")
        limit = m.get("bytes_limit") or m.get("bytes_reservable_limit")
        if in_use is not None:
            self.stats["device/bytes_in_use"] = float(in_use)
        if peak is not None:
            self.stats["device/peak_bytes_in_use"] = float(peak)
        if limit:
            self.stats["device/mem_limit_bytes"] = float(limit)
            if in_use is not None:
                self.stats["device/mem_used_frac"] = float(in_use) / float(limit)


def model_flops_per_token(n_layer, n_embd, n_head, seq_len, vocab_size,
                          n_inner=None, gated=False) -> float:
    """Analytic fwd+bwd FLOPs/token (6N + attention), the reference MFU
    convention (src/utils/flops.py:20-45; attention term uses the
    benchmarks/benchmark_flash_attention.py:27-30 causal formula)."""
    n_inner = n_inner or 4 * n_embd
    mlp_mult = 3 if gated else 2
    params_per_layer = 4 * n_embd * n_embd + mlp_mult * n_embd * n_inner
    dense = n_layer * params_per_layer + n_embd * vocab_size
    fwd = 2 * dense + n_layer * (2 * seq_len * n_embd)  # causal attn: s/2·4·d·2
    return 3.0 * fwd  # fwd + 2x bwd


class FlopCounter:
    def __init__(self, config, seq_len: int, peak_tflops: float = 197.0):
        c = config
        self.flops_per_token = model_flops_per_token(
            c.n_layer, c.n_embd, c.n_head, seq_len, c.padded_vocab,
            c.n_inner, c.gated_mlp,
        )
        self.peak = peak_tflops * 1e12

    def mfu(self, tokens_per_sec: float) -> float:
        return tokens_per_sec * self.flops_per_token / self.peak


@dataclasses.dataclass
class EMA:
    """Exponential moving average of params (ema.py:19-280 surface:
    update / copy_to / store / restore)."""

    decay: float = 0.999
    shadow: Any = None
    _backup: Any = None

    def update(self, params):
        if self.shadow is None:
            self.shadow = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.float32), params
            )
        else:
            d = self.decay
            self.shadow = jax.tree_util.tree_map(
                lambda s, p: s * d + p.astype(jnp.float32) * (1 - d),
                self.shadow, params,
            )

    def copy_to(self, params):
        return jax.tree_util.tree_map(
            lambda s, p: s.astype(p.dtype), self.shadow, params
        )

    def store(self, params):
        self._backup = params

    def restore(self):
        return self._backup


class NormMonitor:
    """Total param/grad L2 norms with NO extra device syncs: the squared sums
    are computed inside the jitted step (device arrays), kept as futures, and
    only converted with .item() when the log step reads them — the reference
    documents a 6-7% slowdown from eager .item() calls
    (/root/reference/training/src/callbacks/norm_monitor.py:1-4,22-79)."""

    def __init__(self, log_every: int = 10):
        self.log_every = log_every
        self._pending = None
        self.stats: Dict[str, float] = {}

    @staticmethod
    def device_norms(params, grads=None):
        """Call INSIDE the jitted step; returns a dict of device scalars to
        thread through the step's outputs."""
        def sq(tree):
            return sum(
                jnp.sum(jnp.square(leaf.astype(jnp.float32)))
                for leaf in jax.tree_util.tree_leaves(tree)
            )

        out = {"norm/param": jnp.sqrt(sq(params))}
        if grads is not None:
            out["norm/grad"] = jnp.sqrt(sq(grads))
        return out

    def on_step_end(self, step: int, device_norms: Optional[Dict] = None):
        # lazily realize LAST log-step's futures; stash this step's
        if self._pending is not None and step % self.log_every == 0:
            self.stats = {k: float(v) for k, v in self._pending.items()}
        self._pending = device_norms


class LoggerCollection:
    """Minimal logger-backend fan-out (the reference ships 7 logger configs,
    training/configs/logger/*): jsonl file + csv + stdout backends, one
    log(step, metrics) call."""

    def __init__(self, backends):
        self.backends = list(backends)

    def log(self, step: int, metrics: Dict[str, Any]):
        for b in self.backends:
            b.log(step, metrics)

    def close(self):
        for b in self.backends:
            if hasattr(b, "close"):
                b.close()


class JsonlLogger:
    def __init__(self, path):
        import io
        self._f = open(path, "a", buffering=1)

    def log(self, step, metrics):
        import json
        self._f.write(json.dumps({"step": step, **metrics}) + "\n")

    def close(self):
        self._f.close()


class CsvLogger:
    """Header covers the union of metric keys — keys that first appear
    mid-run (e.g. 'mfu' once SpeedMonitor has a throughput sample) are not
    silently dropped. Rows APPEND line-buffered (a crash/SIGKILL loses at
    most the in-flight row; I/O stays O(rows) over a long run); only when a
    new key widens the header is the file rewritten once atomically (tmp +
    os.replace). Resumed runs adopt the existing header, so the file never
    grows a second header line."""

    def __init__(self, path):
        import os

        self._path = path
        self._keys = ["step"]
        self._f = None
        if os.path.exists(path) and os.path.getsize(path) > 0:
            with open(path) as f:
                header = f.readline().strip()
            if header:
                self._keys = header.split(",")

    def log(self, step, metrics):
        row = {"step": step, **metrics}
        new = [k for k in sorted(metrics) if k not in self._keys]
        if new:
            self._keys.extend(new)
            self._rewrite(row)
        else:
            self._append(row)

    def _line(self, row):
        return ",".join(str(row.get(k, "")) for k in self._keys) + "\n"

    def _append(self, row):
        import os

        if self._f is None:
            fresh = (
                not os.path.exists(self._path)
                or os.path.getsize(self._path) == 0
            )
            self._f = open(self._path, "a", buffering=1)
            if fresh:
                self._f.write(",".join(self._keys) + "\n")
        self._f.write(self._line(row))

    def _rewrite(self, row):
        import csv
        import os

        if self._f is not None:
            self._f.close()
            self._f = None
        old_rows = []
        if os.path.exists(self._path):
            with open(self._path) as f:
                old_rows = list(csv.DictReader(f))
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            f.write(",".join(self._keys) + "\n")
            for old in old_rows:
                f.write(self._line(old))
            f.write(self._line(row))
        os.replace(tmp, self._path)

    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None


class StdoutLogger:
    def log(self, step, metrics):
        parts = " ".join(
            f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in metrics.items()
        )
        print(f"[step {step}] {parts}")


def causality_probe(model, params, input_ids, k: int) -> float:
    """Max |d out[:, :k] / d embedding[:, k:]| — must be 0.0 for a causal
    model (the reference's CausalityMonitor,
    training/src/callbacks/causality_monitor.py: backprop a loss on early
    positions and assert future input embeddings receive zero gradient).
    Run on a tiny batch; it costs one fwd+bwd."""
    import jax

    b, s = input_ids.shape
    delta0 = jnp.zeros((b, s, model.config.n_embd), jnp.float32)

    def f(delta):
        logits = model.apply(params, input_ids, inputs_embeds_delta=delta)
        return jnp.sum(logits[:, :k].astype(jnp.float32) ** 2)

    g = jax.grad(f)(delta0)
    return float(jnp.max(jnp.abs(g[:, k:])))


class LossScaleMonitor:
    """The reference monitors the AMP grad-scaler scale
    (training/src/callbacks/loss_scale_monitor.py). bf16 training here has
    no loss scaler; the analogous numerics dials are the grad-clip
    coefficient actually applied (min(1, clip/||g||)) and the effective LR
    multiplier (plateau lr_scale), logged under the same metric family."""

    def __init__(self, grad_clip: float):
        self.grad_clip = grad_clip

    def stats(self, grad_norm: float, lr_scale: float = 1.0):
        return {
            "scale/grad_clip_coeff": min(
                1.0, self.grad_clip / (grad_norm + 1e-6)
            ),
            "scale/lr_scale": float(lr_scale),
        }


def params_log(params) -> dict:
    """Total / per-dtype parameter counts (the reference's ParamsLog
    callback, training/src/callbacks/params_log.py)."""
    import jax

    leaves = jax.tree_util.tree_leaves(params)
    total = sum(int(np.prod(x.shape)) for x in leaves)
    by_dtype: dict = {}
    for x in leaves:
        key = f"params/num_{x.dtype}"
        by_dtype[key] = by_dtype.get(key, 0) + int(np.prod(x.shape))
    return {"params/total": total, **by_dtype}


class RemoteLogger:
    """Pluggable remote metrics backend (the reference ships 7 logger
    configs incl. wandb, training/configs/logger/*; remote services are
    unavailable offline). Inject `post_fn(step, metrics_dict)` — e.g. an
    HTTP POST, a wandb.log wrapper, a queue — and failures are counted, not
    raised (logging must never kill a run). Without post_fn it buffers the
    last `keep` rows for inspection."""

    def __init__(self, post_fn=None, keep: int = 1000):
        self.post_fn = post_fn
        self.keep = keep
        self.buffer = []
        self.errors = 0

    def log(self, step, metrics):
        row = {"step": step, **metrics}
        self.buffer.append(row)
        if len(self.buffer) > self.keep:
            self.buffer.pop(0)
        if self.post_fn is not None:
            try:
                self.post_fn(step, row)
            except Exception:
                self.errors += 1

    def close(self):
        pass


class Perplexity:
    """exp(mean loss) reusing the step loss (src/metrics/perplexity.py)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    def update(self, loss: float, n: int = 1):
        self.total += float(loss) * n
        self.count += n

    def compute(self) -> float:
        return float(np.exp(self.total / max(self.count, 1)))

    def reset(self):
        self.total, self.count = 0.0, 0


class NumTokens:
    """Monotone token counter surviving resume (src/metrics/num_tokens.py)."""

    def __init__(self, start: int = 0):
        self.count = int(start)

    def update(self, n: int):
        self.count += int(n)

    def state_dict(self):
        return {"count": self.count}

    def load_state_dict(self, s):
        self.count = int(s["count"])
