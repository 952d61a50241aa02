"""Quantized-KV-cache quality evaluation (BASELINE.json: <=0.05 ppl delta).

No network access here, so instead of WikiText-2 + pretrained weights the
oracle is built locally: a small byte-level LM is trained on this repo's own
source code (real statistical structure), then held-out text is scored
teacher-forced THROUGH THE DECODE PATH — every step appends the ground-truth
token and attends over the paged cache — once per cache dtype. The ppl delta
between the bf16 cache and the int8/fp8 caches measures exactly what a
serving deployment would see.

Run: python benchmarks/eval_kv_quant_ppl.py  (CPU ok; also used by
tests/test_kv_quant.py::test_quantized_cache_ppl_delta with smaller sizes)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def byte_corpus(max_bytes=400_000):
    root = Path(__file__).resolve().parents[1] / "vllm_flash_attn_tpu"
    data = b"\n".join(
        p.read_bytes() for p in sorted(root.rglob("*.py"))
    )[:max_bytes]
    return np.frombuffer(data, np.uint8).astype(np.int32)


def train_byte_lm(tokens, n_layer=2, n_embd=128, steps=300, seq_len=128,
                  batch=16, seed=0):
    from vllm_flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
    from vllm_flash_attn_tpu.training.train_step import make_optimizer

    cfg = GPTConfig(
        vocab_size=256, n_positions=0, n_embd=n_embd, n_layer=n_layer,
        n_head=4, rotary_emb_dim=n_embd // 8, gated_mlp=True, rms_norm=True,
        qkv_proj_bias=False, out_proj_bias=False, mlp_fc1_bias=False,
        mlp_fc2_bias=False, activation_function="silu", n_inner=2 * n_embd,
    )
    model = GPTLMHeadModel(cfg)
    params = model.init(jax.random.PRNGKey(seed))
    opt = make_optimizer(lr=3e-3, warmup_steps=20, total_steps=steps)
    opt_state = jax.jit(opt.init)(params)
    rng = np.random.default_rng(seed)
    n_train = len(tokens) - seq_len - 1

    @jax.jit
    def step(params, opt_state, it, ids, labels):
        loss, grads = jax.value_and_grad(model.loss)(params, ids, labels)
        params, opt_state, _ = opt.update(grads, opt_state, params, it)
        return params, opt_state, loss

    it = jnp.zeros((), jnp.int32)
    for i in range(steps):
        starts = rng.integers(0, n_train, (batch,))
        batch_tok = np.stack([tokens[s : s + seq_len + 1] for s in starts])
        ids = jnp.asarray(batch_tok[:, :-1])
        labels = jnp.asarray(batch_tok[:, 1:])
        params, opt_state, loss = step(params, opt_state, it, ids, labels)
        it = it + 1
        if i % 100 == 0:
            print(f"  train step {i}: loss {float(loss):.3f}", file=sys.stderr)
    return model, params


def decode_path_ppl(model, params, text, cache_dtype, page_size=16):
    """Teacher-forced ppl where every step's attention reads the paged cache
    of dtype `cache_dtype` ('bf16' | 'int8' | 'fp8') — the serving path."""
    from vllm_flash_attn_tpu.kernels.kv_quant import (
        QuantizedPages,
        append_kv_paged_quantized,
        quantize_pages,
    )
    from vllm_flash_attn_tpu.serving.cache import PagedState

    c = model.config
    h_kv = c.n_head_kv or c.n_head
    dh = c.n_embd // c.n_head
    n = len(text)
    num_pages = -(-n // page_size) + 1

    qdtype = {"int8": jnp.int8, "fp8": jnp.float8_e4m3fn}.get(cache_dtype)
    kp, vp = PagedState.allocate(
        c.n_layer, num_pages, page_size, h_kv, dh, jnp.bfloat16
    )
    if qdtype is not None:
        from vllm_flash_attn_tpu.kernels.kv_quant import SCALE_LANES

        shape = kp.shape  # (n_layer, pages, ps, h_kv, dh)
        kp = QuantizedPages(
            jnp.zeros(shape, qdtype),
            jnp.zeros(shape[:3] + (SCALE_LANES,), jnp.float32),
        )
        vp = QuantizedPages(
            jnp.zeros_like(kp.data), jnp.zeros_like(kp.scales)
        )
    tables = jnp.arange(num_pages, dtype=jnp.int32)[None]

    @jax.jit
    def step(params, kp, vp, tok, length):
        state = PagedState(kp, vp, length[None], tables, jnp.ones((1,), jnp.int32), "decode")
        logits = model.apply(
            params, tok[None, None], inference_params=state, num_last_tokens=1
        )
        logp = jax.nn.log_softmax(logits[0, 0, : c.vocab_size].astype(jnp.float32))
        return state.k_pages, state.v_pages, logp

    nll = 0.0
    count = 0
    for i in range(n - 1):
        kp, vp, logp = step(
            params, kp, vp, jnp.int32(text[i]), jnp.int32(i)
        )
        nll -= float(logp[int(text[i + 1])])
        count += 1
    return float(np.exp(nll / count))


def main(eval_len=256, **train_kw):
    tokens = byte_corpus()
    split = int(len(tokens) * 0.9)
    print("training byte-level LM on repo source...", file=sys.stderr)
    model, params = train_byte_lm(tokens[:split], **train_kw)
    text = tokens[split : split + eval_len]

    results = {}
    for dtype in ("bf16", "int8", "fp8"):
        results[dtype] = decode_path_ppl(model, params, text, dtype)
        print(f"  {dtype} cache: ppl {results[dtype]:.4f}", file=sys.stderr)
    base = results["bf16"]
    print(
        f"ppl bf16={base:.4f} int8={results['int8']:.4f} "
        f"(d={results['int8']-base:+.4f}) fp8={results['fp8']:.4f} "
        f"(d={results['fp8']-base:+.4f})"
    )
    return results


if __name__ == "__main__":
    main()
