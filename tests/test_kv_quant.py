"""Quantized KV-cache tests: round-trip accuracy, quantized decode vs fp32
oracle (relaxed tolerance), quantize-on-append, and the model-level
quality bar (logits drift small enough for the <=0.05 ppl target)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_flash_attn_tpu.core.reference import attention_ref
from vllm_flash_attn_tpu.kernels.kv_quant import (
    QuantizedPages,
    append_kv_paged_quantized,
    dequantize_kv,
    page_scales_view,
    quantize_kv,
    quantize_pages,
)
from vllm_flash_attn_tpu.kernels.paged_decode import paged_attention

from test_paged_decode import dense_view, make_paged_cache


@pytest.mark.parametrize("dtype", [jnp.int8, jnp.float8_e4m3fn], ids=["int8", "fp8"])
def test_quantize_roundtrip(dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16, 2, 64)) * 3, jnp.float32)
    vals, scales = quantize_kv(x, dtype)
    back = dequantize_kv(vals, scales)
    rel = np.abs(np.asarray(back) - np.asarray(x)).max() / np.abs(np.asarray(x)).max()
    assert rel < (0.02 if dtype == jnp.int8 else 0.07), rel


@pytest.mark.parametrize("dtype", [jnp.int8, jnp.float8_e4m3fn], ids=["int8", "fp8"])
def test_quantized_decode_vs_oracle(dtype):
    rng = np.random.default_rng(1)
    lengths = [100, 250, 17]
    b, h, h_k, d, ps = 3, 8, 2, 64, 16
    k_pages, v_pages, bt = make_paged_cache(rng, b, lengths, h_k, d, ps, jnp.float32)
    kq, vq = quantize_pages(k_pages, v_pages, dtype)
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    lens = jnp.asarray(lengths, jnp.int32)

    out = paged_attention(q, kq, vq, lens, bt, pages_per_compute_block=4)

    # oracle on the DEQUANTIZED cache (exact target for the kernel) plus a
    # sanity bound vs the fp cache
    kd = dequantize_kv(kq.data, page_scales_view(kq))
    vd = dequantize_kv(vq.data, page_scales_view(vq))
    ks = dense_view(kd, bt, lengths)
    vs = dense_view(vd, bt, lengths)
    ks_f = dense_view(k_pages, bt, lengths)
    vs_f = dense_view(v_pages, bt, lengths)
    for i, L in enumerate(lengths):
        out_ref, _ = attention_ref(
            q[i][None, None], jnp.asarray(ks[i])[None], jnp.asarray(vs[i])[None],
            causal=True, upcast=True,
        )
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(out_ref[0, 0]), atol=2e-2, rtol=2e-2,
            err_msg=f"seq{i} vs dequant oracle",
        )
        out_fp, _ = attention_ref(
            q[i][None, None], jnp.asarray(ks_f[i])[None], jnp.asarray(vs_f[i])[None],
            causal=True, upcast=True,
        )
        err = np.abs(np.asarray(out[i]) - np.asarray(out_fp[0, 0])).max()
        assert err < (0.05 if dtype == jnp.int8 else 0.15), f"seq{i}: {err}"


def test_quantized_append():
    rng = np.random.default_rng(2)
    b, h_k, d, ps = 2, 2, 32, 16
    lengths = [10, 20]
    k_pages, v_pages, bt = make_paged_cache(rng, b, [64, 64], h_k, d, ps, jnp.float32)
    kq, vq = quantize_pages(k_pages, v_pages, jnp.int8)
    k_new = jnp.asarray(rng.standard_normal((b, 1, h_k, d)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((b, 1, h_k, d)), jnp.float32)
    lens = jnp.asarray(lengths, jnp.int32)
    kq2, vq2 = append_kv_paged_quantized(kq, vq, k_new, v_new, lens, bt)
    kd = dequantize_kv(kq2.data, page_scales_view(kq2))
    ks = dense_view(kd, bt, [L + 1 for L in lengths])
    for i, L in enumerate(lengths):
        got = ks[i][L]
        want = np.asarray(k_new[i, 0])
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 0.02, f"seq{i}: {rel}"


def test_quantized_cache_ppl_delta():
    """End-to-end quality bar (BASELINE.json: <=0.05 ppl delta with a
    quantized cache): byte-LM trained on repo source, held-out text scored
    teacher-forced THROUGH the paged decode path per cache dtype. Full-size
    run in benchmarks/eval_kv_quant_ppl.py (measured there on v5e:
    int8 +0.005, fp8 -0.018 around ppl 11.73)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "benchmarks"))
    from eval_kv_quant_ppl import byte_corpus, decode_path_ppl, train_byte_lm

    tokens = byte_corpus(max_bytes=120_000)
    split = int(len(tokens) * 0.9)
    model, params = train_byte_lm(
        tokens[:split], n_layer=1, n_embd=64, steps=60, seq_len=64, batch=8
    )
    text = tokens[split : split + 48]
    base = decode_path_ppl(model, params, text, "bf16")
    for dtype in ("int8", "fp8"):
        ppl = decode_path_ppl(model, params, text, dtype)
        assert abs(ppl - base) <= 0.05 * max(1.0, base / 10), (dtype, ppl, base)


def test_qint8_qk_matmul_decode():
    """PD_QINT8=1: decode QK as int8 x int8 MXU matmul with a host-quantized
    q weight. Module-level env knob -> isolated subprocess."""
    import os
    import subprocess
    import sys

    code = """
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from vllm_flash_attn_tpu.kernels.paged_decode import paged_attention
from vllm_flash_attn_tpu.kernels.kv_quant import quantize_pages
rng = np.random.default_rng(0)
b, hq, hkv, d, ps = 2, 8, 4, 128, 16
npages = 16
kp = jnp.asarray(rng.standard_normal((npages, ps, hkv, d)), jnp.float32)
vp = jnp.asarray(rng.standard_normal((npages, ps, hkv, d)), jnp.float32)
bt = jnp.asarray(rng.permutation(npages).reshape(b, 8).astype(np.int32))
lens = jnp.asarray([100, 37], jnp.int32)
q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)
ref = paged_attention(q, kp.astype(jnp.bfloat16), vp.astype(jnp.bfloat16), lens, bt, interpret=True)
kq, vq = quantize_pages(kp, vp, jnp.int8)
out = paged_attention(q, kq, vq, lens, bt, interpret=True)
err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
assert err < 0.1, err
print("QINT8_SUBPROC_OK", err)
"""
    env = dict(os.environ, PD_QINT8="1", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=300, cwd="/root/repo",
    )
    assert "QINT8_SUBPROC_OK" in r.stdout, (r.stdout, r.stderr[-2000:])
