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
    dequantize_pages,
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
    kd = dequantize_pages(kq)
    vd = dequantize_pages(vq)
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
    kd = dequantize_pages(kq2)
    ks = dense_view(kd, bt, [L + 1 for L in lengths])
    for i, L in enumerate(lengths):
        got = ks[i][L]
        want = np.asarray(k_new[i, 0])
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 0.02, f"seq{i}: {rel}"


@pytest.mark.parametrize(
    "h,h_k,d", [(8, 1, 128), (71, 1, 64), (6, 3, 64), (8, 2, 59)],
    ids=["mqa", "falcon7b", "gqa3", "oddd"],
)
@pytest.mark.parametrize("dtype", [jnp.int8, jnp.float8_e4m3fn], ids=["int8", "fp8"])
def test_quantized_decode_padded_pools(h, h_k, d, dtype):
    """Round-4 padded pool layout: MQA / tiny-h_kv / non-divisible h_q /
    odd head dims all serve quantized (the round-3 TPU limit was
    h_kv % 4 == 0 and h_q % 8 == 0; the pool is now allocated with
    block-replicated padded heads and lane-padded d, and q heads are
    zero-padded host-side)."""
    rng = np.random.default_rng(5)
    lengths = [75, 33]
    b, ps = 2, 16
    k_pages, v_pages, bt = make_paged_cache(
        rng, b, lengths, h_k, d, ps, jnp.float32
    )
    kq, vq = quantize_pages(k_pages, v_pages, dtype)
    assert kq.data.shape[-2] % 4 == 0 and kq.data.shape[-1] % 128 == 0
    assert kq.scales is vq.scales  # packed: one scale DMA serves both
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    lens = jnp.asarray(lengths, jnp.int32)
    out = paged_attention(q, kq, vq, lens, bt, pages_per_compute_block=4)
    kd = dense_view(dequantize_pages(kq), bt, lengths)
    vd = dense_view(dequantize_pages(vq), bt, lengths)
    for i, L in enumerate(lengths):
        ks = jnp.asarray(kd[i])
        vs = jnp.asarray(vd[i])
        if h_k > 1:
            ks = jnp.repeat(ks, h // h_k, axis=1)
            vs = jnp.repeat(vs, h // h_k, axis=1)
        else:
            ks = jnp.broadcast_to(ks, (L, h, d))
            vs = jnp.broadcast_to(vs, (L, h, d))
        out_ref, _ = attention_ref(
            q[i][None, None], ks[None], vs[None], causal=True, upcast=True,
        )
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(out_ref[0, 0]),
            atol=3e-2, rtol=3e-2, err_msg=f"seq{i}",
        )


def test_qpv_on_off_agree():
    """qpv defaults ON for int8 (round-4 hardware win); the fp32-PV path
    (qpv=False) stays covered and both must agree to within the p-requant
    error (1/127 relative)."""
    rng = np.random.default_rng(7)
    b, h, h_k, d, ps = 2, 8, 4, 128, 16
    lengths = [100, 37]
    k_pages, v_pages, bt = make_paged_cache(
        rng, b, lengths, h_k, d, ps, jnp.float32
    )
    kq, vq = quantize_pages(k_pages, v_pages, jnp.int8)
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
    lens = jnp.asarray(lengths, jnp.int32)
    out_on = paged_attention(q, kq, vq, lens, bt, qpv=True)
    out_off = paged_attention(q, kq, vq, lens, bt, qpv=False)
    np.testing.assert_allclose(
        np.asarray(out_on, np.float32), np.asarray(out_off, np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_packed_scales_append_then_decode():
    """Quantize-on-append into the packed/padded layout, then decode: the
    appended token must be attendable and both scale halves must survive
    the single-array update."""
    rng = np.random.default_rng(6)
    b, h, h_k, d, ps = 2, 8, 2, 64, 16
    lengths = [31, 48]
    k_pages, v_pages, bt = make_paged_cache(rng, b, [64, 64], h_k, d, ps, jnp.float32)
    kq, vq = quantize_pages(k_pages, v_pages, jnp.int8)
    lens = jnp.asarray(lengths, jnp.int32)
    k_new = jnp.asarray(rng.standard_normal((b, 1, h_k, d)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((b, 1, h_k, d)), jnp.float32)
    kq2, vq2 = append_kv_paged_quantized(kq, vq, k_new, v_new, lens, bt)
    assert kq2.scales is vq2.scales
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    lens2 = lens + 1
    out = paged_attention(q, kq2, vq2, lens2, bt, pages_per_compute_block=4)
    kd = dense_view(dequantize_pages(kq2), bt, [L + 1 for L in lengths])
    vd = dense_view(dequantize_pages(vq2), bt, [L + 1 for L in lengths])
    for i, L in enumerate(lengths):
        np.testing.assert_allclose(  # appended token round-trips k AND v
            kd[i][L], np.asarray(k_new[i, 0]), atol=2e-2, rtol=2e-2
        )
        np.testing.assert_allclose(
            vd[i][L], np.asarray(v_new[i, 0]), atol=2e-2, rtol=2e-2
        )
        ks = jnp.repeat(jnp.asarray(kd[i]), h // h_k, axis=1)
        vs = jnp.repeat(jnp.asarray(vd[i]), h // h_k, axis=1)
        out_ref, _ = attention_ref(
            q[i][None, None], ks[None], vs[None], causal=True, upcast=True,
        )
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(out_ref[0, 0]),
            atol=3e-2, rtol=3e-2, err_msg=f"seq{i}",
        )


def test_unpacked_legacy_layout_still_works():
    """Directly constructed QuantizedPages (old split-scale layout, no
    padding) keep working via the meta defaults."""
    rng = np.random.default_rng(7)
    b, h, h_k, d, ps = 2, 8, 4, 128, 16
    lengths = [40, 20]
    k_pages, v_pages, bt = make_paged_cache(rng, b, lengths, h_k, d, ps, jnp.float32)
    kv, ks = quantize_kv(k_pages, jnp.int8)
    vv, vs = quantize_kv(v_pages, jnp.int8)
    pad = [(0, 0), (0, 0), (0, 128 - h_k)]
    kq = QuantizedPages(kv, jnp.pad(ks, pad))
    vq = QuantizedPages(vv, jnp.pad(vs, pad))
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    lens = jnp.asarray(lengths, jnp.int32)
    out_legacy = paged_attention(q, kq, vq, lens, bt, pages_per_compute_block=4)
    kq2, vq2 = quantize_pages(k_pages, v_pages, jnp.int8)
    out_packed = paged_attention(q, kq2, vq2, lens, bt, pages_per_compute_block=4)
    np.testing.assert_allclose(
        np.asarray(out_legacy), np.asarray(out_packed), atol=1e-3, rtol=1e-3
    )


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


def test_qpv_int8_pv_matmul_decode():
    """PD_QPV=1: decode PV as int8 x int8 MXU matmul with a requantized p
    (v scales folded into p pre-quantization). Covers GQA, MHA, MQA shapes.
    Module-level env knob -> isolated subprocess."""
    import os
    import subprocess
    import sys

    code = """
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from vllm_flash_attn_tpu.kernels.paged_decode import paged_attention
from vllm_flash_attn_tpu.kernels.kv_quant import quantize_pages
rng = np.random.default_rng(0)
for hq, hkv in [(8, 4), (8, 8), (8, 1)]:
    b, d, ps, npages = 2, 128, 16, 16
    kp = jnp.asarray(rng.standard_normal((npages, ps, hkv, d)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((npages, ps, hkv, d)), jnp.float32)
    bt = jnp.asarray(rng.permutation(npages).reshape(b, 8).astype(np.int32))
    lens = jnp.asarray([100, 37], jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)
    ref = paged_attention(q, kp.astype(jnp.bfloat16), vp.astype(jnp.bfloat16), lens, bt, interpret=True)
    kq, vq = quantize_pages(kp, vp, jnp.int8)
    out = paged_attention(q, kq, vq, lens, bt, interpret=True)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    assert err < 0.1, (hq, hkv, err)
print("QPV_SUBPROC_OK")
"""
    env = dict(os.environ, PD_QPV="1", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=300, cwd="/root/repo",
    )
    assert "QPV_SUBPROC_OK" in r.stdout, (r.stdout, r.stderr[-2000:])
