"""Varlen kernel vs per-sequence oracle, mirroring
test_flash_attn_varlen_output (/root/reference/tests/test_flash_attn.py:1137).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from harness import check_close
from vllm_flash_attn_tpu.core.reference import attention_ref
from vllm_flash_attn_tpu.kernels.flash_varlen import flash_attention_varlen
from vllm_flash_attn_tpu.utils import generate_cu_seqlens


def make_packed(rng, seqlens_q, seqlens_k, h, h_k, d, dtype, pad_to=None):
    total_q, total_k = sum(seqlens_q), sum(seqlens_k)
    if pad_to:
        total_q = -(-total_q // pad_to) * pad_to
        total_k = -(-total_k // pad_to) * pad_to
    q = jnp.asarray(rng.standard_normal((h, total_q, d)), dtype)
    k = jnp.asarray(rng.standard_normal((h_k, total_k, d)), dtype)
    v = jnp.asarray(rng.standard_normal((h_k, total_k, d)), dtype)
    return q, k, v


def run_varlen_case(
    seqlens_q,
    seqlens_k,
    h=4,
    h_k=4,
    d=64,
    causal=False,
    window=(-1, -1),
    alibi=False,
    seqused_k=None,
    dtype=jnp.bfloat16,
    mult=2.0,
    fold=None,
    cp=None,
):
    rng = np.random.default_rng(sum(seqlens_q) + 31 * sum(seqlens_k))
    q, k, v = make_packed(rng, seqlens_q, seqlens_k, h, h_k, d, dtype)
    cu_q = generate_cu_seqlens(seqlens_q)
    cu_k = generate_cu_seqlens(seqlens_k)
    slopes = jnp.asarray(rng.random((h,)) * 0.3, jnp.float32) if alibi else None

    out = flash_attention_varlen(
        q, k, v, cu_q, cu_k,
        seqused_k=None if seqused_k is None else jnp.asarray(seqused_k, jnp.int32),
        alibi_slopes=slopes,
        causal=causal,
        window=window,
        fold=fold,
        cp=cp,
    )

    # oracle: per-sequence dense attention
    for i, (sq, sk) in enumerate(zip(seqlens_q, seqlens_k)):
        sk_used = sk if seqused_k is None else min(sk, seqused_k[i])
        q_i = q[:, int(cu_q[i]) : int(cu_q[i]) + sq].transpose(1, 0, 2)[None]
        k_i = k[:, int(cu_k[i]) : int(cu_k[i]) + sk_used].transpose(1, 0, 2)[None]
        v_i = v[:, int(cu_k[i]) : int(cu_k[i]) + sk_used].transpose(1, 0, 2)[None]
        sl = None if slopes is None else slopes[None]
        out_ref, _ = attention_ref(
            q_i, k_i, v_i, causal=causal, window_size=window, alibi_slopes=sl,
            upcast=True,
        )
        out_pt, _ = attention_ref(
            q_i, k_i, v_i, causal=causal, window_size=window, alibi_slopes=sl,
            upcast=False, reorder_ops=True,
        )
        got = out[:, int(cu_q[i]) : int(cu_q[i]) + sq].transpose(1, 0, 2)[None]
        check_close(got, out_ref, out_pt, mult=mult, what=f"seq{i}")


@pytest.mark.parametrize("causal", [False, True])
def test_mixed_lengths(causal):
    run_varlen_case([37, 128, 1, 200], [37, 128, 1, 200], causal=causal)


@pytest.mark.parametrize("causal", [False, True])
def test_cross_lengths(causal):
    # sq != sk per sequence (bottom-right alignment inside each sequence)
    run_varlen_case([17, 64, 90], [130, 64, 13], causal=causal)


def test_odd_head_dim():
    run_varlen_case([37, 80, 5], [37, 80, 5], d=40, causal=True)


def test_gqa():
    run_varlen_case([100, 156], [100, 156], h=8, h_k=2, causal=True)


def test_window():
    run_varlen_case([200, 56], [200, 56], window=(20, 10))


def test_alibi():
    run_varlen_case([64, 100], [64, 100], alibi=True, causal=True, mult=2.5)


def test_seqused_k():
    run_varlen_case([64, 64], [128, 128], seqused_k=[100, 30], causal=True)


def test_single_token_decode_shape():
    # decode-like: all q lengths 1 (the GQA-swap shape, flash_api.cpp:501-508)
    run_varlen_case([1, 1, 1], [90, 130, 7], h=8, h_k=2, causal=True)


@pytest.mark.parametrize(
    "case",
    [
        dict(sq=[200, 150, 300, 100, 250, 64], sk=None, causal=True),
        dict(sq=[130, 270, 100], sk=None, h=8, h_k=2, window=(64, 0)),
        dict(sq=[100, 200], sk=None, causal=True, alibi=True, lse=True),
        dict(sq=[100, 37], sk=[257, 129]),  # ragged cross-attention
        dict(sq=[128, 128], sk=[256, 256], causal=True, seqused=[200, 180]),
        dict(sq=[100, 60], sk=None, d=80, causal=True),  # odd head dim
    ],
    ids=["causal6", "gqa-window", "alibi-lse", "cross", "seqused", "odd-d"],
)
def test_splash_fold_bit_equal(case):
    """The splash-style folded grid (dynamic active-pair enumeration) must be
    BIT-equal to the dense skipped-step grid: same tiles, same visit order,
    same fp32 accumulation — only the grid structure differs."""
    sq = case["sq"]
    sk = case.get("sk") or sq
    h, h_k, d = case.get("h", 4), case.get("h_k", 4), case.get("d", 128)
    rng = np.random.default_rng(7)
    q, k, v = make_packed(rng, sq, sk, h, h_k, d, jnp.bfloat16)
    cu_q, cu_k = generate_cu_seqlens(sq), generate_cu_seqlens(sk)
    kw = dict(
        causal=case.get("causal", False),
        window=case.get("window", (-1, -1)),
        return_lse=case.get("lse", False),
        seqused_k=(
            jnp.asarray(case["seqused"], jnp.int32)
            if "seqused" in case else None
        ),
        alibi_slopes=(
            jnp.asarray(rng.uniform(0.01, 0.1, (h,)), jnp.float32)
            if case.get("alibi") else None
        ),
    )
    a = flash_attention_varlen(q, k, v, cu_q, cu_k, fold=False, **kw)
    b = flash_attention_varlen(q, k, v, cu_q, cu_k, fold=True, **kw)
    if case.get("lse"):
        (ao, alse), (bo, blse) = a, b
        assert jnp.array_equal(jnp.isinf(alse), jnp.isinf(blse))
        fin = ~jnp.isinf(alse)
        assert jnp.array_equal(
            jnp.where(fin, alse, 0), jnp.where(fin, blse, 0)
        )
    else:
        ao, bo = a, b
    assert jnp.array_equal(ao, bo)


def test_splash_fold_vs_oracle():
    # oracle correctness with the folded grid forced on (explicit static arg
    # — NOT the env/module default, which is jit-cache-keyed per process)
    run_varlen_case(
        [37, 128, 1, 200], [37, 128, 1, 200], causal=True, fold=True
    )


@pytest.mark.parametrize(
    "case",
    [
        dict(sq=[200, 150, 300, 100, 250, 64], sk=None, causal=True),
        dict(sq=[130, 270, 100], sk=None, h=8, h_k=2, window=(64, 0)),
        dict(sq=[100, 200], sk=None, causal=True, alibi=True, lse=True),
        dict(sq=[100, 37], sk=[257, 129]),  # ragged cross-attention
        dict(sq=[128, 128], sk=[256, 256], causal=True, seqused=[200, 180]),
        dict(sq=[100, 60], sk=None, d=80, causal=True),  # odd head dim
        dict(sq=[300, 200], sk=None, h=4, h_k=1, causal=True, d3=True),  # MQA
    ],
    ids=["causal6", "gqa-window", "alibi-lse", "cross", "seqused", "odd-d",
         "mqa-d3"],
)
def test_flat_bit_equal(case):
    """The flat manual-DMA structure (VF_CP=flat: one grid step per
    (head, q-block), hand double-buffered k/v HBM ring) must be BIT-equal
    to the grid-pipelined kernel: same tiles, same visit order, same fp32
    accumulation — only the DMA scheduling differs."""
    sq = case["sq"]
    sk = case.get("sk") or sq
    h, h_k, d = case.get("h", 4), case.get("h_k", 4), case.get("d", 128)
    rng = np.random.default_rng(7)
    q, k, v = make_packed(rng, sq, sk, h, h_k, d, jnp.bfloat16)
    cu_q, cu_k = generate_cu_seqlens(sq), generate_cu_seqlens(sk)
    kw = dict(
        causal=case.get("causal", False),
        window=case.get("window", (-1, -1)),
        return_lse=case.get("lse", False),
        seqused_k=(
            jnp.asarray(case["seqused"], jnp.int32)
            if "seqused" in case else None
        ),
        alibi_slopes=(
            jnp.asarray(rng.uniform(0.01, 0.1, (h,)), jnp.float32)
            if case.get("alibi") else None
        ),
    )
    a = flash_attention_varlen(q, k, v, cu_q, cu_k, cp=(), **kw)
    b = flash_attention_varlen(
        q, k, v, cu_q, cu_k,
        cp=("flat", "d3") if case.get("d3") else ("flat",), **kw
    )
    if case.get("lse"):
        (ao, alse), (bo, blse) = a, b
        assert jnp.array_equal(jnp.isinf(alse), jnp.isinf(blse))
        fin = ~jnp.isinf(alse)
        assert jnp.array_equal(
            jnp.where(fin, alse, 0), jnp.where(fin, blse, 0)
        )
    else:
        ao, bo = a, b
    assert jnp.array_equal(ao, bo)


def test_flat_vs_oracle():
    # oracle correctness with the flat structure forced on (explicit static
    # arg — NOT the env/module default)
    run_varlen_case(
        [37, 128, 1, 200], [37, 128, 1, 200], causal=True, cp=("flat",)
    )


def test_empty_key_sequence():
    # zero-length k: out rows must be 0 (flash_api.cpp:401-407)
    seqlens_q, seqlens_k = [4, 8], [0, 16]
    rng = np.random.default_rng(0)
    q, k, v = make_packed(rng, seqlens_q, seqlens_k, 2, 2, 32, jnp.float32)
    out = flash_attention_varlen(
        q, k, v, generate_cu_seqlens(seqlens_q), generate_cu_seqlens(seqlens_k),
        causal=True,
    )
    assert np.all(np.asarray(out)[:, :4] == 0.0)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_dtype_axis(dtype):
    """fp32 x bf16 on a representative packed-causal case (the reference
    parametrizes every varlen test over dtypes, test_flash_attn.py:1546)."""
    run_varlen_case([200, 120, 56], [200, 120, 56], causal=True,
                    dtype=dtype, mult=2.5)
