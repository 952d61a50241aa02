"""Prefill kernel vs oracle, mirroring the reference parametrization
(/root/reference/tests/test_flash_attn.py:545-563, test_flash_attn_output:880).

Pallas runs in interpreter mode on CPU (config.use_interpret), which doubles as
the race/oob sanitizer path (SURVEY.md §5.2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from harness import check_close
from vllm_flash_attn_tpu.core.reference import attention_ref
from vllm_flash_attn_tpu.kernels.flash_prefill import flash_attention


def run_case(
    sq,
    sk,
    h=4,
    h_k=4,
    d=64,
    causal=False,
    window=(-1, -1),
    alibi=False,
    dtype=jnp.bfloat16,
    softcap=0.0,
    batch=2,
    mult=2.0,
):
    rng = np.random.default_rng(sq * 7919 + sk)
    q = jnp.asarray(rng.standard_normal((batch, sq, h, d)), dtype)
    k = jnp.asarray(rng.standard_normal((batch, sk, h_k, d)), dtype)
    v = jnp.asarray(rng.standard_normal((batch, sk, h_k, d)), dtype)
    slopes = (
        jnp.asarray(rng.random((batch, h)) * 0.3, jnp.float32) if alibi else None
    )

    out_ref, _ = attention_ref(
        q, k, v, causal=causal, window_size=window, alibi_slopes=slopes,
        softcap=softcap, upcast=True,
    )
    out_pt, _ = attention_ref(
        q, k, v, causal=causal, window_size=window, alibi_slopes=slopes,
        softcap=softcap, upcast=False, reorder_ops=True,
    )
    # kernel layout (b, h, s, d)
    out = flash_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        slopes,
        causal=causal,
        window=window,
        softcap=softcap,
    ).transpose(0, 2, 1, 3)
    check_close(out, out_ref, out_pt, mult=mult)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "sq,sk",
    [(128, 128), (256, 256), (128, 256), (256, 128), (239, 113), (113, 203)],
)
def test_basic(sq, sk, causal):
    run_case(sq, sk, causal=causal)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("h,h_k", [(8, 2), (8, 1)])
def test_gqa_mqa(h, h_k, causal):
    run_case(192, 192, h=h, h_k=h_k, causal=causal)


@pytest.mark.parametrize("d", [32, 64, 96, 128, 160, 256])
def test_head_dims(d):
    run_case(128, 128, d=d, causal=True)


@pytest.mark.parametrize("d", [40, 59, 80, 111])
def test_odd_head_dims(d):
    # the reference's odd-dim axis (tests/test_flash_attn.py:545-563),
    # served by the pad-to-lane wrapper (flash_api.cpp:312-320 analog)
    run_case(128, 128, d=d, causal=True)
    run_case(128, 192, d=d, causal=False)


def test_determinism():
    # determinism is a tested API property (tests/test_flash_attn.py:547)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 4, 256, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, 4, 256, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, 4, 256, 64)), jnp.bfloat16)
    a = flash_attention(q, k, v, causal=True)
    b = flash_attention(q, k, v, causal=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize(
    "window", [(16, 0), (32, 32), (0, 16), (64, -1), (-1, 64)]
)
@pytest.mark.parametrize("sq,sk", [(200, 200), (128, 256)])
def test_sliding_window(window, sq, sk):
    run_case(sq, sk, window=window)


@pytest.mark.parametrize("causal", [False, True])
def test_alibi(causal):
    run_case(160, 160, alibi=True, causal=causal, mult=2.5)


def test_softcap():
    run_case(128, 128, softcap=30.0, causal=True)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("local", [False, True])
@pytest.mark.parametrize(
    "sq,sk",
    [
        (1, 239),
        (3, 799),
        (127, 512),
        (127, 513),
        (128, 217),
        (113, 211),
        (108, 256),
        (512, 256),
    ],
)
def test_asymmetric_pairs(sq, sk, causal, local):
    """The reference's asymmetric (sq, sk) pair matrix x causal x local
    (tests/test_flash_attn.py:880-1137): bottom-right alignment and window
    math on shapes where sq and sk disagree in every direction."""
    window = (max(0, min(sq, sk) // 3), 0 if causal else max(0, sk // 4))
    run_case(
        sq, sk, causal=causal,
        window=window if local else (-1, -1),
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize(
    "case", ["basic", "asym", "gqa_window", "alibi_causal"]
)
def test_dtype_matrix(dtype, case):
    """dtype axis over the representative feature combos (the reference
    parametrizes EVERY test over fp16+bf16, :545-563; here fp32+bf16 — the
    TPU-supported pair — on one shape per feature)."""
    kw = {
        "basic": dict(sq=200, sk=200, causal=True),
        "asym": dict(sq=113, sk=211, causal=True),
        "gqa_window": dict(sq=128, sk=256, h=8, h_k=2, window=(32, 0)),
        "alibi_causal": dict(sq=160, sk=160, causal=True, alibi=True),
    }[case]
    run_case(dtype=dtype, **kw)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_dtypes(dtype):
    run_case(128, 128, dtype=dtype, causal=True)


def test_lse():
    rng = np.random.default_rng(0)
    b, s, h, d = 1, 128, 2, 64
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    out, lse = flash_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        return_lse=True,
    )
    scores = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(d)
    lse_ref = jax_logsumexp(scores)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref), rtol=1e-4, atol=1e-4)


def jax_logsumexp(scores):
    import jax

    return jax.scipy.special.logsumexp(scores, axis=-1)


@pytest.mark.parametrize(
    "case",
    ["causal", "causal_asym", "window", "alibi", "softcap", "gqa", "lse",
     "dead_rows"],
)
def test_two_pass_matches_base(case):
    """Round-4 two-pass (lse-then-pv) structure must be numerically
    equivalent to the single-pass online kernel across the feature matrix
    (it recomputes scores from the pass-1 LSE, like the backward pair)."""
    rng = np.random.default_rng(17)
    kw = {
        "causal": dict(sq=384, sk=384, causal=True),
        "causal_asym": dict(sq=200, sk=392, causal=True),
        "window": dict(sq=256, sk=256, window=(64, 32)),
        "alibi": dict(sq=256, sk=256, causal=True, alibi=True),
        "softcap": dict(sq=200, sk=200, causal=True, softcap=8.0),
        "gqa": dict(sq=256, sk=256, h=8, h_k=2, causal=True),
        "lse": dict(sq=256, sk=256, causal=True),
        # sq > sk causal (bottom-right aligned): rows i < sq-sk attend to an
        # EMPTY column range -> exercises the lse=+inf dead-row branch of
        # _stats_kernel/_pv_kernel (exp2(s - inf) = 0, out must be 0 not NaN)
        "dead_rows": dict(sq=128, sk=64, causal=True),
    }[case]
    h = kw.pop("h", 4)
    h_k = kw.pop("h_k", 4)
    d = 64
    sq, sk = kw.pop("sq"), kw.pop("sk")
    alibi = kw.pop("alibi", False)
    q = jnp.asarray(rng.standard_normal((1, h, sq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, h_k, sk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, h_k, sk, d)), jnp.float32)
    slopes = (
        jnp.asarray(rng.random((1, h)) * 0.3, jnp.float32) if alibi else None
    )
    want_lse = case == "lse"
    if case == "dead_rows":
        base_np = np.asarray(
            flash_attention(q, k, v, slopes, two_pass=False, **kw)
        )
        assert np.all(base_np[:, :, : sq - sk] == 0)  # rows truly dead
    base = flash_attention(
        q, k, v, slopes, return_lse=want_lse, two_pass=False, **kw
    )
    two = flash_attention(
        q, k, v, slopes, return_lse=want_lse, two_pass=True, **kw
    )
    if want_lse:
        (base, lse_b), (two, lse_t) = base, two
        np.testing.assert_allclose(
            np.asarray(lse_t), np.asarray(lse_b), atol=1e-4, rtol=1e-4
        )
    np.testing.assert_allclose(
        np.asarray(two), np.asarray(base), atol=2e-4, rtol=2e-4
    )


@pytest.mark.parametrize("unroll", [2, 4])
@pytest.mark.parametrize("case", ["causal", "window", "ragged"])
def test_unrolled_chunk_matches_base(case, unroll):
    """PF_UNROLL=N (statically unrolled multi-k-tile grid steps) must match
    the stepped kernel bit-for... numerically (same tile math, same order)."""
    from vllm_flash_attn_tpu.kernels.flash_prefill import flash_attention

    rng = np.random.default_rng(23)
    kw = {
        "causal": dict(sq=512, sk=512, causal=True),
        "window": dict(sq=384, sk=384, window=(100, 50)),
        "ragged": dict(sq=200, sk=460, causal=True),
    }[case]
    h, d = 4, 64
    sq, sk = kw.pop("sq"), kw.pop("sk")
    q = jnp.asarray(rng.standard_normal((1, h, sq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, h, sk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, h, sk, d)), jnp.float32)
    base = flash_attention(q, k, v, block_q=128, block_k=128, **kw)
    unr = flash_attention(
        q, k, v, block_q=128, block_k=128, unroll=unroll, **kw
    )
    np.testing.assert_allclose(
        np.asarray(unr), np.asarray(base), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("case", ["causal", "window", "ragged", "lse"])
def test_two_pass_unroll_composed(case):
    """PF_TWOPASS=1 PF_UNROLL=N composed: both passes sweep N statically
    unrolled sub-tiles per grid step; must match the single-pass kernel."""
    rng = np.random.default_rng(29)
    kw = {
        "causal": dict(sq=512, sk=512, causal=True),
        "window": dict(sq=384, sk=384, window=(100, 50)),
        "ragged": dict(sq=200, sk=460, causal=True),  # sk % super_k != 0
        "lse": dict(sq=512, sk=512, causal=True),
    }[case]
    h, d = 4, 64
    sq, sk = kw.pop("sq"), kw.pop("sk")
    want_lse = case == "lse"
    q = jnp.asarray(rng.standard_normal((1, h, sq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, h, sk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, h, sk, d)), jnp.float32)
    base = flash_attention(
        q, k, v, block_q=128, block_k=128, return_lse=want_lse, **kw
    )
    comp = flash_attention(
        q, k, v, block_q=128, block_k=128, return_lse=want_lse,
        two_pass=True, unroll=2, **kw
    )
    if want_lse:
        (base, lse_b), (comp, lse_t) = base, comp
        np.testing.assert_allclose(
            np.asarray(lse_t), np.asarray(lse_b), atol=1e-4, rtol=1e-4
        )
    np.testing.assert_allclose(
        np.asarray(comp), np.asarray(base), atol=2e-4, rtol=2e-4
    )


def test_causal_equals_window():
    # causal == window (-1, 0) on asymmetric lengths (bottom-right alignment)
    run_case(96, 160, causal=True)
    run_case(96, 160, window=(-1, 0))


def test_chunked_sweep_matches_stepped():
    """kv_chunk>0 routes through _fwd_kernel_chunked (kv tiles loop inside
    the grid step over a VMEM-resident chunk); must be bit-identical to the
    stepped kernel across causal/window/alibi/GQA/ragged shapes."""
    rng = np.random.default_rng(21)
    cases = [
        dict(b=1, h=2, hk=2, sq=512, sk=512, d=128, causal=True,
             window=(-1, -1), alibi=False, softcap=0.0),
        dict(b=1, h=4, hk=2, sq=384, sk=640, d=128, causal=True,
             window=(-1, -1), alibi=False, softcap=0.0),
        dict(b=2, h=2, hk=2, sq=300, sk=300, d=64, causal=False,
             window=(100, 30), alibi=True, softcap=10.0),
    ]
    for c in cases:
        q = jnp.asarray(
            rng.standard_normal((c["b"], c["h"], c["sq"], c["d"])), jnp.float32
        )
        k = jnp.asarray(
            rng.standard_normal((c["b"], c["hk"], c["sk"], c["d"])), jnp.float32
        )
        v = jnp.asarray(
            rng.standard_normal((c["b"], c["hk"], c["sk"], c["d"])), jnp.float32
        )
        al = (
            jnp.asarray(rng.uniform(0.01, 0.3, (c["h"],)), jnp.float32)
            if c["alibi"] else None
        )
        kw = dict(
            causal=c["causal"], window=c["window"], softcap=c["softcap"],
            block_q=256, block_k=256, interpret=True,
        )
        base, lse_b = flash_attention(q, k, v, al, return_lse=True, **kw)
        out, lse_c = flash_attention(
            q, k, v, al, return_lse=True, kv_chunk=512, **kw
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(base))
        fin = np.isfinite(np.asarray(lse_b))
        np.testing.assert_array_equal(fin, np.isfinite(np.asarray(lse_c)))
        np.testing.assert_allclose(
            np.asarray(lse_c)[fin], np.asarray(lse_b)[fin], atol=1e-5,
            rtol=1e-5,
        )


def test_ragged_lane_multiple_tail():
    """seqlen_k that is a 128-multiple but NOT a block_k multiple: the final
    kv tile's OOB rows are undefined (NaN in interpret mode) and must be
    zeroed before P@V — regression for the %MIN_LANES guard bug."""
    rng = np.random.default_rng(22)
    q = jnp.asarray(rng.standard_normal((1, 2, 384, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 384, 128)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 384, 128)), jnp.float32)
    for kc in (0, 512):
        out = flash_attention(
            q, k, v, causal=True, block_q=256, block_k=256, kv_chunk=kc,
            interpret=True,
        )
        assert bool(jnp.all(jnp.isfinite(out))), f"kv_chunk={kc}"


def test_unroll_knob_reaches_two_pass_kernel(monkeypatch):
    """Regression: flash_attention once coerced unroll to bool before the
    jit boundary, so two_pass composed with unroll=N silently ran N=1 and
    the tp_unroll hardware A/Bs measured plain two-pass. Assert the int
    reaches _flash_attention_two_pass intact (trace-time capture)."""
    import vllm_flash_attn_tpu.kernels.flash_prefill as fp

    seen = {}
    real = fp._flash_attention_two_pass

    def spy(*args, **kwargs):
        seen["unroll"] = kwargs.get("unroll")
        return real(*args, **kwargs)

    monkeypatch.setattr(fp, "_flash_attention_two_pass", spy)
    rng = np.random.default_rng(31)
    # unique shape so the jit cache cannot satisfy this call without tracing
    q = jnp.asarray(rng.standard_normal((1, 2, 520, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 520, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 520, 64)), jnp.float32)
    fp.flash_attention(
        q, k, v, causal=True, block_q=128, block_k=128,
        two_pass=True, unroll=4,
    )
    assert seen.get("unroll") == 4


@pytest.mark.parametrize("knobs", [
    dict(two_pass=True), dict(unroll=2), dict(two_pass=True, unroll=2),
])
def test_experiment_knobs_stay_differentiable(knobs):
    """A leftover PF_TWOPASS/PF_UNROLL env setting (or explicit knob) must
    not break jax.grad through flash_attention — the experiment forwards
    route through the same custom_vjp as the base kernel."""
    rng = np.random.default_rng(37)
    q = jnp.asarray(rng.standard_normal((1, 2, 256, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 256, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 256, 64)), jnp.float32)

    def loss(fn_kw):
        def f(q_, k_, v_):
            return flash_attention(
                q_, k_, v_, causal=True, block_q=128, block_k=128, **fn_kw
            ).sum()
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    gq, gk, gv = loss(knobs)
    bq, bk, bv = loss({})
    np.testing.assert_allclose(np.asarray(gq), np.asarray(bq), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(bk), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(bv), atol=2e-4)


@pytest.mark.parametrize(
    "case",
    ["causal", "noncausal", "asym", "window", "gqa", "softcap", "dead_rows",
     "ragged", "alibi", "lse"],
)
def test_flat_manual_dma_matches_base(case):
    """Round-4 flat structure (PF_CP=flat): one grid step per q block with a
    hand double-buffered HBM->VMEM ring for k/v (pltpu.make_async_copy).
    Must match the grid-pipelined kernel bit-for-bit (same tile math/order)."""
    rng = np.random.default_rng(41)
    kw = {
        "causal": dict(sq=384, sk=384, causal=True),
        "noncausal": dict(sq=256, sk=256),
        "asym": dict(sq=200, sk=392, causal=True),
        "window": dict(sq=256, sk=256, window=(64, 32)),
        "gqa": dict(sq=256, sk=256, h=8, h_k=2, causal=True),
        "softcap": dict(sq=200, sk=200, causal=True, softcap=8.0),
        "dead_rows": dict(sq=128, sk=64, causal=True),
        "ragged": dict(sq=200, sk=460, causal=True),
        "alibi": dict(sq=256, sk=256, causal=True, alibi=True),
        "lse": dict(sq=256, sk=256, causal=True),
    }[case]
    h, h_k, d = kw.pop("h", 4), kw.pop("h_k", 4), 64
    sq, sk = kw.pop("sq"), kw.pop("sk")
    alibi = kw.pop("alibi", False)
    q = jnp.asarray(rng.standard_normal((1, h, sq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, h_k, sk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, h_k, sk, d)), jnp.float32)
    slopes = (
        jnp.asarray(rng.random((1, h)) * 0.3, jnp.float32) if alibi else None
    )
    want_lse = case == "lse"
    base = flash_attention(
        q, k, v, slopes, return_lse=want_lse, block_q=128, block_k=128, **kw
    )
    flat = flash_attention(
        q, k, v, slopes, return_lse=want_lse, block_q=128, block_k=128,
        cp=("flat",), **kw
    )
    if want_lse:
        (base, lse_b), (flat, lse_f) = base, flat
        np.testing.assert_allclose(
            np.asarray(lse_f), np.asarray(lse_b), atol=1e-5, rtol=1e-5
        )
    np.testing.assert_allclose(np.asarray(flat), np.asarray(base), atol=1e-5)


def test_flat_differentiable():
    """PF_CP=flat routes through the same custom_vjp; grads match base."""
    rng = np.random.default_rng(43)
    q = jnp.asarray(rng.standard_normal((1, 2, 256, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 256, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 256, 64)), jnp.float32)
    gb = jax.grad(lambda q_: flash_attention(q_, k, v, causal=True).sum())(q)
    gf = jax.grad(
        lambda q_: flash_attention(q_, k, v, causal=True, cp=("flat",)).sum()
    )(q)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gb), atol=2e-5)


@pytest.mark.parametrize(
    "case", ["causal", "asym", "window", "gqa", "alibi", "dead_rows"]
)
def test_flat_two_pass_composed(case):
    """PF_TWOPASS=1 x PF_CP=flat: both passes hand-ring their HBM tiles
    (pass 1 k-only — zero V traffic). Must match the base kernel."""
    rng = np.random.default_rng(53)
    kw = {
        "causal": dict(sq=384, sk=384, causal=True),
        "asym": dict(sq=200, sk=392, causal=True),
        "window": dict(sq=256, sk=256, window=(64, 32)),
        "gqa": dict(sq=256, sk=256, h=8, h_k=2, causal=True),
        "alibi": dict(sq=256, sk=256, causal=True, alibi=True),
        "dead_rows": dict(sq=128, sk=64, causal=True),
    }[case]
    h, h_k, d = kw.pop("h", 4), kw.pop("h_k", 4), 64
    sq, sk = kw.pop("sq"), kw.pop("sk")
    alibi = kw.pop("alibi", False)
    q = jnp.asarray(rng.standard_normal((1, h, sq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, h_k, sk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, h_k, sk, d)), jnp.float32)
    sl = jnp.asarray(rng.random((1, h)) * 0.3, jnp.float32) if alibi else None
    base = flash_attention(q, k, v, sl, block_q=128, block_k=128, **kw)
    comp = flash_attention(
        q, k, v, sl, block_q=128, block_k=128, two_pass=True, cp=("flat",),
        **kw
    )
    np.testing.assert_allclose(
        np.asarray(comp), np.asarray(base), atol=2e-5, rtol=2e-5
    )


def test_diag_split_matches_base():
    """The causal diagonal-tile quadrant skip (pf_diagsplit, default ON;
    +4.7% raw on hardware) must be bit-exact vs the full-width path: the
    kept region computes identically and the skipped quadrant is fully
    masked. Covers ragged tails, bq != bk, and interleave 2."""
    import vllm_flash_attn_tpu.kernels.flash_prefill as FP

    rng = np.random.default_rng(17)
    cases = [
        dict(s=1024, bq=256, bk=256, il=1),
        dict(s=1000, bq=256, bk=256, il=1),  # ragged tail
        dict(s=512, bq=128, bk=256, il=1),   # bq != bk
        dict(s=640, bq=256, bk=256, il=2),
    ]
    old = FP._DIAGSPLIT
    try:
        for c in cases:
            q = jnp.asarray(rng.standard_normal((1, 2, c["s"], 64)), jnp.float32)
            k = jnp.asarray(rng.standard_normal((1, 2, c["s"], 64)), jnp.float32)
            v = jnp.asarray(rng.standard_normal((1, 2, c["s"], 64)), jnp.float32)
            outs = {}
            for ds in (False, True):
                jax.clear_caches()
                FP._DIAGSPLIT = ds
                outs[ds] = flash_attention(
                    q, k, v, causal=True, block_q=c["bq"], block_k=c["bk"],
                    interleave=c["il"],
                )
            np.testing.assert_array_equal(
                np.asarray(outs[False]), np.asarray(outs[True]), err_msg=str(c)
            )
            # gradients flow (custom_vjp path unaffected by the fwd split)
            g = jax.grad(lambda q: flash_attention(
                q, k, v, causal=True, block_q=c["bq"], block_k=c["bk"],
                interleave=c["il"],
            ).sum())(q)
            assert bool(jnp.isfinite(g).all()), c
    finally:
        FP._DIAGSPLIT = old
        jax.clear_caches()
