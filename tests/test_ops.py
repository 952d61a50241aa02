"""Aux op tests, mirroring the reference per-op suites:
tests/ops/test_dropout_layer_norm.py (1189 LoC), tests/losses/
test_cross_entropy{,_parallel}.py, tests/ops/test_fused_dense_parallel.py,
tests/test_rotary.py, csrc/fused_softmax bindings, ft_attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from vllm_flash_attn_tpu.ops.cross_entropy import CrossEntropyLoss, cross_entropy_loss
from vllm_flash_attn_tpu.ops.fused_dense import (
    column_parallel_linear,
    fused_dense_func,
    fused_mlp_func,
    row_parallel_linear,
)
from vllm_flash_attn_tpu.ops.fused_softmax import (
    scaled_masked_softmax,
    scaled_upper_triang_masked_softmax,
)
from vllm_flash_attn_tpu.ops.ft_attention import single_query_attention
from vllm_flash_attn_tpu.ops.layer_norm import (
    dropout_add_layer_norm,
    dropout_add_layer_norm_parallel_residual,
    layer_norm,
    rms_norm,
)
from vllm_flash_attn_tpu.parallel.mesh import make_mesh


def rand(rng, shape, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal(shape), dtype)


# ----------------------------------------------------------------- layer norm


def test_layer_norm_matches_manual():
    rng = np.random.default_rng(0)
    x = rand(rng, (4, 32, 64))
    w, b = rand(rng, (64,)), rand(rng, (64,))
    out = layer_norm(x, w, b)
    mu = np.asarray(x).mean(-1, keepdims=True)
    var = np.asarray(x).var(-1, keepdims=True)
    ref = (np.asarray(x) - mu) / np.sqrt(var + 1e-5) * np.asarray(w) + np.asarray(b)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_rms_norm_matches_manual():
    rng = np.random.default_rng(1)
    x = rand(rng, (4, 64))
    w = rand(rng, (64,))
    out = rms_norm(x, w)
    ref = np.asarray(x) / np.sqrt((np.asarray(x) ** 2).mean(-1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(np.asarray(out), ref * np.asarray(w), atol=1e-5)


def test_dropout_add_ln_residual_stream():
    rng = np.random.default_rng(2)
    x = rand(rng, (2, 8, 32))
    res = rand(rng, (2, 8, 32))
    w = jnp.ones((32,))
    out, new_res = dropout_add_layer_norm(
        x, res, w, prenorm=True, residual_in_fp32=True, is_rms_norm=True
    )
    np.testing.assert_allclose(
        np.asarray(new_res), np.asarray(x) + np.asarray(res), atol=1e-6
    )
    assert new_res.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(rms_norm(new_res.astype(jnp.float32), w)),
        atol=1e-5,
    )


def test_dropout_determinism_with_key():
    rng = np.random.default_rng(3)
    x = rand(rng, (2, 64, 32))
    w = jnp.ones((32,))
    key = jax.random.PRNGKey(0)
    a = dropout_add_layer_norm(x, None, w, dropout_p=0.5, rng=key)
    b = dropout_add_layer_norm(x, None, w, dropout_p=0.5, rng=key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # empirical dropout fraction within 0.05 (reference checks 0.01 at scale)
    keep = jax.random.bernoulli(key, 0.5, x.shape)
    frac = 1 - np.asarray(keep).mean()
    assert abs(frac - 0.5) < 0.05


def test_parallel_residual_ln():
    rng = np.random.default_rng(4)
    x0, x1, res = (rand(rng, (2, 4, 16)) for _ in range(3))
    w0, b0 = jnp.ones((16,)), jnp.zeros((16,))
    w1, b1 = rand(rng, (16,)), rand(rng, (16,))
    o0, o1, new_res = dropout_add_layer_norm_parallel_residual(
        x0, x1, res, w0, b0, w1, b1, prenorm=True
    )
    np.testing.assert_allclose(
        np.asarray(new_res),
        np.asarray(x0) + np.asarray(x1) + np.asarray(res),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(o1), np.asarray(layer_norm(new_res, w1, b1)), atol=1e-5
    )


# -------------------------------------------------------------- cross entropy


def test_cross_entropy_matches_manual():
    rng = np.random.default_rng(5)
    logits = rand(rng, (64, 100))
    labels = jnp.asarray(rng.integers(0, 100, (64,)), jnp.int32)
    loss = cross_entropy_loss(logits, labels)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    tgt = np.asarray(logits)[np.arange(64), np.asarray(labels)]
    np.testing.assert_allclose(
        float(loss), float((np.asarray(lse) - tgt).mean()), rtol=1e-6
    )


def test_cross_entropy_features():
    rng = np.random.default_rng(6)
    logits = rand(rng, (32, 50))
    labels = jnp.asarray(rng.integers(0, 50, (32,)), jnp.int32)
    labels = labels.at[:5].set(-100)  # ignore_index
    loss = cross_entropy_loss(logits, labels, label_smoothing=0.1)
    assert np.isfinite(float(loss))
    none = cross_entropy_loss(logits, labels, reduction="none")
    assert np.all(np.asarray(none[:5]) == 0.0)
    ce = CrossEntropyLoss(label_smoothing=0.1)
    np.testing.assert_allclose(float(ce(logits, labels)), float(loss))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_cross_entropy_vocab_parallel():
    """tests/losses/test_cross_entropy_parallel.py analog."""
    rng = np.random.default_rng(7)
    mesh = make_mesh((1, 8), ("data", "model"))
    logits = rand(rng, (32, 128))
    labels = jnp.asarray(rng.integers(0, 128, (32,)), jnp.int32)
    serial = float(cross_entropy_loss(logits, labels))

    def shard_loss(lg, lb):
        idx = jax.lax.axis_index("model")
        return cross_entropy_loss(
            lg, lb, axis_name="model", vocab_start=idx * 16
        )

    par = shard_map(
        shard_loss, mesh=mesh,
        in_specs=(P(None, "model"), P()), out_specs=P(),
        check_vma=False,
    )(logits, labels)
    assert abs(float(par) - serial) < 1e-5


# ---------------------------------------------------------------- fused dense


def test_fused_dense_and_mlp():
    rng = np.random.default_rng(8)
    x = rand(rng, (4, 32))
    w1, b1 = rand(rng, (64, 32)), rand(rng, (64,))
    w2, b2 = rand(rng, (32, 64)), rand(rng, (32,))
    y = fused_dense_func(x, w1, b1, "gelu_approx")
    ref = jax.nn.gelu(np.asarray(x) @ np.asarray(w1).T + np.asarray(b1), approximate=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)
    out = fused_mlp_func(x, w1, b1, w2, b2)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref) @ np.asarray(w2).T + np.asarray(b2),
        atol=1e-4,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_parallel_linears_match_serial():
    """tests/ops/test_fused_dense_parallel.py analog (col->row pipeline)."""
    rng = np.random.default_rng(9)
    mesh = make_mesh((1, 8), ("data", "model"))
    x = rand(rng, (2, 16, 32))
    w1 = rand(rng, (64, 32))
    w2 = rand(rng, (32, 64))
    serial = np.asarray(x) @ np.asarray(w1).T @ np.asarray(w2).T

    def body(x, w1s, w2s):
        h = column_parallel_linear(x, w1s, axis_name="model")
        return row_parallel_linear(h, w2s, axis_name="model")

    out = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("model", None), P(None, "model")),
        out_specs=P(),
        check_vma=False,
    )(x, w1, w2)
    np.testing.assert_allclose(np.asarray(out), serial, atol=1e-4, rtol=1e-4)


# -------------------------------------------------------------- fused softmax


def test_scaled_masked_softmax():
    rng = np.random.default_rng(10)
    x = rand(rng, (2, 2, 8, 16))
    mask = jnp.asarray(rng.random((2, 1, 8, 16)) > 0.7)
    out = scaled_masked_softmax(x, mask, 2.0)
    s = np.where(np.asarray(mask), -10000.0, np.asarray(x) * 2.0)
    ref = np.exp(s - s.max(-1, keepdims=True))
    ref /= ref.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_scaled_upper_triang_softmax_is_causal():
    rng = np.random.default_rng(11)
    x = rand(rng, (2, 8, 8))
    out = np.asarray(scaled_upper_triang_masked_softmax(x, 1.0))
    assert np.all(np.triu(out[0], k=1) < 1e-4)
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)


# --------------------------------------------------------------- ft_attention


def test_single_query_attention():
    rng = np.random.default_rng(12)
    b, h, d, s_max = 2, 4, 32, 64
    k_cache = rand(rng, (b, s_max, h, d))
    v_cache = rand(rng, (b, s_max, h, d))
    q = rand(rng, (b, h, d))
    k = rand(rng, (b, h, d))
    v = rand(rng, (b, h, d))
    lens = jnp.asarray([10, 30], jnp.int32)
    out, k2, v2 = single_query_attention(q, k, v, k_cache, v_cache, lens)
    # appended at position lens
    np.testing.assert_allclose(
        np.asarray(k2[0, 10]), np.asarray(k[0]), atol=1e-6
    )
    from vllm_flash_attn_tpu.core.reference import attention_ref

    for i in range(b):
        L = int(lens[i]) + 1
        ref, _ = attention_ref(
            q[i][None, None], k2[i : i + 1, :L], v2[i : i + 1, :L], causal=True,
        )
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(ref[0, 0]), atol=1e-4, rtol=1e-4
        )


def test_config_knob_resolution_precedence():
    """config.knob(): env var of the documented name overrides the Config
    field; tuple/int/bool parsing; 'none' forces an empty tuple."""
    import os

    from vllm_flash_attn_tpu.config import get_config, knob

    cfg = get_config()
    assert knob("pf_unroll") == cfg.pf_unroll
    assert knob("pd_qint8") == cfg.pd_qint8
    assert knob("pf_cp") is None  # auto sentinel
    old = {k: os.environ.pop(k, None)
           for k in ("PF_UNROLL", "PF_CP", "PD_QPV", "PF_SKIP")}
    try:
        os.environ["PF_UNROLL"] = "4"
        os.environ["PF_CP"] = "nobounds,fusein"
        os.environ["PD_QPV"] = "0"
        os.environ["PF_SKIP"] = "qk,softmax"
        assert knob("pf_unroll") == 4
        assert knob("pf_cp") == ("nobounds", "fusein")
        assert knob("pd_qpv") is False
        assert knob("pf_skip") == ("qk", "softmax")
        os.environ["PF_CP"] = "none"
        assert knob("pf_cp") == ()
        # config mutation visible when no env override
        del os.environ["PF_UNROLL"]
        cfg.pf_unroll = 2
        assert knob("pf_unroll") == 2
    finally:
        cfg.pf_unroll = 0
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
