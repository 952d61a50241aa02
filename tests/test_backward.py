"""Attention backward vs dense-autodiff oracle.

The reference fork ships no attention backward at all (setup.py:285-286); our
custom_vjp (kernels/flash_backward.py) must match jax.grad through the dense
reference within the usual 2x error budget.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from harness import check_close
from vllm_flash_attn_tpu.core.reference import attention_ref
from vllm_flash_attn_tpu.kernels.flash_prefill import flash_attention


def grads_of(fn, q, k, v):
    def loss(q, k, v):
        out = fn(q, k, v)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape) * 0.1))

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("h,h_k", [(4, 4), (8, 2)])
@pytest.mark.parametrize("sq,sk", [(128, 128), (130, 254)])
def test_grads_match_dense(causal, h, h_k, sq, sk):
    rng = np.random.default_rng(sq + sk + h)
    d = 64
    dtype = jnp.float32
    q = jnp.asarray(rng.standard_normal((2, h, sq, d)), dtype)
    k = jnp.asarray(rng.standard_normal((2, h_k, sk, d)), dtype)
    v = jnp.asarray(rng.standard_normal((2, h_k, sk, d)), dtype)

    def kernel_fn(q, k, v):
        return flash_attention(q, k, v, causal=causal)

    def dense_fn(q, k, v):
        out, _ = attention_ref(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            causal=causal,
            upcast=True,
        )
        return out.transpose(0, 2, 1, 3)

    def dense_reordered(q, k, v):
        out, _ = attention_ref(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            causal=causal,
            upcast=False,
            reorder_ops=True,
        )
        return out.transpose(0, 2, 1, 3)

    g = grads_of(kernel_fn, q, k, v)
    g_ref = grads_of(dense_fn, q, k, v)
    g_pt = grads_of(dense_reordered, q, k, v)
    for name, a, b, c in zip("qkv", g, g_ref, g_pt):
        check_close(a, b, c, mult=2.0, abs_floor=1e-4, what=f"d{name}")


def test_grads_window_softcap():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, 2, 160, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 160, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 160, 32)), jnp.float32)

    def kernel_fn(q, k, v):
        return flash_attention(q, k, v, window=(32, 8), softcap=20.0)

    def dense_fn(q, k, v):
        out, _ = attention_ref(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), window_size=(32, 8), softcap=20.0,
            upcast=True,
        )
        return out.transpose(0, 2, 1, 3)

    g = grads_of(kernel_fn, q, k, v)
    g_ref = grads_of(dense_fn, q, k, v)
    for name, a, b in zip("qkv", g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3, err_msg=f"d{name}"
        )


@pytest.mark.parametrize(
    "route", ["xla", "pallas"],
    ids=["xla-fallback", "pallas-padded-dense"],
)
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("h,h_k", [(4, 4), (4, 2)])
def test_grads_varlen_match_dense(causal, h, h_k, route):
    """Varlen custom VJP vs per-sequence dense autodiff (the reference ships
    no varlen backward at all, setup.py:154-171). route=pallas threads the
    static max_seqlen so the backward runs the dense Pallas kernel pair via
    per-sequence bottom-right padding (round-4); route=xla is the
    segment-aware fallback."""
    from vllm_flash_attn_tpu.kernels.flash_varlen import flash_attention_varlen
    from vllm_flash_attn_tpu.utils import generate_cu_seqlens

    rng = np.random.default_rng(7 * h + causal)
    d = 64
    seqlens = [96, 160]
    total = sum(seqlens)
    q = jnp.asarray(rng.standard_normal((h, total, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((h_k, total, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((h_k, total, d)), jnp.float32)
    cu = generate_cu_seqlens(seqlens)
    ms = max(seqlens) if route == "pallas" else 0

    def kernel_fn(q, k, v):
        return flash_attention_varlen(
            q, k, v, cu, cu, causal=causal,
            max_seqlen_q=ms, max_seqlen_k=ms,
        )

    def dense_fn(q, k, v):
        outs = []
        off = 0
        for s in seqlens:
            out_i, _ = attention_ref(
                q[:, off:off + s].transpose(1, 0, 2)[None],
                k[:, off:off + s].transpose(1, 0, 2)[None],
                v[:, off:off + s].transpose(1, 0, 2)[None],
                causal=causal,
                upcast=True,
            )
            outs.append(out_i[0].transpose(1, 0, 2))
            off += s
        return jnp.concatenate(outs, axis=1)

    g = grads_of(kernel_fn, q, k, v)
    g_ref = grads_of(dense_fn, q, k, v)
    for name, a, b in zip("qkv", g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3,
            err_msg=f"d{name}",
        )


def test_grads_varlen_pallas_window_seqused_asym():
    """The Pallas padded-dense varlen backward must reproduce the XLA
    segment-aware backward on the hard axes: asymmetric per-seq (sq, sk),
    sliding window (translation under bottom-right padding), and seqused_k
    truncation (unused keys get exact zero grads)."""
    from vllm_flash_attn_tpu.kernels.flash_varlen import flash_attention_varlen
    from vllm_flash_attn_tpu.utils import generate_cu_seqlens

    rng = np.random.default_rng(11)
    h, h_k, d = 4, 2, 64
    q_lens = [40, 96]
    k_lens = [80, 128]
    used = [64, 100]
    cu_q = generate_cu_seqlens(q_lens)
    cu_k = generate_cu_seqlens(k_lens)
    q = jnp.asarray(rng.standard_normal((h, sum(q_lens), d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((h_k, sum(k_lens), d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((h_k, sum(k_lens), d)), jnp.float32)
    su = jnp.asarray(used, jnp.int32)

    def fn(ms):
        def kernel_fn(q, k, v):
            return flash_attention_varlen(
                q, k, v, cu_q, cu_k, seqused_k=su, causal=True,
                window=(48, -1), max_seqlen_q=ms and max(q_lens),
                max_seqlen_k=ms and max(used),
            )
        return kernel_fn

    g_pallas = grads_of(fn(True), q, k, v)
    g_xla = grads_of(fn(False), q, k, v)
    for name, a, b in zip("qkv", g_pallas, g_xla):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3,
            err_msg=f"d{name}",
        )
    # seqused-truncated keys participated in nothing: exact zeros
    for arr in (g_pallas[1], g_pallas[2]):
        a = np.asarray(arr)
        off = 0
        for L, u in zip(k_lens, used):
            assert np.all(a[:, off + u : off + L] == 0.0)
            off += L


def test_pallas_backward_matches_xla():
    """mha_backward_pallas (two-kernel TPU backward) vs the XLA backward and
    dense autodiff across causal/window/ragged/odd-d shapes."""
    from vllm_flash_attn_tpu.kernels.flash_backward import mha_backward
    from vllm_flash_attn_tpu.kernels.flash_backward_pallas import (
        mha_backward_pallas,
    )
    from vllm_flash_attn_tpu.kernels.flash_prefill import flash_attention

    rng = np.random.default_rng(33)
    cases = [
        dict(b=1, h=2, sq=256, sk=256, d=128, causal=True, window=(-1, -1)),
        dict(b=2, h=2, sq=384, sk=640, d=128, causal=True, window=(-1, -1)),
        dict(b=1, h=2, sq=512, sk=512, d=64, causal=False, window=(-1, -1)),
        dict(b=1, h=2, sq=512, sk=512, d=128, causal=True, window=(128, -1)),
    ]
    for c in cases:
        q = jnp.asarray(
            rng.standard_normal((c["b"], c["h"], c["sq"], c["d"])), jnp.float32
        )
        k = jnp.asarray(
            rng.standard_normal((c["b"], c["h"], c["sk"], c["d"])), jnp.float32
        )
        v = jnp.asarray(
            rng.standard_normal((c["b"], c["h"], c["sk"], c["d"])), jnp.float32
        )
        sm = 1.0 / np.sqrt(c["d"])
        out, lse = flash_attention(
            q, k, v, causal=c["causal"], window=c["window"], return_lse=True,
            interpret=True, block_q=256, block_k=256,
        )
        do = jnp.asarray(
            rng.standard_normal(out.shape), jnp.float32
        )
        ref = mha_backward(
            q, k, v, out, lse, do, None, causal=c["causal"], sm_scale=sm,
            window=c["window"], softcap=0.0,
        )
        got = mha_backward_pallas(
            q, k, v, out, lse, do, causal=c["causal"], sm_scale=sm,
            window=c["window"], block_q=256, block_k=256, interpret=True,
        )
        for name, a, b_ in zip(("dq", "dk", "dv"), got, ref):
            scale = float(jnp.max(jnp.abs(b_))) + 1e-9
            err = float(jnp.max(jnp.abs(a - b_))) / scale
            assert err < 1e-3, (c, name, err)


def test_backward_bit_determinism():
    """The reference exposes determinism as a tested API property
    (tests/test_flash_attn.py:547: deterministic=True asserts bit-equal
    repeated grads). The Pallas backward pair has a fixed reduction order
    (serial sweep axes), so repeated runs must be BITWISE identical — both
    at the kernel level and through the custom_vjp."""
    from vllm_flash_attn_tpu.kernels.flash_backward_pallas import (
        mha_backward_pallas,
    )
    from vllm_flash_attn_tpu.kernels.flash_prefill import flash_attention

    rng = np.random.default_rng(13)
    b, h, s, d = 1, 4, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=True).astype(jnp.float32) ** 2
        )

    g1 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", g1, g2):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b_), err_msg=f"d{name} not bit-equal"
        )

    # kernel pair directly (fp32 stats path)
    out, lse = flash_attention(q, k, v, causal=True, return_lse=True)
    do = jnp.asarray(rng.standard_normal(out.shape), out.dtype)
    r1 = mha_backward_pallas(
        q, k, v, out, lse, do, causal=True, sm_scale=1.0 / np.sqrt(d)
    )
    r2 = mha_backward_pallas(
        q, k, v, out, lse, do, causal=True, sm_scale=1.0 / np.sqrt(d)
    )
    for name, a, b_ in zip(("dq", "dk", "dv"), r1, r2):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b_), err_msg=f"{name} not bit-equal"
        )


def test_vjp_routes_pallas_and_fallback():
    """The custom_vjp picks the Pallas backward for MHA and GQA — grads
    must match the dense oracle either way."""
    from vllm_flash_attn_tpu.kernels.flash_prefill import flash_attention

    rng = np.random.default_rng(34)
    for h, hk in ((4, 4), (4, 2)):  # MHA (pallas) and GQA (XLA fallback)
        q = jnp.asarray(rng.standard_normal((1, h, 256, 64)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, hk, 256, 64)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, hk, 256, 64)), jnp.float32)

        def loss_flash(q_, k_, v_):
            return jnp.sum(
                flash_attention(q_, k_, v_, causal=True, interpret=True) ** 2
            )

        def loss_dense(q_, k_, v_):
            kk = jnp.repeat(k_, h // hk, axis=1)
            vv = jnp.repeat(v_, h // hk, axis=1)
            s = jnp.einsum("bhqd,bhkd->bhqk", q_, kk) / jnp.sqrt(64.0)
            m = jnp.triu(jnp.ones((256, 256), bool), 1)
            s = jnp.where(m[None, None], -1e30, s)
            p = jax.nn.softmax(s, -1)
            return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, vv) ** 2)

        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for name, a, b_ in zip(("dq", "dk", "dv"), g1, g2):
            scale = float(jnp.max(jnp.abs(b_))) + 1e-9
            err = float(jnp.max(jnp.abs(a - b_))) / scale
            assert err < 1e-3, (h, hk, name, err)


@pytest.mark.parametrize("case", ["causal", "gqa", "window", "asym"])
def test_flat_backward_matches_grid_pair(case):
    """PB_CP=flat (round-4): manual-DMA flat backward pair must match the
    grid-pipelined pair bit-for-bit. Module-level env knob -> isolated
    subprocess (PB_CP is read at trace time inside mha_backward_pallas)."""
    import os
    import subprocess
    import sys

    code = f"""
import jax; jax.config.update("jax_platforms", "cpu")
import os
os.environ["VFA_TPU_FORCE_INTERPRET"] = "1"
import numpy as np, jax.numpy as jnp
from vllm_flash_attn_tpu.kernels.flash_prefill import flash_attention
from vllm_flash_attn_tpu.kernels.flash_backward_pallas import (
    mha_backward_pallas,
)
kw = {{
    "causal": dict(sq=384, sk=384, h=4, hk=4, causal=True),
    "gqa": dict(sq=256, sk=256, h=8, hk=2, causal=True),
    "window": dict(sq=256, sk=256, h=4, hk=4, window=(64, 32)),
    "asym": dict(sq=200, sk=392, h=4, hk=4, causal=True),
}}["{case}"]
h, hk = kw.pop("h"), kw.pop("hk")
sq, sk, d = kw.pop("sq"), kw.pop("sk"), 64
rng = np.random.default_rng(7)
q = jnp.asarray(rng.standard_normal((1, h, sq, d)), jnp.float32)
k = jnp.asarray(rng.standard_normal((1, hk, sk, d)), jnp.float32)
v = jnp.asarray(rng.standard_normal((1, hk, sk, d)), jnp.float32)
do = jnp.asarray(rng.standard_normal((1, h, sq, d)), jnp.float32)
out, lse = flash_attention(
    q, k, v, return_lse=True, block_q=128, block_k=128,
    causal=kw.get("causal", False), window=kw.get("window", (-1, -1)),
)
grads = mha_backward_pallas(
    q, k, v, out, lse, do, causal=kw.get("causal", False),
    sm_scale=1.0 / np.sqrt(d), window=kw.get("window", (-1, -1)),
    block_q=128, block_k=128,
)
np.savez("{{out}}", dq=grads[0], dk=grads[1], dv=grads[2])
"""
    import tempfile

    import numpy as np

    outs = {}
    with tempfile.TemporaryDirectory() as td:
        for tag, env_val in [("base", ""), ("flat", "flat")]:
            path = os.path.join(td, tag + ".npz")
            env = dict(os.environ, PB_CP=env_val)
            r = subprocess.run(
                [sys.executable, "-c", code.replace("{out}", path)],
                env=env, capture_output=True, text=True, timeout=600,
            )
            assert r.returncode == 0, r.stderr[-3000:]
            outs[tag] = np.load(path)
        for name in ("dq", "dk", "dv"):
            np.testing.assert_array_equal(
                outs["flat"][name], outs["base"][name],
                err_msg=f"{name} not bit-equal ({case})",
            )
