"""Public API parity tests: the 7-function surface + kvcache, exercised the way
the reference test suite does (generate_qkv pack/unpack round trips,
test_flash_attn.py:70; kvcache append/rotary, :1861).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from harness import check_close
from vllm_flash_attn_tpu import (
    flash_attn_func,
    flash_attn_kvpacked_func,
    flash_attn_qkvpacked_func,
    flash_attn_varlen_func,
    flash_attn_varlen_kvpacked_func,
    flash_attn_varlen_qkvpacked_func,
    flash_attn_with_kvcache,
)
from vllm_flash_attn_tpu.core.reference import attention_ref
from vllm_flash_attn_tpu.layers.rotary import RotaryEmbedding, apply_rotary_emb
from vllm_flash_attn_tpu.utils import generate_cu_seqlens, unpad_input


def rand(rng, shape, dtype=jnp.bfloat16):
    return jnp.asarray(rng.standard_normal(shape), dtype)


def oracle_pair(q, k, v, **kw):
    ref, _ = attention_ref(q, k, v, upcast=True, **kw)
    pt, _ = attention_ref(q, k, v, upcast=False, reorder_ops=True, **kw)
    return ref, pt


def test_flash_attn_func():
    rng = np.random.default_rng(0)
    q, k, v = (rand(rng, (2, 200, 4, 64)) for _ in range(3))
    out = flash_attn_func(q, k, v, causal=True)
    ref, pt = oracle_pair(q, k, v, causal=True)
    check_close(out, ref, pt)


def test_packed_funcs():
    rng = np.random.default_rng(1)
    qkv = rand(rng, (2, 128, 3, 4, 64))
    out = flash_attn_qkvpacked_func(qkv, causal=True)
    ref, pt = oracle_pair(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], causal=True)
    check_close(out, ref, pt)

    q = rand(rng, (2, 64, 8, 64))
    kv = rand(rng, (2, 128, 2, 2, 64))
    out = flash_attn_kvpacked_func(q, kv, causal=True)
    ref, pt = oracle_pair(q, kv[:, :, 0], kv[:, :, 1], causal=True)
    check_close(out, ref, pt)


def test_return_attn_probs_gives_lse():
    rng = np.random.default_rng(2)
    q, k, v = (rand(rng, (1, 128, 2, 64), jnp.float32) for _ in range(3))
    out, lse, _ = flash_attn_func(q, k, v, return_attn_probs=True)
    import jax

    scores = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(64)
    lse_ref = jax.scipy.special.logsumexp(scores, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref), atol=1e-4, rtol=1e-4)


def test_varlen_func_with_padding_mask():
    """pad -> unpad -> varlen kernel -> compare vs masked dense oracle."""
    rng = np.random.default_rng(3)
    b, s, h, d = 3, 160, 4, 64
    q, k, v = (rand(rng, (b, s, h, d)) for _ in range(3))
    qlens, klens = [100, 160, 3], [50, 160, 111]
    qmask = np.zeros((b, s), bool)
    kmask = np.zeros((b, s), bool)
    for i in range(b):
        qmask[i, : qlens[i]] = True
        kmask[i, : klens[i]] = True
    q_u, _, cu_q, mq = unpad_input(q, qmask)
    k_u, _, cu_k, mk = unpad_input(k, kmask)
    v_u, _, cu_k2, _ = unpad_input(v, kmask)

    out_u = flash_attn_varlen_func(
        q_u, k_u, v_u, cu_q, cu_k, mq, mk, causal=True
    )
    ref, pt = oracle_pair(
        q, k, v,
        query_padding_mask=jnp.asarray(qmask),
        key_padding_mask=jnp.asarray(kmask),
        causal=True,
    )
    for i in range(b):
        lo, hi = int(cu_q[i]), int(cu_q[i + 1])
        check_close(
            out_u[lo:hi], ref[i, : qlens[i]], pt[i, : qlens[i]], what=f"seq{i}"
        )


def test_varlen_packed_funcs():
    rng = np.random.default_rng(4)
    lens = [64, 100, 28]
    total = sum(lens)
    cu = generate_cu_seqlens(lens)
    qkv = rand(rng, (total, 3, 4, 64))
    out = flash_attn_varlen_qkvpacked_func(qkv, cu, max(lens), causal=True)
    for i, L in enumerate(lens):
        lo = int(cu[i])
        ref, pt = oracle_pair(
            qkv[None, lo : lo + L, 0], qkv[None, lo : lo + L, 1],
            qkv[None, lo : lo + L, 2], causal=True,
        )
        check_close(out[lo : lo + L], ref[0], pt[0], what=f"seq{i}")

    q = rand(rng, (total, 8, 64))
    kv = rand(rng, (total, 2, 2, 64))
    out = flash_attn_varlen_kvpacked_func(
        q, kv, cu, cu, max(lens), max(lens), causal=True
    )
    for i, L in enumerate(lens):
        lo = int(cu[i])
        ref, pt = oracle_pair(
            q[None, lo : lo + L], kv[None, lo : lo + L, 0],
            kv[None, lo : lo + L, 1], causal=True,
        )
        check_close(out[lo : lo + L], ref[0], pt[0], what=f"kv-seq{i}")


def _mk_paged_cache(rng, b, max_len, h_k, d, ps, dtype=jnp.float32):
    pages_per_seq = -(-max_len // ps)
    num_pages = 3 * b * pages_per_seq
    perm = rng.permutation(num_pages)[: b * pages_per_seq]
    bt = jnp.asarray(perm.reshape(b, pages_per_seq).astype(np.int32))
    k_cache = rand(rng, (num_pages, ps, h_k, d), dtype)
    v_cache = rand(rng, (num_pages, ps, h_k, d), dtype)
    return k_cache, v_cache, bt


def _cache_dense(k_cache, bt, i, L, ps):
    kc = np.asarray(k_cache)
    t = np.asarray(bt)[i]
    npg = -(-L // ps) if L else 1
    return kc[t[:npg]].reshape(-1, *kc.shape[2:])[:L]  # (L, h_k, d)


@pytest.mark.parametrize("ps", [16, 256])
def test_kvcache_paged_decode_with_append_and_rotary(ps):
    rng = np.random.default_rng(5)
    b, h, h_k, d = 2, 8, 2, 64
    max_len = 512
    k_cache, v_cache, bt = _mk_paged_cache(rng, b, max_len, h_k, d, ps)
    lens = [100, 211]
    q = rand(rng, (b, 1, h, d), jnp.float32)
    k_new = rand(rng, (b, 1, h_k, d), jnp.float32)
    v_new = rand(rng, (b, 1, h_k, d), jnp.float32)
    rot = RotaryEmbedding(d)
    cos, sin = rot.tables(max_len)

    out, (k2, v2) = flash_attn_with_kvcache(
        q, k_cache, v_cache, k_new, v_new,
        rotary_cos=cos, rotary_sin=sin,
        cache_seqlens=jnp.asarray(lens, jnp.int32),
        block_table=bt, causal=True,
    )

    for i, L in enumerate(lens):
        # cache update exactness: V bitwise, K (rotated) close (test:2074-2075)
        kd = _cache_dense(k2, bt, i, L + 1, ps)
        vd = _cache_dense(v2, bt, i, L + 1, ps)
        k_rot = apply_rotary_emb(
            k_new[i : i + 1], cos, sin, positions=jnp.asarray([L])
        )
        np.testing.assert_array_equal(vd[L], np.asarray(v_new[i, 0]))
        np.testing.assert_allclose(
            kd[L], np.asarray(k_rot[0, 0]), atol=1e-3, rtol=1e-3
        )
        q_rot = apply_rotary_emb(
            q[i : i + 1], cos, sin, positions=jnp.asarray([L])
        )
        ref, pt = oracle_pair(
            q_rot,
            jnp.asarray(kd)[None],
            jnp.asarray(vd)[None],
            causal=True,
        )
        check_close(out[i], ref[0], pt[0], mult=3.0, what=f"seq{i}")


def test_kvcache_contiguous_with_batch_idx():
    rng = np.random.default_rng(6)
    b, b_c, h, h_k, d, s_max = 2, 4, 4, 4, 2, 64
    h, h_k, d = 4, 4, 32
    k_cache = rand(rng, (b_c, s_max, h_k, d), jnp.float32)
    v_cache = rand(rng, (b_c, s_max, h_k, d), jnp.float32)
    q = rand(rng, (b, 1, h, d), jnp.float32)
    lens = jnp.asarray([30, 64], jnp.int32)
    idx = jnp.asarray([2, 0], jnp.int32)
    out = flash_attn_with_kvcache(
        q, k_cache, v_cache, cache_seqlens=lens, cache_batch_idx=idx,
        causal=True,
    )
    for i in range(b):
        L = int(lens[i])
        ref, pt = oracle_pair(
            q[i : i + 1],
            k_cache[int(idx[i]) : int(idx[i]) + 1, :L],
            v_cache[int(idx[i]) : int(idx[i]) + 1, :L],
            causal=True,
        )
        check_close(out[i], ref[0], pt[0], mult=3.0, what=f"seq{i}")


def test_kvcache_multitoken_query():
    """seqlen_q > 1 (speculative verify shape) over paged cache."""
    rng = np.random.default_rng(7)
    b, h, h_k, d, ps = 2, 4, 2, 64, 16
    k_cache, v_cache, bt = _mk_paged_cache(rng, b, 256, h_k, d, ps)
    lens = [60, 200]
    sq = 4
    q = rand(rng, (b, sq, h, d), jnp.float32)
    out = flash_attn_with_kvcache(
        q, k_cache, v_cache, cache_seqlens=jnp.asarray(lens, jnp.int32),
        block_table=bt, causal=True,
    )
    for i, L in enumerate(lens):
        kd = _cache_dense(k_cache, bt, i, L, ps)
        vd = _cache_dense(v_cache, bt, i, L, ps)
        ref, pt = oracle_pair(
            q[i : i + 1], jnp.asarray(kd)[None], jnp.asarray(vd)[None],
            causal=True,
        )
        check_close(out[i], ref[0], pt[0], mult=3.0, what=f"seq{i}")


@pytest.mark.parametrize("paged", [False, True])
@pytest.mark.parametrize("interleaved", [False, True])
@pytest.mark.parametrize("s_new", [1, 3])
def test_kvcache_cross_product(paged, interleaved, s_new):
    """Denser kvcache sampling of the reference's big cross-product
    (tests/test_flash_attn.py:1861-2094): rotary style x append x paged vs
    contiguous x multi-token query, with cache-update exactness."""
    rng = np.random.default_rng(40 + s_new + 2 * paged + 4 * interleaved)
    b, h, h_k, d, ps = 2, 4, 2, 64, 16
    max_len = 256
    lens = [60, 129]
    if paged:
        k_cache, v_cache, bt = _mk_paged_cache(rng, b, max_len, h_k, d, ps)
    else:
        k_cache = rand(rng, (b, max_len, h_k, d), jnp.float32)
        v_cache = rand(rng, (b, max_len, h_k, d), jnp.float32)
        bt = None
    q = rand(rng, (b, s_new, h, d), jnp.float32)
    k_new = rand(rng, (b, s_new, h_k, d), jnp.float32)
    v_new = rand(rng, (b, s_new, h_k, d), jnp.float32)
    rot = RotaryEmbedding(d, interleaved=interleaved)
    cos, sin = rot.tables(max_len)

    res = flash_attn_with_kvcache(
        q, k_cache, v_cache, k_new, v_new,
        rotary_cos=cos, rotary_sin=sin,
        cache_seqlens=jnp.asarray(lens, jnp.int32),
        block_table=bt, causal=True,
        rotary_interleaved=interleaved,
    )
    out, (k2, v2) = res

    for i, L in enumerate(lens):
        if paged:
            kd = _cache_dense(k2, bt, i, L + s_new, ps)
            vd = _cache_dense(v2, bt, i, L + s_new, ps)
        else:
            kd = np.asarray(k2[i, : L + s_new])
            vd = np.asarray(v2[i, : L + s_new])
        pos = jnp.arange(L, L + s_new)
        k_rot = apply_rotary_emb(
            k_new[i : i + 1], cos, sin, interleaved=interleaved, positions=pos[None]
        )
        np.testing.assert_array_equal(vd[L:], np.asarray(v_new[i]))
        np.testing.assert_allclose(
            kd[L:], np.asarray(k_rot[0]), atol=1e-3, rtol=1e-3
        )
        q_rot = apply_rotary_emb(
            q[i : i + 1], cos, sin, interleaved=interleaved, positions=pos[None]
        )
        ref, pt = oracle_pair(
            q_rot, jnp.asarray(kd)[None], jnp.asarray(vd)[None], causal=True,
        )
        check_close(out[i], ref[0], pt[0], mult=3.0, what=f"seq{i}")


def test_kvcache_num_splits_routes_and_matches():
    """`num_splits` on flash_attn_with_kvcache routes through the split-KV
    kernel (r2 verdict: it was silently ignored) and matches num_splits=1."""
    from vllm_flash_attn_tpu import flash_attn_with_kvcache

    rng = np.random.default_rng(31)
    h, hk, d, ps, npages = 4, 2, 64, 16, 64
    kc = jnp.asarray(rng.standard_normal((npages, ps, hk, d)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((npages, ps, hk, d)), jnp.float32)
    bt = jnp.asarray(rng.permutation(npages)[:16].reshape(2, 8).astype(np.int32))
    lens = jnp.asarray([100, 37], jnp.int32)
    q = jnp.asarray(rng.standard_normal((2, 1, h, d)), jnp.float32)
    base = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=lens, block_table=bt, num_splits=1
    )
    for ns in (0, 4):
        out = flash_attn_with_kvcache(
            q, kc, vc, cache_seqlens=lens, block_table=bt, num_splits=ns
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base), atol=2e-5, rtol=2e-5,
            err_msg=f"num_splits={ns}",
        )


def test_runbook_variant_names_valid():
    """A typo'd variant name in the round-4 hardware runbook would waste a
    relay window with a KeyError mid-run. Validate every bench_prefill_hw
    variant named by round4_hw.py against the harness tables, and every
    bench.py auto-tune config against its own table."""
    import ast
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(root))
    sys.path.insert(0, str(root / "benchmarks"))
    import importlib

    bph = importlib.import_module("bench_prefill_hw")
    known = set(bph.VARIANTS) | set(bph.ENV_VARIANTS)

    tree = ast.parse((root / "benchmarks" / "round4_hw.py").read_text())
    checked = 0
    for node in ast.walk(tree):
        if isinstance(node, ast.List):
            vals = [
                e.value for e in node.elts
                if isinstance(e, ast.Constant) and isinstance(e.value, str)
            ]
            if "benchmarks/bench_prefill_hw.py" in vals:
                i = vals.index("benchmarks/bench_prefill_hw.py")
                for name in vals[i + 1:]:
                    assert name in known, f"unknown prefill variant {name!r}"
                    checked += 1
    assert checked > 0, "no bench_prefill_hw steps found in round4_hw.py"

    import bench

    for name, kw in bench.PREFILL_CONFIGS.items():
        assert isinstance(kw, dict), name


@pytest.mark.parametrize("paged", [True, False])
@pytest.mark.parametrize("s_new", [2, 5])
def test_kvcache_fused_multitoken_append(paged, s_new):
    """d=128 + sq>1 routes through the varlen-paged kernel's in-kernel
    multi-token append prologue (flash_fwd_kernel.h:671-785 for
    seqlen_knew > 1) — ONE device program; cache update must be exact and
    the output must match the scatter path bit-for-bit semantics."""
    import os as _os

    rng = np.random.default_rng(90 + s_new)
    b, h, h_k, d, ps = 2, 4, 2, 128, 16
    max_len = 256
    lens = [60, 129]
    if paged:
        k_cache, v_cache, bt = _mk_paged_cache(rng, b, max_len, h_k, d, ps)
    else:
        k_cache = rand(rng, (b, max_len, h_k, d), jnp.float32)
        v_cache = rand(rng, (b, max_len, h_k, d), jnp.float32)
        bt = None
    q = rand(rng, (b, s_new, h, d), jnp.float32)
    k_new = rand(rng, (b, s_new, h_k, d), jnp.float32)
    v_new = rand(rng, (b, s_new, h_k, d), jnp.float32)

    out, (k2, v2) = flash_attn_with_kvcache(
        q, k_cache, v_cache, k_new, v_new,
        cache_seqlens=jnp.asarray(lens, jnp.int32),
        block_table=bt, causal=True,
    )
    # scatter-path reference (same inputs, fused path disabled)
    _os.environ["VFA_FUSED_APPEND"] = "0"
    try:
        out_s, (k2s, v2s) = flash_attn_with_kvcache(
            q, k_cache, v_cache, k_new, v_new,
            cache_seqlens=jnp.asarray(lens, jnp.int32),
            block_table=bt, causal=True,
        )
    finally:
        _os.environ.pop("VFA_FUSED_APPEND", None)
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k2s))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v2s))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_s), atol=2e-5, rtol=2e-5
    )
    for i, L in enumerate(lens):
        if paged:
            kd = _cache_dense(k2, bt, i, L + s_new, ps)
            vd = _cache_dense(v2, bt, i, L + s_new, ps)
        else:
            kd = np.asarray(k2[i, : L + s_new])
            vd = np.asarray(v2[i, : L + s_new])
        np.testing.assert_array_equal(kd[L:], np.asarray(k_new[i]))
        np.testing.assert_array_equal(vd[L:], np.asarray(v_new[i]))
        ref, pt = oracle_pair(
            q[i : i + 1], jnp.asarray(kd)[None], jnp.asarray(vd)[None],
            causal=True,
        )
        check_close(out[i], ref[0], pt[0], mult=3.0, what=f"seq{i}")
