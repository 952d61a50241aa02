"""Paged decode kernel + cache append vs oracle, mirroring
test_flash_attn_kvcache (/root/reference/tests/test_flash_attn.py:1861) incl.
shuffled over-allocated block tables (:2079-2094) and exact-cache-update checks
(:2074-2075).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from harness import check_close
from vllm_flash_attn_tpu.core.reference import attention_ref
from vllm_flash_attn_tpu.kernels.kv_cache import append_kv_paged, gather_kv_paged
from vllm_flash_attn_tpu.kernels.paged_decode import paged_attention


def make_paged_cache(rng, b, lengths, h_k, d, page_size, dtype, overalloc=3):
    """Shuffled pages with over-allocation, like _generate_block_kvcache."""
    max_len = max(lengths)
    pages_per_seq = -(-max_len // page_size) + 1
    num_pages = b * pages_per_seq * overalloc
    perm = rng.permutation(num_pages)[: b * pages_per_seq]
    block_tables = perm.reshape(b, pages_per_seq).astype(np.int32)
    k_pages = rng.standard_normal((num_pages, page_size, h_k, d)).astype(np.float32)
    v_pages = rng.standard_normal((num_pages, page_size, h_k, d)).astype(np.float32)
    return (
        jnp.asarray(k_pages, dtype),
        jnp.asarray(v_pages, dtype),
        jnp.asarray(block_tables),
    )


def dense_view(pages, block_tables, lengths):
    """(pages, ps, h, d) + table -> list of (len_i, h, d) dense per-seq arrays."""
    _, ps, h, d = pages.shape
    out = []
    p = np.asarray(pages)
    bt = np.asarray(block_tables)
    for i, L in enumerate(lengths):
        npg = -(-L // ps) if L else 1
        gathered = p[bt[i, :npg]].reshape(npg * ps, h, d)[:L]
        out.append(gathered)  # (L, h, d)
    return out


def run_decode_case(
    lengths,
    h=8,
    h_k=2,
    d=64,
    page_size=16,
    window=(-1, -1),
    alibi=False,
    dtype=jnp.float32,
    mult=3.0,
):
    rng = np.random.default_rng(sum(lengths) * 13 + h * d)
    b = len(lengths)
    k_pages, v_pages, bt = make_paged_cache(rng, b, lengths, h_k, d, page_size, dtype)
    q = jnp.asarray(rng.standard_normal((b, h, d)), dtype)
    lens = jnp.asarray(lengths, jnp.int32)
    # alibi=True -> shared (h,) slopes; alibi="bh" -> per-batch (b, h)
    # slopes (both validated by the reference, flash_api.cpp:221-237)
    if alibi == "bh":
        slopes = jnp.asarray(rng.random((b, h)) * 0.3, jnp.float32)
    elif alibi:
        slopes = jnp.asarray(rng.random((h,)) * 0.3, jnp.float32)
    else:
        slopes = None

    out = paged_attention(
        q, k_pages, v_pages, lens, bt, slopes, window=window,
        pages_per_compute_block=4,
    )

    ks = dense_view(k_pages, bt, lengths)
    vs = dense_view(v_pages, bt, lengths)
    for i, L in enumerate(lengths):
        if L == 0:
            assert np.all(np.asarray(out[i]) == 0.0)
            continue
        q_i = q[i][None, None]  # (1, 1, h, d)
        k_i = jnp.asarray(ks[i])[None]
        v_i = jnp.asarray(vs[i])[None]
        sl = (
            None if slopes is None
            else (slopes[i][None] if slopes.ndim == 2 else slopes[None])
        )
        out_ref, _ = attention_ref(
            q_i, k_i, v_i, window_size=window, alibi_slopes=sl, causal=True,
            upcast=True,
        )
        out_pt, _ = attention_ref(
            q_i, k_i, v_i, window_size=window, alibi_slopes=sl, causal=True,
            upcast=False, reorder_ops=True,
        )
        check_close(out[i], out_ref[0, 0], out_pt[0, 0], mult=mult, what=f"seq{i}")


@pytest.mark.parametrize("page_size", [16, 64, 128, 512])
def test_page_sizes(page_size):
    # 512 mirrors the reference's largest paged_kv_block_size
    # (tests/test_flash_attn.py:1546,1836)
    run_decode_case([100, 37, 256], page_size=page_size)


def test_odd_head_dim():
    # pad-to-lane path (flash_api.cpp:312-320 analog)
    run_decode_case([40, 100], d=80)
    run_decode_case([64], d=59, h=4, h_k=4)


def test_mqa():
    run_decode_case([333, 5], h=8, h_k=1)


def test_mha():
    run_decode_case([64, 128], h=4, h_k=4)


def test_window():
    run_decode_case([200, 450], window=(64, 0))


def test_alibi():
    run_decode_case([90, 130], alibi=True, mult=5.0)


def test_alibi_per_batch():
    # (batch, nheads) slopes on the decode kernel, incl. the GQA lane
    # permutation and MQA padded-lane paths (flash_api.cpp:221-237)
    run_decode_case([90, 130], alibi="bh", mult=5.0)
    run_decode_case([64, 33, 7], h=8, h_k=1, alibi="bh", mult=5.0)


def test_alibi_per_batch_splitkv():
    """(batch, nheads) slopes through the split-KV path: every split must
    read ITS batch row's slopes with global positions (VERDICT r04 gap #1:
    the reference validates both shapes, flash_api.cpp:221-237)."""
    from vllm_flash_attn_tpu.kernels.paged_decode import paged_attention_splitkv

    rng = np.random.default_rng(21)
    lengths = [700, 260, 64]
    k_pages, v_pages, bt = make_paged_cache(
        rng, 3, lengths, 2, 128, 16, jnp.float32
    )
    q = jnp.asarray(rng.standard_normal((3, 4, 128)), jnp.float32)
    lens = jnp.asarray(lengths, jnp.int32)
    slopes = jnp.asarray(rng.uniform(0.01, 0.3, (3, 4)), jnp.float32)

    base, lse_base = paged_attention(
        q, k_pages, v_pages, lens, bt, slopes,
        pages_per_compute_block=4, return_lse=True,
    )
    # oracle: per-sequence dense attention with that row's slopes
    ks = dense_view(k_pages, bt, lengths)
    vs = dense_view(v_pages, bt, lengths)
    for i, L in enumerate(lengths):
        out_ref, _ = attention_ref(
            q[i][None, None], jnp.asarray(ks[i])[None],
            jnp.asarray(vs[i])[None], alibi_slopes=slopes[i][None],
            causal=True, upcast=True,
        )
        np.testing.assert_allclose(
            np.asarray(base[i]), np.asarray(out_ref[0, 0]), atol=2e-3,
            rtol=2e-3,
        )
    for ns in (2, 4):
        out, lse = paged_attention_splitkv(
            q, k_pages, v_pages, lens, bt, slopes, num_splits=ns,
            pages_per_compute_block=4, return_lse=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base), atol=2e-5, rtol=2e-5
        )
        fin = np.isfinite(np.asarray(lse_base))
        np.testing.assert_allclose(
            np.asarray(lse)[fin], np.asarray(lse_base)[fin], atol=1e-5,
            rtol=1e-5,
        )


def test_bf16():
    run_decode_case([128, 512], dtype=jnp.bfloat16, mult=3.0)


def test_empty_and_single():
    run_decode_case([0, 1, 17])


def test_long_context():
    run_decode_case([3000], h=4, h_k=1, page_size=128)


def test_very_long_context_32k():
    """seqlen_k deep into the 10^4 range (the reference sweeps to 100k,
    tests/test_flash_attn.py:1700-1718; interpret mode makes 32k the
    practical CPU ceiling — the sequential-block walk is length-invariant
    beyond this)."""
    run_decode_case([32768], h=2, h_k=1, d=64, page_size=256, mult=4.0)


def test_decode_determinism():
    # determinism as a tested property (tests/test_flash_attn.py:547)
    rng = np.random.default_rng(3)
    k_pages, v_pages, bt = make_paged_cache(
        rng, 2, [100, 200], 2, 64, 16, jnp.bfloat16
    )
    q = jnp.asarray(rng.standard_normal((2, 4, 64)), jnp.bfloat16)
    lens = jnp.asarray([100, 200], jnp.int32)
    a = paged_attention(q, k_pages, v_pages, lens, bt, pages_per_compute_block=4)
    b = paged_attention(q, k_pages, v_pages, lens, bt, pages_per_compute_block=4)
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_append_exactness():
    """V cache update must be exact (torch.equal analog, test_flash_attn.py:2074)."""
    rng = np.random.default_rng(7)
    b, h_k, d, ps = 2, 2, 32, 16
    lengths = [10, 37]
    k_pages, v_pages, bt = make_paged_cache(
        rng, b, [64, 64], h_k, d, ps, jnp.float32
    )
    s_new = 5
    k_new = jnp.asarray(rng.standard_normal((b, s_new, h_k, d)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((b, s_new, h_k, d)), jnp.float32)
    lens = jnp.asarray(lengths, jnp.int32)
    k2, v2 = append_kv_paged(k_pages, v_pages, k_new, v_new, lens, bt)

    ks = dense_view(k2, bt, [L + s_new for L in lengths])
    for i, L in enumerate(lengths):
        got = ks[i][L : L + s_new]  # (s_new, h_k, d)
        np.testing.assert_array_equal(
            got, np.asarray(k_new[i]), err_msg=f"seq{i} K append not exact"
        )
    # untouched slots identical
    k0 = np.asarray(k_pages)
    k2n = np.asarray(k2)
    touched = set()
    for i, L in enumerate(lengths):
        for t in range(L, L + s_new):
            touched.add((int(np.asarray(bt)[i, t // ps]), t % ps))
    for pg in range(k0.shape[0]):
        for sl in range(ps):
            if (pg, sl) not in touched:
                np.testing.assert_array_equal(k0[pg, sl], k2n[pg, sl])


def test_gather_kv_paged():
    rng = np.random.default_rng(8)
    lengths = [20, 50]
    k_pages, v_pages, bt = make_paged_cache(rng, 2, lengths, 2, 16, 16, jnp.float32)
    k, v = gather_kv_paged(k_pages, v_pages, bt, 50)
    ks = dense_view(k_pages, bt, lengths)
    np.testing.assert_array_equal(
        np.asarray(k[1]).transpose(1, 0, 2)[:50], ks[1][:50]
    )


@pytest.mark.parametrize("quant", [False, True], ids=["bf16", "int8"])
@pytest.mark.parametrize(
    "h,h_k", [(4, 1), (6, 2), (6, 3), (5, 5), (12, 3), (7, 1), (16, 4)]
)
def test_head_combo_property_sweep(h, h_k, quant):
    """Round-4 static lane-permutation property sweep: every (h_q, h_kv)
    divisibility class — MQA, odd h_q, non-4-aligned h_kv, replicated
    quantized pools — against a dense numpy oracle."""
    from vllm_flash_attn_tpu.kernels.kv_quant import quantize_pages

    rng = np.random.default_rng(h * 31 + h_k)
    d, ps, b = 64, 16, 2
    L = [37, 20]
    npages = 12
    kp = rng.standard_normal((npages, ps, h_k, d)).astype(np.float32)
    vp = rng.standard_normal((npages, ps, h_k, d)).astype(np.float32)
    bt = rng.permutation(npages)[:8].reshape(b, 4).astype(np.int32)
    q = rng.standard_normal((b, h, d)).astype(np.float32)
    if quant:
        kq, vq = quantize_pages(jnp.asarray(kp), jnp.asarray(vp), jnp.int8)
    else:
        kq, vq = jnp.asarray(kp), jnp.asarray(vp)
    out = np.asarray(
        paged_attention(
            jnp.asarray(q), kq, vq, jnp.asarray(L, jnp.int32),
            jnp.asarray(bt), pages_per_compute_block=2,
        )
    )
    for i in range(b):
        kd = kp[bt[i]].reshape(-1, h_k, d)[: L[i]]
        vd = vp[bt[i]].reshape(-1, h_k, d)[: L[i]]
        rep = h // h_k
        ks = np.repeat(kd, rep, axis=1) if rep > 1 else kd
        vs = np.repeat(vd, rep, axis=1) if rep > 1 else vd
        s = np.einsum("hd,lhd->hl", q[i], ks) / np.sqrt(d)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref = np.einsum("hl,lhd->hd", p, vs)
        err = np.abs(out[i] - ref).max()
        assert err < (0.06 if quant else 2e-3), (i, err)


def test_splitkv_matches_single():
    """paged_attention_splitkv (flash-decoding analog) must match the
    single-pass kernel for any split count, including splits past the end
    of short sequences (empty splits carry lse=+inf and merge away)."""
    from vllm_flash_attn_tpu.kernels.paged_decode import paged_attention_splitkv

    rng = np.random.default_rng(11)
    lengths = [700, 64, 1]
    k_pages, v_pages, bt = make_paged_cache(
        rng, 3, lengths, 2, 64, 16, jnp.float32
    )
    q = jnp.asarray(rng.standard_normal((3, 4, 64)), jnp.float32)
    lens = jnp.asarray(lengths, jnp.int32)
    base = paged_attention(
        q, k_pages, v_pages, lens, bt, pages_per_compute_block=4
    )
    for ns in (2, 3, 8):
        out = paged_attention_splitkv(
            q, k_pages, v_pages, lens, bt, num_splits=ns,
            pages_per_compute_block=4,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base), atol=2e-5, rtol=2e-5
        ), ns


def test_splitkv_single_call_window_alibi_lse():
    """The single-pallas_call split-KV (virtual rows + combine) supports
    window/alibi with GLOBAL positions and returns a correctly merged LSE
    (reference split kernel semantics, flash_fwd_kernel.h:475-512,
    1093-1252)."""
    from vllm_flash_attn_tpu.kernels.paged_decode import paged_attention_splitkv

    rng = np.random.default_rng(12)
    lengths = [700, 260, 64]
    k_pages, v_pages, bt = make_paged_cache(
        rng, 3, lengths, 2, 128, 16, jnp.float32
    )
    q = jnp.asarray(rng.standard_normal((3, 4, 128)), jnp.float32)
    lens = jnp.asarray(lengths, jnp.int32)
    slopes = jnp.asarray(rng.uniform(0.01, 0.3, (4,)), jnp.float32)

    base, lse_base = paged_attention(
        q, k_pages, v_pages, lens, bt, slopes, window=(128, -1),
        pages_per_compute_block=4, return_lse=True,
    )
    for ns in (2, 4):
        out, lse = paged_attention_splitkv(
            q, k_pages, v_pages, lens, bt, slopes, window=(128, -1),
            num_splits=ns, pages_per_compute_block=4, return_lse=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base), atol=2e-5, rtol=2e-5
        )
        fin = np.isfinite(np.asarray(lse_base))
        np.testing.assert_array_equal(fin, np.isfinite(np.asarray(lse)))
        np.testing.assert_allclose(
            np.asarray(lse)[fin], np.asarray(lse_base)[fin], atol=1e-5,
            rtol=1e-5,
        )


def test_num_splits_heuristic():
    """Auto split count: never split when batch rows cover the cores (the
    TPU reading of the reference occupancy rule, flash_api.cpp:154-192)."""
    from vllm_flash_attn_tpu.kernels.paged_decode import num_splits_heuristic

    assert num_splits_heuristic(8, 64, n_cores=1) == 1
    assert num_splits_heuristic(1, 64, n_cores=1) == 1  # 1 core: DMA-bound
    assert num_splits_heuristic(1, 64, n_cores=2) == 2  # megacore
    assert num_splits_heuristic(2, 64, n_cores=2) == 1
    assert num_splits_heuristic(1, 1, n_cores=8) == 1  # capped by pages
    assert num_splits_heuristic(3, 64, n_cores=8) == 3  # ceil(8/3)


def test_decode_100k_keys():
    """Long-context decode: 100k keys through the paged kernel (the
    reference tests seqlen_k to 100k, tests/test_flash_attn.py:1700-1718).
    Small heads keep the interpret-mode walk tractable."""
    rng = np.random.default_rng(13)
    ctx = 100_000
    page_size = 512
    nps = -(-ctx // page_size)
    k_pages, v_pages, bt = make_paged_cache(
        rng, 1, [ctx], 1, 128, page_size, jnp.float32, overalloc=1
    )
    q = jnp.asarray(rng.standard_normal((1, 2, 128)), jnp.float32)
    lens = jnp.asarray([ctx], jnp.int32)
    out = paged_attention(
        q, k_pages, v_pages, lens, bt, pages_per_compute_block=8
    )
    # oracle: dense softmax over the gathered cache
    ks = dense_view(k_pages, bt, [ctx])[0]  # (ctx, 1, d)
    vs = dense_view(v_pages, bt, [ctx])[0]
    s = np.einsum("hd,khd->hk", np.asarray(q[0]), ks.repeat(2, 1)) / np.sqrt(128)
    p = np.exp(s - s.max(axis=1, keepdims=True))
    p /= p.sum(axis=1, keepdims=True)
    ref = np.einsum("hk,khd->hd", p, vs.repeat(2, 1))
    np.testing.assert_allclose(np.asarray(out[0]), ref, atol=3e-5, rtol=3e-3)


def test_fused_append_matches_scatter():
    """In-kernel append (k_new/v_new + aliased pools) must produce EXACTLY
    the same pools as append_kv_paged and the same attention output; rows
    masked out via append_mask (inactive / mid-prefill engine slots) must
    not be written."""
    from vllm_flash_attn_tpu.kernels.kv_cache import append_kv_paged

    rng = np.random.default_rng(23)
    b, hq, hkv, d, ps = 4, 8, 4, 128, 16
    npages = 64
    kp = jnp.asarray(rng.standard_normal((npages, ps, hkv, d)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((npages, ps, hkv, d)), jnp.float32)
    bt = jnp.asarray(rng.permutation(npages).reshape(b, 16).astype(np.int32))
    # row 2: inactive (len 0); row 3: mid-prefill (len > 0 but NOT appending)
    lens_before = jnp.asarray([100, 31, 0, 57], jnp.int32)
    num_new = jnp.asarray([1, 1, 0, 0], jnp.int32)
    kn = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, hkv, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)

    kp2, vp2 = append_kv_paged(
        kp, vp, kn[:, None], vn[:, None], lens_before, bt, num_new=num_new
    )
    lens_after = lens_before + num_new
    ref = paged_attention(q, kp2, vp2, lens_after, bt)
    out, kp3, vp3 = paged_attention(
        q, kp, vp, lens_after, bt, k_new=kn, v_new=vn, append_mask=num_new
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )
    np.testing.assert_array_equal(np.asarray(kp3), np.asarray(kp2))
    np.testing.assert_array_equal(np.asarray(vp3), np.asarray(vp2))
