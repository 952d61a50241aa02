"""Ragged paged-prefill kernel (varlen + block_table) vs oracle — the
`mha_varlen_fwd(block_table=...)` path (/root/reference/csrc/flash_attn/
flash_api.cpp:467-492, tests/test_flash_attn.py:1546)."""

import jax.numpy as jnp
import numpy as np
import pytest

from harness import check_close
from test_paged_decode import dense_view, make_paged_cache
from vllm_flash_attn_tpu.core.reference import attention_ref
from vllm_flash_attn_tpu.kernels.varlen_paged import flash_attention_varlen_paged


def run_case(
    lens_q,
    lens_k,
    h=4,
    h_k=2,
    d=64,
    page_size=16,
    causal=True,
    window=(-1, -1),
    alibi=False,
    dtype=jnp.float32,
    mult=2.5,
):
    assert len(lens_q) == len(lens_k)
    rng = np.random.default_rng(sum(lens_q) * 31 + sum(lens_k))
    b = len(lens_q)
    k_pages, v_pages, bt = make_paged_cache(
        rng, b, lens_k, h_k, d, page_size, dtype
    )
    total_q = sum(lens_q)
    q = jnp.asarray(rng.standard_normal((total_q, h, d)), dtype)
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(lens_q)]), jnp.int32)
    lk = jnp.asarray(lens_k, jnp.int32)
    slopes = jnp.asarray(rng.random((h,)) * 0.3, jnp.float32) if alibi else None

    out = flash_attention_varlen_paged(
        q.transpose(1, 0, 2),  # (h, total_q, d)
        k_pages, v_pages, cu_q, lk, bt, max(lens_q),
        slopes, causal=causal, window=window, pages_per_compute_block=4,
    ).transpose(1, 0, 2)

    ks = dense_view(k_pages, bt, lens_k)
    vs = dense_view(v_pages, bt, lens_k)
    off = 0
    for i, (lq, lkk) in enumerate(zip(lens_q, lens_k)):
        if lq == 0:
            continue
        q_i = q[off : off + lq][None]  # (1, lq, h, d)
        k_i = jnp.asarray(ks[i])[None]
        v_i = jnp.asarray(vs[i])[None]
        sl = None if slopes is None else slopes[None]
        out_ref, _ = attention_ref(
            q_i, k_i, v_i, causal=causal, window_size=window, alibi_slopes=sl,
            upcast=True,
        )
        out_pt, _ = attention_ref(
            q_i, k_i, v_i, causal=causal, window_size=window, alibi_slopes=sl,
            upcast=False, reorder_ops=True,
        )
        check_close(
            out[off : off + lq][None], out_ref, out_pt, mult=mult,
            what=f"seq{i}",
        )
        off += lq


def test_equal_lengths_causal():
    run_case([32, 32], [32, 32])


def test_chunked_prefill_shapes():
    # queries are a suffix of the cached keys (chunked prefill)
    run_case([16, 40, 8], [48, 100, 30])


def test_speculative_verify_shapes():
    # a few new tokens against a long cache (multi-token decode / verify)
    run_case([4, 4], [130, 77], h=8, h_k=8)


def test_noncausal():
    run_case([24, 56], [64, 64], causal=False)


def test_window():
    run_case([32, 48], [80, 96], window=(24, 0))


def test_alibi():
    run_case([32, 16], [60, 60], alibi=True, mult=3.0)


def test_bf16():
    run_case([48, 32], [96, 64], dtype=jnp.bfloat16, mult=3.0)


def test_gqa_page_sizes():
    run_case([20, 36], [50, 70], h=8, h_k=2, page_size=8)


@pytest.mark.parametrize(
    "case",
    [
        dict(lq=[100, 1, 37, 250], lk=[300, 90, 37, 250]),
        dict(lq=[64, 128], lk=[200, 400], causal=False, window=(50, 0)),
        dict(lq=[100, 60], lk=[150, 80], lse=True, alibi=True),
        dict(lq=[8, 300, 16], lk=[512, 300, 40], h=8, h_k=2),
        dict(lq=[256], lk=[256]),
    ],
    ids=["chunked-mix", "window", "lse-alibi", "uneven-gqa", "single"],
)
def test_paged_splash_fold_bit_equal(case):
    """The folded paged-varlen grid (dynamic active-step enumeration) must be
    BIT-equal to the dense (b, NQ, NKB) sweep: same DMAs, same tile math,
    same visit order — only the grid structure differs."""
    lq, lk_ = case["lq"], case["lk"]
    h, h_k, d, ps = case.get("h", 4), case.get("h_k", 2), 128, 16
    rng = np.random.default_rng(13)
    k_pages, v_pages, bt = make_paged_cache(
        rng, len(lq), lk_, h_k, d, ps, jnp.bfloat16
    )
    q = jnp.asarray(
        rng.standard_normal((h, sum(lq), d)), jnp.bfloat16
    )
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(lq)]), jnp.int32)
    kw = dict(
        causal=case.get("causal", True),
        window=case.get("window", (-1, -1)),
        return_lse=case.get("lse", False),
        alibi_slopes=(
            jnp.asarray(rng.uniform(0.01, 0.1, (h,)), jnp.float32)
            if case.get("alibi") else None
        ),
        pages_per_compute_block=4,
    )
    args = (q, k_pages, v_pages, cu_q, jnp.asarray(lk_, jnp.int32), bt,
            max(lq))
    a = flash_attention_varlen_paged(*args, fold=False, **kw)
    b = flash_attention_varlen_paged(*args, fold=True, **kw)
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


@pytest.mark.parametrize("page_size", [16, 256, 512])
def test_reference_page_size_matrix(page_size):
    """The reference's varlen-causal paged block sizes {16, 256, 512}
    (tests/test_flash_attn.py:1546) — the fork's signature small-page
    support at one end, multi-block pages at the other."""
    run_case(
        [48, 100, 30], [300, 600, 520], h=4, h_k=4, page_size=page_size,
    )


def test_empty_query_sequence():
    run_case([16, 0, 8], [32, 16, 24])


def test_odd_head_dim():
    run_case([24, 16], [40, 40], d=80)


def test_no_dense_gather_in_traced_path():
    """The block_table varlen path must not lower through gather_kv_paged's
    dense jnp.take (VERDICT done-criterion): the traced HLO contains the
    ragged-paged custom call and no (b*npg, ps, h, d)-sized gather."""
    import jax
    import jax.numpy as jnp

    from vllm_flash_attn_tpu.api.interface import flash_attn_varlen_func

    b, ps, h, d = 2, 16, 4, 64
    npages = 16
    k_pages = jnp.zeros((npages, ps, h, d), jnp.float32)
    v_pages = jnp.zeros((npages, ps, h, d), jnp.float32)
    bt = jnp.arange(npages, dtype=jnp.int32).reshape(b, 8)
    q = jnp.zeros((24, h, d), jnp.float32)
    cu_q = jnp.asarray([0, 12, 24], jnp.int32)
    cu_k = jnp.asarray([0, 100, 228], jnp.int32)

    def fn(q, k_pages, v_pages, cu_q, cu_k, bt):
        return flash_attn_varlen_func(
            q, k_pages, v_pages, cu_q, cu_k, 12, 128, causal=True,
            block_table=bt,
        )

    hlo = jax.jit(fn).lower(q, k_pages, v_pages, cu_q, cu_k, bt).as_text()
    # the old gather_kv_paged path materializes a (b, h, max_len, d) dense
    # copy via stablehlo.gather over the page POOL; none may remain. Tiny
    # metadata gathers (the 8-alignment repack indexes (b+1,)-sized
    # cu_seqlens arrays) are fine — flag only gathers whose source tensor is
    # pool-sized.
    import re

    def src_rank(line):
        m = re.search(r":\s*\(tensor<([^>]*)>", line)
        if not m:
            return 0
        # "4x256x128xf32" -> dims are the leading pure-integer tokens
        # (the final token is the dtype; "f32" must not count as a dim)
        parts = m.group(1).split("x")
        return sum(1 for p in parts if p.isdigit())

    # the dense path's signature is a gather whose SOURCE is the rank-4
    # (num_pages, page_size, h, d) pool; the alignment repack's rank-3
    # (h, total, d) stream gathers are intentional and O(total_q)
    big_gather = [
        ln for ln in hlo.splitlines()
        if ("stablehlo.gather" in ln or '"gather"' in ln)
        and src_rank(ln) >= 4
    ]
    assert not big_gather, big_gather[:2]


def test_mqa():
    # h_kv=1: the all-heads kernel's static lane slice degenerates to one
    # shared kv column block for every q head (q_per_kv == h)
    run_case([20, 36], [50, 70], h=8, h_k=1, page_size=8)
    run_case([4, 4], [130, 77], h=4, h_k=1)
