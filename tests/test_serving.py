"""Serving engine tests: C++ allocator semantics, and end-to-end continuous
batching must reproduce the contiguous-cache generate() outputs exactly
(greedy decode is deterministic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from vllm_flash_attn_tpu.serving.engine import LLMEngine, Request
from vllm_flash_attn_tpu.serving.page_allocator import PageAllocator
from vllm_flash_attn_tpu.utils.generation import generate

CFG = GPTConfig(
    vocab_size=128,
    n_positions=0,
    n_embd=64,
    n_layer=2,
    n_head=4,
    n_head_kv=2,
    rotary_emb_dim=16,
    gated_mlp=True,
    rms_norm=True,
    qkv_proj_bias=False,
    out_proj_bias=False,
    mlp_fc1_bias=False,
    mlp_fc2_bias=False,
    activation_function="silu",
    n_inner=128,
)


@pytest.mark.parametrize("force_python", [False, True], ids=["cpp", "python"])
def test_page_allocator(force_python):
    pa = PageAllocator(16, 4, 8, 4, force_python=force_python)
    if not force_python:
        assert pa.native, "C++ allocator failed to build"
    s0 = pa.alloc_seq()
    s1 = pa.alloc_seq()
    assert {s0, s1} == {0, 1}
    assert pa.extend(s0, 10) == 10  # 3 pages
    assert pa.extend(s1, 4) == 4  # 1 page
    assert pa.num_free_pages() == 12
    assert pa.extend(s0, 1) == 11  # fits page 3
    assert pa.num_free_pages() == 12
    assert pa.extend(s0, 2) == 13  # new page
    assert pa.num_free_pages() == 11
    tables, lens = pa.gather([s0, s1, 3])
    assert lens.tolist() == [13, 4, 0]
    assert len(set(tables[0][:4]) | set(tables[1][:1])) == 5  # distinct pages
    # OOM behavior: request more than free
    assert pa.extend(s1, 16 * 4) == -1
    assert pa.seq_length(s1) == 4  # unchanged on failure
    pa.free_seq(s0)
    assert pa.num_free_pages() == 15
    # slot cap
    for _ in range(3):
        pa.alloc_seq()
    assert pa.alloc_seq() == -1


def test_engine_matches_contiguous_generate():
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, CFG.vocab_size, (n,)).tolist() for n in (5, 12, 3)
    ]
    max_new = 6

    # reference: contiguous-cache generate, one prompt at a time
    expected = []
    for p in prompts:
        out = generate(
            model, params, jnp.asarray([p], jnp.int32), max_new_tokens=max_new
        )
        expected.append(np.asarray(out)[0, len(p):].tolist())

    engine = LLMEngine(
        model, params, page_size=16, num_pages=64, max_seqs=4,
        max_pages_per_seq=8,
    )
    reqs = [
        Request(i, p, max_new_tokens=max_new) for i, p in enumerate(prompts)
    ]
    done = engine.run(reqs)
    assert len(done) == 3
    for r in sorted(done, key=lambda r: r.request_id):
        assert r.output_tokens == expected[r.request_id], (
            f"req {r.request_id}: {r.output_tokens} != {expected[r.request_id]}"
        )


def test_engine_preemption_under_page_pressure():
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    # tiny pool: forces staggered admission and possibly preemption
    engine = LLMEngine(
        model, params, page_size=16, num_pages=8, max_seqs=4,
        max_pages_per_seq=4,
    )
    reqs = [
        Request(i, rng.integers(0, 128, (10,)).tolist(), max_new_tokens=8)
        for i in range(4)
    ]
    done = engine.run(reqs)
    assert len(done) == 4
    assert all(len(r.output_tokens) == 8 for r in done)
