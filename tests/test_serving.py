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
    # growth past the per-seq page cap: unrecoverable error code
    assert pa.extend(s1, 16 * 4) == -2
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


def test_allocator_extend_error_codes_and_shrink():
    pa = PageAllocator(6, 2, 4, 4)
    s0 = pa.alloc_seq()
    assert pa.extend(s0, 15) == 15  # 4 pages = per-seq cap
    assert pa.extend(s0, 2) == -2  # cap exceeded: unrecoverable code
    assert pa.extend(s0, 1) == 16  # still fits the last page
    s1 = pa.alloc_seq()
    assert pa.extend(s1, 13) == -1  # needs 4 pages, pool has 2: OOM code
    assert pa.seq_length(s1) == 0  # unchanged on failure
    assert pa.shrink(s0, 9) == 7  # 16 -> 7 tokens, 4 -> 2 pages
    assert pa.num_free_pages() == 4
    assert pa.extend(s1, 13) == 13
    assert pa.shrink(s1, 100) == 0  # clamped at zero, all pages returned
    assert pa.num_free_pages() == 4


def test_engine_mid_tick_preemption_keeps_tokens_exact():
    """Forces extend() to fail mid-tick AFTER other slots already grew: the
    survivors must not be double-extended (that desyncs allocator lengths
    from cache contents and silently corrupts every later token)."""
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(2))
    rng = np.random.default_rng(7)
    # page_size 4; prompts of 8/8/7 tokens -> 6 pages at admission with 7 in
    # the pool. First decode tick: slot0 (len 8) takes the last free page,
    # slot1 (len 8) hits pool OOM with slot0 already grown -> preempt slot2.
    prompts = [
        rng.integers(0, CFG.vocab_size, (n,)).tolist() for n in (8, 8, 7)
    ]
    max_new = 6
    expected = []
    for p in prompts:
        out = generate(
            model, params, jnp.asarray([p], jnp.int32), max_new_tokens=max_new
        )
        expected.append(np.asarray(out)[0, len(p):].tolist())

    engine = LLMEngine(
        model, params, page_size=4, num_pages=7, max_seqs=3,
        max_pages_per_seq=8,
    )
    done = engine.run(
        [Request(i, p, max_new_tokens=max_new) for i, p in enumerate(prompts)]
    )
    assert len(done) == 3
    for r in sorted(done, key=lambda r: r.request_id):
        assert r.error is None
        assert r.output_tokens == expected[r.request_id], (
            f"req {r.request_id}: {r.output_tokens} != {expected[r.request_id]}"
        )


def test_engine_finishes_requests_that_complete_during_admission():
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(3))
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, CFG.vocab_size, (5,)).tolist() for _ in range(2)]
    engine = LLMEngine(model, params, page_size=16, num_pages=32, max_seqs=2)
    # max_new_tokens=1: the single output token comes from the prefill logits,
    # so the request finishes inside _admit_one() and must still be returned
    done = engine.run([Request(i, p, max_new_tokens=1) for i, p in enumerate(prompts)])
    assert sorted(r.request_id for r in done) == [0, 1]
    assert all(len(r.output_tokens) == 1 and r.finished for r in done)


def test_engine_caps_and_rejections_do_not_livelock():
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(4))
    rng = np.random.default_rng(4)
    engine = LLMEngine(
        model, params, page_size=4, num_pages=32, max_seqs=2,
        max_pages_per_seq=2,  # 8-token cap per sequence
    )
    ok_prompt = rng.integers(0, CFG.vocab_size, (4,)).tolist()
    big_prompt = rng.integers(0, CFG.vocab_size, (20,)).tolist()
    done = engine.run(
        [
            Request(0, ok_prompt, max_new_tokens=16),  # wants past the cap
            Request(1, big_prompt, max_new_tokens=4),  # can never be admitted
        ]
    )
    by_id = {r.request_id: r for r in done}
    assert len(done) == 2
    # req 0: 4-token prompt, cap 8 -> decode grows 4..8 then -2: truncated
    # with the prefill token + 4 decode tokens generated
    assert by_id[0].error == "truncated"
    assert len(by_id[0].output_tokens) == 5
    assert by_id[1].error == "rejected"
    assert by_id[1].output_tokens == []


def test_engine_tensor_parallel_matches_serial():
    """Continuous batching under a model-parallel mesh (ParallelMHA paged
    inference + sharded page pools) must reproduce the single-chip engine
    exactly (greedy decode)."""
    from jax.sharding import Mesh
    from vllm_flash_attn_tpu.models.gpt_parallel import ParallelGPTLMHeadModel

    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(5))
    rng = np.random.default_rng(5)
    prompts = [
        rng.integers(0, CFG.vocab_size, (n,)).tolist() for n in (7, 18, 3)
    ]
    max_new = 5

    serial = LLMEngine(
        model, params, page_size=16, num_pages=64, max_seqs=4,
        max_pages_per_seq=8,
    )
    done_serial = serial.run(
        [Request(i, p, max_new_tokens=max_new) for i, p in enumerate(prompts)]
    )
    expected = {
        r.request_id: r.output_tokens
        for r in done_serial
    }

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("model",))
    pmodel = ParallelGPTLMHeadModel(CFG)
    engine = LLMEngine(
        pmodel, params, page_size=16, num_pages=64, max_seqs=4,
        max_pages_per_seq=8, mesh=mesh,
    )
    done = engine.run(
        [Request(i, p, max_new_tokens=max_new) for i, p in enumerate(prompts)]
    )
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


def test_engine_quantized_cache_runs():
    """Continuous batching with an int8 KV cache (quantize-on-append +
    in-flight dequant through the whole engine path)."""
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(8))
    rng = np.random.default_rng(8)
    prompts = [rng.integers(0, CFG.vocab_size, (n,)).tolist() for n in (6, 20)]
    engine = LLMEngine(
        model, params, page_size=16, num_pages=64, max_seqs=2,
        max_pages_per_seq=8, cache_dtype="int8",
    )
    done = engine.run(
        [Request(i, p, max_new_tokens=5) for i, p in enumerate(prompts)]
    )
    assert len(done) == 2
    assert all(len(r.output_tokens) == 5 and r.error is None for r in done)
    # int8 quantization error is small: outputs match the bf16-cache engine
    ref = LLMEngine(
        model, params, page_size=16, num_pages=64, max_seqs=2,
        max_pages_per_seq=8,
    ).run([Request(i, p, max_new_tokens=5) for i, p in enumerate(prompts)])
    same = sum(
        a.output_tokens == b.output_tokens
        for a, b in zip(
            sorted(done, key=lambda r: r.request_id),
            sorted(ref, key=lambda r: r.request_id),
        )
    )
    assert same >= 1  # greedy argmax can flip on near-ties; most match


def test_engine_quantized_mqa_cache_runs():
    """MQA (n_head_kv=1, the falcon-7B shape class) with an int8 cache:
    exercises the round-4 padded pool layout — kv heads block-replicated to
    the 4-sublane tile, k+v scales packed into one per-page tile, q heads
    lane-assigned by the static permutation."""
    cfg = GPTConfig(
        vocab_size=128, n_positions=0, n_embd=64, n_layer=2, n_head=4,
        n_head_kv=1, rotary_emb_dim=16, gated_mlp=True, rms_norm=True,
        qkv_proj_bias=False, out_proj_bias=False, mlp_fc1_bias=False,
        mlp_fc2_bias=False, activation_function="silu", n_inner=128,
    )
    model = GPTLMHeadModel(cfg)
    params = model.init(jax.random.PRNGKey(9))
    rng = np.random.default_rng(9)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).tolist() for n in (6, 20)]
    reqs = lambda: [Request(i, p, max_new_tokens=5) for i, p in enumerate(prompts)]  # noqa: E731
    done = LLMEngine(
        model, params, page_size=16, num_pages=64, max_seqs=2,
        max_pages_per_seq=8, cache_dtype="int8",
    ).run(reqs())
    assert all(len(r.output_tokens) == 5 and r.error is None for r in done)
    ref = LLMEngine(
        model, params, page_size=16, num_pages=64, max_seqs=2,
        max_pages_per_seq=8,
    ).run(reqs())
    same = sum(
        a.output_tokens == b.output_tokens
        for a, b in zip(
            sorted(done, key=lambda r: r.request_id),
            sorted(ref, key=lambda r: r.request_id),
        )
    )
    assert same >= 1  # greedy argmax can flip on near-ties; most match


def test_engine_batched_admission_single_device_call():
    """4 pending prompts admit in ONE prefill device call (batched admission)
    and the outputs still match per-prompt greedy generate."""
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(9))
    rng = np.random.default_rng(9)
    prompts = [
        rng.integers(0, CFG.vocab_size, (n,)).tolist() for n in (5, 9, 12, 7)
    ]
    max_new = 4
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
    calls = {"n": 0}
    orig_build = engine._build_prefill

    def counting_build(padded):
        fn = orig_build(padded)

        def wrapped(*a, **k):
            calls["n"] += 1
            return fn(*a, **k)

        return wrapped

    engine._build_prefill = counting_build
    done = engine.run(
        [Request(i, p, max_new_tokens=max_new) for i, p in enumerate(prompts)]
    )
    assert calls["n"] == 1, f"expected 1 batched prefill call, got {calls['n']}"
    assert len(done) == 4
    for r in sorted(done, key=lambda r: r.request_id):
        assert r.output_tokens == expected[r.request_id]


def test_engine_sampling_seeded_determinism():
    """temperature/top_k sampling: same seed -> identical outputs across two
    engine runs; different seed -> (almost surely) different outputs."""
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(10))
    rng = np.random.default_rng(10)
    prompt = rng.integers(0, CFG.vocab_size, (8,)).tolist()

    def run(seed):
        engine = LLMEngine(
            model, params, page_size=16, num_pages=64, max_seqs=2,
            max_pages_per_seq=8,
        )
        (r,) = engine.run(
            [Request(0, prompt, max_new_tokens=12, temperature=0.8,
                     top_k=20, seed=seed)]
        )
        return r.output_tokens

    a, b = run(123), run(123)
    assert a == b, (a, b)
    c = run(321)
    assert c != a, "different seeds produced identical 12-token samples"
    # greedy path unaffected by seed
    engine = LLMEngine(
        model, params, page_size=16, num_pages=64, max_seqs=2,
        max_pages_per_seq=8,
    )
    (g,) = engine.run([Request(0, prompt, max_new_tokens=6)])
    out = generate(
        model, params, jnp.asarray([prompt], jnp.int32), max_new_tokens=6
    )
    assert g.output_tokens == np.asarray(out)[0, len(prompt):].tolist()


def test_engine_chunked_prefill_matches():
    """prefill_chunk: long prompts prefill chunk-by-chunk across ticks
    (interleaved with decode of running sequences) and produce exactly the
    same outputs as the monolithic-prefill engine."""
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(11))
    rng = np.random.default_rng(11)
    prompts = [
        rng.integers(0, CFG.vocab_size, (n,)).tolist() for n in (37, 5, 23)
    ]
    max_new = 4
    ref = LLMEngine(
        model, params, page_size=16, num_pages=64, max_seqs=4,
        max_pages_per_seq=8,
    ).run([Request(i, p, max_new_tokens=max_new) for i, p in enumerate(prompts)])

    engine = LLMEngine(
        model, params, page_size=16, num_pages=64, max_seqs=4,
        max_pages_per_seq=8, prefill_chunk=8,
    )
    for i, p in enumerate(prompts):
        engine.add_request(Request(i, p, max_new_tokens=max_new))
    # tick manually; the short prompts must start decoding while the long
    # prompts are still mid-prefill
    saw_interleave = False
    done = []
    for _ in range(64):
        done.extend(engine.step())
        if engine.prefilling and engine.active:
            saw_interleave = True
        if not (engine.pending or engine.active or engine.prefilling):
            break
    assert saw_interleave, "chunked prefill never overlapped with decode"
    assert len(done) == 3
    for r, e in zip(
        sorted(done, key=lambda r: r.request_id),
        sorted(ref, key=lambda r: r.request_id),
    ):
        assert r.output_tokens == e.output_tokens, (
            r.request_id, r.output_tokens, e.output_tokens
        )


def test_engine_device_argmax_routing():
    """Device-side greedy argmax readback (round-5: full-row readback costs
    ~12 ms/tick on the relay on top of a ~32 ms round trip; a lax.top_k
    variant was measured and rejected at +20 ms device sort): greedy outputs
    must be bit-identical to the full-row program, and any sampling request
    routes the whole tick back to full rows."""
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(11))
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, CFG.vocab_size, (n,)).tolist() for n in (6, 13)]

    def run(device_argmax, temperature=0.0, top_k=0):
        engine = LLMEngine(
            model, params, page_size=16, num_pages=64, max_seqs=2,
            max_pages_per_seq=8,
        )
        engine.device_argmax = device_argmax
        done = engine.run([
            Request(i, p, max_new_tokens=8, temperature=temperature,
                    top_k=top_k, seed=7)
            for i, p in enumerate(prompts)
        ])
        outs = {r.request_id: r.output_tokens for r in done}
        return outs, set(engine._decode_fns.keys())

    g_full, v_full = run(False)
    g_amax, v_amax = run(True)
    assert g_full == g_amax, (g_full, g_amax)
    assert v_full == {False} and v_amax == {True}
    # sampling requests force the full-row program even with argmax enabled
    s1, v1 = run(True, temperature=0.9, top_k=16)
    s2, _ = run(True, temperature=0.9, top_k=16)
    assert s1 == s2 and v1 == {False}
    assert all(len(t) == 8 for t in s1.values())


@pytest.mark.parametrize("k", [1, 3])
def test_engine_speculative_matches_greedy(k):
    """Draft-model speculative decoding must produce BIT-IDENTICAL token
    streams to plain greedy decoding — with a perfect draft (same weights:
    every proposal accepted, commits k+1 tokens per tick) AND a bad draft
    (different weights: frequent rejection exercises the allocator-shrink
    rollback of both caches)."""
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(0))
    bad_draft_params = model.init(jax.random.PRNGKey(99))
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, CFG.vocab_size, (n,)).tolist()
               for n in (5, 12, 23)]

    def run(**kw):
        engine = LLMEngine(
            model, params, page_size=16, num_pages=96, max_seqs=4,
            max_pages_per_seq=8, **kw,
        )
        done = engine.run([
            Request(i, p, max_new_tokens=11 + i)
            for i, p in enumerate(prompts)
        ])
        return {r.request_id: r.output_tokens for r in done}

    base = run()
    perfect = run(draft_model=model, draft_params=params, speculate_k=k)
    assert perfect == base, (k, "perfect draft", perfect, base)
    bad = run(draft_model=model, draft_params=bad_draft_params, speculate_k=k)
    assert bad == base, (k, "bad draft", bad, base)


def test_engine_speculative_rejects_sampling():
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(0))
    engine = LLMEngine(
        model, params, page_size=16, num_pages=64, max_seqs=2,
        max_pages_per_seq=8, draft_model=model, draft_params=params,
        speculate_k=2,
    )
    with pytest.raises(NotImplementedError):
        engine.add_request(Request(0, [1, 2, 3], temperature=0.8, top_k=5))


def test_engine_prefix_cache_matches_and_hits():
    """Automatic prefix caching: outputs are identical to the plain engine,
    shared full prompt pages are adopted (allocator refcounts) instead of
    re-prefilled, and resubmitted prompts hit the cache."""
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    shared = rng.integers(0, CFG.vocab_size, (40,)).tolist()  # 2 full pages
    prompts = [
        shared + rng.integers(0, CFG.vocab_size, (7,)).tolist(),
        shared + rng.integers(0, CFG.vocab_size, (3,)).tolist(),
        rng.integers(0, CFG.vocab_size, (21,)).tolist(),  # unrelated
    ]

    def run(**kw):
        eng = LLMEngine(model, params, page_size=16, num_pages=96,
                        max_seqs=2, max_pages_per_seq=8, **kw)
        done = eng.run([Request(i, p, max_new_tokens=9)
                        for i, p in enumerate(prompts)])
        # resubmission: an identical prompt later must hit its own pages
        done += eng.run([Request(9, prompts[0], max_new_tokens=9)])
        return {r.request_id: r.output_tokens for r in done}, eng

    base, _ = run()
    cached, eng = run(prefix_cache=True)
    assert cached == base, (cached, base)
    # the resubmission of prompts[0] re-hits its full 2-page prefix
    # (requests admitted in the SAME wave register only after their joint
    # prefill, so intra-wave sharing is not deduped — a known non-goal)
    assert eng.prefix_hits == 2, eng.prefix_hits
    assert len(eng._prefix_cache) > 0
    # all pins released cleanly on teardown: evict everything and check the
    # pool is whole again (every sequence has finished)
    eng._evict_prefix_lru(96)
    assert eng.allocator.num_free_pages() == 96


def test_engine_prefix_cache_eviction_pressure():
    """A pool too small to keep every cached prefix forces LRU eviction
    (instead of preemption); outputs must stay identical to plain greedy."""
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(6)
    prompts = [rng.integers(0, CFG.vocab_size, (33 + 5 * i,)).tolist()
               for i in range(6)]

    def run(**kw):
        eng = LLMEngine(model, params, page_size=16, num_pages=14,
                        max_seqs=2, max_pages_per_seq=6, **kw)
        done = eng.run([Request(i, p, max_new_tokens=7)
                        for i, p in enumerate(prompts)])
        return {r.request_id: r.output_tokens for r in done}

    base = run()
    cached = run(prefix_cache=True)
    assert cached == base, (cached, base)


def test_engine_prefix_cache_with_speculative():
    """Prefix caching composes with speculative decoding: the draft's pools
    share the page ids, so adopted prefixes carry valid draft K/V too."""
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    shared = rng.integers(0, CFG.vocab_size, (32,)).tolist()
    prompts = [shared + rng.integers(0, CFG.vocab_size, (n,)).tolist()
               for n in (4, 9)]

    def run(**kw):
        eng = LLMEngine(model, params, page_size=16, num_pages=96,
                        max_seqs=2, max_pages_per_seq=8, **kw)
        done = eng.run([Request(i, p, max_new_tokens=10)
                        for i, p in enumerate(prompts)])
        return {r.request_id: r.output_tokens for r in done}

    base = run()
    both = run(prefix_cache=True, draft_model=model, draft_params=params,
               speculate_k=2)
    assert both == base, (both, base)


@pytest.mark.parametrize("force_python", [False, True], ids=["cpp", "python"])
def test_page_allocator_prefix_refcounts(force_python):
    """adopt/ref_page/unref_page semantics (prefix caching): shared pages
    survive their donor, cache pins gate the free list, and error paths
    leave state unchanged."""
    pa = PageAllocator(8, 4, 4, 4, force_python=force_python)
    s0 = pa.alloc_seq()
    assert pa.extend(s0, 9) == 9  # 3 pages
    t, _ = pa.gather([s0])
    pages = [int(p) for p in t[0][:3]]
    assert all(pa.page_refcount(p) == 1 for p in pages)
    # cache pins the first two
    assert pa.ref_page(pages[0]) == 2 and pa.ref_page(pages[1]) == 2
    # a fresh slot adopts them
    s1 = pa.alloc_seq()
    assert pa.adopt(s1, pages[:2], 8) == 8
    assert pa.page_refcount(pages[0]) == 3
    assert pa.extend(s1, 3) == 11  # fresh page for the suffix
    # error paths: adopt on a non-empty slot / bad page id
    assert pa.adopt(s1, pages[:1], 4) == -2
    assert pa.ref_page(7) == -2 or pa.page_refcount(7) in (0, -2)
    free0 = pa.num_free_pages()
    pa.free_seq(s0)  # only its unshared 3rd page frees
    assert pa.num_free_pages() == free0 + 1
    pa.free_seq(s1)
    assert pa.page_refcount(pages[0]) == 1  # cache pin remains
    assert pa.unref_page(pages[0]) == 0
    assert pa.unref_page(pages[1]) == 0
    assert pa.num_free_pages() == 8
    # shrink decrements shared refcounts without freeing shared pages
    s2 = pa.alloc_seq()
    assert pa.extend(s2, 16) == 16
    t2, _ = pa.gather([s2])
    p0 = int(t2[0][0])
    assert pa.ref_page(p0) == 2
    assert pa.shrink(s2, 16) == 0
    assert pa.page_refcount(p0) == 1  # pinned, not freed
    assert pa.unref_page(p0) == 0
