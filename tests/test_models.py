"""Model-level tests, mirroring the reference integration strategy
(/root/reference/tests/models/test_gpt.py): forward parity against a plain
oracle model, incremental kv-cache generation == full re-forward, TP
shard/merge round trip.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_flash_attn_tpu.core.reference import attention_ref
from vllm_flash_attn_tpu.models.gpt import (
    GPTConfig,
    GPTLMHeadModel,
    combine_state_dicts_tp,
    shard_state_dict_tp,
)
from vllm_flash_attn_tpu.utils.generation import InferenceParams, generate

CFG = GPTConfig(
    vocab_size=128,
    n_positions=128,
    n_embd=64,
    n_layer=2,
    n_head=4,
    rotary_emb_dim=0,
)

LLAMA_CFG = GPTConfig(
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


def oracle_forward(model, params, ids):
    """Same model but with the O(s^2) reference attention in place of kernels."""
    import vllm_flash_attn_tpu.modules.mha as mha_mod

    orig = mha_mod.flash_attn_func

    def ref_attn(q, k, v, causal=False, softmax_scale=None, window_size=(-1, -1),
                 alibi_slopes=None, **kw):
        out, _ = attention_ref(
            q, k, v, causal=causal, softmax_scale=softmax_scale,
            window_size=window_size, alibi_slopes=alibi_slopes, upcast=True,
        )
        return out

    mha_mod.flash_attn_func = ref_attn
    try:
        return model.apply(params, ids)
    finally:
        mha_mod.flash_attn_func = orig


@pytest.mark.parametrize("cfg", [CFG, LLAMA_CFG], ids=["gpt2", "llama"])
def test_forward_matches_oracle(cfg):
    model = GPTLMHeadModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 64)), jnp.int32
    )
    logits = model.apply(params, ids)
    logits_ref = oracle_forward(model, params, ids)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits_ref), atol=2e-3, rtol=2e-3
    )


@pytest.mark.parametrize("cfg", [CFG, LLAMA_CFG], ids=["gpt2", "llama"])
def test_incremental_decode_matches_full_forward(cfg):
    """KV-cache decode must reproduce teacher-forced logits (test_gpt.py:282+)."""
    model = GPTLMHeadModel(cfg)
    params = model.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)
    out = generate(model, params, prompt, max_new_tokens=8)
    assert out.shape == (2, 24)

    # teacher-forced check: feeding the generated sequence reproduces the
    # same greedy choices at each step
    logits_full = model.apply(params, out)
    greedy = jnp.argmax(logits_full[:, :, : cfg.vocab_size], axis=-1)
    for t in range(16 - 1, 24 - 1):
        np.testing.assert_array_equal(
            np.asarray(greedy[:, t]), np.asarray(out[:, t + 1]),
            err_msg=f"mismatch at position {t}",
        )


def test_tp_shard_combine_roundtrip():
    model = GPTLMHeadModel(LLAMA_CFG)
    params = model.init(jax.random.PRNGKey(2))
    shards = [shard_state_dict_tp(model, params, 2, r) for r in range(2)]
    merged = combine_state_dicts_tp(model, shards)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(merged)}
    for k, v in flat_a:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat_b[ks]), err_msg=ks
        )


def test_num_last_tokens():
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(3))
    ids = jnp.asarray(
        np.random.default_rng(2).integers(0, 128, (1, 32)), jnp.int32
    )
    full = model.apply(params, ids)
    last = model.apply(params, ids, num_last_tokens=1)
    np.testing.assert_allclose(
        np.asarray(full[:, -1:]), np.asarray(last), atol=1e-5
    )


def test_embedding_grad_paths_match():
    """The one-hot-matmul embedding gradient (used where XLA's TPU scatter
    degenerates — modules/embedding.py measurement table) must be exact
    against the scatter autodiff, including tied-weight accumulation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vllm_flash_attn_tpu.config import get_config
    from vllm_flash_attn_tpu.modules.embedding import (
        _use_matmul_grad,
        embedding_lookup,
    )

    rng = np.random.default_rng(7)
    tab = jnp.asarray(rng.standard_normal((96, 24)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 96, (3, 11)), jnp.int32)
    g = jnp.asarray(rng.standard_normal((3, 11, 24)), jnp.float32)
    ref = jax.grad(lambda t: (jnp.take(t, ids, axis=0) * g).sum())(tab)
    cfg = get_config()
    old = cfg.embed_grad
    try:
        for mode in ("matmul", "scatter", "auto"):
            cfg.embed_grad = mode
            d = jax.grad(lambda t: (embedding_lookup(t, ids) * g).sum())(tab)
            np.testing.assert_allclose(np.asarray(d), np.asarray(ref),
                                       atol=1e-6, rtol=1e-6)
    finally:
        cfg.embed_grad = old
    # auto heuristic: the measured degenerate widths route to matmul
    assert _use_matmul_grad(32000, 2560)
    assert _use_matmul_grad(32000, 5120)
    assert _use_matmul_grad(32000, 6144)
    assert not _use_matmul_grad(32000, 2048)
    assert not _use_matmul_grad(32000, 4096)
