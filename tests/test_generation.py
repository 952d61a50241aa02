"""Generation utilities: sampling, EOS handling, speculative decoding
(test_gpt.py:391-447 analog: speculative output must equal plain greedy)."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from vllm_flash_attn_tpu.utils.generation import (
    decode_speculative,
    generate,
)

CFG = GPTConfig(
    vocab_size=128, n_positions=0, n_embd=64, n_layer=2, n_head=4,
    n_head_kv=2, rotary_emb_dim=16, gated_mlp=True, rms_norm=True,
    qkv_proj_bias=False, out_proj_bias=False, mlp_fc1_bias=False,
    mlp_fc2_bias=False, activation_function="silu", n_inner=128,
)


def test_speculative_matches_greedy():
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(0))
    draft_cfg = GPTConfig(**{**CFG.__dict__, "n_layer": 1})
    draft = GPTLMHeadModel(draft_cfg)
    draft_params = draft.init(jax.random.PRNGKey(1))
    prompt = jnp.asarray(
        np.random.default_rng(0).integers(0, 128, (1, 8)), jnp.int32
    )
    greedy = generate(model, params, prompt, max_new_tokens=10)
    spec = decode_speculative(
        model, params, draft, draft_params, prompt, max_new_tokens=10,
        speculative_lookahead=3,
    )
    np.testing.assert_array_equal(np.asarray(spec), np.asarray(greedy))


def test_sampling_temperature_topk():
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(2))
    prompt = jnp.asarray(
        np.random.default_rng(1).integers(0, 128, (2, 6)), jnp.int32
    )
    out1 = generate(model, params, prompt, max_new_tokens=5, temperature=1.0,
                    top_k=20, rng=jax.random.PRNGKey(0))
    out2 = generate(model, params, prompt, max_new_tokens=5, temperature=1.0,
                    top_k=20, rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert out1.shape == (2, 11)


def test_eos_stops_generation():
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(3))
    prompt = jnp.asarray(
        np.random.default_rng(2).integers(0, 128, (1, 4)), jnp.int32
    )
    full = generate(model, params, prompt, max_new_tokens=12)
    eos = int(np.asarray(full)[0, 6])  # force an early EOS
    out = generate(model, params, prompt, max_new_tokens=12, eos_token_id=eos)
    gen = np.asarray(out)[0, 4:]
    hits = np.nonzero(gen == eos)[0]
    assert hits.size > 0
    # everything after the first EOS is EOS-padded
    assert np.all(gen[hits[0]:] == eos)
