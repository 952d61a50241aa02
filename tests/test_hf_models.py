"""Model-family integration tests against HuggingFace implementations.

The reference loads real HF checkpoints (tests/models/test_llama.py etc.);
this environment has no network, so we instead instantiate tiny RANDOM HF
models locally (torch CPU), remap their weights, and demand logits parity —
the same oracle relationship, checkpoint download replaced by random init.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from vllm_flash_attn_tpu.models.gpt import GPTLMHeadModel  # noqa: E402
from vllm_flash_attn_tpu.models.hf_convert import from_hf  # noqa: E402


def check_logits_match(hf_model, ids, atol=5e-3, rtol=5e-3):
    hf_model = hf_model.eval().float()
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids)).logits.numpy()
    config, params = from_hf(hf_model)
    model = GPTLMHeadModel(config)
    logits = np.asarray(
        model.apply(params, jnp.asarray(ids, jnp.int32))
    )[:, :, : config.vocab_size]
    np.testing.assert_allclose(logits, hf_logits, atol=atol, rtol=rtol)


def _ids(vocab, b=2, s=24, seed=0):
    return np.random.default_rng(seed).integers(0, vocab, (b, s))


def test_gpt2():
    cfg = transformers.GPT2Config(
        vocab_size=96, n_positions=64, n_embd=48, n_layer=2, n_head=4
    )
    torch.manual_seed(0)
    model = transformers.GPT2LMHeadModel(cfg)
    check_logits_match(model, _ids(96))


def test_llama():
    cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    model = transformers.LlamaForCausalLM(cfg)
    check_logits_match(model, _ids(96, seed=1))


def test_gpt_neox():
    cfg = transformers.GPTNeoXConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.25,
        max_position_embeddings=64, use_parallel_residual=True,
    )
    torch.manual_seed(2)
    model = transformers.GPTNeoXForCausalLM(cfg)
    check_logits_match(model, _ids(96, seed=2))


def test_gpt_neox_sequential():
    cfg = transformers.GPTNeoXConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=1.0,
        max_position_embeddings=64, use_parallel_residual=False,
    )
    torch.manual_seed(3)
    model = transformers.GPTNeoXForCausalLM(cfg)
    check_logits_match(model, _ids(96, seed=3))


def test_opt():
    cfg = transformers.OPTConfig(
        vocab_size=96, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, ffn_dim=96, max_position_embeddings=64,
        do_layer_norm_before=True, word_embed_proj_dim=48,
    )
    torch.manual_seed(4)
    model = transformers.OPTForCausalLM(cfg)
    check_logits_match(model, _ids(96, seed=4))


def test_gptj():
    cfg = transformers.GPTJConfig(
        vocab_size=96, n_embd=64, n_layer=2, n_head=4, rotary_dim=16,
        n_positions=64,
    )
    torch.manual_seed(5)
    model = transformers.GPTJForCausalLM(cfg)
    check_logits_match(model, _ids(96, seed=5), atol=1e-2, rtol=1e-2)
