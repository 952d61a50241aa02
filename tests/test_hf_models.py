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


def test_falcon_7b_style_multiquery():
    # falcon-7b: multi_query, parallel_attn, single input_layernorm
    cfg = transformers.FalconConfig(
        vocab_size=96, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        new_decoder_architecture=False, bias=False, alibi=False,
    )
    torch.manual_seed(6)
    model = transformers.FalconForCausalLM(cfg)
    check_logits_match(model, _ids(96, seed=6), atol=1e-2, rtol=1e-2)


def test_falcon_40b_style_gqa():
    # falcon-40b: new_decoder_architecture GQA, ln_attn + ln_mlp
    cfg = transformers.FalconConfig(
        vocab_size=96, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2, multi_query=False,
        parallel_attn=True, new_decoder_architecture=True, bias=False,
        alibi=False,
    )
    torch.manual_seed(7)
    model = transformers.FalconForCausalLM(cfg)
    check_logits_match(model, _ids(96, seed=7), atol=1e-2, rtol=1e-2)


def test_falcon_rw_sequential_mha():
    # falcon-rw-1b: classic sequential block, per-head interleaved qkv, biases
    cfg = transformers.FalconConfig(
        vocab_size=96, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=False, parallel_attn=False,
        new_decoder_architecture=False, bias=True, alibi=False,
    )
    torch.manual_seed(8)
    model = transformers.FalconForCausalLM(cfg)
    check_logits_match(model, _ids(96, seed=8), atol=1e-2, rtol=1e-2)


def test_bigcode_multiquery():
    # santacoder/starcoder: MQA, learned positions, nn.Linear weights
    cfg = transformers.GPTBigCodeConfig(
        vocab_size=96, n_positions=64, n_embd=64, n_layer=2, n_head=4,
        multi_query=True, activation_function="gelu_pytorch_tanh",
    )
    torch.manual_seed(9)
    model = transformers.GPTBigCodeForCausalLM(cfg)
    check_logits_match(model, _ids(96, seed=9), atol=1e-2, rtol=1e-2)


def test_bigcode_mha():
    cfg = transformers.GPTBigCodeConfig(
        vocab_size=96, n_positions=64, n_embd=64, n_layer=2, n_head=4,
        multi_query=False, activation_function="gelu_pytorch_tanh",
    )
    torch.manual_seed(10)
    model = transformers.GPTBigCodeForCausalLM(cfg)
    check_logits_match(model, _ids(96, seed=10), atol=1e-2, rtol=1e-2)
