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

import jax  # noqa: E402
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


def test_baichuan_7b_style():
    """Baichuan-7B is llama with a fused W_pack: rename a real HF llama's
    weights into the baichuan layout and demand logits parity with the HF
    llama forward (a true oracle without trust_remote_code checkpoints)."""
    import types

    from vllm_flash_attn_tpu.models.hf_convert import config_from_hf, REMAPPERS

    cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    torch.manual_seed(13)
    hf = transformers.LlamaForCausalLM(cfg).eval().float()
    sd = hf.state_dict()
    bsd = {}
    for name, t in sd.items():
        bsd[name] = t
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}.self_attn."
        bsd[pre + "W_pack.weight"] = torch.cat(
            [sd[pre + "q_proj.weight"], sd[pre + "k_proj.weight"],
             sd[pre + "v_proj.weight"]]
        )
        for k in ("q_proj", "k_proj", "v_proj"):
            del bsd[pre + k + ".weight"]
    bcfg = types.SimpleNamespace(
        model_type="baichuan", vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size, rms_norm_eps=cfg.rms_norm_eps,
    )
    config = config_from_hf(bcfg)
    params = REMAPPERS["baichuan"](bsd, config)
    ids = _ids(96, seed=13)
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits.numpy()
    logits = np.asarray(
        GPTLMHeadModel(config).apply(params, jnp.asarray(ids, jnp.int32))
    )[:, :, : config.vocab_size]
    np.testing.assert_allclose(logits, hf_logits, atol=5e-3, rtol=5e-3)


def test_baichuan_13b_style_alibi_runs():
    """13B variant: ALiBi instead of rotary. No offline oracle exists
    (trust_remote_code), so validate the conversion structurally: the config
    maps to alibi+no-rotary and the converted model produces finite logits
    that DEPEND on position (alibi active)."""
    import types

    from vllm_flash_attn_tpu.models.hf_convert import config_from_hf, REMAPPERS

    bcfg = types.SimpleNamespace(
        model_type="baichuan", vocab_size=96, hidden_size=5120,
        num_hidden_layers=0, num_attention_heads=40, intermediate_size=128,
        rms_norm_eps=1e-6,
    )
    config = config_from_hf(bcfg)
    assert config.use_alibi and config.rotary_emb_dim == 0

    import dataclasses as dc

    bcfg.hidden_size, bcfg.num_attention_heads = 64, 4
    bcfg.num_hidden_layers = 2
    config = config_from_hf(bcfg)
    config = dc.replace(config, use_alibi=True, rotary_emb_dim=0)  # 13B mode
    model = GPTLMHeadModel(config)
    params = model.init(jax.random.PRNGKey(14))
    ids = jnp.asarray(_ids(96, seed=14), jnp.int32)
    logits = np.asarray(model.apply(params, ids))
    assert np.all(np.isfinite(logits))
    # same params without alibi must give different logits (alibi is active)
    plain = GPTLMHeadModel(dc.replace(config, use_alibi=False))
    logits_plain = np.asarray(plain.apply(params, ids))
    assert not np.allclose(logits, logits_plain, atol=1e-4)


def test_btlm_structural():
    """BTLM (cerebras): gpt2 skeleton + SwiGLU + ALiBi + muP scaling. No
    offline oracle (trust_remote_code); validate the converter against a
    synthetic BTLM-layout state dict (Conv1D transposes, split swiglu)."""
    import types

    from vllm_flash_attn_tpu.models.hf_convert import config_from_hf, REMAPPERS

    rng = np.random.default_rng(15)
    D, L, inner, vocab = 64, 2, 112, 96
    bcfg = types.SimpleNamespace(
        model_type="btlm", vocab_size=vocab, hidden_size=D,
        num_hidden_layers=L, num_attention_heads=4, n_inner=inner,
        layer_norm_epsilon=1e-5, mup_width_scale=0.5, mup_output_alpha=2.0,
        mup_embeddings_scale=3.0, mup_scale_qk_dot_by_d=True,
    )
    config = config_from_hf(bcfg)
    assert config.use_alibi and config.gated_mlp
    assert config.logits_scale == 1.0 and config.embeddings_scale == 3.0
    assert config.attn_softmax_scale == 1.0 / (D // 4)

    def t(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    sd = {"transformer.wte.weight": t(vocab, D),
          "transformer.ln_f.weight": np.ones(D, np.float32),
          "transformer.ln_f.bias": np.zeros(D, np.float32)}
    for i in range(L):
        pre = f"transformer.h.{i}."
        sd[pre + "attn.c_attn.weight"] = t(D, 3 * D)  # Conv1D (in, out)
        sd[pre + "attn.c_attn.bias"] = t(3 * D)
        sd[pre + "attn.c_proj.weight"] = t(D, D)
        sd[pre + "attn.c_proj.bias"] = t(D)
        sd[pre + "mlp.c_fc.weight"] = t(D, inner)
        sd[pre + "mlp.c_fc.bias"] = t(inner)
        sd[pre + "mlp.c_fc2.weight"] = t(D, inner)
        sd[pre + "mlp.c_fc2.bias"] = t(inner)
        sd[pre + "mlp.c_proj.weight"] = t(inner, D)
        sd[pre + "mlp.c_proj.bias"] = t(D)
        sd[pre + "ln_1.weight"] = np.ones(D, np.float32)
        sd[pre + "ln_1.bias"] = np.zeros(D, np.float32)
        sd[pre + "ln_2.weight"] = np.ones(D, np.float32)
        sd[pre + "ln_2.bias"] = np.zeros(D, np.float32)
    params = REMAPPERS["btlm"](sd, config)
    model = GPTLMHeadModel(config)
    logits = np.asarray(
        model.apply(params, jnp.asarray(_ids(vocab, seed=15), jnp.int32))
    )
    assert np.all(np.isfinite(logits))
    # swiglu weight halves landed in the right fc1 slots
    fc1 = np.asarray(params["layers"][0]["mlp"]["fc1"]["weight"])
    np.testing.assert_allclose(
        fc1[:inner], sd["transformer.h.0.mlp.c_fc.weight"].T, atol=1e-6
    )
    np.testing.assert_allclose(
        fc1[inner:], sd["transformer.h.0.mlp.c_fc2.weight"].T, atol=1e-6
    )


def test_vit_model():
    from vllm_flash_attn_tpu.models.vit import (
        ViTModel,
        config_from_hf_vit,
        remap_state_dict_hf_vit,
    )

    cfg = transformers.ViTConfig(
        image_size=32, patch_size=8, num_channels=3, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=128,
        hidden_act="gelu",
    )
    torch.manual_seed(11)
    hf = transformers.ViTModel(cfg, add_pooling_layer=False).eval().float()
    pixels = np.random.default_rng(11).standard_normal((2, 3, 32, 32)).astype(
        np.float32
    )
    with torch.no_grad():
        hf_out = hf(torch.tensor(pixels)).last_hidden_state.numpy()
    config = config_from_hf_vit(hf.config)
    params = remap_state_dict_hf_vit(hf.state_dict(), config)
    out = np.asarray(ViTModel(config).apply(params, jnp.asarray(pixels)))
    np.testing.assert_allclose(out, hf_out, atol=5e-3, rtol=5e-3)


def test_vit_classifier():
    from vllm_flash_attn_tpu.models.vit import (
        ViTModel,
        config_from_hf_vit,
        remap_state_dict_hf_vit,
    )

    cfg = transformers.ViTConfig(
        image_size=32, patch_size=8, num_channels=3, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=128,
        num_labels=10,
    )
    torch.manual_seed(12)
    hf = transformers.ViTForImageClassification(cfg).eval().float()
    pixels = np.random.default_rng(12).standard_normal((2, 3, 32, 32)).astype(
        np.float32
    )
    with torch.no_grad():
        hf_logits = hf(torch.tensor(pixels)).logits.numpy()
    config = config_from_hf_vit(hf.config)
    params = remap_state_dict_hf_vit(hf.state_dict(), config)
    _, logits = ViTModel(config).apply(params, jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=5e-3, rtol=5e-3)


def test_bigcode_mha():
    cfg = transformers.GPTBigCodeConfig(
        vocab_size=96, n_positions=64, n_embd=64, n_layer=2, n_head=4,
        multi_query=False, activation_function="gelu_pytorch_tanh",
    )
    torch.manual_seed(10)
    model = transformers.GPTBigCodeForCausalLM(cfg)
    check_logits_match(model, _ids(96, seed=10), atol=1e-2, rtol=1e-2)


def test_state_dict_from_pretrained_dir(tmp_path):
    """Local-directory checkpoint loading (state_dict_from_pretrained analog):
    save an HF gpt2 to disk (safetensors), reload WITHOUT torch-model
    instantiation, remap, and demand logits parity."""
    from vllm_flash_attn_tpu.utils.pretrained import (
        from_pretrained_dir,
        state_dict_from_pretrained,
    )

    cfg = transformers.GPT2Config(
        vocab_size=96, n_positions=64, n_embd=48, n_layer=2, n_head=4
    )
    torch.manual_seed(21)
    hf = transformers.GPT2LMHeadModel(cfg).eval().float()
    hf.save_pretrained(tmp_path)

    sd = state_dict_from_pretrained(str(tmp_path))
    ref_sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    missing = []
    for k, v in ref_sd.items():
        if k in sd:
            np.testing.assert_array_equal(sd[k], v)
        else:
            missing.append(k)
    # save_pretrained drops tied weights; nothing else may be missing
    assert missing in ([], ["lm_head.weight"]), missing

    config, params = from_pretrained_dir(str(tmp_path))
    ids = _ids(96, seed=21)
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits.numpy()
    logits = np.asarray(
        GPTLMHeadModel(config).apply(params, jnp.asarray(ids, jnp.int32))
    )[:, :, : config.vocab_size]
    np.testing.assert_allclose(logits, hf_logits, atol=5e-3, rtol=5e-3)
