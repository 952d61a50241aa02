"""BERT encoder vs HF (tests/models/test_bert.py analog; random tiny model
instead of a downloaded checkpoint — zero-egress environment)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from vllm_flash_attn_tpu.models.bert import (  # noqa: E402
    BertModel,
    config_from_hf_bert,
    remap_state_dict_hf_bert,
)


def make_hf():
    cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    return transformers.BertModel(cfg).eval().float()


def test_bert_full_batch_matches_hf():
    hf = make_hf()
    sd = {"bert." + k: v for k, v in hf.state_dict().items()}
    config = config_from_hf_bert(hf.config)
    model = BertModel(config)
    params = remap_state_dict_hf_bert(sd, config)
    ids = np.random.default_rng(0).integers(0, 120, (2, 24))
    with torch.no_grad():
        hf_out = hf(torch.tensor(ids))
    seq, pooled = model.apply(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(seq), hf_out.last_hidden_state.numpy(), atol=5e-3, rtol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(pooled), hf_out.pooler_output.numpy(), atol=5e-3, rtol=5e-3
    )


def test_bert_padded_batch_matches_hf():
    hf = make_hf()
    sd = {"bert." + k: v for k, v in hf.state_dict().items()}
    config = config_from_hf_bert(hf.config)
    model = BertModel(config)
    params = remap_state_dict_hf_bert(sd, config)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 120, (3, 32))
    mask = np.zeros((3, 32), np.int64)
    for i, L in enumerate([10, 32, 21]):
        mask[i, :L] = 1
    with torch.no_grad():
        hf_out = hf(torch.tensor(ids), attention_mask=torch.tensor(mask))
    seq, _ = model.apply(
        params, jnp.asarray(ids, jnp.int32), attention_mask=mask
    )
    for i, L in enumerate([10, 32, 21]):
        np.testing.assert_allclose(
            np.asarray(seq)[i, :L],
            hf_out.last_hidden_state.numpy()[i, :L],
            atol=5e-3, rtol=5e-3, err_msg=f"seq {i}",
        )
