"""Sanity checks for the pure-JAX oracle (vllm_flash_attn_tpu/core/reference.py).

The oracle itself is the ground truth for every kernel test, so here we only check
self-consistency properties: plain softmax equivalence, GQA broadcast, causal
bottom-right alignment, padding-row zeroing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_flash_attn_tpu.core.reference import attention_ref
from vllm_flash_attn_tpu.utils import pad_input, unpad_input


def naive_attention(q, k, v, causal=False):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scores = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(d)
    if causal:
        # bottom-right aligned
        row = jnp.arange(sq)[:, None]
        col = jnp.arange(sk)[None, :]
        scores = jnp.where(col > row + sk - sq, -jnp.inf, scores)
    p = jax.nn.softmax(scores, axis=-1)
    # Rows with no valid keys (sq > sk causal) softmax to NaN; the oracle zeroes them.
    p = jnp.nan_to_num(p, nan=0.0)
    return jnp.einsum("bhts,bshd->bthd", p, v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("sq,sk", [(64, 64), (32, 128), (128, 37)])
def test_matches_naive(causal, sq, sk):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, sq, 4, 32), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((2, sk, 4, 32), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((2, sk, 4, 32), dtype=np.float32))
    out, _ = attention_ref(q, k, v, causal=causal)
    ref = naive_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_gqa_broadcast():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 16, 8, 32), dtype=np.float32))
    k1 = jnp.asarray(rng.standard_normal((1, 16, 2, 32), dtype=np.float32))
    v1 = jnp.asarray(rng.standard_normal((1, 16, 2, 32), dtype=np.float32))
    out_gqa, _ = attention_ref(q, k1, v1)
    out_full, _ = attention_ref(q, jnp.repeat(k1, 4, axis=2), jnp.repeat(v1, 4, axis=2))
    np.testing.assert_allclose(np.asarray(out_gqa), np.asarray(out_full), atol=1e-6)


def test_padding_rows_zeroed():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((2, 8, 2, 16), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((2, 8, 2, 16), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((2, 8, 2, 16), dtype=np.float32))
    qmask = jnp.asarray(np.array([[1, 1, 1, 0, 0, 0, 0, 0], [1] * 8], dtype=bool))
    out, _ = attention_ref(q, k, v, query_padding_mask=qmask)
    assert np.all(np.asarray(out)[0, 3:] == 0.0)


def test_window_equals_causal():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((1, 32, 2, 16), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((1, 32, 2, 16), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((1, 32, 2, 16), dtype=np.float32))
    out_c, _ = attention_ref(q, k, v, causal=True)
    out_w, _ = attention_ref(q, k, v, window_size=(-1, 0))
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_w), atol=1e-6)


def test_pad_unpad_roundtrip():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((3, 16, 4), dtype=np.float32))
    mask = np.zeros((3, 16), dtype=bool)
    for i, L in enumerate([5, 16, 9]):
        mask[i, :L] = True
    packed, indices, cu, mx = unpad_input(x, mask)
    assert packed.shape[0] == 30 and mx == 16
    assert np.array_equal(np.asarray(cu), [0, 5, 21, 30])
    back = pad_input(packed, indices, 3, 16)
    np.testing.assert_array_equal(np.asarray(back) * mask[..., None], np.asarray(back))
    np.testing.assert_allclose(
        np.asarray(back)[mask], np.asarray(x)[mask], atol=0
    )
