"""Rotary embedding tests, mirroring /root/reference/tests/test_rotary.py:
interleaved (GPT-J) vs non-interleaved (GPT-NeoX) styles vs an independent
reference implementation, positional offsets, conj inverse, partial rotary.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_flash_attn_tpu.layers.rotary import RotaryEmbedding, apply_rotary_emb


def ref_rotate_neox(x, cos, sin, positions):
    """Independent numpy reference: half-rotation."""
    x = np.asarray(x, np.float64)
    r2 = cos.shape[-1]
    out = x.copy()
    for bi in range(x.shape[0]):
        for t in range(x.shape[1]):
            c = cos[positions[bi, t]]
            s = sin[positions[bi, t]]
            x1 = x[bi, t, :, :r2]
            x2 = x[bi, t, :, r2 : 2 * r2]
            out[bi, t, :, :r2] = x1 * c - x2 * s
            out[bi, t, :, r2 : 2 * r2] = x2 * c + x1 * s
    return out


def ref_rotate_interleaved(x, cos, sin, positions):
    x = np.asarray(x, np.float64)
    r2 = cos.shape[-1]
    out = x.copy()
    for bi in range(x.shape[0]):
        for t in range(x.shape[1]):
            c = cos[positions[bi, t]]
            s = sin[positions[bi, t]]
            for j in range(r2):
                x1 = x[bi, t, :, 2 * j]
                x2 = x[bi, t, :, 2 * j + 1]
                out[bi, t, :, 2 * j] = x1 * c[j] - x2 * s[j]
                out[bi, t, :, 2 * j + 1] = x2 * c[j] + x1 * s[j]
    return out


@pytest.mark.parametrize("interleaved", [False, True], ids=["neox", "gptj"])
@pytest.mark.parametrize("rotary_dim,d", [(32, 32), (16, 32)])
def test_rotary_vs_reference(interleaved, rotary_dim, d):
    rng = np.random.default_rng(0)
    b, s, h = 2, 24, 4
    x = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    rot = RotaryEmbedding(rotary_dim, interleaved=interleaved)
    cos, sin = rot.tables(64)
    out = apply_rotary_emb(x, cos, sin, interleaved=interleaved)
    positions = np.tile(np.arange(s), (b, 1))
    ref_fn = ref_rotate_interleaved if interleaved else ref_rotate_neox
    ref = np.asarray(x, np.float64)
    ref[:, :, :, :rotary_dim] = ref_fn(
        np.asarray(x)[..., :rotary_dim], np.asarray(cos), np.asarray(sin), positions
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_rotary_offset_positions():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 2, 16)), jnp.float32)
    rot = RotaryEmbedding(16)
    cos, sin = rot.tables(64)
    offs = jnp.asarray([5, 11], jnp.int32)
    out = apply_rotary_emb(x, cos, sin, positions=offs)
    positions = np.stack([np.arange(4) + 5, np.arange(4) + 11])
    ref = ref_rotate_neox(np.asarray(x), np.asarray(cos), np.asarray(sin), positions)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_rotary_conj_is_inverse():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 2, 32)), jnp.float32)
    rot = RotaryEmbedding(32)
    cos, sin = rot.tables(8)
    y = apply_rotary_emb(x, cos, sin)
    back = apply_rotary_emb(y, cos, sin, conj=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_rotary_qkv_wrapper():
    rng = np.random.default_rng(3)
    qkv = jnp.asarray(rng.standard_normal((2, 8, 3, 2, 16)), jnp.float32)
    rot = RotaryEmbedding(16)
    out = rot(qkv)
    # v untouched, q/k rotated
    np.testing.assert_array_equal(np.asarray(out[:, :, 2]), np.asarray(qkv[:, :, 2]))
    assert not np.allclose(np.asarray(out[:, :, 0]), np.asarray(qkv[:, :, 0]))
