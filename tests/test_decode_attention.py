"""Fused decode-step attention kernels vs the einsum path (interpret mode).

The einsum reference is the exact code the model runs without the kernels
(models/whisper.py `_cross_attend` / `_decoder_block` self-attention), so
these tests pin the fusion to the existing, separately-parity-tested math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manual_whisper_tpu.models.whisper import _cross_attend, quantize_cross_kv
from manual_whisper_tpu.ops.decode_attention import (
    decode_cross_attention, decode_cross_attention_int8,
    decode_self_attention)


def _mk(shape, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape).astype(dtype))


def _einsum_self(q, k, v, pos):
    dh = q.shape[-1]
    max_len = k.shape[-1]
    mask = jnp.where(jnp.arange(max_len)[None, :] <= pos,
                     0.0, -jnp.inf).astype(jnp.float32)
    s = jnp.einsum("bhqd,bhdk->bhqk", q, k,
                   preferred_element_type=jnp.float32) * dh ** -0.5 + mask
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhdk->bhqd", p, v)


def test_cross_bf16_matches_einsum():
    b, h, dh, ta = 2, 3, 64, 150          # unaligned Ta exercises padding
    q = _mk((b, h, 1, dh), 0)
    k = _mk((b, h, dh, ta), 1)
    v = _mk((b, h, dh, ta), 2)
    out = decode_cross_attention(q, k, v, interpret=True)
    ref = _cross_attend(q, (k, v), dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_cross_int8_matches_einsum():
    b, h, dh, ta = 2, 2, 64, 200
    q = _mk((b, h, 1, dh), 3)
    k = _mk((b, h, dh, ta), 4)
    v = _mk((b, h, dh, ta), 5)
    k_q, k_s, v_q, v_s = quantize_cross_kv((k, v))
    out = decode_cross_attention_int8(q, k_q, k_s, v_q, v_s, interpret=True)
    ref = _cross_attend(q, (k_q, k_s, v_q, v_s), dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_cross_int8_bf16_query():
    b, h, dh, ta = 1, 2, 64, 256
    q = _mk((b, h, 1, dh), 6).astype(jnp.bfloat16)
    k = _mk((b, h, dh, ta), 7)
    v = _mk((b, h, dh, ta), 8)
    k_q, k_s, v_q, v_s = quantize_cross_kv((k, v))
    out = decode_cross_attention_int8(q, k_q, k_s, v_q, v_s, interpret=True)
    ref = _cross_attend(q, (k_q, k_s, v_q, v_s), dh)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)


@pytest.mark.parametrize("pos", [0, 3, 31])
def test_self_matches_einsum_masked(pos):
    """Cache slots beyond pos hold garbage and must not leak in."""
    b, h, dh, t_max = 2, 2, 64, 32
    q = _mk((b, h, 1, dh), 9)
    k = _mk((b, h, dh, t_max), 10) * 3.0   # large garbage values
    v = _mk((b, h, dh, t_max), 11) * 3.0
    out = decode_self_attention(q, k, v, jnp.int32(pos), interpret=True)
    ref = _einsum_self(q, k, v, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_self_unaligned_cache_len():
    b, h, dh, t_max = 1, 2, 64, 200        # pads to 256 internally
    q = _mk((b, h, 1, dh), 12)
    k = _mk((b, h, dh, t_max), 13)
    v = _mk((b, h, dh, t_max), 14)
    out = decode_self_attention(q, k, v, jnp.int32(150), interpret=True)
    ref = _einsum_self(q, k, v, 150)
    assert out.shape == (b, h, 1, dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
