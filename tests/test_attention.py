"""Flash attention kernel vs jnp reference (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from manual_whisper_tpu.ops.attention import (flash_attention,
                                              reference_attention)


def _qkv(b=1, h=2, t_q=128, t_k=128, dh=64, seed=0):
    rng = np.random.default_rng(seed)
    def mk(t):
        return jnp.asarray(
            rng.standard_normal((b, h, t, dh)).astype(np.float32))
    return mk(t_q), mk(t_k), mk(t_k)


def test_flash_matches_reference_aligned():
    q, k, v = _qkv()
    out = flash_attention(q, k, v, interpret=True)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_matches_reference_unaligned_kv():
    """Whisper encoder length 1500 is not a block multiple — padding and
    key masking must be exact.  (Scaled-down: 150 with 128-blocks.)"""
    q, k, v = _qkv(t_q=150, t_k=150, seed=1)
    out = flash_attention(q, k, v, interpret=True)
    ref = reference_attention(q, k, v)
    assert out.shape == ref.shape == (1, 2, 150, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_multi_kblock():
    q, k, v = _qkv(t_q=128, t_k=384, seed=2)
    out = flash_attention(q, k, v, interpret=True)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_bf16():
    q, k, v = _qkv(seed=3)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = flash_attention(q, k, v, interpret=True)
    ref = reference_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)
