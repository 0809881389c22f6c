"""Pallas flash attention for TPU (encoder self-attention).

Whisper's encoder attends over 1500 frames; materialising [B, H, 1500,
1500] score tensors costs ~90 MB of HBM traffic per sample per layer at
bf16.  This kernel computes softmax(QK^T)V with the online-softmax
(flash) recurrence entirely in VMEM, never writing scores to HBM —
BASELINE.json's "Pallas flash-attention" north star.  Replaces the
CTranslate2 C++ attention the reference uses via whisperx
(call path: model.transcribe, reference: transcribe.py:123).

Non-causal with optional key-padding length (queries/keys are zero-padded
to block multiples by the wrapper).  Decoder attention does not use this
kernel: decode steps have q_len=1 and are einsum-bound on the KV cache.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 128
BLOCK_K = 128
_NEG_INF = -1e30


def _flash_kernel(kv_len_ref, q_ref, k_ref, v_ref, out_ref,
                  *, block_k: int, scale: float):
    """One (batch*head, q_block) grid step: online softmax over K blocks."""
    q = q_ref[0].astype(jnp.float32) * scale              # [BQ, dh]
    kv_len = kv_len_ref[0]
    seq_k = k_ref.shape[1]
    n_kb = seq_k // block_k

    bq = q.shape[0]
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, q.shape[1]), jnp.float32)

    def body(kb, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k)].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k)].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [BQ, BK]
        k_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(k_pos < kv_len, s, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, n_kb, body, (m0, l0, acc0))
    out_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """softmax(q k^T / sqrt(dh)) v for [B, H, T, dh] inputs (non-causal).

    T is padded internally to BLOCK multiples; padded keys are masked,
    padded query rows are sliced away.
    """
    b, h, t_q, dh = q.shape
    t_k = k.shape[2]
    scale = 1.0 / math.sqrt(dh)

    t_q_pad = -(-t_q // BLOCK_Q) * BLOCK_Q
    t_k_pad = -(-t_k // BLOCK_K) * BLOCK_K
    qp = _pad_to(q, t_q_pad, 2).reshape(b * h, t_q_pad, dh)
    kp = _pad_to(k, t_k_pad, 2).reshape(b * h, t_k_pad, dh)
    vp = _pad_to(v, t_k_pad, 2).reshape(b * h, t_k_pad, dh)

    kernel = functools.partial(_flash_kernel, block_k=BLOCK_K, scale=scale)
    grid = (b * h, t_q_pad // BLOCK_Q)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # index maps receive the scalar-prefetch ref as arg 3
                pl.BlockSpec((1, BLOCK_Q, dh), lambda bh, iq, _: (bh, iq, 0)),
                pl.BlockSpec((1, t_k_pad, dh), lambda bh, iq, _: (bh, 0, 0)),
                pl.BlockSpec((1, t_k_pad, dh), lambda bh, iq, _: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, BLOCK_Q, dh),
                                   lambda bh, iq, _: (bh, iq, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, t_q_pad, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t_q * t_k * dh,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * t_q * t_k,
        ),
        interpret=interpret,
    )(jnp.asarray([t_k], jnp.int32), qp, kp, vp)

    return out.reshape(b, h, t_q_pad, dh)[:, :, :t_q]


def reference_attention(q, k, v):
    """jnp reference for tests."""
    dh = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / math.sqrt(dh)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)
