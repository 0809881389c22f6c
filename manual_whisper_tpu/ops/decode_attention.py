"""Fused Pallas decode-step attention (q_len = 1) for the KV-transposed cache.

The decode loop's per-token cost is HBM bandwidth on three tensors: the
int8 cross-attention K/V (~2 GB/step at large-v3 batch 16), the bf16
self-attention cache, and the int8 weights.  The einsum path
(models/whisper.py `_cross_attend`) expresses the attention as four XLA
ops (dequant-dot, scale, softmax, dot); this module fuses each attention
into ONE Pallas kernel so the quantized K/V stream through VMEM exactly
once per step, the int8->f32 dequantisation happens in registers, and no
score/prob tensor ever round-trips HBM.

Layouts match the transposed cache the model keeps (position on the
128-lane axis):

- cross:  k_q/v_q int8 [B, H, dh, Ta],  k_s/v_s f32 [B, H, 1, Ta]
- self:   k/v    bf16 [B, H, dh, T_max] with a <=pos validity mask

Replaces the CTranslate2 C++ fused decoder attention the reference drives
through ``model.transcribe`` (reference: transcribe.py:123); the encoder's
flash kernel lives in ops/attention.py (this file is the decoder half its
docstring points to).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Cross-attention: int8 K/V with per-position scales
# ---------------------------------------------------------------------------

def _cross_kernel(kv_len_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, out_ref,
                  *, scale: float):
    """One (b*h) grid step: q [1, dh] against int8 K/V [dh, Ta_pad]."""
    q = q_ref[0].astype(jnp.float32) * scale                 # [1, dh]
    kv_len = kv_len_ref[0]
    k = kq_ref[0].astype(jnp.float32)                        # [dh, Ta]
    s = jax.lax.dot_general(q, k, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [1, Ta]
    s = s * ks_ref[0]                                        # dequant scores
    t_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(t_pos < kv_len, s, _NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    pv = p * vs_ref[0]                                       # fold v scales
    v = vq_ref[0].astype(jnp.float32)                        # [dh, Ta]
    out = jax.lax.dot_general(pv, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [1, dh]
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kv_len", "interpret"))
def decode_cross_attention_int8(q: jnp.ndarray, k_q: jnp.ndarray,
                                k_s: jnp.ndarray, v_q: jnp.ndarray,
                                v_s: jnp.ndarray, kv_len: int = 0,
                                interpret: bool = False) -> jnp.ndarray:
    """softmax((q k_q^T) * k_s / sqrt(dh)) diag(v_s) v_q^T, fused.

    q [B, H, 1, dh]; k_q/v_q int8 [B, H, dh, Ta]; k_s/v_s f32 [B, H, 1, Ta].
    Returns [B, H, 1, dh] in q.dtype.  Exact same math as the einsum path
    (scales commute out of the dots); one VMEM pass over K/V.

    ``kv_len``: true valid length when the inputs were pre-padded with
    pad_cross_kv (avoids a per-step pad copy in the decode loop); 0 means
    every position is valid.
    """
    b, h, _, dh = q.shape
    ta = k_q.shape[-1]
    ta_pad = _round_up(ta, 128)
    kv_len = kv_len or ta
    scale = 1.0 / math.sqrt(dh)

    qf = q.reshape(b * h, 1, dh)
    pad = [(0, 0), (0, 0), (0, 0), (0, ta_pad - ta)]
    kqf = jnp.pad(k_q, pad).reshape(b * h, dh, ta_pad)
    vqf = jnp.pad(v_q, pad).reshape(b * h, dh, ta_pad)
    ksf = jnp.pad(k_s, pad).reshape(b * h, 1, ta_pad)
    vsf = jnp.pad(v_s, pad).reshape(b * h, 1, ta_pad)

    out = pl.pallas_call(
        functools.partial(_cross_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h,),
            in_specs=[
                pl.BlockSpec((1, 1, dh), lambda i, _: (i, 0, 0)),
                pl.BlockSpec((1, dh, ta_pad), lambda i, _: (i, 0, 0)),
                pl.BlockSpec((1, 1, ta_pad), lambda i, _: (i, 0, 0)),
                pl.BlockSpec((1, dh, ta_pad), lambda i, _: (i, 0, 0)),
                pl.BlockSpec((1, 1, ta_pad), lambda i, _: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, dh), lambda i, _: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, 1, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * ta * dh,
            bytes_accessed=(kqf.size + vqf.size
                            + 4 * (ksf.size + vsf.size) + 2 * qf.size * 2),
            transcendentals=b * h * ta,
        ),
        interpret=interpret,
    )(jnp.asarray([kv_len], jnp.int32), qf, kqf, ksf, vqf, vsf)
    return out.reshape(b, h, 1, dh)


# ---------------------------------------------------------------------------
# Cross-attention: bf16 K/V (no scales) — same kernel shape, unit dequant
# ---------------------------------------------------------------------------

def _cross_bf16_kernel(kv_len_ref, q_ref, k_ref, v_ref, out_ref,
                       *, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale
    kv_len = kv_len_ref[0]
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    t_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(t_pos < kv_len, s, _NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0].astype(jnp.float32)
    out = jax.lax.dot_general(p, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kv_len", "interpret"))
def decode_cross_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           kv_len: int = 0,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused q_len=1 attention over bf16 transposed K/V [B, H, dh, Ta].

    ``kv_len`` as in decode_cross_attention_int8."""
    b, h, _, dh = q.shape
    ta = k.shape[-1]
    ta_pad = _round_up(ta, 128)
    kv_len = kv_len or ta
    scale = 1.0 / math.sqrt(dh)

    qf = q.reshape(b * h, 1, dh)
    pad = [(0, 0), (0, 0), (0, 0), (0, ta_pad - ta)]
    kf = jnp.pad(k, pad).reshape(b * h, dh, ta_pad)
    vf = jnp.pad(v, pad).reshape(b * h, dh, ta_pad)

    out = pl.pallas_call(
        functools.partial(_cross_bf16_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h,),
            in_specs=[
                pl.BlockSpec((1, 1, dh), lambda i, _: (i, 0, 0)),
                pl.BlockSpec((1, dh, ta_pad), lambda i, _: (i, 0, 0)),
                pl.BlockSpec((1, dh, ta_pad), lambda i, _: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, dh), lambda i, _: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, 1, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * ta * dh,
            bytes_accessed=(kf.size + vf.size) * 2 + 2 * qf.size * 2,
            transcendentals=b * h * ta,
        ),
        interpret=interpret,
    )(jnp.asarray([kv_len], jnp.int32), qf, kf, vf)
    return out.reshape(b, h, 1, dh)


# ---------------------------------------------------------------------------
# Self-attention over the growing cache: bf16 K/V, valid slots <= pos
# ---------------------------------------------------------------------------

def _self_kernel(pos_ref, q_ref, k_ref, v_ref, out_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale
    pos = pos_ref[0]
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    t_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(t_pos <= pos, s, _NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0].astype(jnp.float32)
    out = jax.lax.dot_general(p, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_self_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          pos: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """Fused q_len=1 causal attention over the transposed self cache.

    q [B, H, 1, dh]; k/v [B, H, dh, T_max] (cache, positions > pos are
    garbage and masked).  pos scalar int32.  Returns [B, H, 1, dh].
    """
    b, h, _, dh = q.shape
    t_max = k.shape[-1]
    if t_max % 128 != 0:
        pad = [(0, 0), (0, 0), (0, 0), (0, _round_up(t_max, 128) - t_max)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        t_max = k.shape[-1]
    scale = 1.0 / math.sqrt(dh)

    qf = q.reshape(b * h, 1, dh)
    kf = k.reshape(b * h, dh, t_max)
    vf = v.reshape(b * h, dh, t_max)

    out = pl.pallas_call(
        functools.partial(_self_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h,),
            in_specs=[
                pl.BlockSpec((1, 1, dh), lambda i, _: (i, 0, 0)),
                pl.BlockSpec((1, dh, t_max), lambda i, _: (i, 0, 0)),
                pl.BlockSpec((1, dh, t_max), lambda i, _: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, dh), lambda i, _: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, 1, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t_max * dh,
            bytes_accessed=(kf.size + vf.size) * 2 + 2 * qf.size * 2,
            transcendentals=b * h * t_max,
        ),
        interpret=interpret,
    )(jnp.reshape(pos.astype(jnp.int32), (1,)), qf, kf, vf)
    return out.reshape(b, h, 1, dh)
