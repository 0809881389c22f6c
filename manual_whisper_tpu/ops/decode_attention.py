"""Fused Pallas decode-step attention (q_len = 1) for the KV-transposed cache.

The decode loop's per-token cost is HBM bandwidth on three tensors: the
int8 cross-attention K/V (~2 GB/step at large-v3 batch 16), the bf16
self-attention cache, and the int8 weights.  These kernels fuse each
attention (dequant-dot, scale, softmax, weighted sum) into ONE Pallas
program so the quantized K/V stream through VMEM exactly once per step
with the int8->f32 dequantisation in registers and no score tensor in HBM.

Grid layout: one program per BATCH row with every head resident
(per-program block ≈ heads × 2 × dh × T — ~3.8 MB for large-v3 cross
K/V), so each grid step issues megabyte-scale DMAs instead of one
per-head sliver; all heads compute in one VPU broadcast-multiply-reduce
(q_len=1 attention is a batched matvec — skinny [1,dh]x[dh,T] MXU
matmuls drive 1 of 128 MXU rows).

Measured honestly (tools/bench_decode_step.py, same process, same
params, v5e, large-v3 batch 16 int8+ckv8, 112 steps): einsum
10.6 ms/step vs 16.3 ms/step for the best of three kernel layouts
tried ((B*H,) grid per-head, (B,) grid MXU head-loop, (B,) grid VPU
all-heads).  XLA already fuses dequant-dot-softmax-dot at q_len=1
close to the HBM bound, so the EINSUM PATH IS THE PIPELINE DEFAULT
(pipeline/transcribe.py); these kernels stay behind
asr_options={"fused_attention": True} as the measured alternative.

Layouts match the transposed cache the model keeps (position on the
128-lane axis):

- cross:  k_q/v_q int8 [B, H, dh, Ta],  k_s/v_s f32 [B, H, 1, Ta]
- self:   k/v    bf16 [B, H, dh, T_max] with a <=pos validity mask

Replaces the CTranslate2 C++ fused decoder attention the reference drives
through ``model.transcribe`` (reference: transcribe.py:123); the encoder's
flash kernel lives in ops/attention.py.
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


def _attend_all_heads(q, k, v, valid_mask, scale, k_scale=None,
                      v_scale=None):
    """All heads on the VPU in one shot — no MXU, no head loop.

    q [H, dh] f32; k/v [H, dh, T]; valid_mask [1, T]; scales [H, 1, T].
    q_len=1 attention is a batched matvec: a [1,dh]x[dh,T] MXU matmul
    drives 1 of 128 MXU rows, so broadcast-multiply + reduce on the
    8x128 VPU beats 2*n_head skinny matmuls.  Returns [H, dh] f32.
    """
    qk = (q * scale)[:, :, None] * k.astype(jnp.float32)  # [H, dh, T]
    s = jnp.sum(qk, axis=1)                               # [H, T]
    if k_scale is not None:
        s = s * k_scale[:, 0, :]
    s = jnp.where(valid_mask, s, _NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    if v_scale is not None:
        p = p * v_scale[:, 0, :]
    return jnp.sum(p[:, None, :] * v.astype(jnp.float32), axis=2)


# ---------------------------------------------------------------------------
# Cross-attention: int8 K/V with per-position scales
# ---------------------------------------------------------------------------

def _cross_int8_kernel(kv_len_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                       out_ref, *, scale: float):
    kv_len = kv_len_ref[0]
    t = kq_ref.shape[-1]
    valid = (jax.lax.broadcasted_iota(jnp.int32, (1, t), 1) < kv_len)
    out = _attend_all_heads(q_ref[0].astype(jnp.float32), kq_ref[0],
                            vq_ref[0], valid, scale, ks_ref[0], vs_ref[0])
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_cross_attention_int8(q: jnp.ndarray, k_q: jnp.ndarray,
                                k_s: jnp.ndarray, v_q: jnp.ndarray,
                                v_s: jnp.ndarray, kv_len=0,
                                interpret: bool = False) -> jnp.ndarray:
    """softmax((q k_q^T) * k_s / sqrt(dh)) diag(v_s) v_q^T, fused.

    q [B, H, 1, dh]; k_q/v_q int8 [B, H, dh, Ta]; k_s/v_s f32 [B, H, 1, Ta].
    Returns [B, H, 1, dh] in q.dtype.  Exact same math as the einsum path
    (scales commute out of the dots); one VMEM pass over K/V.

    ``kv_len``: true valid length when the inputs were pre-padded with
    pad_cross_kv (avoids a per-step pad copy in the decode loop); 0 means
    every position is valid.  A runtime scalar (NOT static): the
    scalar-prefetch mask already handles any valid length, so one
    compiled program serves every cross length at a given padded Ta
    (ADVICE r2 — it was redundantly also a static arg, forcing a
    recompile per length the mask made unnecessary).
    """
    b, h, _, dh = q.shape
    ta = k_q.shape[-1]
    ta_pad = _round_up(ta, 128)
    kv_len = jnp.where(jnp.asarray(kv_len, jnp.int32) > 0, kv_len, ta)
    scale = 1.0 / math.sqrt(dh)

    qf = q.reshape(b, h, dh)
    pad = [(0, 0), (0, 0), (0, 0), (0, ta_pad - ta)]
    k_q, v_q = jnp.pad(k_q, pad), jnp.pad(v_q, pad)
    k_s, v_s = jnp.pad(k_s, pad), jnp.pad(v_s, pad)

    out = pl.pallas_call(
        functools.partial(_cross_int8_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, h, dh), lambda i, _: (i, 0, 0)),
                pl.BlockSpec((1, h, dh, ta_pad), lambda i, _: (i, 0, 0, 0)),
                pl.BlockSpec((1, h, 1, ta_pad), lambda i, _: (i, 0, 0, 0)),
                pl.BlockSpec((1, h, dh, ta_pad), lambda i, _: (i, 0, 0, 0)),
                pl.BlockSpec((1, h, 1, ta_pad), lambda i, _: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, h, dh), lambda i, _: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * ta * dh,
            bytes_accessed=(k_q.size + v_q.size
                            + 4 * (k_s.size + v_s.size) + 4 * qf.size),
            transcendentals=b * h * ta,
        ),
        interpret=interpret,
    )(jnp.reshape(kv_len.astype(jnp.int32), (1,)), qf, k_q, k_s, v_q, v_s)
    return out.reshape(b, h, 1, dh)


# ---------------------------------------------------------------------------
# Cross-attention: bf16 K/V (no scales)
# ---------------------------------------------------------------------------

def _cross_bf16_kernel(kv_len_ref, q_ref, k_ref, v_ref, out_ref,
                       *, scale: float):
    kv_len = kv_len_ref[0]
    t = k_ref.shape[-1]
    valid = (jax.lax.broadcasted_iota(jnp.int32, (1, t), 1) < kv_len)
    out = _attend_all_heads(q_ref[0].astype(jnp.float32), k_ref[0],
                            v_ref[0], valid, scale)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_cross_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           kv_len=0,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused q_len=1 attention over bf16 transposed K/V [B, H, dh, Ta].

    ``kv_len`` as in decode_cross_attention_int8 (runtime scalar)."""
    b, h, _, dh = q.shape
    ta = k.shape[-1]
    ta_pad = _round_up(ta, 128)
    kv_len = jnp.where(jnp.asarray(kv_len, jnp.int32) > 0, kv_len, ta)
    scale = 1.0 / math.sqrt(dh)

    qf = q.reshape(b, h, dh)
    pad = [(0, 0), (0, 0), (0, 0), (0, ta_pad - ta)]
    k, v = jnp.pad(k, pad), jnp.pad(v, pad)

    out = pl.pallas_call(
        functools.partial(_cross_bf16_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, h, dh), lambda i, _: (i, 0, 0)),
                pl.BlockSpec((1, h, dh, ta_pad), lambda i, _: (i, 0, 0, 0)),
                pl.BlockSpec((1, h, dh, ta_pad), lambda i, _: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, h, dh), lambda i, _: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * ta * dh,
            bytes_accessed=(k.size + v.size) * 2 + 4 * qf.size,
            transcendentals=b * h * ta,
        ),
        interpret=interpret,
    )(jnp.reshape(kv_len.astype(jnp.int32), (1,)), qf, k, v)
    return out.reshape(b, h, 1, dh)


# ---------------------------------------------------------------------------
# Self-attention over the growing cache: bf16 K/V, valid slots <= pos
# ---------------------------------------------------------------------------

def _self_kernel(pos_ref, q_ref, k_ref, v_ref, out_ref,
                 *, scale: float):
    pos = pos_ref[0]
    t = k_ref.shape[-1]
    valid = (jax.lax.broadcasted_iota(jnp.int32, (1, t), 1) <= pos)
    out = _attend_all_heads(q_ref[0].astype(jnp.float32), k_ref[0],
                            v_ref[0], valid, scale)
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

    qf = q.reshape(b, h, dh)

    out = pl.pallas_call(
        functools.partial(_self_kernel, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, h, dh), lambda i, _: (i, 0, 0)),
                pl.BlockSpec((1, h, dh, t_max), lambda i, _: (i, 0, 0, 0)),
                pl.BlockSpec((1, h, dh, t_max), lambda i, _: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, h, dh), lambda i, _: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t_max * dh,
            bytes_accessed=(k.size + v.size) * 2 + 4 * qf.size,
            transcendentals=b * h * t_max,
        ),
        interpret=interpret,
    )(jnp.reshape(pos.astype(jnp.int32), (1,)), qf, k, v)
    return out.reshape(b, h, 1, dh)
