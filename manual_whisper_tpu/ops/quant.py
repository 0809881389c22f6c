"""Int8 weight-only quantization (CT2-int8 parity path).

The reference CLI runs CTranslate2 with ``compute_type="int8"``
(transcribe.py:32); the scheme there is symmetric per-output-channel int8
weights with float activations.  Same here: matmul weights become
``{"q": int8 [.., K, N], "s": float32 [.., N]}`` and the matmul helper
dequantises inside the contraction.  On TPU the win is HBM traffic — the
decode loop is weight-bandwidth-bound, and int8 halves the bytes read per
step versus bf16.  "Parity" is WER parity, not logit equality
(SURVEY.md §7 hard part d).

Two matmul paths: XLA (convert fused into the dot) and a Pallas kernel
that keeps the int8->bf16 upconversion in VMEM per weight tile.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weight(w: Any) -> Dict[str, Any]:
    """Symmetric per-output-channel int8 quantization of [..., K, N].

    Numpy inputs quantize in numpy and STAY on the host (int8 + scales
    then ship half the bytes of the bf16 original at first jitted use,
    and no quantization programs hit the accelerator compile path)."""
    if isinstance(w, np.ndarray):
        w32 = np.asarray(w, np.float32)
        absmax = np.max(np.abs(w32), axis=-2, keepdims=True)
        scale = np.maximum(absmax / 127.0, 1e-10)
        q = np.clip(np.round(w32 / scale), -127, 127).astype(np.int8)
        return {"q": q, "s": scale[..., 0, :].astype(np.float32)}
    w32 = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)   # [..., 1, N]
    scale = jnp.maximum(absmax / 127.0, 1e-10)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale[..., 0, :].astype(jnp.float32)}


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def mm(x: jnp.ndarray, w: Any) -> jnp.ndarray:
    """x @ w for plain or quantized weights (the model's matmul helper).

    Quantized form: per-layer 2-D ``{"q": [K, N] int8, "s": [N] f32}``.
    Layer-STACKED quantized trees ([L, K, N], as quantize_params emits
    for block stacks) must be sliced per layer first — every model call
    site does this inside its lax.scan body."""
    if not is_quantized(w):
        return x @ w
    y = jax.lax.dot_general(
        x, w["q"].astype(x.dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (y * w["s"]).astype(x.dtype)


# weights quantized inside transformer blocks (biases/norms excluded)
_QUANT_KEYS = ("q_w", "k_w", "v_w", "o_w", "fc1_w", "fc2_w")


def quantize_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize every block matmul weight of a Whisper param pytree.

    Embeddings, convs, positions and norms stay in their original dtype
    (small and/or quality-critical — matches CT2's int8 layout).
    """
    def quant_blocks(blocks):
        out = {}
        for name, sub in blocks.items():
            if isinstance(sub, dict):
                out[name] = {
                    k: (quantize_weight(v)
                        if k in _QUANT_KEYS and not is_quantized(v) else v)
                    for k, v in sub.items()
                }
            else:
                out[name] = sub
        return out

    out = {}
    for part in ("encoder", "decoder"):
        section = dict(params[part])
        section["blocks"] = quant_blocks(params[part]["blocks"])
        out[part] = section
    return out


# ---------------------------------------------------------------------------
# Pallas int8 matmul kernel (weight tiles upconverted in VMEM)
# ---------------------------------------------------------------------------

def _int8_mm_kernel(x_ref, q_ref, s_ref, out_ref):
    x = x_ref[:]                                     # [M, K]
    w = q_ref[:].astype(jnp.float32) * s_ref[:]      # [K, BN] dequant in VMEM
    out_ref[:] = jax.lax.dot_general(
        x.astype(jnp.float32), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def int8_matmul_pallas(x: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray,
                       block_n: int = 512,
                       interpret: bool = False) -> jnp.ndarray:
    """x [M, K] @ dequant(q [K, N], s [N]) -> [M, N]."""
    m, k = x.shape
    _, n = q.shape
    block_n = min(block_n, n)
    if n % block_n != 0:
        # largest divisor of N that fits the requested block (1280/1024
        # etc. are not divisible by 512; a hard error would reject the
        # model's own attention dims)
        block_n = next(b for b in range(block_n, 0, -1) if n % b == 0)
    return pl.pallas_call(
        _int8_mm_kernel,
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((m, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k * x.dtype.itemsize + k * n + m * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, q, s.reshape(1, -1))
