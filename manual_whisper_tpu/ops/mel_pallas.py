"""Fused Pallas TPU kernel for the Whisper log-mel frontend.

The kernel fuses the compute chain: hann-windowed 400-point real DFT as an
MXU matmul -> power spectrum -> mel filterbank matmul -> log10, per block
of frames, with no intermediate ever written to HBM.  Frame extraction
(overlapping windows, hop 160) stays in XLA — it is a pure data movement
the compiler handles well, and Mosaic's vector layouts do not support the
shifted concatenates an in-kernel framing would need.  The per-sample
dynamic-range normalisation (global max) also stays in XLA (ops/mel.py).

Replaces the C++/numpy feature extractor the reference uses via
faster-whisper (call site: transcribe.py:123); this is the BASELINE.json
north-star "fused Pallas kernel" for the STFT+log-mel frontend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mel import (HOP_LENGTH, N_FFT, N_FREQS, _dft_window_matrix, _frame,
                  _reflect_pad, mel_filter_bank)

FRAME_BLOCK = 600  # 3000 frames (30 s) = 5 blocks
_LN10 = float(np.log(10.0))


def _mel_kernel(frames_ref, dft_ref, filt_ref, out_ref):
    frames = frames_ref[0]                              # [FB, 400]
    spec = jnp.dot(frames, dft_ref[:],
                   preferred_element_type=jnp.float32)  # [FB, 2*201]
    re = spec[:, :N_FREQS]
    im = spec[:, N_FREQS:]
    power = re * re + im * im                           # [FB, 201]
    mel = jnp.dot(power, filt_ref[:],
                  preferred_element_type=jnp.float32)   # [FB, n_mels]
    out_ref[0] = jnp.log(jnp.maximum(mel, 1e-10)) * (1.0 / _LN10)


@functools.partial(jax.jit,
                   static_argnames=("n_mels", "interpret", "frame_block"))
def unnormalized_log_mel_pallas(audio: jnp.ndarray, n_mels: int = 80,
                                interpret: bool = False,
                                frame_block: int = FRAME_BLOCK) -> jnp.ndarray:
    """[B, T] float32 -> raw log10-mel [B, T//160, n_mels] (fused kernel).

    Requires T//160 to be a multiple of ``frame_block`` (true for the 30 s
    windows the pipeline feeds); other sizes should use the XLA path.
    """
    audio = jnp.asarray(audio, jnp.float32)
    if audio.ndim == 1:
        audio = audio[None]
    batch, t = audio.shape
    n_frames = t // HOP_LENGTH
    if n_frames % frame_block != 0:
        raise ValueError(
            f"n_frames={n_frames} not a multiple of {frame_block}; "
            "use the XLA path for irregular lengths")
    n_blocks = n_frames // frame_block

    frames = _frame(_reflect_pad(audio), n_frames)          # [B, F, 400]
    dft = jnp.asarray(_dft_window_matrix(), jnp.float32)    # [400, 402]
    filters = jnp.asarray(mel_filter_bank(n_mels),
                          jnp.float32)                      # [201, n_mels]

    return pl.pallas_call(
        _mel_kernel,
        grid=(batch, n_blocks),
        in_specs=[
            pl.BlockSpec((1, frame_block, N_FFT), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, 2 * N_FREQS), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FREQS, n_mels), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, frame_block, n_mels),
                               lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, n_frames, n_mels),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * n_frames * N_FFT * 2 * N_FREQS
            + 2 * batch * n_frames * N_FREQS * n_mels,
            bytes_accessed=(batch * n_frames * (N_FFT + n_mels) * 4),
            transcendentals=batch * n_frames * n_mels,
        ),
        interpret=interpret,
    )(frames, dft, filters)
