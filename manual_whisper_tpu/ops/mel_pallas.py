"""Fused Pallas TPU kernel for the Whisper log-mel frontend.

One kernel fuses: hop-aligned audio DMA from HBM -> frame rebuild in VMEM
(shifted-row concatenation) -> hann-windowed 400-point real DFT as a matmul
on the MXU -> power -> mel filterbank matmul -> log10.  The per-sample
normalisation (global max) stays in XLA (see ops/mel.py).

Replaces the C++/numpy feature extractor the reference uses via
faster-whisper (call site: transcribe.py:123); this is the BASELINE.json
north-star "fused Pallas kernel" for the STFT+log-mel frontend.

Grid: (batch, frame_blocks).  Each step processes FRAME_BLOCK frames:
audio span (FRAME_BLOCK+2)*160 samples is DMA'd manually (overlapping
blocks cannot be expressed with BlockSpec index maps), then
frames[f] = rows[f] ++ rows[f+1] ++ rows[f+2] truncated to 400 samples.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mel import (HOP_LENGTH, N_FFT, N_FREQS, _dft_window_matrix,
                  _reflect_pad, mel_filter_bank)

FRAME_BLOCK = 600  # 3000 frames (30 s) = 5 blocks
_LN10 = float(np.log(10.0))


def _make_mel_kernel(frame_block: int):
    def _mel_kernel(audio_hbm, dft_ref, filt_ref, out_ref, scratch, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)

        span = (frame_block + 2) * HOP_LENGTH
        start = i * (frame_block * HOP_LENGTH)
        dma = pltpu.make_async_copy(
            audio_hbm.at[b, pl.ds(start, span)],
            scratch,
            sem,
        )
        dma.start()
        dma.wait()

        rows = scratch[:].reshape(frame_block + 2, HOP_LENGTH)
        frames = jnp.concatenate(
            [rows[0:frame_block],
             rows[1:frame_block + 1],
             rows[2:frame_block + 2]],
            axis=1,
        )[:, :N_FFT]                                        # [FB, 400]

        spec = jnp.dot(frames, dft_ref[:],
                       preferred_element_type=jnp.float32)  # [FB, 2*201]
        re = spec[:, :N_FREQS]
        im = spec[:, N_FREQS:]
        power = re * re + im * im                           # [FB, 201]
        mel = jnp.dot(power, filt_ref[:],
                      preferred_element_type=jnp.float32)   # [FB, n_mels]
        out_ref[0] = jnp.log(jnp.maximum(mel, 1e-10)) * (1.0 / _LN10)

    return _mel_kernel


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

    padded = _reflect_pad(audio)                            # [B, T+400]
    dft = jnp.asarray(_dft_window_matrix(), jnp.float32)    # [400, 402]
    filters = jnp.asarray(mel_filter_bank(n_mels),
                          jnp.float32)                      # [201, n_mels]

    return pl.pallas_call(
        _make_mel_kernel(frame_block),
        grid=(batch, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # audio stays in HBM
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
        scratch_shapes=[
            pltpu.VMEM(((frame_block + 2) * HOP_LENGTH,), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_frames * N_FFT * 2 * N_FREQS
            + 2 * n_frames * N_FREQS * n_mels,
            bytes_accessed=t * 4 + n_frames * n_mels * 4,
            transcendentals=n_frames * n_mels,
        ),
        interpret=interpret,
    )(padded, dft, filters)
