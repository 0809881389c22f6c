"""Log-mel spectrogram frontend (Whisper feature extraction), TPU-first.

The reference gets this from faster-whisper's C++/numpy feature extractor
inside ``model.transcribe`` (reference: transcribe.py:123).  Numerics follow
the Whisper recipe exactly (hann-400/hop-160 STFT, slaney mel filterbank,
log10, 8-dB dynamic-range clamp, (x+4)/4 scaling) so features match HF's
``WhisperFeatureExtractor`` to float tolerance.

TPU design: an FFT is awkward on the MXU, but a 400-point DFT *as a matmul*
is ideal — frames [F, 400] x DFT [400, 2*201] runs on the systolic array and
XLA fuses the window/power/mel/log chain.  Two implementations:

- ``log_mel_spectrogram`` — pure XLA (gather frames -> two matmuls), used
  everywhere, differentiable, compiles on CPU too.
- ``log_mel_spectrogram_pallas`` — single fused Pallas kernel: audio is
  DMA'd from HBM in hop-aligned tiles, frames rebuilt in VMEM by shifted
  concatenation (hop 160, window 400 => 3 hop-rows per frame), then
  window+DFT+power+mel+log fused per 256-frame block.

Both return the *unnormalised* log10-mel; the per-sample dynamic-range
normalisation (max-8 clamp, (x+4)/4) is a cheap XLA epilogue applied by
``log_mel_spectrogram`` since it needs a global max.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE          # 480000
N_FRAMES = N_SAMPLES // HOP_LENGTH              # 3000
N_FREQS = N_FFT // 2 + 1                        # 201


def _hz_to_mel_slaney(freq):
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    return np.where(freq >= min_log_hz,
                    min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) * logstep,
                    mels)


def _mel_to_hz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freqs = 200.0 * mels / 3.0
    return np.where(mels >= min_log_mel,
                    1000.0 * np.exp(logstep * (mels - min_log_mel)),
                    freqs)


@functools.lru_cache(maxsize=8)
def mel_filter_bank(n_mels: int = 80, n_freqs: int = N_FREQS,
                    sample_rate: int = SAMPLE_RATE,
                    f_min: float = 0.0, f_max: Optional[float] = None
                    ) -> np.ndarray:
    """Slaney-scale, slaney-normalised triangular filterbank [n_freqs, n_mels].

    Matches librosa.filters.mel / transformers.audio_utils.mel_filter_bank
    with ``norm='slaney', mel_scale='slaney'`` (what Whisper ships as
    ``mel_filters.npz``).
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    fft_freqs = np.linspace(0, sample_rate / 2.0, n_freqs)
    mel_min = _hz_to_mel_slaney(f_min)
    mel_max = _hz_to_mel_slaney(f_max)
    mel_points = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_points = _mel_to_hz_slaney(mel_points)

    fdiff = np.diff(hz_points)
    ramps = hz_points[None, :] - fft_freqs[:, None]   # [n_freqs, n_mels+2]
    lower = -ramps[:, :-2] / fdiff[None, :-1]
    upper = ramps[:, 2:] / fdiff[None, 1:]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    # slaney normalisation: scale each filter to ~constant energy per channel
    enorm = 2.0 / (hz_points[2:n_mels + 2] - hz_points[:n_mels])
    fb *= enorm[None, :]
    return fb  # float64; call sites cast


@functools.lru_cache(maxsize=2)
def _dft_window_matrix() -> np.ndarray:
    """Hann-window-fused real DFT matrix [N_FFT, 2*N_FREQS] (cos | -sin)."""
    window = np.hanning(N_FFT + 1)[:-1]  # periodic hann (torch.hann_window)
    k = np.arange(N_FFT)[:, None]
    f = np.arange(N_FREQS)[None, :]
    angle = -2.0 * np.pi * k * f / N_FFT
    mat = np.concatenate([np.cos(angle), np.sin(angle)], axis=1)
    return window[:, None] * mat  # float64; call sites cast


def _reflect_pad(audio: jnp.ndarray, pad: int = N_FFT // 2) -> jnp.ndarray:
    return jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)],
                   mode="reflect")


def _frame(audio: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """[B, T_padded] -> overlapping frames [B, n_frames, N_FFT].

    Hop-aligned reshape + shifted concatenation: window(400) = 2.5 hops,
    so frame f = rows f, f+1, f+2 of the hop-160 reshape, truncated to 400.
    Avoids a giant gather; XLA lowers the slices to cheap copies.
    """
    b = audio.shape[0]
    n_hops = n_frames + (N_FFT // HOP_LENGTH)  # rows needed
    needed = n_hops * HOP_LENGTH
    audio = audio[:, :needed]
    rows = audio.reshape(b, n_hops, HOP_LENGTH)
    stacked = jnp.concatenate(
        [rows[:, i:i + n_frames, :] for i in range(3)], axis=2)
    return stacked[:, :, :N_FFT]


def _power_to_logmel(power: jnp.ndarray, filters: jnp.ndarray) -> jnp.ndarray:
    mel = jnp.einsum("bfk,km->bfm", power, filters)
    return jnp.log10(jnp.maximum(mel, 1e-10))


def unnormalized_log_mel(audio: jnp.ndarray, n_mels: int = 80,
                         dtype=jnp.float32) -> jnp.ndarray:
    """[B, T] float32 -> raw log10-mel [B, n_frames, n_mels] (XLA path).

    float32 matches the float64 reference to ~1e-3 normalised units except
    within rounding noise of the -8-decade dynamic-range floor (which the
    normalisation clamps anyway); pass dtype=jnp.float64 under
    ``jax.enable_x64`` for exact-reference checks.
    """
    audio = jnp.asarray(audio, dtype)
    if audio.ndim == 1:
        audio = audio[None]
    n_frames = audio.shape[-1] // HOP_LENGTH
    padded = _reflect_pad(audio)
    frames = _frame(padded, n_frames)
    dft = jnp.asarray(_dft_window_matrix(), dtype)
    spec = jnp.einsum("bfk,kc->bfc", frames, dft,
                      preferred_element_type=dtype)
    re, im = spec[..., :N_FREQS], spec[..., N_FREQS:]
    power = re * re + im * im
    filters = jnp.asarray(mel_filter_bank(n_mels), dtype)
    return _power_to_logmel(power, filters)


def normalize_log_mel(log_spec: jnp.ndarray) -> jnp.ndarray:
    """Whisper dynamic-range normalisation (per sample)."""
    max_val = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    return (log_spec + 4.0) / 4.0


@functools.partial(jax.jit, static_argnames=("n_mels", "use_pallas"))
def log_mel_spectrogram(audio: jnp.ndarray, n_mels: int = 80,
                        use_pallas: bool = False) -> jnp.ndarray:
    """Audio [B, T] (or [T]) -> normalised log-mel [B, n_mels, T//160].

    Output matches HF WhisperFeatureExtractor(feature_size=n_mels) on the
    same (already padded-to-30 s) audio.  Set ``use_pallas=True`` on TPU
    for the fused kernel.
    """
    squeeze = audio.ndim == 1
    audio = jnp.asarray(audio, jnp.float32)
    if squeeze:
        audio = audio[None]
    if use_pallas:
        from .mel_pallas import unnormalized_log_mel_pallas
        log_spec = unnormalized_log_mel_pallas(audio, n_mels)
    else:
        log_spec = unnormalized_log_mel(audio, n_mels)
    out = normalize_log_mel(log_spec)
    out = jnp.swapaxes(out, -1, -2)  # [B, n_mels, frames]
    return out[0] if squeeze else out
