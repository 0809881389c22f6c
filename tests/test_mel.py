"""Log-mel frontend golden tests vs HF WhisperFeatureExtractor.

The feature extractor in transformers is pure numpy and needs no downloads,
so it serves as the offline golden reference (SURVEY.md §4: "mel frontend vs
librosa/HF reference fixtures").  Strategy: exactness is asserted at
float64 (same algorithm); the float32 production path is asserted within a
precision band — float32 DFT rounding only matters within noise of the
-8-decade dynamic-range floor that Whisper clamps anyway.

Golden fixtures use 3 s chunks (chunk_length=3): HF's numpy STFT loops
per-frame in Python and takes minutes at the full 30 s.
"""

import numpy as np
import pytest

from manual_whisper_tpu.ops.mel import (
    HOP_LENGTH, log_mel_spectrogram, mel_filter_bank, normalize_log_mel,
    unnormalized_log_mel)

CHUNK_S = 3
T = 16000 * CHUNK_S
FRAMES = T // HOP_LENGTH


def _hf_features(audio, n_mels):
    from transformers import WhisperFeatureExtractor
    fe = WhisperFeatureExtractor(feature_size=n_mels, chunk_length=CHUNK_S)
    out = fe(audio, sampling_rate=16000, padding="max_length",
             max_length=T, return_tensors="np")
    return out.input_features[0]


def _chirp(seconds=float(CHUNK_S), sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = (0.4 * np.sin(2 * np.pi * (200 + 50 * t) * t)
         + 0.1 * rng.standard_normal(len(t)))
    return x.astype(np.float32)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_mel_filter_bank_matches_hf(n_mels):
    from transformers.audio_utils import mel_filter_bank as hf_fb
    ours = mel_filter_bank(n_mels)
    theirs = hf_fb(num_frequency_bins=201, num_mel_filters=n_mels,
                   min_frequency=0.0, max_frequency=8000.0,
                   sampling_rate=16000, norm="slaney", mel_scale="slaney")
    np.testing.assert_allclose(ours, theirs, atol=1e-7)


def _numpy_f64_log_mel(audio, n_mels):
    """Our algorithm at float64 in numpy, using the same constant matrices
    the JAX/Pallas paths consume (_dft_window_matrix, mel_filter_bank)."""
    from manual_whisper_tpu.ops.mel import N_FFT, N_FREQS, _dft_window_matrix
    padded = np.pad(audio.astype(np.float64), N_FFT // 2, mode="reflect")
    frames = np.lib.stride_tricks.sliding_window_view(
        padded, N_FFT)[::HOP_LENGTH][: len(audio) // HOP_LENGTH]
    spec = frames @ _dft_window_matrix()
    power = spec[:, :N_FREQS] ** 2 + spec[:, N_FREQS:] ** 2
    mel = power @ mel_filter_bank(n_mels)
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).T


@pytest.mark.parametrize("n_mels", [80, 128])
def test_log_mel_matches_hf_exact_f64(n_mels):
    """Algorithm exactness: our constants at float64 == HF's reference."""
    audio = _chirp()
    golden = _hf_features(audio, n_mels)
    ours = _numpy_f64_log_mel(audio, n_mels)
    assert ours.shape == golden.shape == (n_mels, FRAMES)
    # golden is float32-cast by HF; atol covers its representation error
    np.testing.assert_allclose(ours, golden, atol=3e-5)


def test_log_mel_f32_precision_band():
    """Production float32 path stays within rounding noise of golden."""
    audio = _chirp()
    golden = _hf_features(audio, 80)
    ours = np.asarray(log_mel_spectrogram(audio, n_mels=80))
    diff = np.abs(ours - golden)
    assert diff.mean() < 2e-3
    assert diff.max() < 0.1  # isolated bins near the clamp floor only
    # bins well above the dynamic-range floor (top 2 decades) are tight
    strong = golden > golden.max() - 0.5
    assert diff[strong].max() < 2e-3


def test_log_mel_batched():
    audio = np.stack([_chirp(seed=0), _chirp(seed=1)])
    out = np.asarray(log_mel_spectrogram(audio, n_mels=80))
    assert out.shape == (2, 80, FRAMES)
    # per-sample normalisation: each sample matches its solo run
    solo = np.asarray(log_mel_spectrogram(audio[1], n_mels=80))
    np.testing.assert_allclose(out[1], solo, atol=1e-5)


def test_silence_normalisation():
    # all-zero audio hits the 1e-10 floor everywhere; output is finite
    out = np.asarray(log_mel_spectrogram(np.zeros(T, np.float32)))
    assert np.isfinite(out).all()


def test_pallas_kernel_matches_xla_interpret():
    """Fused kernel (interpreter mode on CPU) == XLA reference path.

    Uses a small frame block (same kernel code as the TPU default of 600)
    because interpreter mode is orders of magnitude slower than compiled.
    """
    from manual_whisper_tpu.ops.mel_pallas import unnormalized_log_mel_pallas
    fb = 40
    n_blocks = 2
    seconds = n_blocks * fb * HOP_LENGTH / 16000
    audio = _chirp(seconds=seconds)[None]
    ref = np.asarray(unnormalized_log_mel(audio, 80))
    ker = np.asarray(unnormalized_log_mel_pallas(audio, 80, interpret=True,
                                                 frame_block=fb))
    assert ker.shape == ref.shape == (1, n_blocks * fb, 80)
    np.testing.assert_allclose(ker, ref, atol=2e-4)


def test_pallas_rejects_irregular_length():
    from manual_whisper_tpu.ops.mel_pallas import unnormalized_log_mel_pallas
    with pytest.raises(ValueError):
        unnormalized_log_mel_pallas(np.zeros((1, 16000), np.float32), 80,
                                    interpret=True)
