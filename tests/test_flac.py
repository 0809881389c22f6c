"""Native FLAC decoder tests (reference surface: ffmpeg compressed-audio
decode inside whisperx.load_audio, transcribe.py:117; format list
README.md:90).  The fixture encoder (audio/flacenc.py) exercises every
decoder path without needing ffmpeg or a flac binary on the host."""

import numpy as np
import pytest

from manual_whisper_tpu.audio import SAMPLE_RATE, encode_flac, load_audio, \
    write_flac
from manual_whisper_tpu.audio.native import get_lib, native_decode_flac

pytestmark = pytest.mark.skipif(
    get_lib() is None or not hasattr(get_lib(), "mwx_decode_flac"),
    reason="native FLAC decoder not built")


def quantized(x):
    """What a 16-bit FLAC round trip should give back for float input."""
    return np.round(np.clip(x, -1, 1) * 32767).astype(np.float32) / 32768.0


def noise(n, seed=0, amp=0.3):
    rng = np.random.default_rng(seed)
    return (amp * rng.standard_normal(n)).clip(-1, 1).astype(np.float32)


@pytest.mark.parametrize("predictor",
                         ["fixed0", "fixed1", "fixed2", "lpc", "verbatim"])
def test_mono_roundtrip_predictors(predictor):
    x = noise(12000, seed=1)
    dec, sr = native_decode_flac(encode_flac(x, 16000, predictor=predictor))
    assert sr == 16000 and len(dec) == len(x)
    np.testing.assert_allclose(dec, quantized(x), atol=1e-7)


def test_constant_subframe_silence():
    x = np.zeros(5000, np.float32)
    dec, sr = native_decode_flac(encode_flac(x, 16000))
    assert len(dec) == 5000 and np.abs(dec).max() == 0.0


@pytest.mark.parametrize("mode",
                         ["independent", "left_side", "right_side",
                          "mid_side"])
def test_stereo_decorrelation_downmix(mode):
    n = 9000
    stereo = np.stack([noise(n, seed=2), noise(n, seed=3, amp=0.2)], axis=1)
    dec, sr = native_decode_flac(
        encode_flac(stereo, 16000, stereo_mode=mode))
    assert sr == 16000 and len(dec) == n
    expected = quantized(stereo).mean(axis=1)
    np.testing.assert_allclose(dec, expected, atol=1e-7)


def test_partial_last_block_and_uncommon_size():
    # 3000 isn't a coded block size -> explicit 16-bit size path, and the
    # stream length isn't a multiple of it -> short final frame
    x = noise(7001, seed=4)
    dec, _ = native_decode_flac(encode_flac(x, 16000, block_size=3000))
    assert len(dec) == 7001
    np.testing.assert_allclose(dec, quantized(x), atol=1e-7)


def test_rice_escape_on_incompressible_residual():
    # full-scale alternating +/- residuals make Rice blow up -> raw-bits
    # escape (encoder) and escape-read path (decoder)
    x = np.empty(4096, np.float32)
    x[0::2], x[1::2] = 0.999, -0.999
    dec, _ = native_decode_flac(encode_flac(x, 16000, predictor="fixed2"))
    np.testing.assert_allclose(dec, quantized(x), atol=1e-7)


def test_many_frames_utf8_numbers():
    # >128 frames exercises multi-byte UTF-8 frame numbering
    x = noise(192 * 130, seed=5, amp=0.1)
    dec, _ = native_decode_flac(encode_flac(x, 16000, block_size=192))
    assert len(dec) == len(x)
    np.testing.assert_allclose(dec, quantized(x), atol=1e-7)


def test_load_audio_flac_resamples(tmp_path):
    sr_in = 32000
    t = np.arange(sr_in) / sr_in
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = tmp_path / "tone.flac"
    write_flac(path, x, sr_in)
    y = load_audio(path)
    assert y.dtype == np.float32
    assert abs(len(y) - SAMPLE_RATE) <= 1
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    freqs = np.fft.rfftfreq(len(y), 1 / SAMPLE_RATE)
    assert abs(freqs[np.argmax(spec)] - 440) < 2


def test_load_audio_flac_native_path(tmp_path):
    x = noise(SAMPLE_RATE, seed=6)
    path = tmp_path / "n.flac"
    write_flac(path, x, SAMPLE_RATE)
    y = load_audio(path)
    np.testing.assert_allclose(y, quantized(x), atol=1e-7)


def test_malformed_stream_raises():
    with pytest.raises(ValueError):
        native_decode_flac(b"fLaC" + b"\x00" * 16)


def test_decodable_suffixes_advertises_flac(monkeypatch):
    import shutil
    from manual_whisper_tpu.audio import io as audio_io
    monkeypatch.setattr(shutil, "which", lambda _: None)
    assert ".flac" in audio_io.decodable_suffixes()


def test_huge_streaminfo_total_rejected_fast():
    """A crafted 36-bit STREAMINFO total must be rejected (rc -5), not
    drive a multi-GB allocation (anti-DoS; found by the ASan fuzzer)."""
    from manual_whisper_tpu.audio.flacenc import _BitWriter
    si = _BitWriter()
    si.bits(4096, 16); si.bits(4096, 16)
    si.bits(0, 24); si.bits(0, 24)
    si.bits(16000, 20); si.bits(0, 3); si.bits(15, 5)
    si.bits((1 << 36) - 1, 36)          # absurd total_samples
    si.bits(0, 64); si.bits(0, 64)
    body = si.getvalue()
    stream = b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body
    import time
    t0 = time.time()
    with pytest.raises(ValueError):
        native_decode_flac(stream)
    assert time.time() - t0 < 1.0


def test_streaming_stream_with_trailing_junk():
    """total_samples=0 (streaming encoder) + trailing tag bytes after the
    last frame: decoded audio must be kept, not discarded (ffmpeg-like
    tolerance; a bad FIRST frame is still an error)."""
    x = noise(6000, seed=7)
    s = bytearray(encode_flac(x, 16000))
    # STREAMINFO: bytes 18..25 hold sr(20)|ch(3)|bps(5)|total(36);
    # zero the 36-bit total (low nibble of byte 21 + bytes 22-25)
    s[21] &= 0xF0
    s[22:26] = b"\x00\x00\x00\x00"
    s += b"APETAGEX" * 4   # byte-aligned trailing junk
    dec, sr = native_decode_flac(bytes(s))
    assert sr == 16000 and len(dec) == 6000
    np.testing.assert_allclose(dec, quantized(x), atol=1e-7)
