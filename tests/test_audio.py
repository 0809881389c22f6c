"""Audio frontend tests (reference surface: whisperx.load_audio,
transcribe.py:117-118 — ffmpeg decode to 16 kHz mono f32)."""

import numpy as np
import pytest

from manual_whisper_tpu.audio import (
    SAMPLE_RATE, decode_wav_bytes, load_audio, resample_poly, write_wav)
from manual_whisper_tpu.audio.native import (
    get_lib, native_decode_wav, native_resample)


def sine(freq, sr, seconds=1.0, amp=0.5):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_wav_roundtrip_16bit(tmp_path):
    x = sine(440, SAMPLE_RATE)
    path = tmp_path / "tone.wav"
    write_wav(path, x, SAMPLE_RATE)
    y = load_audio(path)
    assert y.dtype == np.float32
    assert len(y) == len(x)
    assert np.abs(y - x).max() < 2e-4  # 16-bit quantization error


def test_decode_stereo_averages_to_mono():
    import struct
    sr = 16000
    left = sine(440, sr, 0.1)
    right = sine(440, sr, 0.1) * 0.0
    inter = np.empty(2 * len(left), dtype=np.float32)
    inter[0::2], inter[1::2] = left, right
    pcm = (np.clip(inter, -1, 1) * 32767).astype("<i2").tobytes()
    header = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm),
                         b"WAVE", b"fmt ", 16, 1, 2, sr, sr * 4, 4, 16,
                         b"data", len(pcm))
    samples, got_sr = decode_wav_bytes(header + pcm)
    assert got_sr == sr and samples.shape == (len(left), 2)
    mono = samples.mean(axis=1)
    assert np.abs(mono - left / 2).max() < 2e-4


def test_resample_preserves_tone_frequency():
    sr_in = 44100
    x = sine(440, sr_in, 1.0)
    y = resample_poly(x, sr_in, 16000)
    assert abs(len(y) - 16000) <= 1
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    freqs = np.fft.rfftfreq(len(y), 1 / 16000)
    assert abs(freqs[np.argmax(spec)] - 440) < 2


def test_resample_rejects_above_nyquist():
    sr_in = 48000
    x = sine(10000, sr_in, 0.5)  # above 8 kHz target Nyquist
    y = resample_poly(x, sr_in, 16000)
    assert np.sqrt(np.mean(y ** 2)) < 0.02  # filtered out


def test_resample_identity():
    x = sine(440, 16000, 0.2)
    assert resample_poly(x, 16000, 16000) is x or np.array_equal(
        resample_poly(x, 16000, 16000), x)


@pytest.mark.skipif(get_lib() is None, reason="native lib not built")
def test_native_matches_numpy(tmp_path):
    x = sine(440, 44100, 0.5)
    write_wav(tmp_path / "t.wav", x, 44100)
    data = (tmp_path / "t.wav").read_bytes()
    ref_samples, ref_sr = decode_wav_bytes(data)
    nat_samples, nat_sr = native_decode_wav(data)
    assert ref_sr == nat_sr
    assert np.abs(np.squeeze(ref_samples) - nat_samples).max() < 1e-6

    y_np = resample_poly(x, 44100, 16000)
    y_nat = native_resample(x, 44100, 16000)
    assert y_nat is not None
    assert np.abs(y_np - y_nat).max() < 1e-5


def test_load_audio_missing_file():
    with pytest.raises(FileNotFoundError):
        load_audio("/nonexistent/file.wav")


def _extensible_wav(sr=16000, n=1600):
    """Spec-conformant WAVE_FORMAT_EXTENSIBLE 16-bit PCM mono blob."""
    import struct
    x = (0.25 * np.sin(2 * np.pi * 440 * np.arange(n) / sr))
    pcm = (x * 32767).astype("<i2").tobytes()
    sub_guid = struct.pack("<H", 1) + bytes(14)   # PCM subformat
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, sr, sr * 2, 2, 16)
    fmt += struct.pack("<HHI", 22, 16, 0x4) + sub_guid
    hdr = b"RIFF" + struct.pack("<I", 36 + len(fmt) - 16 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    hdr += b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm, x


def test_decode_extensible_wav():
    """Audacity/Windows recorders emit WAVE_FORMAT_EXTENSIBLE; the real
    format tag lives in the SubFormat GUID of the fmt body (a past
    version read past EOF and crashed on every such file)."""
    blob, x = _extensible_wav()
    samples, sr = decode_wav_bytes(blob)
    assert sr == 16000
    assert np.abs(np.squeeze(samples) - x).max() < 2e-4


def test_decode_truncated_data_chunk_raises():
    blob, _ = _extensible_wav()
    with pytest.raises(ValueError, match="truncated"):
        decode_wav_bytes(blob[:-100])


def test_json_twin_path_uses_suffix(tmp_path):
    from manual_whisper_tpu.text.formatting import format_transcript
    out = tmp_path / "v1.mdx_rec_transcript.md"
    result = {"segments": [{"text": "hi", "start": 0.0, "end": 1.0}]}
    json_file = format_transcript(result, "v1.mdx_rec.m4a", str(out),
                                  1.0, 1.0, quiet=True)
    assert json_file == str(tmp_path / "v1.mdx_rec_transcript.json")
    assert out.exists() and (tmp_path / "v1.mdx_rec_transcript.json").exists()


# ---------------------------------------------------------------------------
# Compressed-container decode (native/mwx_ffdec.cpp linking the system
# FFmpeg libraries — the reference's m4a/mp3/ogg surface, README.md:90,
# canonical .m4a input transcribe.py:239)
# ---------------------------------------------------------------------------

from pathlib import Path

from manual_whisper_tpu.audio.native import (get_ffdec, native_decode_any,
                                             native_encode_fixture)

FIXTURES = Path(__file__).parent / "fixtures"

ffdec_only = pytest.mark.skipif(
    get_ffdec() is None, reason="libmwx_ffdec not built (no FFmpeg libs)")


@ffdec_only
@pytest.mark.parametrize("ext", ["mp3", "m4a"])
def test_compressed_fixture_decodes_to_golden(ext, tmp_path):
    """Committed .mp3/.m4a fixtures decode through load_audio and match
    the committed PCM golden (decoder stability) AND the original tone
    (codec fidelity, SNR-gated since the codecs are lossy)."""
    src = np.load(FIXTURES / "tone_source.npy")
    golden = np.load(FIXTURES / f"tone_{ext}_golden.npy")
    path = tmp_path / f"tone.{ext}"
    path.write_bytes((FIXTURES / f"tone.{ext}").read_bytes())

    audio = load_audio(path)
    assert audio.dtype == np.float32
    n = min(len(audio), len(golden))
    # same-lib decode is deterministic; the loose tolerance only allows
    # for minor FFmpeg point-release drift
    np.testing.assert_allclose(audio[:n], golden[:n], atol=2e-3)
    n = min(len(audio), len(src))
    snr = 10 * np.log10(float(np.sum(src[:n] ** 2))
                        / max(float(np.sum((audio[:n] - src[:n]) ** 2)),
                              1e-12))
    assert snr > 18.0, f"{ext} SNR {snr:.1f} dB vs source tone"


@ffdec_only
@pytest.mark.parametrize("fmt,codec,ext", [
    ("mp3", "libmp3lame", "mp3"),
    ("ipod", "aac", "m4a"),
    ("ogg", "libvorbis", "ogg"),
])
def test_compressed_roundtrip_in_process(fmt, codec, ext, tmp_path):
    """encode_fixture -> load_audio round trip, fully in-process (no
    ffmpeg CLI): frequency and duration survive the codec."""
    sr = 16000
    tone = sine(220, sr, seconds=1.5, amp=0.4)
    data = native_encode_fixture(tone, sr, fmt, codec)
    path = tmp_path / f"t.{ext}"
    path.write_bytes(data)
    audio = load_audio(path)
    assert abs(len(audio) - len(tone)) < sr // 4   # codec padding only
    # dominant frequency check via zero crossings of the mid section
    mid = audio[len(audio) // 4: 3 * len(audio) // 4]
    crossings = int(np.sum(np.abs(np.diff(np.signbit(mid)))))
    freq = crossings * SAMPLE_RATE / (2 * len(mid))
    assert 200 < freq < 240, f"dominant freq {freq:.0f} Hz"


@ffdec_only
def test_compressed_garbage_raises_actionable_error(tmp_path):
    path = tmp_path / "bad.mp3"
    path.write_bytes(b"\x00\x01garbage that is not audio" * 40)
    with pytest.raises(ValueError, match="malformed|unsupported"):
        load_audio(path)


@ffdec_only
def test_decodable_suffixes_include_compressed():
    from manual_whisper_tpu.audio.io import decodable_suffixes
    sufs = decodable_suffixes()
    assert ".mp3" in sufs and ".m4a" in sufs and ".ogg" in sufs
