"""Pipeline integration tests (SURVEY.md §4: synthetic WAVs through
VAD->ASR with a tiny model on the CPU backend)."""

import numpy as np
import pytest

from manual_whisper_tpu.pipeline import load_model, merge_chunks
from manual_whisper_tpu.pipeline.chunking import (SpeechChunk, batch_chunks,
                                                  pad_audio_window)

SR = 16000


def test_merge_chunks_respects_limit():
    regions = [(0.0, 10.0), (12.0, 25.0), (26.0, 29.0), (40.0, 45.0)]
    chunks = merge_chunks(regions, chunk_size=30.0)
    assert all(c.duration <= 30.0 + 1e-9 for c in chunks)
    # first three regions fit one window; the last starts a new one
    assert len(chunks) == 2
    assert chunks[0].regions == [(0.0, 10.0), (12.0, 25.0), (26.0, 29.0)]
    assert chunks[1].start == 40.0


def test_merge_chunks_splits_long_regions():
    chunks = merge_chunks([(0.0, 75.0)], chunk_size=30.0)
    assert [round(c.duration, 3) for c in chunks] == [30.0, 30.0, 15.0]
    assert chunks[0].start == 0.0 and chunks[2].end == 75.0


def test_merge_chunks_empty():
    assert merge_chunks([], 30.0) == []


def test_pad_audio_window():
    audio = np.arange(SR * 2, dtype=np.float32)
    win = pad_audio_window(audio, 0.5, 1.0, window_samples=SR)
    assert win.shape == (SR,)
    assert win[0] == audio[SR // 2]
    assert (win[SR // 2:] == 0).all()  # zero pad past the 0.5s clip


def test_batch_chunks_static_shapes():
    audio = np.ones(SR * 10, np.float32)
    chunks = [SpeechChunk(float(i), float(i) + 0.5, [(float(i), float(i) + .5)])
              for i in range(5)]
    batches = batch_chunks(audio, chunks, batch_size=2, window_samples=SR)
    assert len(batches) == 3
    assert batches[0][0].shape == (2, SR)
    assert batches[1][0].shape == (2, SR)
    # trailing single chunk drops to the 1-row bucket
    assert batches[2][0].shape == (1, SR)
    assert len(batches[-1][1]) == 1


def test_batch_chunks_bucket_ladder():
    audio = np.ones(SR * 40, np.float32)
    chunks = [SpeechChunk(float(i), float(i) + 0.5,
                          [(float(i), float(i) + .5)]) for i in range(19)]
    batches = batch_chunks(audio, chunks, batch_size=16, window_samples=SR)
    # 16 + 3 -> full batch then the 4-row bucket
    assert [arr.shape[0] for arr, _ in batches] == [16, 4]


@pytest.fixture(scope="module")
def tiny_pipeline():
    return load_model("test", language="zh")


def _speech_audio(seconds=4.0):
    rng = np.random.default_rng(0)
    t = np.arange(int(SR * seconds)) / SR
    x = 0.002 * rng.standard_normal(len(t)).astype(np.float32)
    mask = (t % 2.0) < 1.2   # speech bursts every 2s
    x[mask] += (0.4 * np.sin(2 * np.pi * 240 * t[mask])).astype(np.float32)
    return x


def test_transcribe_end_to_end_contract(tiny_pipeline):
    progress = []
    result = tiny_pipeline.transcribe(
        _speech_audio(), batch_size=2, language="zh",
        progress_callback=lambda pct, msg: progress.append((pct, msg)))
    assert set(result.keys()) == {"segments", "language"}
    assert result["language"] == "zh"
    for seg in result["segments"]:
        assert set(seg) >= {"text", "start", "end"}
        assert 0 <= seg["start"] < seg["end"] <= 4.0 + 1e-6
    # progress is monotone and reaches 100
    pcts = [p for p, _ in progress]
    assert pcts == sorted(pcts) and pcts[-1] == 100.0


def test_warmup_precompiles_and_matches_runtime(tiny_pipeline):
    """warmup() runs every bucket through the real encode+decode path and
    reports progress; a transcribe afterwards still works (shapes/statics
    identical, so runtime is a pure cache hit)."""
    msgs = []
    tiny_pipeline.warmup(batch_size=4,
                         progress_callback=lambda p, m: msgs.append((p, m)))
    assert any("batch-4" in m for _, m in msgs)
    assert any("batch-1" in m for _, m in msgs)
    assert msgs[-1][1] == "warmup: done"
    result = tiny_pipeline.transcribe(_speech_audio(), batch_size=4,
                                      language="zh")
    assert "segments" in result


def test_transcribe_per_call_overrides_do_not_mutate_state(tiny_pipeline):
    """Second-pass style calls pass stricter VAD + no prompt as arguments;
    shared pipeline state must stay untouched (a daemon thread runs these
    concurrently with main-pass jobs)."""
    from manual_whisper_tpu.models.vad import VadOptions
    saved_opts = tiny_pipeline.vad_options
    saved_asr = dict(tiny_pipeline.asr_options)
    result = tiny_pipeline.transcribe(
        _speech_audio(), batch_size=2, language="zh",
        vad_options=VadOptions(vad_onset=0.60, vad_offset=0.42),
        initial_prompt=None, temperature=(0.0,))
    assert "segments" in result
    assert tiny_pipeline.vad_options is saved_opts
    assert tiny_pipeline.asr_options == saved_asr
    # the override decoder is cached under its own key, not the default's
    keys = list(tiny_pipeline._decoders)
    assert any(k[2] is None for k in keys)


def test_transcribe_silence_returns_empty(tiny_pipeline):
    result = tiny_pipeline.transcribe(
        np.zeros(SR * 2, np.float32), batch_size=2, language="zh")
    assert result["segments"] == []


def test_transcribe_silence_skips_language_detection(monkeypatch):
    """No-speech audio with no language pinned must not dispatch a
    detection forward (argmax over noise logits) and must keep the
    stable 'zh' default in the response."""
    model = load_model("test")          # no language
    model.language = None
    def boom(_audio):
        raise AssertionError("detect_language dispatched on silence")
    monkeypatch.setattr(model, "detect_language", boom)
    result = model.transcribe(np.zeros(SR * 2, np.float32), batch_size=2)
    assert result == {"segments": [], "language": "zh"}


def test_detect_language_runs(tiny_pipeline):
    lang = tiny_pipeline.detect_language(_speech_audio(2.0))
    assert isinstance(lang, str) and len(lang) >= 2


def test_load_model_guards_random_weights(monkeypatch):
    monkeypatch.delenv("MWX_ALLOW_RANDOM_WEIGHTS", raising=False)
    monkeypatch.delenv("MWX_WEIGHTS_DIR", raising=False)
    with pytest.raises(FileNotFoundError):
        load_model("large-v3")
    with pytest.raises(KeyError):
        load_model("nonexistent-model")
    monkeypatch.setenv("MWX_ALLOW_RANDOM_WEIGHTS", "1")
    pipe = load_model("tiny", language="zh")
    assert pipe.cfg.name == "tiny"


def test_transcribe_timestamp_mode():
    """asr_options.without_timestamps=False -> sub-chunk segments from
    timestamp tokens."""
    pipe = load_model("test", language="zh",
                      asr_options={"without_timestamps": False,
                                   "max_new_tokens": 10})
    result = pipe.transcribe(_speech_audio(), batch_size=2, language="zh",
                             temperature=(0.0,))
    for seg in result["segments"]:
        assert set(seg) == {"text", "start", "end"}
        assert 0 <= seg["start"] <= seg["end"] <= 4.0 + pipe.window_sec


def test_whisperx_style_top_level_api():
    import manual_whisper_tpu as mwx
    assert callable(mwx.load_model)
    assert callable(mwx.load_audio)
    assert callable(mwx.load_align_model)
    assert callable(mwx.align)
    assert callable(mwx.assign_word_speakers)
    assert callable(mwx.DiarizationPipeline)
    with pytest.raises(AttributeError):
        mwx.nonexistent_symbol


def test_baseline_config_harness_runs():
    """tools/run_configs.py config 1 (single-window greedy) on the tiny
    model: the harness exercises pipeline + cleaners and reports RTF."""
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "tools/run_configs.py"
    spec = importlib.util.spec_from_file_location("run_configs", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    row = mod.run_config(1, model_override="test")
    assert row["config"] == 1 and row["audio_sec"] == 30.0
    assert row["rtf"] > 0 and row["segments"] >= 0


def test_asr_options_forward_every_decoding_field(tiny_pipeline):
    """Every DecodingOptions field set in asr_options reaches the decoder.

    Regression: the pipeline used to forward a hardcoded subset, silently
    dropping suppress_blank / thresholds — undetectable until a decode
    depended on one (the synth eval's char tokenizer needs the bare space
    as its first generated token, which suppress_blank bans)."""
    from manual_whisper_tpu.pipeline.transcribe import TranscribePipeline

    pipe = TranscribePipeline(
        tiny_pipeline.params, tiny_pipeline.cfg, tiny_pipeline.tokenizer,
        asr_options={"suppress_blank": False, "suppress_non_speech": False,
                     "no_speech_threshold": 0.9, "max_new_tokens": 12,
                     "log_prob_threshold": None, "beam_size": 2,
                     "ckv_scale_bf16": True,  # MWX_CKV_SCALE=bf16 (cli/jobs)
                     "not_a_decoding_option": 1},  # unknown keys ignored
        language="zh")
    dec = pipe._decoder("zh", (0.0,))
    assert dec.opts.suppress_blank is False
    assert dec.opts.suppress_non_speech is False
    assert dec.opts.no_speech_threshold == 0.9
    assert dec.opts.max_new_tokens == 12
    assert dec.opts.log_prob_threshold is None
    assert dec.opts.beam_size == 2
    assert dec.opts.ckv_scale_bf16 is True


def test_bounded_inflight_matches_unbounded(monkeypatch):
    """MWX_MAX_INFLIGHT_BATCHES=1 (finalize each batch before dispatching
    the next) must produce exactly the segments of the default window —
    the bound only limits memory, never changes results or order."""
    from manual_whisper_tpu import config as mwx_config
    model = load_model("test", language="zh")
    audio = _speech_audio(20.0)
    # greedy only: ladder retries draw fresh per-dispatch sampling keys
    # (by design), which differ with dispatch interleaving
    ref = model.transcribe(audio, batch_size=2, language="zh",
                           temperature=(0.0,))
    monkeypatch.setenv("MWX_MAX_INFLIGHT_BATCHES", "1")
    mwx_config.clear_env_cache()
    try:
        got = model.transcribe(audio, batch_size=2, language="zh",
                               temperature=(0.0,))
    finally:
        monkeypatch.delenv("MWX_MAX_INFLIGHT_BATCHES")
        mwx_config.clear_env_cache()
    assert got == ref
    starts = [s["start"] for s in got["segments"]]
    assert starts == sorted(starts)


def test_fetch_worker_matches_serial(monkeypatch):
    """MWX_FETCH_WORKER=0 (inline finalization on the dispatch thread)
    must produce exactly the threaded default's segments — the worker
    only moves host work off the critical path, never changes results,
    order, or the progress contract."""
    from manual_whisper_tpu import config as mwx_config
    model = load_model("test", language="zh")
    audio = _speech_audio(20.0)
    progress: list = []
    ref = model.transcribe(audio, batch_size=2, language="zh",
                           temperature=(0.0,),
                           progress_callback=lambda p, m:
                           progress.append(p))
    assert progress and progress[-1] == 100.0
    monkeypatch.setenv("MWX_FETCH_WORKER", "0")
    mwx_config.clear_env_cache()
    try:
        got = model.transcribe(audio, batch_size=2, language="zh",
                               temperature=(0.0,))
    finally:
        monkeypatch.delenv("MWX_FETCH_WORKER")
        mwx_config.clear_env_cache()
    assert got == ref
    starts = [s["start"] for s in got["segments"]]
    assert starts == sorted(starts)


def test_decoder_cache_is_lru_bounded(tiny_pipeline):
    """Per-request prompt overrides must not grow the decoder cache (and
    its compiled programs) unboundedly over a server's lifetime."""
    for i in range(12):
        tiny_pipeline._decoder("zh", (0.0,), initial_prompt=f"p{i}")
    assert len(tiny_pipeline._decoders) <= 8
    # most-recent keys survive
    keys = list(tiny_pipeline._decoders)
    assert ("zh", (0.0,), "p11") in keys and ("zh", (0.0,), "p0") not in keys
