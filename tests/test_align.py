"""Alignment stack tests: wav2vec2 parity vs HF torch, CTC Viterbi
correctness on constructed posteriors, and the align() surface."""

import numpy as np
import pytest

from manual_whisper_tpu.models.align import (AlignModel, _group_words, align,
                                             ctc_viterbi_align)
from manual_whisper_tpu.models.wav2vec2 import (Wav2Vec2Config,
                                                convert_wav2vec2_state_dict,
                                                frames_for_samples,
                                                init_wav2vec2_params,
                                                wav2vec2_logits)

SR = 16000


# ---------------------------------------------------------------------------
# wav2vec2 numerics vs HF torch (random weights, no downloads)
# ---------------------------------------------------------------------------

HF_TINY = dict(vocab_size=12, hidden_size=64, num_hidden_layers=2,
               num_attention_heads=2, intermediate_size=128,
               conv_dim=[32] * 7, conv_kernel=[10, 3, 3, 3, 3, 2, 2],
               conv_stride=[5, 2, 2, 2, 2, 2, 2],
               num_conv_pos_embeddings=16,
               num_conv_pos_embedding_groups=2,
               do_stable_layer_norm=True, feat_extract_norm="layer",
               hidden_dropout=0.0, attention_dropout=0.0,
               feat_proj_dropout=0.0, final_dropout=0.0,
               layerdrop=0.0, apply_spec_augment=False)


def test_wav2vec2_parity_vs_hf():
    import torch
    from transformers import Wav2Vec2Config as HFW2V2Config
    from transformers import Wav2Vec2ForCTC

    torch.manual_seed(0)
    hf = Wav2Vec2ForCTC(HFW2V2Config(**HF_TINY)).eval()
    cfg = Wav2Vec2Config(vocab_size=12, hidden=64, n_layers=2, n_heads=2,
                         ffn=128, conv_dim=32, pos_conv_kernel=16,
                         pos_conv_groups=2)
    params = convert_wav2vec2_state_dict(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, SR)).astype(np.float32)
    with torch.no_grad():
        theirs = torch.log_softmax(
            hf(torch.from_numpy(audio)).logits, dim=-1).numpy()
    ours = np.asarray(wav2vec2_logits(params, audio, cfg))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=5e-3)


def test_frames_for_samples():
    assert frames_for_samples(16000) == 49  # 1 s -> 49 frames at 20 ms
    assert frames_for_samples(400) == 1
    assert frames_for_samples(0) == 0


# ---------------------------------------------------------------------------
# CTC Viterbi on constructed posteriors with known ground truth
# ---------------------------------------------------------------------------

def _posteriors(label_per_frame, vocab=5, peak=0.9):
    T = len(label_per_frame)
    p = np.full((T, vocab), (1 - peak) / (vocab - 1))
    for t, l in enumerate(label_per_frame):
        p[t, l] = peak
    return np.log(p)


def test_viterbi_recovers_planted_alignment():
    # blank=0; emit token 1 on frames 2-4, token 2 on frames 7-8
    frames = [0, 0, 1, 1, 1, 0, 0, 2, 2, 0]
    spans, total = ctc_viterbi_align(_posteriors(frames), [1, 2], blank_id=0)
    (s1, e1, sc1), (s2, e2, sc2) = spans
    assert (s1, e1) == (2, 5)
    assert (s2, e2) == (7, 9)
    assert sc1 > 0.8 and sc2 > 0.8
    assert np.isfinite(total)


def test_viterbi_repeated_labels_need_blank():
    # "1 1" must pass through a blank between the two 1s
    frames = [1, 1, 0, 1, 1]
    spans, _ = ctc_viterbi_align(_posteriors(frames), [1, 1], blank_id=0)
    (s1, e1, _), (s2, e2, _) = spans
    assert e1 <= 2 and s2 >= 3


def test_extend_span_starts_anchors_to_previous_end():
    """Peaky-CTC start correction: spans pull back toward the previous
    aligned span's end, capped by the backoff; unaligned spans pass
    through untouched and do not anchor."""
    from manual_whisper_tpu.models.align import extend_span_starts
    fd = 0.02
    spans = [(8, 9, 0.9),     # first span: no anchor, capped backoff
             (12, 13, 0.8),   # gap of 3 frames to prev end -> pulls to 9
             (-1, -1, 0.0),   # unaligned: passthrough, no anchoring
             (30, 31, 0.7)]   # far from prev end -> capped at 4 frames
    out = extend_span_starts(spans, fd, max_backoff_sec=0.08)
    assert out[0] == (4, 9, 0.9)        # 8 - 4-frame cap
    assert out[1] == (9, 13, 0.8)       # anchored to prev end 9
    assert out[2] == (-1, -1, 0.0)
    assert out[3] == (26, 31, 0.7)      # 30 - cap (prev end 13 is farther)
    # never moves a start forward, never crosses its own end
    weird = extend_span_starts([(5, 6, 1.0), (5, 7, 1.0)], fd, 0.08)
    assert weird[1][0] <= 5 and weird[1][0] >= min(6, 5)


def test_viterbi_empty_and_degenerate():
    assert ctc_viterbi_align(np.zeros((0, 5)), [1], 0)[0] == []
    assert ctc_viterbi_align(np.zeros((5, 5)), [], 0)[0] == []


def test_viterbi_long_target_backtrack():
    # >63 targets -> trellis S = 2N+1 > 127: the int8 backpointer table is
    # fine, but backtracking `s -= psi[t, s]` overflowed under NumPy 2
    # weak promotion (python-int state index cast TO int8) the moment
    # end_state exceeded 127 — a 112-char zh segment hit it (state 224).
    # Plant each of 100 labels on its own frame pair and check recovery.
    n = 100
    frames = []
    for lab in range(1, n + 1):
        frames.extend([lab, 0])
    spans, total = ctc_viterbi_align(
        _posteriors(frames, vocab=n + 1, peak=0.9),
        list(range(1, n + 1)), blank_id=0)
    assert len(spans) == n
    assert np.isfinite(total)
    for j, (s, e, score) in enumerate(spans):
        assert s == 2 * j and e >= s + 1, (j, s, e)


# ---------------------------------------------------------------------------
# align() surface
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_align_model():
    import jax
    cfg = Wav2Vec2Config.tiny_test()
    params = init_wav2vec2_params(jax.random.PRNGKey(0), cfg)
    vocab = {"<pad>": 0, "|": 1, "你": 2, "好": 3, "世": 4, "界": 5,
             "h": 6, "i": 7}
    return AlignModel(params=params, cfg=cfg, vocab=vocab, blank_id=0,
                      language="zh")


def test_align_schema(tiny_align_model):
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(SR * 3)).astype(np.float32)
    segments = [{"text": "你好世界", "start": 0.2, "end": 1.4},
                {"text": "", "start": 1.5, "end": 1.6},
                {"text": "好", "start": 1.8, "end": 2.6}]
    out = align(segments, tiny_align_model, audio)
    assert set(out) == {"segments", "word_segments"}
    assert len(out["segments"]) == 3
    for seg in out["segments"]:
        assert "words" in seg
        for w in seg["words"]:
            assert set(w) == {"word", "start", "end", "score"}
            assert 0 <= w["start"] <= w["end"] <= 3.0
    # char-aligned language: one word per character
    words0 = out["segments"][0]["words"]
    assert all(len(w["word"]) == 1 for w in words0)
    # word order is monotone in time
    starts = [w["start"] for w in words0]
    assert starts == sorted(starts)


def test_align_char_alignments_flag(tiny_align_model):
    rng = np.random.default_rng(1)
    audio = (0.1 * rng.standard_normal(SR)).astype(np.float32)
    out = align([{"text": "你好", "start": 0.0, "end": 1.0}],
                tiny_align_model, audio, return_char_alignments=True)
    assert "chars" in out["segments"][0]


def test_group_words_whitespace():
    text = "hi yo"
    times = [(0.0, 0.1, 0.9), (0.1, 0.2, 0.9), None,
             (0.3, 0.4, 0.8), (0.4, 0.5, 0.8)]
    words = _group_words(text, times, "en")
    assert [w["word"] for w in words] == ["hi", "yo"]
    assert words[0]["start"] == 0.0 and words[1]["end"] == 0.5


def test_random_align_model_fallback(monkeypatch):
    """MWX_ALLOW_RANDOM_WEIGHTS lets benchmarks exercise the full
    wav2vec2 + trellis path without checkpoints; without the flag the
    loader still raises (degradation ladder)."""
    import numpy as np
    import pytest

    from manual_whisper_tpu import config as c
    from manual_whisper_tpu.models.align import align_result, \
        load_align_model

    monkeypatch.delenv("MWX_WEIGHTS_DIR", raising=False)
    monkeypatch.setenv("MWX_ALLOW_RANDOM_WEIGHTS", "1")
    c.clear_env_cache()
    res = {"segments": [{"text": "我们的会议", "start": 0.0, "end": 2.0}]}
    audio = (np.random.default_rng(0)
             .standard_normal(16000 * 3).astype(np.float32) * 0.1)
    out = align_result(res, audio, "zh")
    assert out["segments"] and "word_segments" in out

    monkeypatch.delenv("MWX_ALLOW_RANDOM_WEIGHTS")
    c.clear_env_cache()
    with pytest.raises(FileNotFoundError):
        load_align_model("zh")


def test_wav2vec2_parity_vs_hf_conv_bias():
    """XLSR-53 fine-tunes (every default align checkpoint) have
    conv_bias=true; the converter must carry the biases and the forward
    must apply them (LN does not absorb a per-channel conv bias)."""
    import torch
    from transformers import Wav2Vec2Config as HFW2V2Config
    from transformers import Wav2Vec2ForCTC

    torch.manual_seed(1)
    hf = Wav2Vec2ForCTC(HFW2V2Config(**{**HF_TINY, "conv_bias": True})
                        ).eval()
    # give the biases real values (fresh HF init zeroes them)
    with torch.no_grad():
        for layer in hf.wav2vec2.feature_extractor.conv_layers:
            layer.conv.bias.uniform_(-0.5, 0.5)
    cfg = Wav2Vec2Config(vocab_size=12, hidden=64, n_layers=2, n_heads=2,
                         ffn=128, conv_dim=32, pos_conv_kernel=16,
                         pos_conv_groups=2)
    params = convert_wav2vec2_state_dict(hf.state_dict(), cfg)
    assert "b" in params["conv"][0]

    rng = np.random.default_rng(1)
    audio = rng.standard_normal((2, SR)).astype(np.float32)
    with torch.no_grad():
        theirs = torch.log_softmax(
            hf(torch.from_numpy(audio)).logits, dim=-1).numpy()
    ours = np.asarray(wav2vec2_logits(params, audio, cfg))
    np.testing.assert_allclose(ours, theirs, atol=5e-3)


def test_wav2vec2_padding_invariance_with_mask():
    """Bucket padding with n_valid masking must reproduce the logits of
    running the clip alone (HF attention_mask semantics) — without the
    mask, padded rows contaminate every valid frame through attention."""
    import jax
    import jax.numpy as jnp
    cfg = Wav2Vec2Config.tiny_test()
    params = init_wav2vec2_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    clip = rng.standard_normal(SR).astype(np.float32)       # 1 s
    alone = np.asarray(wav2vec2_logits(params, clip[None], cfg))

    padded = np.zeros((2, 4 * SR), np.float32)               # 4 s bucket
    padded[0, :SR] = clip
    n_valid = jnp.asarray([SR, 0], jnp.int32)
    masked = np.asarray(wav2vec2_logits(params, padded, cfg, n_valid))
    nf = frames_for_samples(SR)
    np.testing.assert_allclose(masked[0, :nf], alone[0, :nf],
                               atol=2e-3, rtol=1e-3)
    assert np.isfinite(masked).all()

    unmasked = np.asarray(wav2vec2_logits(params, padded, cfg))
    assert np.abs(unmasked[0, :nf] - alone[0, :nf]).max() > 1e-3


def test_align_infeasible_trellis_skipped(tiny_align_model):
    """Hallucinated over-long text in a tiny clip (2N+1 states > frames)
    must fall back to segment timestamps, not backtrack into garbage."""
    rng = np.random.default_rng(3)
    audio = (0.1 * rng.standard_normal(int(SR * 0.3))).astype(np.float32)
    text = "你" * 200   # 401 trellis states vs ~14 frames
    out = align([{"text": text, "start": 0.0, "end": 0.3}],
                tiny_align_model, audio)
    seg = out["segments"][0]
    assert seg["start"] == 0.0 and seg["end"] == 0.3
    assert seg["words"] == []          # no fabricated word timings
    assert out["word_segments"] == []


# ---------------------------------------------------------------------------
# start-anchor cap validation across onset lengths (VERDICT r4 #7)
# ---------------------------------------------------------------------------

def _render_ramped_words(words, ramp_sec, sustain_sec=0.24, gap_sec=0.5):
    """Synth words whose amplitude ramps 0->1 over ``ramp_sec`` before the
    0.24 s sustain — variable-length onsets (slow attacks) the fixed-cap
    start anchor must not mistake for emission delay."""
    from manual_whisper_tpu.eval.synth import NOISE, WORDS
    rng = np.random.default_rng(7)
    parts = [np.zeros(int(0.3 * SR), np.float32)]
    times = []
    cursor = 0.3
    for w in words:
        dur = ramp_sec + sustain_sec
        t = np.arange(int(dur * SR)) / SR
        f1, f2 = WORDS[w]
        x = 0.5 * (np.sin(2 * np.pi * f1 * t) + np.sin(2 * np.pi * f2 * t))
        env = (np.minimum(1.0, t / max(ramp_sec, 1e-6))
               if ramp_sec > 0 else np.ones_like(t))
        rel = int(0.02 * SR)
        env[-rel:] *= np.linspace(1, 0, rel)
        parts.append((0.45 * x * env).astype(np.float32))
        times.append((w, cursor, cursor + dur))
        parts.append(np.zeros(int(gap_sec * SR), np.float32))
        cursor += dur + gap_sec
    audio = np.concatenate(parts)
    audio += NOISE * rng.standard_normal(len(audio)).astype(np.float32)
    return audio, times


@pytest.fixture(scope="module")
def synth_align_model():
    """The committed synth-trained aligner (the hermetic-registry autouse
    fixture pins an empty dir; this module-scoped load goes straight to
    the repo registry instead)."""
    import os
    from pathlib import Path
    from manual_whisper_tpu import config
    repo_weights = Path(__file__).resolve().parent.parent / ".weights"
    old = {k: os.environ.get(k)
           for k in ("MWX_WEIGHTS_DIR", "MWX_ALLOW_SYNTH_WEIGHTS")}
    os.environ["MWX_WEIGHTS_DIR"] = str(repo_weights)
    os.environ["MWX_ALLOW_SYNTH_WEIGHTS"] = "1"
    config.clear_env_cache()
    try:
        from manual_whisper_tpu.models.align import load_align_model
        yield load_align_model("en")
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        config.clear_env_cache()


def _mean_start_err(model, audio, times, cap, monkeypatch):
    from manual_whisper_tpu import config
    monkeypatch.setenv("MWX_ALIGN_START_BACKOFF_SEC", str(cap))
    config.clear_env_cache()
    text = " ".join(w for w, _, _ in times)
    out = align([{"text": text, "start": 0.0,
                  "end": len(audio) / SR}], model, audio)
    errs = []
    for w, ts, te in times:
        m = [x for x in out["word_segments"]
             if x["word"] == w and abs(x["start"] - ts) < 0.45]
        if m:
            errs.append(m[0]["start"] - ts)
    assert len(errs) >= len(times) - 1, "aligner lost words"
    return float(np.mean(errs))


def test_start_anchor_cap_across_onset_lengths(synth_align_model,
                                               monkeypatch):
    """Sweep attack-ramp lengths (0 / 160 / 320 ms) against the trained
    aligner: the default 80 ms cap must track slow onsets without
    swallowing the 0.5 s true silences between words (measured r5:
    mean start error ~ -10 ms at every ramp length).  A 400 ms cap is
    the documented failure direction — it extends starts deep into the
    true silence (mean error < -60 ms).  Validates the
    MWX_ALIGN_START_BACKOFF_SEC default beyond the plain eval corpus
    (VERDICT r4 #7)."""
    words = ["ba", "de", "ki", "lo"]
    for ramp in (0.0, 0.16, 0.32):
        audio, times = _render_ramped_words(words, ramp, gap_sec=0.6)
        err = _mean_start_err(synth_align_model, audio, times, 0.08,
                              monkeypatch)
        # no under-extension on long onsets, no silence-swallowing
        assert abs(err) < 0.06, (ramp, err)
    # over-large cap: starts extend into true silence (failure direction
    # the cap exists to prevent) — proves the knob is load-bearing
    audio, times = _render_ramped_words(words, 0.16, gap_sec=0.6)
    err_big = _mean_start_err(synth_align_model, audio, times, 0.40,
                              monkeypatch)
    assert err_big < -0.06, err_big


def test_start_backoff_env_knob(monkeypatch):
    from manual_whisper_tpu import config
    from manual_whisper_tpu.models.align import (START_BACKOFF_SEC,
                                                 start_backoff_sec)
    config.clear_env_cache()
    assert start_backoff_sec() == START_BACKOFF_SEC
    monkeypatch.setenv("MWX_ALIGN_START_BACKOFF_SEC", "0.2")
    config.clear_env_cache()
    assert start_backoff_sec() == 0.2
