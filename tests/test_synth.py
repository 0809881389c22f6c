"""Synthetic tone-language corpus: determinism and fixture invariants.

The corpus is the ground truth behind EVAL_r*.json (tools/train_synth.py +
tools/run_synth_eval.py); if rendering drifts, recorded quality numbers
stop being comparable across rounds — hence the bit-exactness tests.
"""

import numpy as np

from manual_whisper_tpu.eval.synth import (GAP_SEC, WORD_SEC, WORDS,
                                           make_corpus, render_conversation,
                                           render_file, render_utterance,
                                           sample_text, turns_to_rttm)
from manual_whisper_tpu.models import MODEL_CONFIGS
from manual_whisper_tpu.tokenizer import make_test_tokenizer


def test_render_deterministic():
    a = render_utterance(["bo", "ta"], seed=7)
    b = render_utterance(["bo", "ta"], seed=7)
    np.testing.assert_array_equal(a, b)
    c = render_utterance(["bo", "ta"], seed=8)
    assert not np.array_equal(a, c)


def test_corpus_deterministic_and_fits_window():
    """Every utterance must fit the test config's 1.2 s model window with
    100 ms of onset-jitter headroom (tools/train_synth.py)."""
    cfg = MODEL_CONFIGS["test"]
    window = cfg.n_audio_ctx * 2 * 160
    corpus = make_corpus(64, seed=3)
    again = make_corpus(64, seed=3)
    for (a1, t1), (a2, t2) in zip(corpus, again):
        np.testing.assert_array_equal(a1, a2)
        assert t1 == t2
        assert len(a1) + 1600 <= window
        assert all(w in WORDS for w in t1.split())


def test_tokens_fit_training_seq_len():
    # mirrors tools/train_synth.py exactly: seq_len = 36 and the same
    # 4-token prefix (sot_sequence with without_timestamps=True) — a
    # stale pinned constant previously drifted from the trainer
    # (ADVICE r2)
    seq_len = 36                              # train_synth.py seq_len
    tk = make_test_tokenizer()
    prefix = tk.sot_sequence(language="en", task="transcribe",
                             without_timestamps=True)
    longest_word = max(WORDS, key=len)
    longest = " ".join([longest_word] * 8)   # longest word x max_words
    toks = prefix + tk.encode(" " + longest) + [tk.special.eot]
    assert len(toks) <= seq_len


def test_render_file_transcript_order():
    utts = [["bo", "da"], ["sa"], ["ta", "ki", "la"]]
    audio, text = render_file(utts, seed=0)
    assert text == "bo da sa ta ki la"
    # silence gaps exist between utterances (VAD separability)
    assert len(audio) > sum(len(u) for u in utts) * int(
        (WORD_SEC + GAP_SEC) * 16000)


def test_conversation_rttm_consistent():
    audio, turns = render_conversation(n_turns=6, seed=2)
    assert {t.speaker for t in turns} == {"SPEAKER_00", "SPEAKER_01"}
    rttm = turns_to_rttm(turns)
    dur = len(audio) / 16000.0
    prev_end = 0.0
    for t in rttm:
        assert 0.0 <= t["start"] < t["end"] <= dur + 1e-6
        assert t["start"] >= prev_end          # non-overlapping turns
        prev_end = t["end"]


def test_sample_text_bounds():
    rng = np.random.default_rng(0)
    for _ in range(200):
        words = sample_text(rng, 1, 3)
        assert 1 <= len(words) <= 3


def test_trained_pipeline_decodes_clean_file():
    """End-to-end quality tripwire on the committed synth checkpoint: a
    clean held-out file must decode at low WER.  Guards decode-path
    regressions the unit suite can miss — a suppress-list change once
    banned the space token and drove WER to 1.0 while every other test
    stayed green."""
    from manual_whisper_tpu.convert.from_hf import load_params
    from manual_whisper_tpu.eval.metrics import wer
    from manual_whisper_tpu.eval.synth import render_file_with_times, \
        sample_text
    from manual_whisper_tpu.models import MODEL_CONFIGS
    from manual_whisper_tpu.pipeline.transcribe import TranscribePipeline
    from manual_whisper_tpu.text import clean_result_segments
    from manual_whisper_tpu.tokenizer import make_test_tokenizer

    params = load_params(".synth_ckpt")
    if params is None:
        import pytest
        pytest.skip("no committed synth checkpoint")
    model = TranscribePipeline(params, MODEL_CONFIGS["test"],
                               make_test_tokenizer(),
                               asr_options={"max_new_tokens": 40,
                                            "suppress_blank": False},
                               language="en")
    rng = np.random.default_rng(123)
    utts = [sample_text(rng, 4, 8) for _ in range(3)]
    audio, words_t = render_file_with_times(utts, seed=123)
    truth = " ".join(w for w, _, _ in words_t)
    result = model.transcribe(audio, batch_size=4, language="en")
    cleaned, _, _ = clean_result_segments(result["segments"])
    hyp = " ".join(s["text"].strip() for s in cleaned)
    assert wer(truth, hyp) < 0.3, f"ref={truth!r} hyp={hyp!r}"
