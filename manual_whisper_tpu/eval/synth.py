"""Deterministic synthetic speech: a tone-coded language with known text.

The reference's quality is defined by real checkpoints the build cannot
download here (transcribe.py:107-113 pulls from the HF hub), so quality
numbers need ground truth that exists *inside* the repo.  This module
defines a tiny artificial language — each word is a fixed two-tone chord
— plus renderers for utterances, multi-utterance files (VAD/chunking
exercise), and two-speaker conversations with RTTM truth (diarization
exercise).  tools/train_synth.py trains the `test` Whisper config on it;
tools/run_synth_eval.py then measures WER/CER/DER through the FULL
pipeline (VAD -> chunk -> mel -> encode -> decode -> cleanup), giving a
real, regressable metric (EVAL_r02.json) instead of an asserted one.

Everything is seeded and pure-numpy: corpora regenerate bit-identically.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

SAMPLE_RATE = 16000

# Ten words; each is a two-tone chord.  Frequencies sit on distinct mel
# bins well inside the 80-mel / 8 kHz front end and avoid harmonic
# collisions (no f being a multiple of another word's f).
WORDS: Dict[str, Tuple[float, float]] = {
    "bo": (220.0, 330.0),
    "da": (290.0, 470.0),
    "ki": (380.0, 610.0),
    "lu": (500.0, 790.0),
    "mei": (650.0, 1030.0),
    "nan": (840.0, 1340.0),
    "po": (1090.0, 1740.0),
    "ri": (1410.0, 2260.0),
    "su": (1830.0, 2930.0),
    "ta": (2370.0, 3800.0),
}
WORD_LIST = list(WORDS)

WORD_SEC = 0.24          # voiced part
GAP_SEC = 0.06           # intra-utterance gap between words
NOISE = 0.002            # additive noise floor


def _tone(freqs: Sequence[float], seconds: float,
          sr: int = SAMPLE_RATE) -> np.ndarray:
    t = np.arange(int(seconds * sr)) / sr
    x = sum(np.sin(2 * np.pi * f * t) for f in freqs) / len(freqs)
    # Hann envelope keeps word boundaries click-free and VAD-friendly
    env = np.hanning(len(t)) ** 0.5
    return (0.45 * x * env).astype(np.float32)


def render_utterance(words: Sequence[str], seed: int = 0,
                     sr: int = SAMPLE_RATE) -> np.ndarray:
    """words -> waveform (words separated by short gaps, noise floor)."""
    rng = np.random.default_rng(seed)
    parts = []
    for w in words:
        parts.append(_tone(WORDS[w], WORD_SEC, sr))
        parts.append(np.zeros(int(GAP_SEC * sr), np.float32))
    audio = np.concatenate(parts[:-1]) if parts else np.zeros(0, np.float32)
    return audio + NOISE * rng.standard_normal(len(audio)).astype(np.float32)


def sample_text(rng: np.random.Generator,
                min_words: int = 1, max_words: int = 3) -> List[str]:
    n = int(rng.integers(min_words, max_words + 1))
    return [WORD_LIST[int(i)] for i in rng.integers(0, len(WORD_LIST), n)]


def make_corpus(n: int, seed: int = 0, min_words: int = 1,
                max_words: int = 3) -> List[Tuple[np.ndarray, str]]:
    """n seeded (audio, transcript) pairs of single utterances."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        words = sample_text(rng, min_words, max_words)
        out.append((render_utterance(words, seed=seed * 100003 + i),
                    " ".join(words)))
    return out


def render_file_with_times(utterances: Sequence[Sequence[str]],
                           seed: int = 0, gap_sec: float = 0.5,
                           sr: int = SAMPLE_RATE
                           ) -> Tuple[np.ndarray,
                                      List[Tuple[str, float, float]]]:
    """Multi-utterance file -> (audio, [(word, start, end), ...]).

    Word times let training data be cut by the PRODUCT's own VAD + chunk
    merger (tools/train_synth.py): the model then sees exactly the window
    layouts inference produces — merged utterances, mid-window gaps,
    VAD-trimmed onsets — instead of idealized one-utterance windows."""
    rng = np.random.default_rng(seed)
    parts = [np.zeros(int(0.25 * sr), np.float32)]
    words_t: List[Tuple[str, float, float]] = []
    cursor = 0.25
    for i, words in enumerate(utterances):
        wav = render_utterance(words, seed=seed * 7919 + i, sr=sr)
        for j, w in enumerate(words):
            start = cursor + j * (WORD_SEC + GAP_SEC)
            words_t.append((w, round(start, 4), round(start + WORD_SEC, 4)))
        parts.append(wav)
        parts.append(np.zeros(int(gap_sec * sr), np.float32))
        cursor += len(wav) / sr + gap_sec
    audio = np.concatenate(parts)
    audio += NOISE * rng.standard_normal(len(audio)).astype(np.float32)
    return audio, words_t


def render_file(utterances: Sequence[Sequence[str]], seed: int = 0,
                gap_sec: float = 0.5, sr: int = SAMPLE_RATE
                ) -> Tuple[np.ndarray, str]:
    """Multi-utterance file with silence gaps (exercises VAD + chunking).

    Returns (audio, full transcript)."""
    audio, words_t = render_file_with_times(utterances, seed=seed,
                                            gap_sec=gap_sec, sr=sr)
    return audio, " ".join(w for w, _, _ in words_t)


# ---------------------------------------------------------------------------
# Two-speaker conversations (diarization ground truth)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Turn:
    start: float
    end: float
    speaker: str
    words: List[str]


def _speaker_voice(audio: np.ndarray, speaker: int,
                   sr: int = SAMPLE_RATE) -> np.ndarray:
    """Give each speaker a distinct spectral register: speaker 1's words
    ride a 4.5 kHz ring-modulation carrier, moving the whole voice into a
    band disjoint from speaker 0's low-word register (conversations draw
    words from the low half of the lexicon, see render_conversation).
    Between-speaker separation then dominates within-speaker content
    variance, as register does for real voices."""
    if speaker == 0:
        return audio
    t = np.arange(len(audio)) / sr
    carrier = np.cos(2 * np.pi * 4500.0 * t).astype(np.float32)
    return (audio * carrier).astype(np.float32)


def render_conversation(n_turns: int = 8, seed: int = 0,
                        gap_sec: float = 0.45, sr: int = SAMPLE_RATE
                        ) -> Tuple[np.ndarray, List[Turn]]:
    """Alternating two-speaker conversation -> (audio, reference turns).

    Turns run 6-10 words (~2-3 s) — meeting-like lengths that the 3 s
    sliding embedding windows of DiarizationPipeline can capture as
    single-speaker; sub-second turns would put both voices in every
    window and measure the fixture, not the pipeline."""
    rng = np.random.default_rng(seed)
    parts = [np.zeros(int(0.3 * sr), np.float32)]
    turns: List[Turn] = []
    cursor = 0.3
    low_words = WORD_LIST[:6]            # <=1.34 kHz: disjoint from the
    for i in range(n_turns):             # ring-modulated speaker-1 band
        spk = i % 2
        words = [low_words[int(j)]
                 for j in rng.integers(0, len(low_words),
                                       int(rng.integers(6, 11)))]
        wav = render_utterance(words, seed=seed * 31337 + i, sr=sr)
        wav = _speaker_voice(wav, spk, sr)
        dur = len(wav) / sr
        turns.append(Turn(start=round(cursor, 3), end=round(cursor + dur, 3),
                          speaker=f"SPEAKER_{spk:02d}", words=words))
        parts.append(wav)
        parts.append(np.zeros(int(gap_sec * sr), np.float32))
        cursor += dur + gap_sec
    audio = np.concatenate(parts)
    audio += NOISE * rng.standard_normal(len(audio)).astype(np.float32)
    return audio, turns


def turns_to_rttm(turns: Sequence[Turn]) -> List[dict]:
    """Reference-turn dicts in the shape eval.metrics.der consumes."""
    return [{"start": t.start, "end": t.end, "speaker": t.speaker}
            for t in turns]
