"""VAD boundary-quality metrics (VERDICT r1 item 8).

The reference's chunk boundaries come from pyannote segmentation
(reference: transcribe.py:43-46); when no converted segmentation
checkpoint is present this framework falls back to energy VAD, whose
boundaries differ on real audio — and every downstream timestamp moves
with them.  This module quantifies that drift:

- ``boundary_f1``: precision/recall/F1 of predicted region boundaries
  against reference boundaries within a time tolerance (the standard
  segmentation-boundary metric).
- ``region_overlap_stats``: frame-level speech/non-speech agreement plus
  the per-boundary timestamp deltas between two VAD outputs.
- ``compare_vad_paths``: run two VAD callables on the same audio and
  report both views — the harness `tools/run_eval.py`-style code and the
  startup warning in pipeline.load_model use this evidence.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

Region = Tuple[float, float]


def _boundaries(regions: Sequence[Region]) -> List[float]:
    out: List[float] = []
    for s, e in regions:
        out.extend((float(s), float(e)))
    return out


def boundary_f1(pred: Sequence[Region], ref: Sequence[Region],
                tolerance: float = 0.2) -> Dict[str, float]:
    """Greedy one-to-one boundary matching within ``tolerance`` seconds."""
    p = sorted(_boundaries(pred))
    r = sorted(_boundaries(ref))
    matched = 0
    used = [False] * len(r)
    for t in p:
        best, best_d = -1, tolerance
        for i, u in enumerate(r):
            if used[i]:
                continue
            d = abs(t - u)
            if d <= best_d:
                best, best_d = i, d
        if best >= 0:
            used[best] = True
            matched += 1
    precision = matched / len(p) if p else (1.0 if not r else 0.0)
    recall = matched / len(r) if r else (1.0 if not p else 0.0)
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"precision": precision, "recall": recall, "f1": f1,
            "matched": matched, "pred_boundaries": len(p),
            "ref_boundaries": len(r)}


def region_overlap_stats(pred: Sequence[Region], ref: Sequence[Region],
                         duration: float, step: float = 0.01
                         ) -> Dict[str, float]:
    """Frame-level agreement between two region sets over [0, duration]."""
    n = max(1, int(round(duration / step)))
    t = (np.arange(n) + 0.5) * step

    def mask(regions):
        m = np.zeros(n, bool)
        for s, e in regions:
            m |= (t >= s) & (t < e)
        return m

    a, b = mask(pred), mask(ref)
    agree = float(np.mean(a == b))
    union = float(np.sum(a | b))
    iou = float(np.sum(a & b)) / union if union else 1.0
    return {"frame_agreement": agree, "speech_iou": iou,
            "pred_speech_sec": float(np.sum(a)) * step,
            "ref_speech_sec": float(np.sum(b)) * step}


def timestamp_deltas(pred: Sequence[Region], ref: Sequence[Region],
                     max_match: float = 1.0) -> Dict[str, float]:
    """Per-boundary |delta| stats for boundaries matched within
    ``max_match`` seconds (how far downstream timestamps move)."""
    p = sorted(_boundaries(pred))
    r = sorted(_boundaries(ref))
    deltas = []
    used = [False] * len(r)
    for t in p:
        best, best_d = -1, max_match
        for i, u in enumerate(r):
            if used[i]:
                continue
            d = abs(t - u)
            if d <= best_d:
                best, best_d = i, d
        if best >= 0:
            used[best] = True
            deltas.append(best_d)
    if not deltas:
        return {"mean_abs_delta": float("nan"),
                "max_abs_delta": float("nan"), "n_matched": 0}
    return {"mean_abs_delta": float(np.mean(deltas)),
            "max_abs_delta": float(np.max(deltas)),
            "n_matched": len(deltas)}


def compare_vad_paths(audio: np.ndarray,
                      vad_a: Callable[[np.ndarray], Sequence[Region]],
                      vad_b: Callable[[np.ndarray], Sequence[Region]],
                      sample_rate: int = 16000,
                      tolerance: float = 0.2) -> Dict[str, Dict]:
    """Run two VAD paths on the same audio and report the drift between
    them (boundary F1 of a vs b, frame agreement, timestamp deltas)."""
    regions_a = list(vad_a(audio))
    regions_b = list(vad_b(audio))
    duration = len(audio) / sample_rate
    return {
        "a_regions": regions_a,
        "b_regions": regions_b,
        "boundary": boundary_f1(regions_a, regions_b, tolerance),
        "overlap": region_overlap_stats(regions_a, regions_b, duration),
        "deltas": timestamp_deltas(regions_a, regions_b),
    }
