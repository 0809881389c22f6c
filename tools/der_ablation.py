#!/usr/bin/env python3
"""DER ablation over powerset-decode mode / binarisation thresholds.

VERDICT r4 #4: 4-speaker overlap DER (0.262 on the OLD segmentation
checkpoint per commit a7d51a0) vs the 3-spk 0.103 — the diagnosis was
the segmentation model suppressing the quieter speaker mid-overlap, and
the retrained overlap-heavy checkpoint (13696a7) landed unevaluated.
This tool measures the CURRENT committed stack on the synth conversation
conditions (2/3/4-spk, 25 % overlap prob) across:

  - powerset_decode: "argmax" (pyannote's hard Powerset.to_multilabel)
    vs "marginal" (per-speaker class-prob sums, thresholded),
  - activity onset/offset pairs (the marginal decode needs its own
    operating point: class-weighted training shifts raw probs upward).

Prints one JSON line per (mode, onset, offset, condition) and a final
summary ranking — evidence for choosing the product default, feeding the
EVAL_r05 run.  Matches pyannote-3.1 overlap resolution behind
/root/reference/transcribe.py:142-144.

Usage: python tools/der_ablation.py [--convos 4] [--spk 2 3 4]
"""

import argparse
import json
import os
import sys
from pathlib import Path

os.environ.setdefault("MWX_ALLOW_SYNTH_WEIGHTS", "1")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convos", type=int, default=4)
    ap.add_argument("--spk", type=int, nargs="+", default=[2, 3, 4])
    ap.add_argument("--seed", type=int, default=9000)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms",
                      "" if args.platform == "tpu" else args.platform)

    from manual_whisper_tpu.eval.metrics import der
    from manual_whisper_tpu.eval.synth import (render_conversation,
                                               turns_to_rttm)
    from manual_whisper_tpu.models.diarize import DiarizationPipeline

    # pre-render the conversations once: every ablation cell scores the
    # SAME audio (seeds match run_synth_eval's DER section)
    convos = {}
    for n_spk in args.spk:
        for i in range(args.convos):
            audio, turns = render_conversation(
                n_turns=4 * n_spk, seed=args.seed + 500 + i,
                n_speakers=n_spk, overlap_prob=0.25)
            convos[(n_spk, i)] = (audio, turns_to_rttm(turns))

    grid = [
        {"powerset_decode": "argmax"},
        {"powerset_decode": "marginal",
         "activity_onset": 0.5, "activity_offset": 0.35},
        {"powerset_decode": "marginal",
         "activity_onset": 0.6, "activity_offset": 0.45},
        {"powerset_decode": "marginal",
         "activity_onset": 0.7, "activity_offset": 0.55},
    ]
    results = []
    for cfg in grid:
        diar = DiarizationPipeline(**cfg)
        row = {"cfg": cfg}
        for n_spk in args.spk:
            ders = []
            for i in range(args.convos):
                audio, ref = convos[(n_spk, i)]
                ders.append(round(der(ref, diar(audio)), 4))
            row[f"{n_spk}spk"] = round(sum(ders) / len(ders), 4)
            row[f"{n_spk}spk_per_convo"] = ders
            print(json.dumps(row | {"partial": n_spk}), flush=True)
        results.append(row)

    # rank by the 4-spk condition (the open frontier), tie-break on 3-spk
    key = (lambda r: (r.get("4spk", 9), r.get("3spk", 9), r.get("2spk", 9)))
    results.sort(key=key)
    print(json.dumps({"ranking": results}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
