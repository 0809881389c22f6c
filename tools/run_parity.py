#!/usr/bin/env python3
"""Parity harness: the five BASELINE.json measurement configs.

Runs whichever configs the environment can support and reports RTF plus
WER/CER (when a reference transcript is supplied) and DER (when a
reference RTTM-style segment list is supplied).  Without converted
weights it still exercises configs 1-2-5 mechanically on synthetic
weights/audio, reporting RTF only.

Usage:
  python tools/run_parity.py                      # synthetic sweep
  python tools/run_parity.py --audio x.wav --ref ref.txt --model large-v3
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def synth_audio(seconds, seed=0):
    import numpy as np
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * 16000)) / 16000
    x = 0.003 * rng.standard_normal(len(t)).astype(np.float32)
    voiced = (t % 12.0) < 10.0
    x[voiced] += (0.35 * np.sin(2 * np.pi * 220 * t[voiced])).astype(
        np.float32)
    return x


CONFIGS = [
    # (name, model, seconds, batch, diarize) — BASELINE.json "configs"
    ("c1_small_30s_greedy", "small", 30, 1, False),
    ("c2_medium_vad_batch4", "medium", 300, 4, False),
    ("c3_largev3_align", "large-v3", 300, 16, False),
    ("c4_largev3_diarize", "large-v3", 300, 16, True),
    ("c5_1hour_full", "large-v3", 3600, 16, True),
]


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--audio", default=None)
    parser.add_argument("--ref", default=None, help="reference transcript")
    parser.add_argument("--ref-rttm", default=None,
                        help="reference diarization json [{start,end,speaker}]")
    parser.add_argument("--model", default="large-v3")
    parser.add_argument("--configs", default=None,
                        help="comma list, e.g. c1,c5")
    args = parser.parse_args()

    os.environ.setdefault("MWX_ALLOW_RANDOM_WEIGHTS", "1")
    from manual_whisper_tpu.audio import load_audio
    from manual_whisper_tpu.eval import cer, der, wer
    from manual_whisper_tpu.pipeline import load_model

    results = []

    if args.audio:
        audio = load_audio(args.audio)
        model = load_model(args.model, language="zh")
        t0 = time.time()
        out = model.transcribe(audio, batch_size=16, language="zh")
        rtf = (len(audio) / 16000) / (time.time() - t0)
        text = "".join(s["text"] for s in out["segments"])
        entry = {"config": f"custom_{args.model}", "rtf": round(rtf, 2)}
        if args.ref:
            ref_text = Path(args.ref).read_text(encoding="utf-8")
            entry["wer"] = round(wer(ref_text, text), 4)
            entry["cer"] = round(cer(ref_text, text), 4)
        if args.ref_rttm:
            ref_segs = json.loads(Path(args.ref_rttm).read_text())
            from manual_whisper_tpu.models.diarize import DiarizationPipeline
            hyp = DiarizationPipeline()(audio)
            entry["der"] = round(der(ref_segs, hyp), 4)
        results.append(entry)
    else:
        wanted = set((args.configs or "c1,c2,c5").split(","))
        for name, model_name, seconds, batch, diarize in CONFIGS:
            if name.split("_")[0] not in wanted:
                continue
            audio = synth_audio(min(seconds, 600))  # cap synthetic runtime
            model = load_model(model_name, language="zh")
            model.transcribe(audio[: 16000 * 30], batch_size=batch,
                             language="zh", temperature=(0.0,))  # warmup
            t0 = time.time()
            out = model.transcribe(audio, batch_size=batch, language="zh",
                                   temperature=(0.0,))
            elapsed = time.time() - t0
            entry = {"config": name, "model": model_name,
                     "audio_sec": len(audio) / 16000,
                     "rtf": round(len(audio) / 16000 / elapsed, 2),
                     "segments": len(out["segments"])}
            if diarize:
                from manual_whisper_tpu.models.diarize import (
                    DiarizationPipeline, assign_word_speakers)
                t0 = time.time()
                diar = DiarizationPipeline()(audio)
                out = assign_word_speakers(diar, out)
                entry["diarize_sec"] = round(time.time() - t0, 2)
            results.append(entry)

    print(json.dumps({"results": results}, ensure_ascii=False, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
