#!/usr/bin/env python3
"""Corpus evaluation: WER / CER (+ DER with reference RTTM) over a manifest.

The reference publishes no quality numbers (BASELINE.md); this is the
harness for measuring them once real checkpoints are converted
(tools/convert_weights.py + MWX_WEIGHTS_DIR). Manifest: JSON-lines, one
utterance per line:

    {"audio": "path.wav", "text": "reference transcript",
     "rttm": "optional path.rttm"}

RTTM lines follow the standard `SPEAKER <file> 1 <start> <dur> ... <spk>`
layout. Prints one JSON line per utterance plus a corpus summary line.

Usage: python tools/run_eval.py manifest.jsonl [--model large-v3]
       [--batch 16] [--language zh] [--diarize]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def read_rttm(path: str):
    segs = []
    for line in Path(path).read_text(encoding="utf-8").splitlines():
        parts = line.split()
        if len(parts) >= 8 and parts[0] == "SPEAKER":
            start, dur = float(parts[3]), float(parts[4])
            segs.append({"start": start, "end": start + dur,
                         "speaker": parts[7]})
    return segs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("manifest")
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--language", default="zh")
    ap.add_argument("--diarize", action="store_true")
    args = ap.parse_args()

    from manual_whisper_tpu.audio import load_audio
    from manual_whisper_tpu.eval.metrics import cer, der, wer
    from manual_whisper_tpu.pipeline import load_model
    from manual_whisper_tpu.text import clean_result_segments

    model = load_model(args.model, language=args.language)
    model.warmup(batch_size=args.batch, language=args.language)
    diarizer = None
    if args.diarize:
        from manual_whisper_tpu.models.diarize import DiarizationPipeline
        diarizer = DiarizationPipeline()

    n = 0
    wer_sum = cer_sum = der_sum = 0.0
    der_n = 0
    total_audio = total_wall = 0.0
    for line in Path(args.manifest).read_text(encoding="utf-8").splitlines():
        if not line.strip():
            continue
        item = json.loads(line)
        audio = load_audio(item["audio"])
        t0 = time.time()
        result = model.transcribe(audio, batch_size=args.batch,
                                  language=args.language)
        cleaned, _, _ = clean_result_segments(result["segments"])
        hyp = "".join(s["text"] for s in cleaned)
        wall = time.time() - t0
        row = {"audio": item["audio"],
               "wer": round(wer(item["text"], hyp), 4),
               "cer": round(cer(item["text"], hyp), 4),
               "rtf": round(len(audio) / 16000.0 / max(wall, 1e-9), 2)}
        if diarizer is not None and item.get("rttm"):
            hyp_turns = diarizer(audio)
            row["der"] = round(der(read_rttm(item["rttm"]), hyp_turns), 4)
            der_sum += row["der"]
            der_n += 1
        print(json.dumps(row, ensure_ascii=False), flush=True)
        n += 1
        wer_sum += row["wer"]
        cer_sum += row["cer"]
        total_audio += len(audio) / 16000.0
        total_wall += wall

    if n:
        summary = {"utterances": n, "mean_wer": round(wer_sum / n, 4),
                   "mean_cer": round(cer_sum / n, 4),
                   "corpus_rtf": round(total_audio / max(total_wall, 1e-9),
                                       2)}
        if der_n:
            summary["mean_der"] = round(der_sum / der_n, 4)
        print(json.dumps(summary, ensure_ascii=False))
    return 0


if __name__ == "__main__":
    sys.exit(main())
