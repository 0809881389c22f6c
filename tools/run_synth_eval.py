#!/usr/bin/env python3
"""Measure WER/CER (+DER) through the FULL pipeline on the synth corpus.

Loads the checkpoint tools/train_synth.py produced and runs the real
product path — energy/PyanNet VAD -> chunk merger -> batched mel ->
encoder -> KV-cache decode -> text cleanup — on held-out synthetic files
(multi-utterance, so VAD boundaries and chunk batching are really
exercised), then scores WER/CER against the known transcripts and DER on
two-speaker conversations.  Writes EVAL_r{N}.json at the repo root: the
regressable quality number VERDICT.md round 1 asked for (BASELINE.json
"WER + DER parity" north star; the reference itself publishes no numbers,
SURVEY.md §6).

Usage: python tools/run_synth_eval.py [--ckpt .synth_ckpt] [--files 24]
       [--out EVAL_r02.json]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=".synth_ckpt")
    ap.add_argument("--files", type=int, default=24)
    ap.add_argument("--convos", type=int, default=6)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--beam", type=int, default=1,
                    help="beam size (5 = faster-whisper/WhisperX default; "
                         "records the WER delta that justifies the greedy "
                         "perf default)")
    ap.add_argument("--seed", type=int, default=9000)
    ap.add_argument("--out", default="EVAL_r02.json")
    ap.add_argument("--platform", default="cpu",
                    help="cpu (default) or tpu; env JAX_PLATFORMS is "
                         "pinned by the axon sitecustomize, config wins")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms",
                      "" if args.platform == "tpu" else args.platform)

    import numpy as np

    from manual_whisper_tpu.convert.from_hf import load_params
    from manual_whisper_tpu.eval.metrics import cer, der, wer
    from manual_whisper_tpu.eval.synth import (render_conversation,
                                               render_file, sample_text,
                                               turns_to_rttm)
    from manual_whisper_tpu.models import MODEL_CONFIGS
    from manual_whisper_tpu.pipeline.transcribe import TranscribePipeline
    from manual_whisper_tpu.text import clean_result_segments
    from manual_whisper_tpu.tokenizer import make_test_tokenizer

    ckpt = Path(args.ckpt).resolve()
    params = load_params(ckpt)
    if params is None:
        print(f"no checkpoint at {ckpt}; run tools/train_synth.py first",
              file=sys.stderr)
        return 1

    cfg = MODEL_CONFIGS["test"]
    # suppress_blank=False: OpenAI's first-step blank suppression bans the
    # bare space token, but the char-level test tokenizer encodes every
    # transcript as " word ..." — the space IS the correct first token, so
    # the real-vocab-oriented default derails every window here (spurious
    # first-char insertions).  Real BPE vocabs merge " w" into one token,
    # where the default is correct and stays on.
    # same VAD wiring as load_model: trained segmentation weights from the
    # registry upgrade the energy fallback when present
    # (tools/train_synth_vad.py writes them under MWX_WEIGHTS_DIR)
    vad = None
    try:
        from manual_whisper_tpu.models.vad import (VoiceActivityDetector,
                                                   load_segmentation_params)
        seg = load_segmentation_params()
        if seg is not None:
            vad = VoiceActivityDetector(seg)
            print("VAD: trained segmentation checkpoint", file=sys.stderr)
    except Exception as exc:
        print(f"VAD registry load failed ({exc}); energy fallback",
              file=sys.stderr)
    model = TranscribePipeline(params, cfg, make_test_tokenizer(),
                               asr_options={"max_new_tokens": 20,
                                            "beam_size": args.beam,
                                            "suppress_blank": False},
                               language="en", vad=vad)

    # -- WER/CER over held-out multi-utterance files -------------------------
    rng = np.random.default_rng(args.seed)
    rows = []
    wer_sum = cer_sum = 0.0
    total_audio = total_wall = 0.0
    for i in range(args.files):
        utts = [sample_text(rng, 1, 3)
                for _ in range(int(rng.integers(2, 5)))]
        audio, truth = render_file(utts, seed=args.seed + i)
        t0 = time.time()
        result = model.transcribe(audio, batch_size=args.batch,
                                  language="en")
        wall = time.time() - t0
        cleaned, _, _ = clean_result_segments(result["segments"])
        hyp = " ".join(s["text"].strip() for s in cleaned)
        rows.append({"file": i, "ref": truth, "hyp": hyp,
                     "wer": round(wer(truth, hyp), 4),
                     "cer": round(cer(truth, hyp), 4)})
        wer_sum += rows[-1]["wer"]
        cer_sum += rows[-1]["cer"]
        total_audio += len(audio) / 16000.0
        total_wall += wall
        print(json.dumps(rows[-1], ensure_ascii=False), flush=True)

    # -- DER over two-speaker conversations ----------------------------------
    ders = []
    try:
        from manual_whisper_tpu.models.diarize import DiarizationPipeline
        diar = DiarizationPipeline()
        for i in range(args.convos):
            audio, turns = render_conversation(n_turns=8,
                                               seed=args.seed + 500 + i)
            hyp_turns = diar(audio)
            d = der(turns_to_rttm(turns), hyp_turns)
            ders.append(round(d, 4))
            print(json.dumps({"convo": i, "der": ders[-1]}), flush=True)
    except Exception as exc:  # diarization must not sink the ASR numbers
        print(f"diarization eval failed: {exc}", file=sys.stderr)

    try:
        from manual_whisper_tpu.models.diarize import load_embedding_params
        emb_trained = load_embedding_params() is not None
    except Exception:
        emb_trained = False
    der_note = (
        ("segmentation: trained synth checkpoint "
         "(tools/train_synth_vad.py); " if vad is not None
         else "segmentation: randomly initialized; ")
        + ("speaker embeddings: trained synth checkpoint "
           "(tools/train_synth_embed.py)" if emb_trained
           else "speaker embeddings: randomly initialized (the "
           "conversation fixture's separable registers keep "
           "random-projection embeddings clusterable)"))
    summary = {
        "task": "synthetic tone-language, full pipeline "
                "(VAD->chunk->mel->encode->decode->cleanup)",
        "checkpoint": str(ckpt),
        "beam_size": args.beam,
        "files": args.files,
        "mean_wer": round(wer_sum / max(args.files, 1), 4),
        "mean_cer": round(cer_sum / max(args.files, 1), 4),
        "corpus_rtf": round(total_audio / max(total_wall, 1e-9), 2),
        "vad": "trained segmentation" if vad is not None else "energy",
        "der": {"convos": len(ders),
                "mean_der": round(sum(ders) / len(ders), 4) if ders
                else None,
                "note": der_note},
        "worst": sorted(rows, key=lambda r: -r["wer"])[:3],
    }
    Path(args.out).write_text(json.dumps(summary, indent=2,
                                         ensure_ascii=False) + "\n")
    print(json.dumps({k: summary[k] for k in
                      ("mean_wer", "mean_cer", "corpus_rtf")}))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
