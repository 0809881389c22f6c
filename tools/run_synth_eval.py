#!/usr/bin/env python3
"""Measure WER/CER, word-timing MAE/F1 and DER through the FULL pipeline
on the synth corpus.

Loads the checkpoints tools/train_synth*.py produced and runs the real
product path — PyanNet/energy VAD -> chunk merger -> batched mel ->
encoder -> KV-cache decode -> text cleanup — on held-out synthetic files,
then scores:

- WER/CER against known transcripts across an SNR sweep
  (clean / 10 dB / 0 dB — VERDICT r2 #4: the saturated v1 corpus could
  no longer discriminate),
- word-boundary MAE + F1(+-80 ms) of wav2vec2 forced alignment against
  exact rendered word times (VERDICT r2 #3),
- DER on 2/3/4-speaker conversations incl. overlapping turns, plus an
  optional hour-length file.

Writes EVAL_r{N}.json at the repo root (the reference itself publishes no
numbers, SURVEY.md §6).

Usage: python tools/run_synth_eval.py [--ckpt .synth_ckpt] [--files 12]
       [--out EVAL_r03.json] [--long-minutes 60]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

# this eval exists to score the synth-trained checkpoints; the loader
# warning is for real-audio deployments (config.py)
os.environ.setdefault("MWX_ALLOW_SYNTH_WEIGHTS", "1")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


class _Skip(Exception):
    """Control-flow marker: --wer-only skips the align/DER sections."""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=".synth_ckpt")
    ap.add_argument("--files", type=int, default=12,
                    help="held-out files PER SNR condition")
    ap.add_argument("--convos", type=int, default=4,
                    help="conversations per speaker-count condition")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--beam", type=int, default=1,
                    help="beam size (5 = faster-whisper/WhisperX default; "
                         "records the WER delta that justifies the greedy "
                         "perf default)")
    ap.add_argument("--long-minutes", type=int, default=60,
                    help="length of the long-file DER check (0 skips)")
    ap.add_argument("--powerset-decode", default="argmax",
                    choices=("argmax", "marginal"),
                    help="diarization powerset decode (tools/der_ablation"
                         ".py picks the operating point)")
    ap.add_argument("--activity-onset", type=float, default=0.5)
    ap.add_argument("--activity-offset", type=float, default=0.35)
    ap.add_argument("--seed", type=int, default=9000)
    ap.add_argument("--out", default=None,
                    help="output JSON (default EVAL_r03.json; ablation "
                         "--wer-only runs default to EVAL_ablation.json "
                         "so they can't clobber the published artifact)")
    ap.add_argument("--platform", default="cpu",
                    help="cpu (default) or tpu; env JAX_PLATFORMS is "
                         "pinned by the axon sitecustomize, config wins")
    ap.add_argument("--wer-only", action="store_true",
                    help="run only the WER/CER SNR sweep (ablation runs: "
                         "beam-vs-greedy, trained-vs-energy VAD)")
    args = ap.parse_args()
    if args.out is None:
        args.out = "EVAL_ablation.json" if args.wer_only else "EVAL_r03.json"

    import jax
    jax.config.update("jax_platforms",
                      "" if args.platform == "tpu" else args.platform)

    import numpy as np

    from manual_whisper_tpu.convert.from_hf import load_params
    from manual_whisper_tpu.eval.metrics import (cer, der, wer,
                                                 word_timing_scores)
    from manual_whisper_tpu.eval.synth import (render_conversation,
                                               render_file_with_times,
                                               sample_text, turns_to_rttm)
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
                               asr_options={"max_new_tokens": 40,
                                            "beam_size": args.beam,
                                            "suppress_blank": False},
                               language="en", vad=vad)
    # compile every program shape BEFORE the timed sweep, else the first
    # files bill XLA compiles to corpus_rtf (run_configs.py does the same)
    model.warmup(batch_size=args.batch, language="en")

    # -- WER/CER over held-out multi-utterance files, per SNR ----------------
    rng = np.random.default_rng(args.seed)
    # snr5 (r4): clean saturates at 0 and snr0 saturates near 1 (filler
    # loops), so r3's sweep had exactly one informative cell (snr10);
    # an intermediate condition gives future deltas a second one.
    # babble10/babble5 (r5): NON-STATIONARY speech-shaped interference
    # (VERDICT r4 #6) — competing tone-word streams in the target band,
    # the synth analog of meeting-room babble/music.
    # snr7 + babble15 (r5): the first babble sweep saturated high
    # (babble10 WER 0.88, babble5 1.03 — speech-shaped maskers are far
    # harder per dB than white noise), leaving snr10 (0.32) the ONLY
    # cell with 0 < WER < 0.5; these two sit in the gaps (white 10→5 dB
    # jumps 0.32→0.65, babble needs >10 dB to leave saturation) so the
    # band has multiple discriminative cells for future quality deltas.
    snr_sweep = {"clean": (None, "white"), "snr10": (10.0, "white"),
                 "snr7": (7.0, "white"), "snr5": (5.0, "white"),
                 "snr0": (0.0, "white"), "babble15": (15.0, "babble"),
                 "babble10": (10.0, "babble"), "babble5": (5.0, "babble")}
    by_snr = {}
    rows = []
    total_audio = total_wall = 0.0
    for cond, (snr_db, noise_kind) in snr_sweep.items():
        wer_sum = cer_sum = 0.0
        for i in range(args.files):
            utts = [sample_text(rng, 4, 8)
                    for _ in range(int(rng.integers(2, 5)))]
            audio, words_t = render_file_with_times(
                utts, seed=args.seed + i, snr_db=snr_db,
                noise_kind=noise_kind)
            truth = " ".join(w for w, _, _ in words_t)
            t0 = time.time()
            result = model.transcribe(audio, batch_size=args.batch,
                                      language="en")
            wall = time.time() - t0
            cleaned, _, _ = clean_result_segments(result["segments"])
            hyp = " ".join(s["text"].strip() for s in cleaned)
            row = {"cond": cond, "file": i, "ref": truth, "hyp": hyp,
                   "wer": round(wer(truth, hyp), 4),
                   "cer": round(cer(truth, hyp), 4)}
            rows.append(row)
            wer_sum += row["wer"]
            cer_sum += row["cer"]
            total_audio += len(audio) / 16000.0
            total_wall += wall
            print(json.dumps(row, ensure_ascii=False), flush=True)
        by_snr[cond] = {"mean_wer": round(wer_sum / max(args.files, 1), 4),
                        "mean_cer": round(cer_sum / max(args.files, 1), 4)}

    # -- word-timing accuracy of forced alignment (truth segments) -----------
    timing = {"skipped": "--wer-only"} if args.wer_only else None
    try:
        if args.wer_only:
            raise _Skip
        from manual_whisper_tpu.models.align import align, load_align_model
        amodel = load_align_model("en")
        maes_s, maes_e, f1s = [], [], []
        for i in range(6):
            utts = [sample_text(rng, 4, 8)
                    for _ in range(int(rng.integers(2, 5)))]
            audio, words_t = render_file_with_times(
                utts, seed=args.seed + 3000 + i)
            segs, wi = [], 0
            for u in utts:
                sw = words_t[wi: wi + len(u)]
                wi += len(u)
                segs.append({"text": " ".join(w for w, _, _ in sw),
                             "start": max(0.0, sw[0][1] - 0.05),
                             "end": sw[-1][2] + 0.05})
            out = align(segs, amodel, audio)
            s = word_timing_scores(words_t, out["word_segments"])
            print(json.dumps({"align_file": i, **s}), flush=True)
            if s["mae_start"] is None:   # no matched words on this file
                continue
            maes_s.append(s["mae_start"])
            maes_e.append(s["mae_end"])
            f1s.append(s["f1"])
        if not f1s:
            raise RuntimeError("alignment produced no matched words")
        timing = {"files": len(f1s),
                  "mae_start_ms": round(1000 * float(np.mean(maes_s)), 1),
                  "mae_end_ms": round(1000 * float(np.mean(maes_e)), 1),
                  "f1_80ms": round(float(np.mean(f1s)), 4),
                  "model": "trained synth wav2vec2-CTC "
                           "(tools/train_synth_align.py)"}
    except _Skip:
        pass
    except Exception as exc:  # alignment must not sink the ASR numbers
        print(f"alignment eval failed: {exc}", file=sys.stderr)
        timing = {"error": str(exc)}

    # -- DER: speaker-count / overlap conditions ------------------------------
    der_conds = {"skipped": "--wer-only"} if args.wer_only else {}
    try:
        if args.wer_only:
            raise _Skip
        from manual_whisper_tpu.models.diarize import DiarizationPipeline
        diar = DiarizationPipeline(
            powerset_decode=args.powerset_decode,
            activity_onset=args.activity_onset,
            activity_offset=args.activity_offset)
        for cond, (n_spk, ov) in {
                "2spk": (2, 0.0), "3spk_overlap": (3, 0.25),
                "4spk_overlap": (4, 0.25)}.items():
            ders = []
            for i in range(args.convos):
                audio, turns = render_conversation(
                    n_turns=4 * n_spk, seed=args.seed + 500 + i,
                    n_speakers=n_spk, overlap_prob=ov)
                hyp_turns = diar(audio)
                ders.append(round(der(turns_to_rttm(turns), hyp_turns), 4))
                print(json.dumps({"cond": cond, "convo": i,
                                  "der": ders[-1]}), flush=True)
            der_conds[cond] = round(sum(ders) / max(len(ders), 1), 4)
        if args.long_minutes > 0:
            # hour-scale file: one long conversation through the same
            # pipeline (VERDICT r2 #4 — long-context DER evidence)
            n_turns = int(args.long_minutes * 60 / 3.2)
            audio, turns = render_conversation(
                n_turns=n_turns, seed=args.seed + 900, n_speakers=3,
                overlap_prob=0.15)
            t0 = time.time()
            hyp_turns = diar(audio)
            der_conds[f"long_{args.long_minutes}min_3spk"] = round(
                der(turns_to_rttm(turns), hyp_turns), 4)
            der_conds["long_wall_s"] = round(time.time() - t0, 1)
            print(json.dumps({"cond": "long", "minutes": args.long_minutes,
                              "der": der_conds[
                                  f"long_{args.long_minutes}min_3spk"],
                              "wall_s": der_conds["long_wall_s"]}),
                  flush=True)
    except _Skip:
        pass
    except Exception as exc:  # diarization must not sink the ASR numbers
        print(f"diarization eval failed: {exc}", file=sys.stderr)
        der_conds["error"] = str(exc)

    summary = {
        "task": "synthetic tone-language v2 (56-word lexicon, 4-8-word "
                "utterances), full pipeline "
                "(VAD->chunk->mel->encode->decode->cleanup)",
        "checkpoint": str(ckpt),
        "beam_size": args.beam,
        "files_per_cond": args.files,
        "wer_by_snr": by_snr,
        "mean_wer": by_snr["clean"]["mean_wer"],
        "mean_cer": by_snr["clean"]["mean_cer"],
        "word_timing": timing,
        "corpus_rtf": round(total_audio / max(total_wall, 1e-9), 2),
        "vad": "trained segmentation" if vad is not None else "energy",
        "diarization": {"powerset_decode": args.powerset_decode,
                        "activity_onset": args.activity_onset,
                        "activity_offset": args.activity_offset},
        "der": der_conds,
        "worst": sorted(rows, key=lambda r: -r["wer"])[:3],
    }
    Path(args.out).write_text(json.dumps(summary, indent=2,
                                         ensure_ascii=False) + "\n")
    print(json.dumps({"wer_by_snr": by_snr, "der": der_conds,
                      "word_timing": timing}, ensure_ascii=False))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
