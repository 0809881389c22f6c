#!/usr/bin/env python3
"""Train the `test` Whisper config on the synthetic tone language.

Produces the checkpoint tools/run_synth_eval.py evaluates — the repo's
only way to record a REAL (trained-model) WER through the full pipeline
without hub access (the reference defines quality via downloaded
checkpoints, transcribe.py:107-113; see eval/synth.py for the rationale).

The training windows replicate the inference path exactly: utterance at a
random onset inside the model window, int16 round-trip (the pipeline ships
audio to the device as int16), the same log-mel front end, and the same
SOT prompt sequence BatchDecoder builds at decode time.

Usage: python tools/train_synth.py [--steps 1500] [--batch 64]
       [--out .synth_ckpt] [--seed 1]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-train", type=int, default=4096)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--out", default=".synth_ckpt")
    ap.add_argument("--platform", default="cpu",
                    help="cpu (default: the model is tiny and the chip "
                         "should stay free for serving/bench) or tpu")
    args = ap.parse_args()

    import jax
    # env JAX_PLATFORMS is pinned by the axon sitecustomize; config wins.
    # "tpu" means auto-select (the chip registers under the axon plugin's
    # own platform name, so naming it explicitly would miss it).
    jax.config.update("jax_platforms",
                      "" if args.platform == "tpu" else args.platform)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from manual_whisper_tpu.eval.synth import (render_file_with_times,
                                               sample_text)
    from manual_whisper_tpu.models import MODEL_CONFIGS, init_params
    from manual_whisper_tpu.models.vad import VoiceActivityDetector
    from manual_whisper_tpu.ops.mel import log_mel_spectrogram
    from manual_whisper_tpu.pipeline.chunking import (merge_chunks,
                                                      pad_audio_window)
    from manual_whisper_tpu.tokenizer import make_test_tokenizer
    from manual_whisper_tpu.training.train import (init_train_state,
                                                   make_train_step)

    cfg = MODEL_CONFIGS["test"]          # float32, d=64, 2+2 layers
    tk = make_test_tokenizer()
    window = cfg.n_audio_ctx * 2 * 160   # 3.0 s at 16 kHz
    window_sec = window / 16000.0
    # 4-token prefix + up to ~9 two-char words x (" " + 2 chars) + EOT
    seq_len = 36
    prefix = tk.sot_sequence(language="en", task="transcribe",
                             without_timestamps=True)
    p = len(prefix)
    eot = tk.special.eot

    # Training windows come from the PRODUCT's own VAD + chunk merger run
    # over multi-utterance files — the exact distribution inference sees
    # (merged utterances, mid-window silence, VAD-trimmed onsets); the
    # label for a window is the words whose midpoint falls inside it.
    print(f"building ~{args.n_train} chunk windows via the product "
          "VAD/chunker...", flush=True)
    data_rng = np.random.default_rng(args.seed)
    # the SAME VAD inference will use: trained segmentation from the
    # registry when present (tools/train_synth_vad.py), else energy.
    # Training windows must come from the deployed VAD or its boundary
    # shifts show up as word doublings/drops at eval time.
    from manual_whisper_tpu.models.vad import load_segmentation_params
    try:
        seg = load_segmentation_params()
    except Exception:
        seg = None
    vad = VoiceActivityDetector(seg)
    print(f"VAD: {'trained segmentation' if seg is not None else 'energy'}",
          flush=True)
    def file_regions(files):
        """VAD a batch of files with ONE device dispatch per 64 windows.

        The per-file path (vad(audio)) dispatches a PyanNet forward per
        file; over a remote chip those round-trips make corpus building
        hours long.  Same probs, same binarize — just batched."""
        if vad.params is None:
            return [vad(a) for a in files]
        from manual_whisper_tpu.models.vad import (
            VadOptions, binarize, powerset_to_speech_prob,
            pyannet_forward_chunked)
        vwin = int(vad.cfg.window_sec * 16000)
        rows, meta = [], []
        for a in files:
            n_win = max(1, -(-len(a) // vwin))
            padded = np.zeros(n_win * vwin, np.float32)
            padded[: len(a)] = a
            meta.append((len(rows), n_win, len(a)))
            rows.extend(padded.reshape(n_win, vwin))
        # shared fixed-shape chunked forward: the same [PYANNET_CHUNK,
        # window] program every product caller compiles, instead of a
        # trainer-private batch shape (a second multi-minute BiLSTM
        # compile under MWX_VAD_BACKEND=device)
        lp = pyannet_forward_chunked(vad.params, np.stack(rows), vad.cfg)
        probs = list(powerset_to_speech_prob(lp))
        out = []
        for start, n_win, n_samples in meta:
            flat = np.concatenate(probs[start: start + n_win])
            frame_dur = vad.cfg.window_sec / probs[0].shape[0]
            valid = int(np.ceil(n_samples / 16000 / frame_dur))
            dur = n_samples / 16000.0
            out.append([(max(0.0, s), min(dur, e)) for s, e in
                        binarize(flat[:valid], frame_dur, VadOptions())])
        return out

    corpus = []                                     # (window_audio, text)
    file_i = 0
    stalled_rounds = 0
    while len(corpus) < args.n_train:
        before = len(corpus)
        batch_files, batch_words = [], []
        for _ in range(128):
            utts = [sample_text(data_rng, 1, 8)
                    for _ in range(int(data_rng.integers(2, 5)))]
            audio, words_t = render_file_with_times(
                utts, seed=args.seed * 613 + file_i)
            file_i += 1
            batch_files.append(audio)
            batch_words.append(words_t)
        for audio, words_t, regions in zip(batch_files, batch_words,
                                           file_regions(batch_files)):
            for ch in merge_chunks(regions, window_sec):
                # identical extraction to the pipeline's batch_chunks
                clip = pad_audio_window(audio, ch.start, ch.end, window)
                words = [w for w, s, e in words_t
                         if ch.start <= (s + e) / 2 <= ch.end]
                if not words:
                    continue
                toks = prefix + tk.encode(" " + " ".join(words)) + [eot]
                if len(toks) > seq_len:
                    continue
                corpus.append((clip, " ".join(words)))
        if len(corpus) == before:
            # a broken/stale VAD that yields no usable windows must fail
            # loudly, not render files forever
            stalled_rounds += 1
            if stalled_rounds >= 3:
                raise RuntimeError(
                    f"corpus building stalled: {file_i} files rendered, "
                    f"{len(corpus)} usable windows — is the segmentation "
                    "checkpoint in MWX_WEIGHTS_DIR sane for this corpus?")
        else:
            stalled_rounds = 0
        print(f"  corpus {len(corpus)}/{args.n_train} "
              f"({file_i} files)", flush=True)
    print(f"{len(corpus)} windows from {file_i} files", flush=True)

    rng = np.random.default_rng(args.seed)

    def make_batch(idx):
        audio = np.zeros((len(idx), window), np.float32)
        tokens = np.full((len(idx), seq_len), eot, np.int32)
        mask = np.zeros((len(idx), seq_len), np.float32)
        for row, j in enumerate(idx):
            wav, text = corpus[j]
            n = min(len(wav), window)
            # augment: random gain + extra noise floor — the held-out eval
            # files differ from training only in their noise realization,
            # so an unaugmented model overfits the training noise and
            # free-running decode stumbles on the first token of unseen
            # windows (seen as spurious first-char insertions at eval)
            gain = float(rng.uniform(0.4, 1.6))
            extra = float(rng.uniform(0.0, 0.006))
            aug = wav[:n] * gain + extra * rng.standard_normal(n).astype(
                np.float32)
            audio[row, :n] = aug
            toks = prefix + tk.encode(" " + text) + [eot]
            tokens[row, :len(toks)] = toks
            mask[row, p:len(toks)] = 1.0            # text tokens + first EOT
        # inference ships int16 audio; train on the same quantization
        audio = np.clip(audio * 32768.0, -32768, 32767).astype(np.int16)
        audio = audio.astype(np.float32) / 32768.0
        mel = log_mel_spectrogram(jnp.asarray(audio), n_mels=cfg.n_mels)
        return mel, jnp.asarray(tokens), jnp.asarray(mask)

    # init on the host CPU: per-leaf jax.random / zeros_like calls would
    # each be a separate axon-TPU dispatch; the chip should see only the
    # jitted train step (tpu-env quirk: serial tiny-compile stall)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_params(jax.random.PRNGKey(args.seed), cfg)
        optimizer = optax.adamw(
            optax.warmup_cosine_decay_schedule(
                0.0, args.lr, warmup_steps=50, decay_steps=args.steps),
            weight_decay=1e-4)
        state = init_train_state(jax.device_get(params), optimizer)
    if args.platform == "tpu":
        import dataclasses as _dc
        dev = jax.devices()[0]
        state = _dc.replace(state,
                            params=jax.device_put(state.params, dev),
                            opt_state=jax.device_put(state.opt_state, dev))
    step_fn = make_train_step(cfg, optimizer)

    t0 = time.time()
    for step in range(args.steps):
        idx = rng.integers(0, len(corpus), args.batch)
        mel, tokens, mask = make_batch(idx)
        state, loss = step_fn(state, mel, tokens, mask)
        if step % 100 == 0 or step == args.steps - 1:
            print(f"step {step:5d}  loss {float(loss):.4f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)

    out = Path(args.out).resolve()
    from manual_whisper_tpu.convert.from_hf import save_params
    save_params(jax.device_get(state.params), out)
    print(f"saved checkpoint to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
