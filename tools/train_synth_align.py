#!/usr/bin/env python3
"""Train a tiny wav2vec2-CTC aligner on the synthetic tone language.

Completes the trained model set (VERDICT r2 #3: wav2vec2 was the only
pipeline model still random-weight in every in-env run, so word-timestamp
quality was literally unknown).  Character-level CTC over the synth
lexicon's letters; models/align.py then Viterbi-aligns segment text to
the CTC log-probs exactly as it would with the converted HF checkpoint
the reference stack uses (reference: transcribe.py:130-131).

Saved under the registry key language "en" resolves to
(DEFAULT_ALIGN_MODELS), as an orbax checkpoint + align_meta.json (the
torch-free registry form load_align_model prefers), with a SYNTH_TRAINED
provenance marker.

Usage: python tools/train_synth_align.py [--steps 1500] [--batch 16]
       [--out .weights/jonatasgrosman--wav2vec2-large-xlsr-53-english]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n-samples", type=int, default=2048)
    ap.add_argument("--window-sec", type=float, default=4.0,
                    help="training window; matches the 4 s align length "
                         "bucket VAD-sized segments pad to")
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=23)
    ap.add_argument("--out", default=".weights/jonatasgrosman--wav2vec2-large-xlsr-53-english")
    ap.add_argument("--platform", default="cpu",
                    help="cpu (default: the 2-layer model trains in "
                         "minutes and the axon backend compiles "
                         "lax.scan-heavy programs pathologically slowly) "
                         "or tpu")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms",
                      "" if args.platform == "tpu" else args.platform)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from manual_whisper_tpu.eval.synth import (SAMPLE_RATE, WORD_LIST,
                                               render_utterance, sample_text)
    from manual_whisper_tpu.models.wav2vec2 import (Wav2Vec2Config,
                                                    frames_for_samples,
                                                    init_wav2vec2_params,
                                                    wav2vec2_logits)

    # char vocab: CTC blank (<pad>) 0, word separator "|" 1, letters 2..
    letters = sorted(set("".join(WORD_LIST)))
    vocab = {"<pad>": 0, "|": 1}
    for ch in letters:
        vocab[ch] = len(vocab)
    cfg_fields = dict(vocab_size=len(vocab), hidden=64, n_layers=2,
                      n_heads=2, ffn=128, conv_dim=32, pos_conv_kernel=16,
                      pos_conv_groups=2)
    cfg = Wav2Vec2Config(**cfg_fields)

    window = int(args.window_sec * SAMPLE_RATE)
    n_frames = frames_for_samples(window)
    max_label = 8 * 3  # 8 words x (2 letters + separator)
    rng = np.random.default_rng(args.seed)

    def sample(seed: int):
        r = np.random.default_rng(seed)
        words = sample_text(r, 1, 8)
        wav = render_utterance(words, seed=seed)
        # models/align.py normalizes the clip THEN zero-pads to the
        # length bucket; train on the same distribution
        norm = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-7)
        clip = np.zeros(window, np.float32)
        off = int(r.integers(0, max(window - len(norm), 1)))
        clip[off: off + len(norm)] = norm[:window]
        text = " ".join(words)
        labels = [vocab["|"] if c == " " else vocab[c] for c in text]
        return clip, labels

    print(f"rendering {args.n_samples} CTC samples "
          f"({args.window_sec:.1f}s window, {n_frames} frames, "
          f"vocab {len(vocab)})...", flush=True)
    xs = np.zeros((args.n_samples, window), np.float32)
    ys = np.zeros((args.n_samples, max_label), np.int32)
    yp = np.ones((args.n_samples, max_label), np.float32)  # 1 = padding
    for i in range(args.n_samples):
        clip, labels = sample(args.seed * 92821 + i)
        xs[i] = clip
        ys[i, : len(labels)] = labels
        yp[i, : len(labels)] = 0.0

    # init on the host CPU (tpu-env quirk: serial tiny-compile stall)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_wav2vec2_params(jax.random.PRNGKey(args.seed), cfg)
    params = jax.device_get(params)
    warmup = min(50, max(1, args.steps // 10))
    optimizer = optax.adamw(
        optax.warmup_cosine_decay_schedule(
            0.0, args.lr, warmup_steps=warmup,
            decay_steps=max(args.steps, warmup + 1)),
        weight_decay=1e-4)
    with jax.default_device(jax.devices("cpu")[0]):
        opt_state = optimizer.init(params)
    if args.platform == "tpu":
        dev = jax.devices()[0]
        params = jax.device_put(params, dev)
        opt_state = jax.device_put(opt_state, dev)

    @jax.jit
    def step_fn(params, opt_state, clips, labels, label_pad):
        def loss_fn(p):
            logp = wav2vec2_logits(p, clips, cfg)     # [B, T, V]
            logit_pad = jnp.zeros(logp.shape[:2], jnp.float32)
            per = optax.ctc_loss(logp, logit_pad, labels, label_pad,
                                 blank_id=0)
            return per.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for step in range(args.steps):
        idx = rng.integers(0, args.n_samples, args.batch)
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(xs[idx]), jnp.asarray(ys[idx]),
            jnp.asarray(yp[idx]))
        if step % 100 == 0 or step == args.steps - 1:
            print(f"step {step:5d}  ctc loss {float(loss):.4f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # quick held-out timing sanity via the REAL align() path
    from manual_whisper_tpu.eval.metrics import word_timing_scores
    from manual_whisper_tpu.eval.synth import render_file_with_times
    from manual_whisper_tpu.models.align import AlignModel, align
    model = AlignModel(params=jax.device_get(params), cfg=cfg, vocab=vocab,
                       blank_id=0, language="en")
    r = np.random.default_rng(args.seed + 1)
    utts = [sample_text(r, 4, 8) for _ in range(3)]
    audio, words_t = render_file_with_times(utts, seed=args.seed + 77)
    cursor, segs, wi = 0, [], 0
    for u in utts:
        seg_words = words_t[wi: wi + len(u)]
        wi += len(u)
        segs.append({"text": " ".join(w for w, _, _ in seg_words),
                     "start": seg_words[0][1] - 0.05,
                     "end": seg_words[-1][2] + 0.05})
    out = align(segs, model, audio)
    scores = word_timing_scores(words_t, out["word_segments"])
    print("held-out word timing:", json.dumps(scores), flush=True)

    out_dir = Path(args.out).resolve()
    from manual_whisper_tpu.convert.from_hf import save_params
    save_params(jax.device_get(params), out_dir / "jax")
    (out_dir / "align_meta.json").write_text(
        json.dumps({"config": cfg_fields, "vocab": vocab, "blank_id": 0},
                   ensure_ascii=False, indent=1) + "\n", encoding="utf-8")
    from manual_whisper_tpu import config as _config
    _config.write_synth_marker(
        out_dir, f"tools/train_synth_align.py --steps {args.steps} "
        f"--seed {args.seed} (held-out timing {scores})")
    print(f"saved alignment checkpoint to {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
