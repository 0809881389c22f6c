#!/usr/bin/env python3
"""Train the ResNet34 speaker-embedding model on synthetic voices.

Completes the trained diarization stack (segmentation is trained by
tools/train_synth_vad.py): with this checkpoint in the registry,
DiarizationPipeline embeds with a trained ResNet instead of the
random-init / spectral-stats fallback, removing the last random-weights
caveat from EVAL_r{N}.json.  Replaces the wespeaker checkpoint pyannote
3.1 downloads in the reference deployment (README.md:58-59).

A synthetic "voice" is a ring-modulation carrier applied to the tone-word
waveform (the same mechanism the eval fixture uses for its two speaker
registers, eval/synth.py _speaker_voice — carrier 0 Hz and ~4.5 kHz are
both inside the training distribution).  Word content is drawn
independently of voice so the embedding cannot shortcut on content.
Objective: cross-entropy over voice identities through a linear head on
the L2-normalised embedding; the head is dropped at save time.

Usage: python tools/train_synth_embed.py [--steps 1500] [--batch 32]
       [--voices 48] [--out .weights/wespeaker-voxceleb-resnet34-LM/jax]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--voices", type=int, default=48)
    ap.add_argument("--n-samples", type=int, default=4096)
    ap.add_argument("--clip-sec", type=float, default=3.0,
                    help="diarization sliding-window length")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--out",
                    default=".weights/wespeaker-voxceleb-resnet34-LM/jax")
    ap.add_argument("--platform", default="tpu", help="tpu (auto) or cpu")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms",
                      "" if args.platform == "tpu" else args.platform)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from manual_whisper_tpu.eval.synth import (SAMPLE_RATE,
                                               render_utterance,
                                               sample_text)
    from manual_whisper_tpu.models.diarize import (EmbeddingConfig,
                                                   embed_forward,
                                                   init_embedding_params)
    from manual_whisper_tpu.ops.mel import unnormalized_log_mel

    cfg = EmbeddingConfig()
    clip_len = int(args.clip_sec * SAMPLE_RATE)
    rng = np.random.default_rng(args.seed)

    # voice 0 = clean register; others = ring-mod carriers spanning the
    # band the fixture uses (4.5 kHz) and beyond
    carriers = np.concatenate(
        [[0.0], rng.uniform(1500.0, 7800.0, args.voices - 1)])
    t_axis = (np.arange(clip_len) / SAMPLE_RATE).astype(np.float32)

    def sample_clip(voice: int, seed: int) -> np.ndarray:
        r = np.random.default_rng(seed)
        words = sample_text(r, 3, 6)
        wav = render_utterance(words, seed=seed)
        clip = np.zeros(clip_len, np.float32)
        n = min(len(wav), clip_len)
        off = int(r.integers(0, max(clip_len - n, 1)))
        clip[off: off + n] = wav[:n]
        c = carriers[voice]
        if c > 0:
            clip = clip * np.cos(2 * np.pi * c * t_axis)
        clip = clip * float(r.uniform(0.4, 1.6))
        clip += 0.002 * r.standard_normal(clip_len).astype(np.float32)
        return clip

    print(f"{args.voices} voices, {args.n_samples} clips of "
          f"{args.clip_sec:.1f}s ...", flush=True)
    xs = np.zeros((args.n_samples, clip_len), np.float32)
    ys = np.zeros(args.n_samples, np.int32)
    for i in range(args.n_samples):
        v = int(rng.integers(0, args.voices))
        xs[i] = sample_clip(v, args.seed * 65537 + i)
        ys[i] = v

    # init on the host CPU: each jax.random call in the init loop would
    # otherwise be its own ~35 s axon-TPU compile (serial tiny-compile
    # stall); the chip sees ONE program — the jitted step below
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_embedding_params(jax.random.PRNGKey(args.seed), cfg)
        head = (np.asarray(jax.random.normal(
                    jax.random.PRNGKey(args.seed + 1),
                    (cfg.embed_dim, args.voices)))
                / np.sqrt(cfg.embed_dim)).astype(np.float32)
    params = jax.device_get(params)
    trainable = {"model": params, "head": head}

    warmup = min(50, max(1, args.steps // 10))
    optimizer = optax.adamw(
        optax.warmup_cosine_decay_schedule(
            0.0, args.lr, warmup_steps=warmup,
            decay_steps=max(args.steps, warmup + 1)),
        weight_decay=1e-4)
    with jax.default_device(jax.devices("cpu")[0]):
        opt_state = optimizer.init(trainable)
    if args.platform == "tpu":
        dev = jax.devices()[0]
        trainable = jax.device_put(trainable, dev)
        opt_state = jax.device_put(opt_state, dev)

    @jax.jit
    def step_fn(trainable, opt_state, clips, labels):
        mel = unnormalized_log_mel(clips, cfg.n_mels)

        def loss_fn(tr):
            emb = embed_forward(tr["model"], mel, cfg)     # L2-normalised
            # scaled cosine logits (normalised-softmax; scale ~= AAM's s)
            w = tr["head"] / jnp.linalg.norm(tr["head"], axis=0,
                                             keepdims=True).clip(1e-8)
            logits = 20.0 * (emb @ w)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, labels[:, None], 1)[:, 0]
            acc = (jnp.argmax(logits, -1) == labels).mean()
            return nll.mean(), acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss, acc

    t0 = time.time()
    for step in range(args.steps):
        idx = rng.integers(0, args.n_samples, args.batch)
        trainable, opt_state, loss, acc = step_fn(
            trainable, opt_state, jnp.asarray(xs[idx]), jnp.asarray(ys[idx]))
        if step % 100 == 0 or step == args.steps - 1:
            print(f"step {step:5d}  loss {float(loss):.4f}  "
                  f"acc {float(acc):.3f}  ({time.time() - t0:.0f}s)",
                  flush=True)

    out = Path(args.out).resolve()
    from manual_whisper_tpu.convert.from_hf import save_params
    save_params(jax.device_get(trainable["model"]), out)
    from manual_whisper_tpu import config as _config
    _config.write_synth_marker(
        out.parent, f"tools/train_synth_embed.py --steps {args.steps} "
        f"--voices {args.voices} --seed {args.seed} "
        f"(train acc {float(acc):.3f})")
    print(f"saved embedding checkpoint to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
