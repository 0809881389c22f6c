#!/usr/bin/env python3
"""Clean A/B of the decode loop: fused Pallas decode-step attention vs
the einsum path, same process, same params, same token trajectories.

bench.py's full-pipeline A/B (BENCH_FUSED=0/1) measures across separate
processes and is sensitive to host/tunnel load between runs; this tool
holds everything else fixed — one params set, one xa, `fused_attention`
flipped as the static arg of greedy_decode_jit — so the delta is the
kernel choice alone.  Decides the pipeline's TPU default
(pipeline/transcribe.py asr_options["fused_attention"]).

Usage: python tools/bench_decode_step.py [--model large-v3] [--batch 16]
       [--max-new 112] [--repeats 5]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("MWX_ALLOW_RANDOM_WEIGHTS", "1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-new", type=int, default=112)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--no-int8", action="store_true",
                    help="bf16 weights + bf16 cross-KV instead of int8")
    ap.add_argument("--ab", default="fused", choices=("fused", "ckv16"),
                    help="which static knob to A/B: 'fused' = Pallas vs "
                         "einsum decode attention; 'ckv16' = f32 vs bf16 "
                         "cross-KV scales on the einsum path "
                         "(VERDICT r4 #8)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from manual_whisper_tpu.models import MODEL_CONFIGS, init_params
    from manual_whisper_tpu.models.decode import greedy_decode_jit
    from manual_whisper_tpu.ops.quant import quantize_params

    cfg = MODEL_CONFIGS[args.model]
    params = init_params(jax.random.PRNGKey(0), cfg)
    if not args.no_int8:
        params = quantize_params(params)
    params = jax.block_until_ready(params)

    b = args.batch
    xa = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(1),
                          (b, cfg.n_audio_ctx, cfg.n_audio_state),
                          dtype=cfg.dtype) * 0.1)
    prefix = jnp.asarray([50258, 50260, 50360, 50364], jnp.int32)
    suppress = jnp.zeros((cfg.n_vocab,), jnp.float32)
    blank = jnp.zeros((cfg.n_vocab,), jnp.float32)
    temp = jnp.float32(0.0)
    rng = jax.random.PRNGKey(2)

    def run(fused: bool, ckv16: bool = False):
        return greedy_decode_jit(
            params, xa, prefix, suppress, blank, temp, rng,
            eot=50257, cfg=cfg, max_new=args.max_new,
            int8_cross_kv=not args.no_int8, fused_attention=fused,
            ckv_scale_bf16=ckv16)

    # (label, kwargs) variants; the SECOND is the candidate, speedup is
    # variant[0].s / variant[1].s
    variants = ([("einsum", {"fused": False}), ("fused", {"fused": True})]
                if args.ab == "fused" else
                [("ckv_s32", {"fused": False, "ckv16": False}),
                 ("ckv_s16", {"fused": False, "ckv16": True})])
    out = {}
    toks = {}
    for name, kw in variants:
        r = jax.block_until_ready(run(**kw))           # compile + warm
        toks[name] = np.asarray(r[0])
        gen = int(np.asarray(r[2]).sum())
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.time()
            jax.block_until_ready(run(**kw))
            best = min(best, time.time() - t0)
        out[name] = {"s": round(best, 4), "gen_tokens": gen,
                     "ms_per_token_row": round(1000 * best / max(
                         gen / b, 1), 3),
                     "tokens_per_s": round(gen / best, 1)}
        print(f"{name}: {out[name]}", flush=True)

    (base_name, _), (cand_name, _) = variants
    match = bool((toks[base_name] == toks[cand_name]).all())
    speedup = out[base_name]["s"] / out[cand_name]["s"]
    print(json.dumps({
        "model": args.model, "batch": b, "max_new": args.max_new,
        "int8": not args.no_int8, "tokens_match": match,
        f"{cand_name}_speedup_vs_{base_name}": round(speedup, 3),
        base_name: out[base_name], cand_name: out[cand_name],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
