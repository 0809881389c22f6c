#!/usr/bin/env python3
"""Dump + analyze the optimized HLO of the greedy decode program.

Finds where the decode while_loop's HBM bytes actually go: large copies
(scan ys rewrites, double-buffered carries), materialized converts
(int8->bf16 cross-KV, bf16->f32 embeddings), and per-fusion operand
sizes inside the loop body.  Written for VERDICT r3 #1 (decode runs at
~35% of its own recorded HBM roofline).
"""

import argparse
import os
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("MWX_ALLOW_RANDOM_WEIGHTS", "1")


DTYPE_BYTES = {"f32": 4, "bf16": 2, "s8": 1, "u8": 1, "s32": 4, "u32": 4,
               "pred": 1, "f16": 2, "s16": 2, "u16": 2, "f64": 8, "s64": 8}


def shape_bytes(shape_str: str) -> int:
    """'bf16[32,16,20,64,116]' -> byte count (0 for tuples/opaque)."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    if dt not in DTYPE_BYTES:
        return 0
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES[dt]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-new", type=int, default=112)
    ap.add_argument("--no-int8", action="store_true")
    ap.add_argument("--out", default="/tmp/decode_hlo.txt")
    ap.add_argument("--min-mb", type=float, default=4.0,
                    help="report ops with output >= this many MB")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from manual_whisper_tpu.models import MODEL_CONFIGS
    from manual_whisper_tpu.models.whisper import init_params_host
    from manual_whisper_tpu.models.decode import greedy_decode_jit
    from manual_whisper_tpu.ops.quant import quantize_params

    cfg = MODEL_CONFIGS[args.model]
    params = init_params_host(0, cfg, quantize_int8=not args.no_int8)
    if not args.no_int8:
        params = quantize_params(params)

    b = args.batch
    xa = jnp.zeros((b, cfg.n_audio_ctx, cfg.n_audio_state), cfg.dtype)
    prefix = jnp.asarray([50258, 50260, 50360, 50364], jnp.int32)
    suppress = jnp.zeros((cfg.n_vocab,), jnp.float32)
    blank = jnp.zeros((cfg.n_vocab,), jnp.float32)
    temp = jnp.float32(0.0)
    rng = jax.random.PRNGKey(2)

    lowered = greedy_decode_jit.lower(
        params, xa, prefix, suppress, blank, temp, rng,
        eot=50257, cfg=cfg, max_new=args.max_new,
        int8_cross_kv=not args.no_int8, fused_attention=False)
    compiled = lowered.compile()
    txt = compiled.as_text()
    Path(args.out).write_text(txt)
    print(f"wrote {len(txt) / 1e6:.1f} MB HLO to {args.out}")

    try:
        mem = compiled.memory_analysis()
        print(f"memory: {mem}")
    except Exception as exc:
        print(f"memory_analysis failed: {exc}")
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        keys = {k: v for k, v in ca.items()
                if "bytes" in k or k in ("flops", "optimal_seconds")}
        print(f"cost_analysis: {keys}")
    except Exception as exc:
        print(f"cost_analysis failed: {exc}")

    # --- find the decode while-loop body and tally big ops ---------------
    # locate computation blocks: lines '%name (…) -> … {' … '}'
    blocks = defaultdict(list)
    cur = None
    for line in txt.splitlines():
        m = re.match(r"^%?([\w.\-]+)\s.*\{$", line)
        if m and "=" not in line.split("{")[0]:
            cur = m.group(1)
            continue
        if line.startswith("}"):
            cur = None
            continue
        if cur:
            blocks[cur].append(line.strip())

    # the while body for the decode loop: the biggest body computation
    # mentioning dynamic-update-slice on the cache shape
    def body_score(name, lines):
        if "body" not in name and "while" not in name:
            return 0
        return sum(1 for ln in lines if "dynamic" in ln)

    body_name = max(blocks, key=lambda n: body_score(n, blocks[n]))
    lines = blocks[body_name]
    print(f"\n=== while body: {body_name} ({len(lines)} ops) ===")

    min_bytes = args.min_mb * 1e6
    tally = defaultdict(lambda: [0, 0])   # opcode -> [count, bytes]
    for ln in lines:
        m = re.match(r"%?[\w.\-]+ = ([\w\[\],\d]+?) ([\w\-]+)\(", ln)
        if not m:
            continue
        shape, op = m.groups()
        nbytes = shape_bytes(shape)
        tally[op][0] += 1
        tally[op][1] += nbytes
        if nbytes >= min_bytes and op in (
                "copy", "convert", "transpose", "broadcast", "reshape",
                "dynamic-update-slice", "dynamic-slice", "fusion",
                "dot", "bitcast"):
            print(f"  {nbytes / 1e6:9.1f} MB  {op:22s} {ln[:160]}")

    print("\n--- opcode byte totals (outputs) in body ---")
    for op, (cnt, byts) in sorted(tally.items(), key=lambda kv: -kv[1][1]):
        if byts > 1e6:
            print(f"  {byts / 1e9:8.3f} GB  {cnt:4d}x {op}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
