#!/usr/bin/env python3
"""Benchmark: large-v3 transcription throughput per TPU chip.

Prints ONE JSON line.  Required keys {"metric", "value", "unit",
"vs_baseline"} carry the BASELINE.json headline — real-time factor (audio
seconds transcribed per wall second) for the full pipeline (VAD -> chunk
-> fused log-mel -> encoder -> batched KV-cache greedy decode) on Whisper
large-v3-shaped weights.  Weights are synthetic (no hub access in this
environment): identical shapes, dtypes, FLOPs and HBM traffic as a
converted checkpoint — matmul timing is value-independent, so the int8
blocks are synthesized zero-filled (init_params_host) to keep model
construction off this host's erratically slow memory path.  Decode length
is pinned to a realistic 30 s-segment token budget so the synthetic
model's non-termination doesn't skew RTF.

Budget safety (VERDICT.md r2 weak #2): a watchdog thread holds a hard
wall-clock deadline (BENCH_BUDGET_S, default 520 s — under the driver's
timeout).  The headline dict is updated after every timed repeat, so if a
later stage stalls the watchdog still emits the best headline measured so
far (or an explicit "incomplete" record naming the stage) and exits 0.
The phase-split pass only runs when enough budget remains and is
best-effort.  The VAD path actually measured is stated in the "vad" field
(trained PyanNet pinned to host CPU by default — the on-chip BiLSTM
compile stall was BENCH_r02's rc 124; see models/vad.py
vad_compute_device).

Degraded-tunnel ladder (VERDICT.md r4 #1 — BENCH_r04 died inside an
in-process canary that never returned):
  1. The canary (one tiny matmul) runs in a SUBPROCESS, observed by the
     main process.  It is never killed while the bench continues — a
     client killed mid-compile wedges the tunnel for every subsequent
     compile in THIS process too (the r4 failure chain).  If it hasn't
     returned by BENCH_CANARY_CAP_S (default 300 s) the tunnel is
     hard-down for compiles: the bench emits an explicit diagnostic
     artifact (canary_blocked_s, the probe result, the ladder steps
     taken) and exits 0 — proof the ladder ran, not a bare zero.
  2. A persistent XLA compile cache (BENCH_COMPILE_CACHE_DIR, default
     .jax_bench_cache/) is READ whenever it has entries — degraded OR
     healthy canary (r5 evidence: a 23.8 s canary preceded a warmup
     whose compiles never returned; the canary samples one moment of an
     erratic tunnel, so a healthy reading does not license cold
     compiles when hits are available).  Stale entries never hit
     (content-addressed).  BENCH_CACHE_READS=0 restores write-only
     staging.  With an EMPTY cache, compiles land in a staging dir
     promoted into the cache after the headline is emitted AND on
     watchdog exit (partial progress survives a wedged run, so
     consecutive budget-exhausted runs ratchet toward a full hit).
     The canary always runs cache-less so it measures true compile-path
     health rather than a cache hit.
  3. If the canary returns slow (> BENCH_DEGRADED_CANARY_S, default
     30 s), the run degrades: compile-cache reads ON, repeats 3 -> 1,
     phase-split only with ample budget, and — when the cache is empty,
     so there are no same-shape entries to hit — BENCH_SECONDS
     768 -> 192 for the cheapest-possible fresh compile.  With cache
     entries present the audio length stays at the recorded 768 s
     config so every program shape cache-hits.

Extra keys separate compute throughput from host/link noise: the
phase-split pass times encode and decode dispatches individually
(block_until_ready between phases) and reports encode_rtf / decode_rtf /
device_rtf, tokens_per_s, decode ms/token, an analytic-FLOPs MFU estimate
against the v5e bf16 peak, and an HBM-roofline note for the decode step
(mfu_note) so the MFU number has a recorded interpretation
(VERDICT.md r2 #7).

vs_baseline = value / 30 (the >=30x real-time per-chip north star;
the reference publishes no numbers of its own, BASELINE.md; its only
perf self-report is the runtime RTF print, reference transcribe.py:125).
"""

import json
import logging
import os
import sys
import threading
import time

os.environ.setdefault("MWX_ALLOW_RANDOM_WEIGHTS", "1")
# the committed registry checkpoints are synth-trained by design here;
# the loader warning is for real-audio deployments (config.py)
os.environ.setdefault("MWX_ALLOW_SYNTH_WEIGHTS", "1")
# keep stdout pure JSON: jax's experimental-platform warning goes to a
# logger that must not interleave with the metric line
logging.getLogger("jax._src.xla_bridge").setLevel(logging.ERROR)

import numpy as np

_STATE = {"headline": None, "stage": "import", "done": False}
# exactly-once guard for the final JSON line: main and the watchdog
# race near the deadline, and os._exit mid-print would truncate output
_PRINT_LOCK = threading.Lock()
_T_START = time.time()


def _emit_final(payload: dict) -> bool:
    """Print the one-and-only headline JSON line.  Returns False if the
    other thread already printed it."""
    with _PRINT_LOCK:
        if _STATE["done"]:
            return False
        _STATE["done"] = True
        print(json.dumps(payload), flush=True)
        return True


def _log(msg: str) -> None:
    print(f"[bench +{time.time() - _T_START:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _stage(name: str) -> None:
    _STATE["stage"] = name
    _log(name)


def _watchdog(deadline: float) -> None:
    while not _STATE["done"]:
        remaining = deadline - time.time()
        if remaining <= 0:
            break
        time.sleep(min(5.0, remaining))
    if _STATE["done"]:
        return
    head = _STATE["headline"]
    if head is None:
        head = {
            "metric": "rtf_bench_incomplete",
            "value": 0.0,
            "unit": "x_realtime_per_chip",
            "vs_baseline": 0.0,
        }
    else:
        head = dict(head)
    head["watchdog"] = f"budget exhausted during stage: {_STATE['stage']}"
    if _STATE.get("canary") is not None:
        head.setdefault("canary_s", _STATE["canary"])
    # salvage compiles that DID finish before the wedge: promote staging
    # entries into the persistent cache so consecutive budget-exhausted
    # runs ratchet forward until one fully cache-hits (r5: a fast canary
    # followed by a wedged warmup left zero entries behind, wasting the
    # 108 s of compiles that had already completed)
    n = _promote_staging_cache(_STATE.get("staging", ""),
                               _STATE.get("cache_dir", ""))
    if n:
        head["staging_promoted_on_watchdog"] = n
    _emit_final(head)   # no-op if main printed first
    os._exit(0)


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
V5E_HBM_BW = 819e9      # TPU v5e HBM bandwidth (public spec)

_REPO = os.path.dirname(os.path.abspath(__file__))


def _cache_dir() -> str:
    """Persistent XLA compile-cache dir ('' disables)."""
    if os.environ.get("BENCH_COMPILE_CACHE", "1") != "1":
        return ""
    return os.environ.get("BENCH_COMPILE_CACHE_DIR",
                          os.path.join(_REPO, ".jax_bench_cache"))


def _enable_compile_cache(d: str) -> str:
    """Point jax at a compile-cache dir.  Returns the dir.

    Must run after `import jax` but before the first compile.  min
    compile time 1 s: everything in the pipeline qualifies, while the
    host-side CPU helpers stay uncached."""
    if not d:
        return ""
    import jax
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return d


def _promote_staging_cache(staging: str, cache_dir: str) -> int:
    """Move freshly-written cache entries from the healthy run's staging
    dir into the real cache (content-addressed filenames; an overwrite
    is a same-key refresh).  Returns entries promoted."""
    if not staging or not cache_dir or not os.path.isdir(staging):
        return 0
    os.makedirs(cache_dir, exist_ok=True)
    n = 0
    for name in os.listdir(staging):
        try:
            os.replace(os.path.join(staging, name),
                       os.path.join(cache_dir, name))
            n += 1
        except OSError:
            pass
    try:
        os.rmdir(staging)
    except OSError:
        pass
    return n


_CANARY_CODE = r"""
import json, time
t0 = time.time()
import jax, jax.numpy as jnp
import numpy as np
x = jnp.ones((1024, 1024))
np.asarray(jax.jit(lambda a: a @ a)(x))
print(json.dumps({"canary_s": round(time.time() - t0, 1)}), flush=True)
"""


def _run_canary(cap_s: float):
    """One tiny matmul compile+run in a fresh process, cache-less (it
    must measure true compile-path health, not a cache hit).

    Returns (canary_s, None) on success or (None, reason) when the child
    had not returned by ``cap_s``.  A timed-out child is NEVER killed —
    a client killed mid-compile wedges the tunnel's compile path for
    every later client (the r4 failure chain); the orphan exits by
    itself the moment its compile finally returns."""
    import subprocess
    proc = subprocess.Popen([sys.executable, "-c", _CANARY_CODE],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True,
                            start_new_session=True)
    t0 = time.time()
    while time.time() - t0 < cap_s:
        if proc.poll() is not None:
            break
        time.sleep(1.0)
    if proc.poll() is None:
        return None, (f"canary matmul still compiling after {cap_s:.0f}s "
                      "in a fresh process — compile path hard-down "
                      "(r4 failure mode); the canary child is left "
                      "running (killing a mid-compile client deepens "
                      "the wedge) and will exit on its own")
    out, err = proc.communicate()
    if proc.returncode != 0:
        tail = (err or "").strip().splitlines()[-1:]
        return None, (f"canary process failed (rc {proc.returncode}): "
                      f"{' '.join(tail)}")
    try:
        return float(json.loads(out.strip().splitlines()[-1])
                     ["canary_s"]), None
    except Exception:
        return None, f"canary emitted unparseable output: {out!r}"


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


def _decode_roofline_note(cfg, batch: int, cache_len: float,
                          int8_weights: bool, int8_ckv: bool,
                          measured_ms_per_row: float) -> str:
    """HBM-roofline bound for one decode step vs the measured time.

    Bytes read per step: decoder weights (L*(4d^2 self + 2d^2 cross +
    8d^2 mlp) + d*vocab bf16 logits), cross-KV for every batch row
    (L*B*2*d*Ta, + f32 per-position scales when int8), and the
    self-KV cache.  ``cache_len`` is the STATIC cache length the
    implementation actually reads every step (prefix + max_new; XLA
    static shapes read the full cache and mask, they do not grow with
    position).  The decode loop is bandwidth-bound; this records how
    close the measured step time is to bytes/bandwidth (VERDICT r2 #7,
    r3 #1)."""
    d = cfg.n_audio_state
    ta = cfg.n_audio_ctx
    wb = 1 if int8_weights else 2
    w_bytes = cfg.n_text_layer * 14 * d * d * wb + d * cfg.n_vocab * 2
    ckv_bytes = cfg.n_text_layer * batch * 2 * d * ta * (1 if int8_ckv else 2)
    if int8_ckv:   # f32 per-(layer,row,head,position) scales
        ckv_bytes += cfg.n_text_layer * batch * 2 * (d // 64) * ta * 4
    skv_bytes = cfg.n_text_layer * batch * 2 * d * cache_len * 2
    total = w_bytes + ckv_bytes + skv_bytes
    min_ms_row = 1000.0 * total / V5E_HBM_BW / batch
    return (f"decode HBM roofline: {total / 1e9:.2f} GB/step "
            f"(weights {w_bytes / 1e9:.2f} + crossKV {ckv_bytes / 1e9:.2f} "
            f"+ selfKV {skv_bytes / 1e9:.2f} static-read) @ 819 GB/s -> "
            f"min {min_ms_row:.3f} ms/token-row vs measured "
            f"{measured_ms_per_row:.3f}")


def _phase_split(model, audio, batch_size: int, language: str,
                 temperature: float):
    """Time encode and decode dispatches separately on the chunked audio.

    Returns (encode_s, decode_s, generated_tokens, n_windows)."""
    import jax

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


def _vad_label(model) -> str:
    if model.vad.params is None:
        return "energy"
    from manual_whisper_tpu.models.vad import vad_compute_device
    dev = vad_compute_device()
    return "pyannet[cpu]" if dev is not None else "pyannet[device]"


def main() -> int:
    model_name = os.environ.get("BENCH_MODEL", "large-v3")
    # batch 32 is the recorded config since r4: the unrolled decode loop
    # measures 0.347 ms/token-row at 32 vs 0.389 at 16 (ckv8 int8), and
    # one batch-32 dispatch halves the host/tunnel round-trips of two
    # batch-16 ones (tools/bench_decode_step.py A/B)
    batch_size = int(os.environ.get("BENCH_BATCH", "32"))
    # 768 s -> 64 voiced bursts -> 32 merged ~22 s windows -> exactly one
    # full batch-32 dispatch: ONE compiled (encode, decode) shape pair,
    # so warmup compiles as few XLA programs as possible
    seconds = int(os.environ.get("BENCH_SECONDS", "768"))
    max_new = int(os.environ.get("BENCH_MAX_NEW_TOKENS", "112"))
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "520"))
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
    # this knob quantifies.  Beam honors int8_cross_kv since r4 (the
    # scales commute out of the beam cross dots too); fused_attention
    # still does not apply to beam and the suffix reflects what ran.
    beam = int(os.environ.get("BENCH_BEAM", "1"))

    deadline = _T_START + budget_s
    threading.Thread(target=_watchdog, args=(deadline,), daemon=True).start()

    # reachability pre-check, in a SUBPROCESS: a dead tunnel (relay
    # process gone) blocks jax.devices() forever — in-process that
    # burns the whole budget before the watchdog reports a bare zero.
    # The probe either exits quickly (healthy: ~5-10 s) or is killed at
    # the cap, in which case the artifact names the infra failure and
    # bench exits 0 immediately.  A killed probe is safe here: it never
    # got past backend init, so no in-flight device state can wedge.
    _stage("backend probe")
    probe_cap = float(os.environ.get("BENCH_PROBE_CAP_S", "120"))
    import subprocess
    probe_err = None
    try:
        res = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=probe_cap, capture_output=True, text=True)
        if res.returncode != 0:
            tail = (res.stderr or "").strip().splitlines()[-1:]
            probe_err = (f"backend init failed fast in a fresh process "
                         f"(rc {res.returncode}): {' '.join(tail)}")
    except subprocess.TimeoutExpired:
        probe_err = (f"jax.devices() blocked >{probe_cap:.0f}s in a "
                     "fresh process (axon tunnel relay down?)")
    if probe_err:
        _emit_final({
            "metric": "rtf_bench_incomplete",
            "value": 0.0,
            "unit": "x_realtime_per_chip",
            "vs_baseline": 0.0,
            "error": ("accelerator backend unreachable: " + probe_err
                      + " — not a pipeline regression; rerun once the "
                        "tunnel is restored"),
        })
        return 0

    # canary: one tiny matmul compile+run, in a SUBPROCESS (r4's died
    # in-process and ate the whole budget).  Healthy tunnel ~2 s; a
    # wedged compile path shows up as 10-100x that or never returns —
    # the cap turns "never" into an explicit diagnostic artifact.
    _stage("canary")
    cache_dir = _cache_dir()
    cache_entries = len(os.listdir(cache_dir)) \
        if cache_dir and os.path.isdir(cache_dir) else 0
    # with a hot cache the best response to ANY canary slowness is the
    # cache path, and the rescue needs ~400 s of budget (loads measured
    # ~112 s/program) — so the cap shrinks to 90 s; cache-less, the full
    # 300 s distinguishes "very slow but alive" from hard-down
    canary_cap = float(os.environ.get(
        "BENCH_CANARY_CAP_S", "90" if cache_entries else "300"))
    canary_cap = min(canary_cap, max(60.0, deadline - time.time() - 30.0))
    canary_s, canary_err = _run_canary(canary_cap)
    if canary_err is None and canary_s is not None \
            and canary_s > 0.5 * canary_cap:
        # one retry on a fresh process: a single slow canary can be a
        # transient (relay restart, competing client exiting); the retry
        # costs little compared to mis-tiering the whole run
        retry_s, retry_err = _run_canary(
            min(canary_cap, max(30.0, deadline - time.time() - 30.0)))
        if retry_err is None and retry_s is not None:
            canary_s = min(canary_s, retry_s)
    cache_rescue = False
    if canary_err is not None:
        # last rung: with a hot cache, every program can LOAD instead of
        # compile — r4's diagnosis was that dispatches stay fast while
        # compiles wedge, so a 100% cache-hit run can still land a real
        # RTF.  One cold shape re-wedges, but the watchdog then emits an
        # artifact naming the stage, which is no worse than giving up.
        if cache_entries > 0 and deadline - time.time() > 120.0:
            cache_rescue = True
            canary_s = -1.0   # sentinel: canary never returned
            _log("canary hard-down but compile cache is hot "
                 f"({cache_entries} entries): attempting cache-only run")
        else:
            _emit_final({
                "metric": "rtf_bench_incomplete",
                "value": 0.0,
                "unit": "x_realtime_per_chip",
                "vs_baseline": 0.0,
                "error": ("compile path unavailable: " + canary_err
                          + " — not a pipeline regression; rerun once "
                            "the tunnel is restored"),
                "ladder": "probe ok -> canary subprocess capped "
                          f"at {canary_cap:.0f}s -> no cache entries "
                          "to attempt a cache-only run with",
                "compile_cache_dir": cache_dir or "disabled",
                "compile_cache_entries": cache_entries,
            })
            return 0
    _STATE["canary"] = canary_s
    _log(f"canary compile+run {canary_s}s (subprocess; "
         f"cache entries {cache_entries})")

    # tier the workload on canary health (VERDICT r4 #1b)
    degraded_at = float(os.environ.get("BENCH_DEGRADED_CANARY_S", "30"))
    degraded = cache_rescue or canary_s > degraded_at
    staging = ""
    if degraded:
        repeats_default = "1"
        if cache_entries == 0 and "BENCH_SECONDS" not in os.environ:
            # no same-shape cache entries to hit: compile the cheapest
            # possible fresh program set instead of the full config
            seconds = 192
        _log(f"canary {canary_s}s > {degraded_at}s: degraded tier "
             f"(seconds={seconds}, repeats forced 1, cache reads ON, "
             f"{'hot' if cache_entries else 'cold'})")
    else:
        repeats_default = "3"

    _stage("load_model")
    import jax
    if cache_dir:
        if degraded or cache_entries > 0:
            # reads may rescue the run.  Entries present => read even on
            # a healthy canary: r5 evidence is that a 23.8 s canary can
            # still precede a warmup whose compiles never return (the
            # canary samples one moment of an erratic tunnel), and a
            # same-code cache hit skips the compile entirely.  Stale
            # entries never hit (content-addressed), they only cost the
            # lookup.  BENCH_CACHE_READS=0 restores write-only staging.
            if os.environ.get("BENCH_CACHE_READS", "1") == "1":
                _enable_compile_cache(cache_dir)
            else:
                staging = cache_dir + ".staging"
                import shutil
                shutil.rmtree(staging, ignore_errors=True)
                _enable_compile_cache(staging)
        else:
            # empty cache: nothing to read — write compiles to a staging
            # dir promoted into the cache after the headline lands (and,
            # since r5, on watchdog exit too) so the NEXT run can hit
            staging = cache_dir + ".staging"
            import shutil
            shutil.rmtree(staging, ignore_errors=True)
            _enable_compile_cache(staging)
        _STATE["staging"] = staging
        _STATE["cache_dir"] = cache_dir
    from manual_whisper_tpu.pipeline import load_model

    asr_options = {"max_new_tokens": max_new, "int8_cross_kv": int8_ckv,
                   "beam_size": beam}
    # BENCH_CKV_SCALE=bf16 stores the int8 cross-KV scales in bf16
    # (halves the scale read — VERDICT r4 #8 A/B knob)
    ckv_scale = os.environ.get("BENCH_CKV_SCALE", "f32")
    if ckv_scale == "bf16":
        asr_options["ckv_scale_bf16"] = True
    if fused_env is not None:
        asr_options["fused_attention"] = fused_env == "1"
    model = load_model(
        model_name, language="zh", compute_type=compute_type,
        asr_options=asr_options)
    # Beam runs suppress EOT (faster-whisper's suppress_tokens option):
    # synthetic zero-int8 weights give near-uniform logits, where beam's
    # length-normalised scoring ends every row after ~2 tokens — the
    # measured decode phase must run the same realistic token budget the
    # greedy config does, not an empty-hypothesis early-out.  Greedy's
    # argmax already never emits EOT on these weights.
    if (beam > 1 and os.environ.get("BENCH_SUPPRESS_EOT", "1") == "1") \
            or os.environ.get("BENCH_SUPPRESS_EOT") == "1":
        model.asr_options["suppress_tokens"] = (
            model.tokenizer.special.eot,)
    audio = synth_speech(seconds)
    duration = len(audio) / 16000.0
    vad_label = _vad_label(model)
    _log(f"model loaded; vad={vad_label}")

    suffix = "" if compute_type == "bfloat16" else f"_{compute_type}"
    if int8_ckv:
        suffix += "_ckv8"
        if ckv_scale == "bf16":
            suffix += "s16"
    if beam > 1:
        suffix += f"_beam{beam}"
    metric = (f"rtf_{model_name.replace('-', '_')}"
              f"_batch{batch_size}{suffix}")

    def headline(rtf: float, repeats_done: int) -> dict:
        return {
            "metric": metric,
            "value": round(rtf, 2),
            "unit": "x_realtime_per_chip",
            "vs_baseline": round(rtf / 30.0, 3),
            "wall_rtf": round(rtf, 2),
            "repeats": repeats_done,
            "audio_s": seconds,
            "vad": vad_label,
            "canary_s": canary_s,
            "compile_cache_entries": cache_entries,
            **({"degraded_tier": True} if degraded else {}),
            **({"cache_only_rescue": True,
                "canary_note": "canary never returned (-1); run survived "
                               "on cache hits"} if cache_rescue else {}),
        }

    # warmup: compile every program shape (mel, encode, prefill, decode
    # loop, VAD) — counted against the budget but not the metric.  The
    # warmup transcribe is itself a full pipeline run, so its RTF becomes
    # a flagged fallback headline: if axon compile-time variance eats the
    # whole budget (warmup measured 200-440 s run-to-run for identical
    # programs), the artifact still carries a real number instead of an
    # "incomplete" zero.
    _stage("warmup (compiles)")
    t0 = time.time()
    model.transcribe(audio, batch_size=batch_size, language="zh",
                     temperature=(0.0,))
    warm = headline(duration / (time.time() - t0), 0)
    warm["includes_compile"] = True
    _STATE["headline"] = warm

    # best-of-N: host<->device link latency varies run to run; the best
    # run reflects the pipeline, not transient link noise
    repeats = int(os.environ.get("BENCH_REPEATS", repeats_default))
    elapsed = float("inf")
    result = None
    for i in range(max(repeats, 1)):
        _stage(f"timed repeat {i + 1}/{repeats}")
        t0 = time.time()
        result = model.transcribe(audio, batch_size=batch_size,
                                  language="zh", temperature=(0.0,))
        elapsed = min(elapsed, time.time() - t0)
        _STATE["headline"] = headline(duration / elapsed, i + 1)
        _log(f"repeat {i + 1}: {duration / (time.time() - t0):.1f}x "
             f"(best {duration / elapsed:.1f}x)")
        # stop early rather than let the watchdog truncate a repeat
        if deadline - time.time() < 1.5 * (time.time() - t0):
            _log("stopping repeats: insufficient budget for another")
            break

    assert result["segments"], "pipeline produced no segments"
    out = dict(_STATE["headline"])

    # phase-split pass: device-path throughput with host noise excluded.
    # Best-effort — the wall headline above survives any failure here.
    # Every program is already compiled (warmup + repeats ran the same
    # shapes), so this costs about one repeat, not a compile.
    if deadline - time.time() > (120.0 if degraded else 45.0):
        _stage("phase split (best effort)")
        try:
            encode_s, decode_s, gen_tokens, n_windows = _phase_split(
                model, audio, batch_size, "zh", 0.0)
            prefix_len = 4  # sot/lang/task/no-timestamps (no prompt here)
            flops = _analytic_flops(model.cfg, n_windows, gen_tokens,
                                    prefix_len)
            ms_per_row = 1000.0 * decode_s / max(gen_tokens, 1)
            out.update({
                "encode_rtf": round(duration / max(encode_s, 1e-9), 2),
                "decode_rtf": round(duration / max(decode_s, 1e-9), 2),
                "device_rtf": round(
                    duration / max(encode_s + decode_s, 1e-9), 2),
                "tokens_per_s": round(gen_tokens / max(decode_s, 1e-9), 1),
                "decode_ms_per_token_row": round(ms_per_row, 3),
                "mfu_est": round(flops / max(encode_s + decode_s, 1e-9)
                                 / V5E_BF16_PEAK, 4),
                "mfu_note": _decode_roofline_note(
                    model.cfg, batch_size,
                    prefix_len + max_new,
                    compute_type == "int8", int8_ckv, ms_per_row),
                "gen_tokens": gen_tokens,
                "windows": n_windows,
            })
            # phase-split fields are the STABLE citable numbers (the wall
            # headline swings with tunnel health); keep them in the
            # watchdog's fallback payload too
            _STATE["headline"] = dict(out)
        except Exception as exc:  # noqa: BLE001 — headline must survive
            out["phase_split_error"] = f"{type(exc).__name__}: {exc}"
    else:
        out["phase_split_skipped"] = "insufficient budget"

    _emit_final(out)
    if staging:
        n = _promote_staging_cache(staging, cache_dir)
        _log(f"promoted {n} staged compile-cache entries -> {cache_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
