"""Batched Whisper decoding on TPU.

Replaces CTranslate2's C++ generate loop (driven by ``model.transcribe``,
reference: transcribe.py:123).  TPU design:

- ONE jitted function per (batch, prefix_len, max_new) bucket: prefill over
  the prompt + ``lax.while_loop`` of single-token steps with an in-place
  KV cache (buffer donation keeps the cache in HBM).
- whole batch decodes in lockstep; finished rows emit EOT and stop
  contributing (cheaper than ragged early-exit on SPMD hardware).
- quality gates (compression ratio / avg logprob / no-speech) + the
  temperature fallback ladder run on host between jitted calls, matching
  faster-whisper's behavior surfaced via the reference's
  ``temperature`` knob (web/.env.example:50, replicateClient.js:43).
"""

from __future__ import annotations

import dataclasses
import zlib
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..tokenizer import WhisperTokenizer
from .whisper import (Params, WhisperConfig, decode_step, decoder_forward,
                      init_kv_cache, pad_cross_kv, precompute_cross_kv,
                      unstack_cross_kv, unstack_decoder)


@dataclasses.dataclass(frozen=True)
class DecodingOptions:
    """Mirrors the option surface the reference exercises
    (initial_prompt: transcribe.py:111; temperature: replicateClient.js:43;
    language/task: transcribe.py:112/123)."""

    language: str = "zh"
    task: str = "transcribe"
    temperatures: Tuple[float, ...] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
    initial_prompt: Optional[str] = None
    max_new_tokens: int = 224
    beam_size: int = 1           # faster-whisper/WhisperX default is 5
    length_penalty: float = 1.0
    int8_cross_kv: bool = False  # halve decode HBM traffic (greedy + beam)
    # bf16 per-position scales for the int8 cross-KV: halves the scale
    # read (3.1 % vs 6.3 % of the int8 payload at dh=64, VERDICT r4 #8);
    # adds <=0.4 % relative scale rounding on top of int8's ~0.8 %
    ckv_scale_bf16: bool = False
    fused_attention: bool = False  # Pallas decode-step attention (TPU)
    suppress_blank: bool = True
    suppress_non_speech: bool = True
    # extra token ids to suppress at every step (faster-whisper's
    # suppress_tokens asr_option; also how bench.py pins the synthetic
    # model to a full token budget by suppressing EOT)
    suppress_tokens: Optional[Tuple[int, ...]] = None
    without_timestamps: bool = True
    compression_ratio_threshold: Optional[float] = 2.4
    log_prob_threshold: Optional[float] = -1.0
    no_speech_threshold: Optional[float] = 0.6
    seed: int = 0


def build_suppress_mask(tokenizer: WhisperTokenizer, cfg: WhisperConfig,
                        opts: DecodingOptions) -> np.ndarray:
    """Additive -inf mask [n_vocab] applied at every step."""
    sp = tokenizer.special
    mask = np.zeros(cfg.n_vocab, np.float32)
    suppress = {sp.sot, sp.sot_prev, sp.sot_lm, sp.no_speech}
    suppress.update(tokenizer.all_language_tokens)
    suppress.add(sp.translate)
    suppress.add(sp.transcribe)
    if opts.suppress_non_speech:
        suppress.update(tokenizer.non_speech_tokens())
    suppress.update(opts.suppress_tokens or ())
    suppress.add(sp.no_timestamps)   # never a valid generation
    if opts.without_timestamps:
        mask[sp.timestamp_begin:] = -np.inf
    for t in suppress:
        if t < cfg.n_vocab:
            mask[t] = -np.inf
    return mask


def build_blank_mask(tokenizer: WhisperTokenizer, cfg: WhisperConfig
                     ) -> np.ndarray:
    """First-step mask: suppress blank/space and EOT (OpenAI suppress_blank)."""
    mask = np.zeros(cfg.n_vocab, np.float32)
    space = tokenizer.encode(" ")
    if len(space) == 1:
        mask[space[0]] = -np.inf
    mask[tokenizer.special.eot] = -np.inf
    return mask


@partial(jax.jit, static_argnames=("eot", "cfg", "max_new", "sot_index",
                                   "no_speech_token", "int8_cross_kv",
                                   "fused_attention", "ckv_scale_bf16"))
def greedy_decode_jit(params: Params, xa: jnp.ndarray,
                      prefix: jnp.ndarray, suppress_mask: jnp.ndarray,
                      blank_mask: jnp.ndarray, temperature: jnp.ndarray,
                      rng: jnp.ndarray,
                      eot: int, cfg: WhisperConfig, max_new: int,
                      sot_index: int = 0, no_speech_token: int = 0,
                      int8_cross_kv: bool = False,
                      fused_attention: bool = False,
                      ckv_scale_bf16: bool = False):
    """Prefill + decode loop, one compiled program.

    xa [B, Ta, d]; prefix [P] shared prompt (identical across the batch —
    the reference uses one initial_prompt per job, transcribe.py:111).
    Returns (tokens [B, max_new], sum_logprobs [B], lengths [B],
    no_speech_probs [B]).  no-speech prob is read inside the program (the
    full prefill logits never leave the device).

    ``fused_attention`` (TPU): decode-step attentions run as fused Pallas
    kernels; the cross-KV is padded once to a lane tile and the cache
    length rounds up to 128 so no padding happens inside the loop.
    """
    b = xa.shape[0]
    p = prefix.shape[0]
    eot_i32 = jnp.int32(eot)

    cross_kv = precompute_cross_kv(
        params, xa, cfg, quantize=int8_cross_kv,
        scale_dtype=jnp.bfloat16 if ckv_scale_bf16 else jnp.float32)
    cache_len = (p + max_new if not fused_attention
                 else -(-(p + max_new) // 128) * 128)
    cache = init_kv_cache(cfg, b, max_len=cache_len)

    prefix_b = jnp.broadcast_to(prefix[None, :], (b, p))
    # reuse the (possibly int8) cross-KV computed above: re-projecting it
    # bf16 inside the prefill would materialize the very tensor the fused
    # quantization exists to avoid (and double the projection FLOPs)
    prefill_logits, cache = decoder_forward(
        params, prefix_b, None, cfg, pos_offset=0, kv_cache=cache,
        cross_kv=cross_kv)

    first_logits = prefill_logits[:, -1, :] + suppress_mask + blank_mask

    def sample(logits, key):
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        gumbel = -jnp.log(-jnp.log(
            jax.random.uniform(key, logits.shape, minval=1e-9, maxval=1.0)))
        sampled = jnp.argmax(
            logits / jnp.maximum(temperature, 1e-6) + gumbel,
            axis=-1).astype(jnp.int32)
        return jnp.where(temperature > 0, sampled, greedy)

    def logprob_of(logits, tok):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.take_along_axis(logp, tok[:, None], axis=1)[:, 0]

    key0, loop_key = jax.random.split(rng)
    tok0 = sample(first_logits, key0)
    lp0 = logprob_of(first_logits, tok0)

    tokens0 = jnp.full((b, max_new), eot_i32, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(tok0)
    finished0 = tok0 == eot_i32
    state = (tokens0, tok0, jnp.int32(1), cache, finished0,
             lp0, jnp.ones((b,), jnp.int32), loop_key)

    def cond(state):
        _, _, i, _, finished, _, _, _ = state
        return jnp.logical_and(i < max_new, ~jnp.all(finished))

    # per-layer views for the unrolled decode step, materialized ONCE per
    # program (outside the while loop): weights, cross K/V (padded first
    # for the fused kernels so no pad copy happens inside the loop)
    cross_step = pad_cross_kv(cross_kv) if fused_attention else cross_kv
    cross_layers = unstack_cross_kv(cross_step, cfg.n_text_layer)
    dec_u = unstack_decoder(params, cfg)

    def body(state):
        tokens, last, i, cache, finished, sum_lp, lengths, key = state
        logits, cache = decode_step(dec_u, last, p + i - 1, cache,
                                    cross_layers, cfg,
                                    use_fused=fused_attention,
                                    cross_len=xa.shape[1])
        logits = logits + suppress_mask
        key, sub = jax.random.split(key)
        nxt = sample(logits, sub)
        nxt = jnp.where(finished, eot_i32, nxt)
        lp = jnp.where(finished, 0.0, logprob_of(logits, nxt))
        tokens = tokens.at[:, i].set(nxt)
        now_finished = jnp.logical_or(finished, nxt == eot_i32)
        lengths = lengths + jnp.where(finished, 0, 1).astype(jnp.int32)
        return (tokens, nxt, i + 1, cache, now_finished,
                sum_lp + lp, lengths, key)

    tokens, _, _, _, _, sum_lp, lengths, _ = jax.lax.while_loop(
        cond, body, state)

    # no-speech probability: softmax at the SOT slot of the prefill
    no_speech = jax.nn.softmax(
        prefill_logits[:, sot_index, :], axis=-1)[:, no_speech_token]
    return tokens, sum_lp, lengths, no_speech


def compression_ratio(text: str) -> float:
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


@dataclasses.dataclass
class SegmentResult:
    tokens: List[int]
    text: str
    avg_logprob: float
    no_speech_prob: float
    compression_ratio: float
    temperature: float


class BatchDecoder:
    """Host-side driver: prompt building, jitted decode, fallback ladder.

    With ``mesh`` set (data-parallel inference, SURVEY.md §2.3), every
    small operand is placed replicated on the mesh so the jitted decode
    partitions its batch axis over the ``data`` axis alongside the
    sharded params/xa instead of erroring on mixed device sets."""

    def __init__(self, params: Params, cfg: WhisperConfig,
                 tokenizer: WhisperTokenizer, opts: DecodingOptions,
                 mesh=None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.opts = opts
        self.mesh = mesh
        self._suppress = self._replicate(jnp.asarray(
            build_suppress_mask(tokenizer, cfg, opts)))
        self._blank = self._replicate(
            jnp.asarray(build_blank_mask(tokenizer, cfg))
            if opts.suppress_blank
            else jnp.zeros(cfg.n_vocab, jnp.float32))
        # timestamp-mode suppress mask + prefix, built once on first use:
        # they depend only on opts, and rebuilding the O(n_vocab) mask per
        # dispatch would sit on the latency-critical submit path
        self._ts_cache: Optional[tuple] = None
        # distinct sampling keys per dispatch (a repeated ladder
        # temperature must resample, not replay the same tokens).  Callers
        # that care about reproducibility pass a deterministic ``rng_tag``
        # (the pipeline uses its batch dispatch index): with the fetch
        # worker, first-rung submits (dispatch thread) and ladder retries
        # (worker thread) interleave nondeterministically, and a shared
        # draw-order counter would make sampled retries depend on the
        # race.  The counter remains the fallback for direct callers
        # (itertools.count advances atomically under the GIL).
        import itertools
        self._rng_counter = itertools.count(1)
        if opts.beam_size > 1 and opts.fused_attention:
            # the beam kernel runs einsum attention (its lazy-ancestry
            # self-attention has no fused-kernel variant); silently
            # honoring the flag would mislabel A/B measurements
            # (ADVICE r2).  int8_cross_kv IS honored for beam (r3 #2).
            import warnings
            warnings.warn(
                "beam_size>1 decodes through the einsum attention path; "
                "fused_attention is ignored for beam search",
                RuntimeWarning, stacklevel=2)

    def _replicate(self, x):
        """Replicate a small array over the mesh (no-op without one)."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec
        return jax.device_put(x, NamedSharding(self.mesh,
                                               PartitionSpec()))

    def _prefix(self) -> Tuple[np.ndarray, int]:
        """(prefix tokens, index of SOT within the prefix)."""
        tk = self.tokenizer
        prompt: List[int] = []
        if self.opts.initial_prompt:
            prompt = tk.prompt_sequence(self.opts.initial_prompt,
                                        max_len=self.cfg.n_text_ctx // 2 - 1)
        sot_seq = tk.sot_sequence(
            language=self.opts.language, task=self.opts.task,
            without_timestamps=self.opts.without_timestamps)
        return np.asarray(prompt + sot_seq, np.int32), len(prompt)

    def decode(self, xa: jnp.ndarray, temperature: float = 0.0,
               rng_tag: Optional[int] = None) -> List[SegmentResult]:
        """Decode a batch of encoded segments xa [B, Ta, d] at one
        temperature; returns per-segment results with quality stats."""
        return self.decode_finalize(
            self.decode_submit(xa, temperature, rng_tag=rng_tag),
            int(xa.shape[0]), temperature)

    def decode_submit(self, xa: jnp.ndarray, temperature: float = 0.0,
                      rng_tag: Optional[int] = None):
        """Dispatch the decode program WITHOUT fetching results.

        JAX dispatch is asynchronous: submitting every batch's first-rung
        decode before fetching any lets batch i+1's device time overlap
        batch i's host fetch + post-processing (pipeline/transcribe.py
        uses this; tunnel/PCIe round-trips are a real per-batch cost).

        ``rng_tag``: deterministic sampling-key tag (see __init__); None
        draws from the process-order counter."""
        tk = self.tokenizer
        prefix, sot_index = self._prefix()
        max_new = min(self.opts.max_new_tokens,
                      self.cfg.n_text_ctx - len(prefix) - 1)
        if self.opts.beam_size > 1 and temperature == 0.0:
            from .beam import beam_decode_jit
            out = beam_decode_jit(
                self.params, xa, self._replicate(jnp.asarray(prefix)),
                self._suppress,
                self._blank, tk.special.eot, self.cfg, max_new,
                self.opts.beam_size, self.opts.length_penalty,
                sot_index=sot_index,
                no_speech_token=tk.special.no_speech,
                int8_cross_kv=self.opts.int8_cross_kv,
                ckv_scale_bf16=self.opts.ckv_scale_bf16)
        else:
            if rng_tag is None:
                rng_tag = next(self._rng_counter)
            out = greedy_decode_jit(
                self.params, xa, self._replicate(jnp.asarray(prefix)),
                self._suppress,
                self._blank, self._replicate(jnp.float32(temperature)),
                self._replicate(jax.random.PRNGKey(
                    self.opts.seed + 1000003 * rng_tag)),
                tk.special.eot, self.cfg, max_new,
                sot_index=sot_index,
                no_speech_token=tk.special.no_speech,
                int8_cross_kv=self.opts.int8_cross_kv,
                fused_attention=self.opts.fused_attention,
                ckv_scale_bf16=self.opts.ckv_scale_bf16)
        return out

    def decode_finalize(self, out, b: int, temperature: float = 0.0
                        ) -> List[SegmentResult]:
        """Fetch a decode_submit handle and build SegmentResults."""
        tk = self.tokenizer
        # one device->host round trip for all outputs
        tokens, sum_lp, lengths, no_speech = jax.device_get(out)

        results = []
        for i in range(b):
            toks = [int(t) for t in tokens[i] if t != tk.special.eot]
            text = tk.decode(toks).strip()
            # lengths counts the EOT-emitting step, so it equals OpenAI's
            # len(tokens) + 1 denominator — except when the row truncated
            # at max_new without ever emitting EOT, where the +1 must be
            # added explicitly to match faster-whisper's gating scale
            denom = int(lengths[i]) + (1 if len(toks) == tokens.shape[1]
                                       else 0)
            avg_lp = float(sum_lp[i] / max(denom, 1))
            results.append(SegmentResult(
                tokens=toks, text=text, avg_logprob=avg_lp,
                no_speech_prob=float(no_speech[i]),
                compression_ratio=compression_ratio(text),
                temperature=temperature))
        return results

    def decode_with_timestamps(self, xa: jnp.ndarray,
                               chunk_starts: Sequence[float],
                               chunk_durations: Sequence[float]
                               ) -> List[List[dict]]:
        """Timestamp-rule greedy decode -> per-row sub-segment lists
        (the without_timestamps=False mode; models/timestamps.py)."""
        return self.timestamps_finalize(self.timestamps_submit(xa),
                                        chunk_starts, chunk_durations)

    def timestamps_submit(self, xa: jnp.ndarray):
        """Dispatch the timestamp-mode decode without fetching (see
        decode_submit for why)."""
        from .timestamps import greedy_timestamps_jit
        tk = self.tokenizer
        if self._ts_cache is None:
            ts_opts = dataclasses.replace(self.opts,
                                          without_timestamps=False)
            suppress = self._replicate(jnp.asarray(
                build_suppress_mask(tk, self.cfg, ts_opts)))
            prefix = np.asarray(
                tk.sot_sequence(self.opts.language, self.opts.task,
                                without_timestamps=False), np.int32)
            self._ts_cache = (suppress, self._replicate(
                jnp.asarray(prefix)), len(prefix))
        suppress, prefix_dev, prefix_len = self._ts_cache
        max_new = min(self.opts.max_new_tokens,
                      self.cfg.n_text_ctx - prefix_len - 1)
        return greedy_timestamps_jit(
            self.params, xa, prefix_dev, suppress,
            tk.special.eot, tk.special.timestamp_begin, self.cfg, max_new,
            fused_attention=self.opts.fused_attention,
            int8_cross_kv=self.opts.int8_cross_kv,
            ckv_scale_bf16=self.opts.ckv_scale_bf16)

    def timestamps_finalize(self, out, chunk_starts: Sequence[float],
                            chunk_durations: Sequence[float]
                            ) -> List[List[dict]]:
        from .timestamps import split_segments_by_timestamps
        tk = self.tokenizer
        tokens, _, _ = jax.device_get(out)
        return [
            split_segments_by_timestamps(tokens[i], tk,
                                         float(chunk_starts[i]),
                                         float(chunk_durations[i]))
            for i in range(len(chunk_starts))
        ]

    def _needs_fallback(self, r: SegmentResult) -> bool:
        o = self.opts
        if (o.compression_ratio_threshold is not None
                and r.compression_ratio > o.compression_ratio_threshold):
            return True
        if (o.log_prob_threshold is not None
                and r.avg_logprob < o.log_prob_threshold):
            return True
        return False

    def decode_with_fallback(self, xa: jnp.ndarray, first=None,
                             n_valid: Optional[int] = None,
                             rng_tag: Optional[int] = None
                             ) -> List[SegmentResult]:
        """faster-whisper style temperature ladder: retry failing segments
        at increasing temperature; keep the first passing result.
        ``first`` takes an already-dispatched decode_submit handle for the
        first rung (cross-batch async overlap).  ``n_valid`` limits the
        quality gates to the real rows — the zero-audio rows batch_chunks
        pads with always "fail" the gates and would otherwise drag every
        rung of the ladder for output the caller discards.

        Retry sub-batches are padded up to the same power-of-two bucket
        ladder the chunk batcher uses (including its data-parallel
        divisor), so a retry of (say) 3 rows out of 16 reuses a
        warmup-compiled mesh-divisible program instead of forcing a fresh
        XLA compile mid-job (minutes on large checkpoints)."""
        from ..pipeline.chunking import _bucket_for
        temps = self.opts.temperatures or (0.0,)
        if first is None:
            first = self.decode_submit(
                xa, temps[0],
                rng_tag=None if rng_tag is None else rng_tag * 16)
        results = self.decode_finalize(first, int(xa.shape[0]), temps[0])
        n_valid = int(xa.shape[0]) if n_valid is None else n_valid
        divisor = 1
        if self.mesh is not None:
            from ..parallel.mesh import DATA_AXIS
            divisor = self.mesh.shape[DATA_AXIS]
        pending = [i for i, r in enumerate(results[:n_valid])
                   if self._needs_fallback(r)]
        for rung, temp in enumerate(temps[1:], start=1):
            if not pending:
                break
            rows = _bucket_for(len(pending), int(xa.shape[0]), divisor)
            idx = pending + [pending[0]] * (rows - len(pending))
            sub = xa[np.asarray(idx)]
            # per-rung deterministic tag (rung < 16: the ladder is 6 temps;
            # a longer custom ladder only risks harmless cross-batch key
            # reuse, never same-rows key replay)
            retried = self.decode(
                sub, temperature=temp,
                rng_tag=None if rng_tag is None else rng_tag * 16 + rung
                )[:len(pending)]
            still = []
            for j, i in enumerate(pending):
                results[i] = retried[j]
                if self._needs_fallback(retried[j]):
                    still.append(i)
            pending = still
        return results

    def is_no_speech(self, r: SegmentResult) -> bool:
        """Silence gate (OpenAI semantics: no-speech prob high AND logprob
        low => treat as silence)."""
        o = self.opts
        return (o.no_speech_threshold is not None
                and r.no_speech_prob > o.no_speech_threshold
                and (o.log_prob_threshold is None
                     or r.avg_logprob < o.log_prob_threshold))
