"""Timestamp-token decoding (the ``without_timestamps=False`` mode).

OpenAI Whisper's timestamp rules, applied inside the jitted greedy loop:

1. the first generated token must be a timestamp (bounded by
   ``max_initial_timestamp``, default 1.0 s);
2. timestamps come in pairs — after a lone timestamp the next token must be
   another timestamp (or EOT); after a closing pair the next token must be
   text;
3. timestamps never decrease;
4. when the total probability mass on timestamps exceeds the best text
   token, a timestamp is forced.

The host-side ``split_segments_by_timestamps`` then cuts the 30 s window
into sub-segments at the decoded pair boundaries.  This gives sub-chunk
timing even when no wav2vec2 alignment checkpoint is available (the
reference's align path needs gated downloads, transcribe.py:130).
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..tokenizer import WhisperTokenizer
from .whisper import (Params, WhisperConfig, decode_step, decoder_forward,
                      init_kv_cache, pad_cross_kv, precompute_cross_kv,
                      unstack_cross_kv, unstack_decoder)

NEG = -1e30


@partial(jax.jit, static_argnames=("eot", "ts_begin", "cfg", "max_new",
                                   "max_initial_index", "fused_attention",
                                   "int8_cross_kv", "ckv_scale_bf16"))
def greedy_timestamps_jit(params: Params, xa: jnp.ndarray,
                          prefix: jnp.ndarray, suppress_mask: jnp.ndarray,
                          eot: int, ts_begin: int, cfg: WhisperConfig,
                          max_new: int, max_initial_index: int = 50,
                          fused_attention: bool = False,
                          int8_cross_kv: bool = False,
                          ckv_scale_bf16: bool = False):
    """Greedy decode with timestamp rules.

    ``suppress_mask`` must NOT mask the timestamp region.  Returns
    (tokens [B, max_new], sum_logprobs [B], lengths [B]).
    """
    b = xa.shape[0]
    p = prefix.shape[0]
    vocab = cfg.n_vocab
    eot_i32 = jnp.int32(eot)

    cross_kv = precompute_cross_kv(
        params, xa, cfg, quantize=int8_cross_kv,
        scale_dtype=jnp.bfloat16 if ckv_scale_bf16 else jnp.float32)
    cache_len = (p + max_new if not fused_attention
                 else -(-(p + max_new) // 128) * 128)
    cache = init_kv_cache(cfg, b, max_len=cache_len)
    prefix_b = jnp.broadcast_to(prefix[None, :], (b, p))
    prefill_logits, cache = decoder_forward(
        params, prefix_b, None, cfg, pos_offset=0, kv_cache=cache,
        cross_kv=cross_kv)

    token_ids = jnp.arange(vocab)
    is_ts = (token_ids >= ts_begin)

    def apply_rules(logits, last, prev, last_ts):
        """logits [B, V] -> masked logits per the four rules."""
        logits = logits + suppress_mask
        last_is_ts = last >= ts_begin
        prev_is_ts = prev >= ts_begin

        # pair rule (OpenAI ApplyTimestampRules): after a lone timestamp
        # following text the next token must be a timestamp (or EOT);
        # after two consecutive timestamps (or the initial one) the next
        # must be text.
        need_ts = jnp.logical_and(last_is_ts, ~prev_is_ts)
        closed = jnp.logical_and(last_is_ts, prev_is_ts)
        allow_ts_eot = jnp.logical_or(is_ts, token_ids == eot)
        text_mask = jnp.where(allow_ts_eot[None, :], 0.0, NEG)
        ts_mask = jnp.where(is_ts[None, :], NEG, 0.0)
        logits = jnp.where(need_ts[:, None], logits + text_mask, logits)
        logits = jnp.where(closed[:, None], logits + ts_mask, logits)

        # monotonic timestamps, with OpenAI's nonzero-duration force:
        # after a LONE timestamp following text the closing timestamp may
        # equal the opener's successor region start (mask < last_ts);
        # everywhere else — inside a segment (last is text) or right
        # after a closed pair — the next timestamp must be STRICTLY
        # greater (mask <= last_ts), else the model can loop on
        # zero-duration segments at one timestamp forever
        lone = jnp.logical_and(last_is_ts, ~prev_is_ts)
        cutoff = jnp.where(lone, last_ts, last_ts + 1)
        mono = jnp.where(
            jnp.logical_and(is_ts[None, :],
                            token_ids[None, :] < cutoff[:, None]),
            NEG, 0.0)
        logits = logits + mono

        # force timestamp when its total mass beats the best text token
        logp = jax.nn.log_softmax(logits, axis=-1)
        ts_mass = jax.nn.logsumexp(
            jnp.where(is_ts[None, :], logp, NEG), axis=-1)
        best_text = jnp.max(jnp.where(is_ts[None, :], NEG, logp), axis=-1)
        force_ts = ts_mass > best_text
        logits = jnp.where(
            jnp.logical_and(force_ts[:, None], ~is_ts[None, :]),
            NEG, logits)
        return logits

    # first token: must be a timestamp within max_initial_timestamp
    first = prefill_logits[:, -1, :] + suppress_mask
    first = jnp.where(is_ts[None, :], first, NEG)
    first = jnp.where(token_ids[None, :] > ts_begin + max_initial_index,
                      NEG, first)
    tok0 = jnp.argmax(first, axis=-1).astype(jnp.int32)
    lp0 = jnp.take_along_axis(jax.nn.log_softmax(first, axis=-1),
                              tok0[:, None], axis=1)[:, 0]

    tokens0 = jnp.full((b, max_new), eot_i32, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(tok0)
    # initial prev is treated as a timestamp (OpenAI: len(seq)<2 counts as
    # penultimate_was_timestamp) so text follows the opening timestamp
    prev0 = jnp.full((b,), ts_begin, jnp.int32)
    state = (tokens0, tok0, prev0, tok0,
             jnp.int32(1), cache, tok0 == eot_i32, lp0,
             jnp.ones((b,), jnp.int32))

    def cond(state):
        return jnp.logical_and(state[4] < max_new, ~jnp.all(state[6]))

    # per-layer views for the unrolled decode step (see decode.py)
    cross_step = pad_cross_kv(cross_kv) if fused_attention else cross_kv
    cross_layers = unstack_cross_kv(cross_step, cfg.n_text_layer)
    dec_u = unstack_decoder(params, cfg)

    def body(state):
        (tokens, last, prev, last_ts, i, cache, finished, sum_lp,
         lengths) = state
        logits, cache = decode_step(dec_u, last, p + i - 1, cache,
                                    cross_layers, cfg,
                                    use_fused=fused_attention,
                                    cross_len=xa.shape[1])
        logits = apply_rules(logits, last, prev, last_ts)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, eot_i32, nxt)
        logp = jax.nn.log_softmax(logits, axis=-1)
        lp = jnp.where(finished, 0.0,
                       jnp.take_along_axis(logp, nxt[:, None], axis=1)[:, 0])
        tokens = tokens.at[:, i].set(nxt)
        new_last_ts = jnp.where(nxt >= ts_begin, nxt, last_ts)
        lengths = lengths + jnp.where(finished, 0, 1).astype(jnp.int32)
        finished = jnp.logical_or(finished, nxt == eot_i32)
        return (tokens, nxt, last, new_last_ts, i + 1, cache, finished,
                sum_lp + lp, lengths)

    (tokens, _, _, _, _, _, _, sum_lp, lengths) = jax.lax.while_loop(
        cond, body, state)
    return tokens, sum_lp, lengths


def split_segments_by_timestamps(tokens: np.ndarray,
                                 tokenizer: WhisperTokenizer,
                                 chunk_start: float,
                                 chunk_duration: float) -> List[dict]:
    """Token stream with timestamp tokens -> [{text, start, end}].

    Consecutive ``<|t0|> text <|t1|>`` spans become segments offset by
    ``chunk_start``; an unterminated trailing span closes at the chunk end.
    """
    sp = tokenizer.special
    segments: List[dict] = []
    current_text: List[int] = []
    start_time = None

    def clamp(t: float) -> float:
        return min(max(t, 0.0), chunk_duration)
    for t in (int(x) for x in tokens):
        if t == sp.eot:
            break
        if t >= sp.timestamp_begin:
            ts = tokenizer.timestamp_from_token(t)
            if start_time is None or not current_text:
                start_time = ts
                current_text = []
            else:
                text = tokenizer.decode(current_text).strip()
                if text:
                    segments.append({
                        "text": text,
                        "start": round(chunk_start + clamp(start_time), 3),
                        "end": round(chunk_start + clamp(ts), 3),
                    })
                start_time = ts
                current_text = []
        elif t < sp.eot:
            current_text.append(t)
    if current_text and start_time is not None:
        text = tokenizer.decode(current_text).strip()
        if text:
            segments.append({
                "text": text,
                "start": round(chunk_start + clamp(start_time), 3),
                "end": round(chunk_start + chunk_duration, 3),
            })
    return segments
