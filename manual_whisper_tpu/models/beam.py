"""Batched beam-search decoding for Whisper on TPU.

WhisperX's faster-whisper backend decodes with beam_size=5 by default
(the engine the reference drives via model.transcribe, transcribe.py:123);
this is the TPU equivalent.  Memory-conscious layout:

- cross-attention K/V stays [L, B, H, dh, Ta] (transposed so Ta, not the
  64-wide dh, sits on the 128-lane axis — avoiding a 2x padding expansion)
  and is SHARED across beams inside the attention einsum (tiling it for
  large-v3 at batch 8 x beam 5 would cost ~20 GB of HBM);
- the self-attention cache is NEVER physically reordered after top-k.
  Slots stay append-only ([L, B, K, H, dh, T]: time column t holds the K
  candidates written at step t); each surviving beam carries an ancestry
  index anc[B, K, T] ("which slot holds my token at time t"), and the
  permutation folds into the attention einsums as a one-hot contraction
  over the K parent slots.  A physical take_along_axis re-gather would
  read+write the whole cache every token (~3x the HBM traffic of the
  attention read itself — the dominant cost of beam decode); the one-hot
  contraction costs K extra MXU FLOPs per score instead, which the TPU
  has to spare — classic bandwidth-for-FLOPs trade;
- whole search is ONE jitted program: prefill -> while_loop of
  (step, top-k, ancestry update) with static (B, K, P, max_new).

Hypothesis selection uses length-normalised scores
(sum_logprob / length^length_penalty, CT2's default penalty 1.0).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.quant import mm
from .whisper import (Params, WhisperConfig, _layer_norm, _mlp,
                      decoder_forward, init_kv_cache, precompute_cross_kv,
                      unstack_cross_kv, unstack_decoder)

NEG_INF = -1e30


def _beam_cross_attend(xq, xkv, dh):
    """Beam cross attention; xq [B, K, H, dh]; xkv is the per-layer (k, v)
    pair of [B, H, dh, Ta] shared across beams, or the int8 4-tuple from
    quantize_cross_kv (per-position scales commute exactly out of both
    dots, same math as whisper._cross_attend).  Returns [B, K, H, dh]."""
    xq_h = jnp.swapaxes(xq, 1, 2)            # [B, H, K, dh]
    if len(xkv) == 2:
        x_k, x_v = xkv
        # batch dims (b, h) lead: the bkhd,bhdt form lowers to a dot shape
        # the XLA CPU thunk can't run in bf16 (TPU is fine either way);
        # the transpose fuses into the consumer
        xscores = jnp.einsum("bhkd,bhdt->bhkt", xq_h, x_k,
                             preferred_element_type=jnp.float32)
        xscores = jnp.swapaxes(xscores, 1, 2) * dh ** -0.5
        xprobs = jax.nn.softmax(xscores, axis=-1).astype(xq.dtype)
        return jnp.einsum("bkht,bhdt->bkhd", xprobs, x_v)
    k_q, k_s, v_q, v_s = xkv
    xscores = jnp.einsum("bhkd,bhdt->bhkt", xq_h, k_q.astype(xq.dtype),
                         preferred_element_type=jnp.float32)
    xscores = xscores * k_s[..., 0, :][:, :, None, :]     # [B, H, K, T]
    xscores = jnp.swapaxes(xscores, 1, 2) * dh ** -0.5
    xprobs = jax.nn.softmax(xscores, axis=-1)
    xprobs = (xprobs * v_s[..., 0, :][:, None, :, :]).astype(xq.dtype)
    return jnp.einsum("bkht,bhdt->bkhd", xprobs, v_q.astype(xq.dtype))


def _beam_block(h, blk, n_head, ck, cv, mask, xkv, pos, oh):
    """One decoder block for beam-shaped activations.

    h [B, K, d]; self cache ck/cv [B, K, H, dh, T] (slot k updated at
    ``pos``); cross xkv per-layer (bf16 pair or int8 4-tuple, shared
    across beams); oh [B, K, J, T] one-hot ancestry (oh[b,k,j,t]=1 iff
    beam k's token at time t lives in cache slot j) — the lazy beam
    reorder.  Returns (h, (ck, cv)) with the caches updated in place.
    """
    b, k, d = h.shape
    dh = d // n_head

    def heads(y):  # [B, K, d] -> [B, K, H, dh]
        return y.reshape(b, k, n_head, dh)

    a_in = _layer_norm(h, blk["ln1"])
    q = heads(mm(a_in, blk["attn"]["q_w"]) + blk["attn"]["q_b"])
    new_k = heads(mm(a_in, blk["attn"]["k_w"]))
    new_v = heads(mm(a_in, blk["attn"]["v_w"]) + blk["attn"]["v_b"])
    ck = jax.lax.dynamic_update_slice(
        ck, new_k[..., None].astype(ck.dtype), (0, 0, 0, 0, pos))
    cv = jax.lax.dynamic_update_slice(
        cv, new_v[..., None].astype(cv.dtype), (0, 0, 0, 0, pos))
    # score against every parent slot j, then select the true ancestor via
    # the one-hot: one sequential cache read, zero re-gather traffic
    s_all = jnp.einsum("bkhd,bjhdt->bkjht", q, ck,
                       preferred_element_type=jnp.float32) * dh ** -0.5
    scores = jnp.einsum("bkjht,bkjt->bkht", s_all, oh)
    scores = scores + mask                   # [B, K, H, T] + [T]
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    probs_j = probs[:, :, None] * oh[:, :, :, None, :].astype(q.dtype)
    attn = jnp.einsum("bkjht,bjhdt->bkhd", probs_j, cv).reshape(b, k, d)
    h = h + (mm(attn, blk["attn"]["o_w"]) + blk["attn"]["o_b"])

    x_in = _layer_norm(h, blk["lnx"])
    xq = heads(mm(x_in, blk["xattn"]["q_w"]) + blk["xattn"]["q_b"])
    xattn = _beam_cross_attend(xq, xkv, dh).reshape(b, k, d)
    h = h + (mm(xattn, blk["xattn"]["o_w"]) + blk["xattn"]["o_b"])

    m_in = _layer_norm(h, blk["ln2"])
    return h + _mlp(m_in, blk["mlp"]), (ck, cv)


def _beam_step(dec_u, cfg, token, pos, cache, cross_layers, oh):
    """token [B, K] at absolute position ``pos`` -> (logits [B,K,V], cache).

    ``dec_u``: per-layer decoder params (whisper.unstack_decoder);
    cache: per-layer (k_layers, v_layers) of [B, K, H, dh, T];
    cross_layers: per-layer cross K/V (whisper.unstack_cross_kv);
    oh [B, K, J, T] one-hot ancestry shared by every layer.

    Unrolled over layers like whisper.decode_step (and for the same HBM
    reason: in-place per-layer cache updates instead of scan ys churn).
    """
    n_head = cfg.n_text_head
    k_layers, v_layers = cache

    x = dec_u["tok_emb"][token] + jax.lax.dynamic_index_in_dim(
        dec_u["pos_emb"], pos, axis=0, keepdims=False)
    h = x.astype(cfg.dtype)                                # [B, K, d]

    max_len = k_layers[0].shape[-1]
    mask = jnp.where(jnp.arange(max_len) <= pos, 0.0,
                     -jnp.inf).astype(jnp.float32)

    new_k: list = []
    new_v: list = []
    for blk, ck, cv, xkv in zip(dec_u["layers"], k_layers, v_layers,
                                cross_layers):
        h, (ck, cv) = _beam_block(h, blk, n_head, ck, cv, mask, xkv,
                                  pos, oh)
        new_k.append(ck)
        new_v.append(cv)
    x = _layer_norm(h, dec_u["ln"])
    # bf16 operands, f32 accumulation (see whisper.decode_step)
    logits = jnp.einsum("bkd,vd->bkv", x, dec_u["tok_emb"],
                        preferred_element_type=jnp.float32)
    return logits, (tuple(new_k), tuple(new_v))


@partial(jax.jit, static_argnames=("eot", "cfg", "max_new", "beam_size",
                                   "sot_index", "no_speech_token",
                                   "int8_cross_kv", "ckv_scale_bf16"))
def beam_decode_jit(params: Params, xa: jnp.ndarray, prefix: jnp.ndarray,
                    suppress_mask: jnp.ndarray, blank_mask: jnp.ndarray,
                    eot: int, cfg: WhisperConfig, max_new: int,
                    beam_size: int, length_penalty: float = 1.0,
                    sot_index: int = 0, no_speech_token: int = 0,
                    int8_cross_kv: bool = False,
                    ckv_scale_bf16: bool = False):
    """Beam search over a batch of encoded segments.

    Returns (tokens [B, max_new] of the best hypothesis, sum_logprobs [B],
    lengths [B], no_speech_probs [B]).

    ``int8_cross_kv`` quantizes the cross-attention K/V exactly like the
    greedy path (whisper.quantize_cross_kv): the cross K/V is the beam
    loop's dominant HBM read too (shared across beams, re-read every
    step), and the per-position scales commute out of both dots.
    """
    b = xa.shape[0]
    p = prefix.shape[0]
    k = beam_size
    eot_i32 = jnp.int32(eot)
    vocab = cfg.n_vocab

    cross_kv = precompute_cross_kv(
        params, xa, cfg, quantize=int8_cross_kv,
        scale_dtype=(jnp.bfloat16 if ckv_scale_bf16
                     else jnp.float32))  # [L,B,H,dh,Ta]
    cache = init_kv_cache(cfg, b, max_len=p + max_new)
    prefix_b = jnp.broadcast_to(prefix[None, :], (b, p))
    prefill_logits, cache = decoder_forward(
        params, prefix_b, None, cfg, pos_offset=0, kv_cache=cache,
        cross_kv=cross_kv)

    # per-layer views for the unrolled beam step, materialized once per
    # program (outside the while loop)
    cross_layers = unstack_cross_kv(cross_kv, cfg.n_text_layer)
    dec_u = unstack_decoder(params, cfg)

    # per-layer [B, H, dh, T] -> [B, K, H, dh, T] (beams start identical)
    def tile(c):
        return jnp.broadcast_to(c[:, None], (b, k) + c.shape[1:]).copy()
    cache = (tuple(tile(c) for c in cache[0]),
             tuple(tile(c) for c in cache[1]))

    first = jax.nn.log_softmax(
        prefill_logits[:, -1, :] + suppress_mask + blank_mask, axis=-1)
    top_lp, top_tok = jax.lax.top_k(first, k)              # [B, K]

    tokens0 = jnp.full((b, k, max_new), eot_i32, jnp.int32)
    tokens0 = tokens0.at[:, :, 0].set(top_tok)
    finished0 = top_tok == eot_i32
    # ancestry starts as the identity: for t < p every slot holds the same
    # tiled prefill, and each beam's first token will be written to its own
    # slot at t = p
    anc0 = jnp.broadcast_to(
        jnp.arange(k, dtype=jnp.int32)[None, :, None],
        (b, k, p + max_new))

    # Completed-hypothesis set-aside (CT2/OpenAI semantics): a finished
    # hypothesis frozen inside the beam can still be EVICTED by a later
    # top-k while degenerate continuations briefly outscore it raw; the
    # per-row best completed hypothesis (by length-normalised score) is
    # therefore recorded OUTSIDE the beam every step and competes in the
    # final selection.  The empty hypothesis (EOT as the first token) is
    # scored here at init.
    def norm_score(cum, length):
        return cum / jnp.maximum(length.astype(jnp.float32),
                                 1.0) ** length_penalty
    fin_score0 = jnp.where(first[:, eot] > NEG_INF / 2,
                           norm_score(first[:, eot], jnp.ones((b,))),
                           NEG_INF)
    fin0 = (fin_score0,
            jnp.full((b, max_new), eot_i32, jnp.int32),   # tokens
            first[:, eot],                                 # cum logprob
            jnp.ones((b,), jnp.int32))                     # length
    state = (tokens0, top_tok, jnp.int32(1), cache, finished0,
             top_lp, jnp.ones((b, k), jnp.int32), anc0, fin0)

    def cond(state):
        return jnp.logical_and(state[2] < max_new, ~jnp.all(state[4]))

    def body(state):
        tokens, last, i, cache, finished, cum_lp, lengths, anc, fin = state
        # beam k writes this step's K/V into its own slot k
        pos = p + i - 1
        anc = jax.lax.dynamic_update_slice(
            anc, jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None, :],
                                  (b, k))[:, :, None], (0, 0, pos))
        oh = (anc[:, :, None, :] ==
              jnp.arange(k, dtype=jnp.int32)[None, None, :, None]
              ).astype(jnp.float32)                         # [B, K, J, T]
        logits, cache = _beam_step(dec_u, cfg, last, pos, cache,
                                   cross_layers, oh)
        logp = jax.nn.log_softmax(logits + suppress_mask, axis=-1)
        # finished beams: only EOT continuation at zero cost
        frozen = jnp.full((vocab,), NEG_INF).at[eot].set(0.0)
        logp = jnp.where(finished[:, :, None], frozen[None, None, :], logp)

        # record every parent's EOT continuation (= a completed
        # hypothesis; its token row is the parent's row, which is already
        # EOT-filled past i-1) against the running best.  Frozen parents
        # re-score identically to when they finished, so this is
        # idempotent for them.
        fin_score, fin_tokens, fin_lp, fin_len = fin
        eot_cum = cum_lp + logp[:, :, eot]                  # [B, K]
        eot_len = lengths + jnp.where(finished, 0, 1).astype(jnp.int32)
        eot_score = norm_score(eot_cum, eot_len)            # [B, K]
        k_best = jnp.argmax(eot_score, axis=1)              # [B]
        row_score = jnp.max(eot_score, axis=1)
        improve = row_score > fin_score
        parent_tokens = jnp.take_along_axis(
            tokens, k_best[:, None, None], axis=1)[:, 0]    # [B, max_new]
        fin = (jnp.where(improve, row_score, fin_score),
               jnp.where(improve[:, None], parent_tokens, fin_tokens),
               jnp.where(improve,
                         jnp.take_along_axis(eot_cum, k_best[:, None],
                                             axis=1)[:, 0], fin_lp),
               jnp.where(improve,
                         jnp.take_along_axis(eot_len, k_best[:, None],
                                             axis=1)[:, 0], fin_len))

        cand = cum_lp[:, :, None] + logp                    # [B, K, V]
        flat = cand.reshape(b, k * vocab)
        new_cum, idx = jax.lax.top_k(flat, k)               # [B, K]
        beam_idx = idx // vocab
        tok = (idx % vocab).astype(jnp.int32)

        tokens = jnp.take_along_axis(tokens, beam_idx[:, :, None], axis=1)
        tokens = tokens.at[:, :, i].set(tok)
        finished = jnp.take_along_axis(finished, beam_idx, axis=1)
        lengths = jnp.take_along_axis(lengths, beam_idx, axis=1)
        # the cache is NOT re-gathered: surviving beams inherit their
        # parent's ancestry row instead ([B, K, T] int32 — a few KB)
        anc = jnp.take_along_axis(anc, beam_idx[:, :, None], axis=1)

        lengths = lengths + jnp.where(finished, 0, 1).astype(jnp.int32)
        finished = jnp.logical_or(finished, tok == eot_i32)
        return (tokens, tok, i + 1, cache, finished, new_cum, lengths,
                anc, fin)

    tokens, _, _, _, finished, cum_lp, lengths, _, fin = jax.lax.while_loop(
        cond, body, state)
    fin_score, fin_tokens, fin_lp, fin_len = fin

    # length-normalised selection among the live beams (covers rows that
    # truncated at max_new without finishing) ...
    score = norm_score(cum_lp, lengths)
    best = jnp.argmax(score, axis=1)                        # [B]
    best_tokens = jnp.take_along_axis(
        tokens, best[:, None, None], axis=1)[:, 0]
    best_lp = jnp.take_along_axis(cum_lp, best[:, None], axis=1)[:, 0]
    best_len = jnp.take_along_axis(lengths, best[:, None], axis=1)[:, 0]
    # ... then the recorded best COMPLETED hypothesis competes, so a
    # finished winner evicted from the beam mid-search still surfaces
    best_score = jnp.take_along_axis(score, best[:, None], axis=1)[:, 0]
    fin_wins = fin_score > best_score
    best_tokens = jnp.where(fin_wins[:, None], fin_tokens, best_tokens)
    best_lp = jnp.where(fin_wins, fin_lp, best_lp)
    best_len = jnp.where(fin_wins, fin_len, best_len)
    no_speech = jax.nn.softmax(
        prefill_logits[:, sot_index, :], axis=-1)[:, no_speech_token]
    return best_tokens, best_lp, best_len, no_speech
