"""Beam-search decode tests (tiny random model).

WhisperX decodes with beam_size=5 by default; the beam path must be
deterministic, respect suppression, and never score worse than greedy
under the same scoring (the greedy path is a member of the beam)."""

import numpy as np
import pytest

import jax

from manual_whisper_tpu.models import MODEL_CONFIGS, encode, init_params
from manual_whisper_tpu.models.decode import BatchDecoder, DecodingOptions
from manual_whisper_tpu.tokenizer import make_test_tokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = MODEL_CONFIGS["test"]
    tk = make_test_tokenizer()
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, cfg.n_mels, 2 * cfg.n_audio_ctx)
                              ).astype(np.float32)
    xa = encode(params, mel, cfg)
    return params, cfg, tk, xa


def _decoder(params, cfg, tk, beam_size):
    return BatchDecoder(params, cfg, tk, DecodingOptions(
        language="zh", temperatures=(0.0,), max_new_tokens=8,
        beam_size=beam_size))


def test_beam_deterministic_and_shaped(setup):
    params, cfg, tk, xa = setup
    dec = _decoder(params, cfg, tk, beam_size=3)
    a = dec.decode(xa)
    b = dec.decode(xa)
    assert [r.tokens for r in a] == [r.tokens for r in b]
    for r in a:
        assert len(r.tokens) <= 8
        assert np.isfinite(r.avg_logprob)


def test_beam_not_worse_than_greedy(setup):
    params, cfg, tk, xa = setup
    greedy = _decoder(params, cfg, tk, beam_size=1).decode(xa)
    beam = _decoder(params, cfg, tk, beam_size=4).decode(xa)
    for g, bm in zip(greedy, beam):
        # compare total path logprob per emitted token count; beam explores
        # a superset of greedy's path under identical scoring
        g_total = g.avg_logprob * (len(g.tokens) + 1)
        b_total = bm.avg_logprob * (len(bm.tokens) + 1)
        assert b_total >= g_total - 1e-3


def test_beam_respects_suppression(setup):
    params, cfg, tk, xa = setup
    dec = _decoder(params, cfg, tk, beam_size=3)
    sp = tk.special
    banned = {sp.sot, sp.sot_prev, sp.no_speech, sp.translate,
              sp.transcribe}
    banned.update(tk.all_language_tokens)
    banned.update(range(sp.timestamp_begin, sp.n_vocab))
    for r in dec.decode(xa):
        assert not (set(r.tokens) & banned)


def test_beam_matches_uncached_reference(setup):
    """The lazy-ancestry beam (cache never physically reordered) must pick
    the same hypotheses as a naive reference that re-runs the full
    teacher-forced decoder on every candidate prefix each step — any
    ancestry/cache bug shows up as a token or score mismatch."""
    import jax.numpy as jnp

    from manual_whisper_tpu.models import decoder_forward
    from manual_whisper_tpu.models.beam import beam_decode_jit
    from manual_whisper_tpu.models.decode import (DecodingOptions,
                                                  build_blank_mask,
                                                  build_suppress_mask)

    params, cfg, tk, xa = setup
    opts = DecodingOptions(language="zh", max_new_tokens=6, beam_size=3)
    suppress = jnp.asarray(build_suppress_mask(tk, cfg, opts))
    blank = jnp.asarray(build_blank_mask(tk, cfg))
    prefix = np.asarray(tk.sot_sequence("zh", "transcribe"), np.int32)
    eot, k, max_new = tk.special.eot, 3, 6
    b, p = int(xa.shape[0]), len(prefix)

    got_tokens, got_lp, got_len, _ = jax.device_get(beam_decode_jit(
        params, xa, jnp.asarray(prefix), suppress, blank, eot, cfg,
        max_new, k, sot_index=0, no_speech_token=tk.special.no_speech))

    # ---- uncached reference ------------------------------------------------
    xa_k = jnp.repeat(xa, k, axis=0)                       # [B*K, Ta, d]
    logits, _ = decoder_forward(
        params, jnp.broadcast_to(jnp.asarray(prefix), (b, p)), xa, cfg)
    first = jax.nn.log_softmax(logits[:, -1] + suppress + blank, axis=-1)
    cum, tok = jax.lax.top_k(first, k)                     # [B, K]
    cum, tok = np.asarray(cum), np.asarray(tok)
    tokens = np.full((b, k, max_new), eot, np.int32)
    tokens[:, :, 0] = tok
    finished = tokens[:, :, 0] == eot
    lengths = np.ones((b, k), np.int32)

    # completed-hypothesis set-aside, mirroring beam.py: the best finished
    # hypothesis (length-normalised) survives even if evicted from the beam
    first_np = np.asarray(first)
    fin_score = np.where(first_np[:, eot] > -1e30 / 2, first_np[:, eot],
                         -1e30)
    fin_tokens = np.full((b, max_new), eot, np.int32)
    fin_lp = first_np[:, eot].copy()
    fin_len = np.ones(b, np.int32)

    for i in range(1, max_new):
        if finished.all():
            break
        seqs = np.concatenate(
            [np.broadcast_to(prefix, (b, k, p)), tokens[:, :, :i]], axis=-1)
        logits, _ = decoder_forward(
            params, jnp.asarray(seqs.reshape(b * k, p + i)), xa_k, cfg)
        logp = np.asarray(jax.nn.log_softmax(
            logits[:, -1] + suppress, axis=-1)).reshape(b, k, -1)
        frozen = np.full(logp.shape[-1], -1e30, np.float32)
        frozen[eot] = 0.0
        logp = np.where(finished[:, :, None], frozen, logp)

        eot_cum = cum + logp[:, :, eot]
        eot_len = lengths + np.where(finished, 0, 1)
        eot_score = eot_cum / np.maximum(eot_len.astype(np.float32), 1.0)
        k_best = np.argmax(eot_score, axis=1)
        for row in range(b):
            if eot_score[row, k_best[row]] > fin_score[row]:
                fin_score[row] = eot_score[row, k_best[row]]
                fin_tokens[row] = tokens[row, k_best[row]]
                fin_lp[row] = eot_cum[row, k_best[row]]
                fin_len[row] = eot_len[row, k_best[row]]

        cand = (cum[:, :, None] + logp).reshape(b, -1)
        idx = np.argsort(cand, axis=-1)[:, ::-1][:, :k]
        cum = np.take_along_axis(cand, idx, axis=-1)
        parent, tok = idx // logp.shape[-1], (idx % logp.shape[-1])
        tokens = np.take_along_axis(tokens, parent[:, :, None], axis=1)
        tokens[:, :, i] = tok
        finished = np.take_along_axis(finished, parent, axis=1)
        lengths = np.take_along_axis(lengths, parent, axis=1)
        lengths = lengths + np.where(finished, 0, 1)
        finished = finished | (tok == eot)

    norm = np.maximum(lengths.astype(np.float32), 1.0)  # length_penalty 1.0
    score = cum / norm
    best = np.argmax(score, axis=1)
    for row in range(b):
        exp_tokens = tokens[row, best[row]].tolist()
        exp_lp, exp_len = cum[row, best[row]], lengths[row, best[row]]
        if fin_score[row] > score[row, best[row]]:
            exp_tokens = fin_tokens[row].tolist()
            exp_lp, exp_len = fin_lp[row], fin_len[row]
        assert got_tokens[row].tolist() == exp_tokens
        assert abs(got_lp[row] - exp_lp) < 1e-3
        assert got_len[row] == exp_len


def test_beam_size_one_equals_greedy_tokens(setup):
    params, cfg, tk, xa = setup
    greedy = _decoder(params, cfg, tk, beam_size=1).decode(xa)
    # beam_size=1 routes through the greedy kernel (temperature 0)
    assert all(r.temperature == 0.0 for r in greedy)


def test_beam_runs_in_bf16():
    """load_model defaults to bf16 even for the test config; the beam
    kernel must run under that dtype on every backend (a bkhd,bhdt cross
    einsum once lowered to a dot shape the XLA CPU thunk rejects)."""
    import jax
    import numpy as np
    from manual_whisper_tpu.models import MODEL_CONFIGS, encode, init_params
    from manual_whisper_tpu.models.decode import BatchDecoder, DecodingOptions
    from manual_whisper_tpu.tokenizer import make_test_tokenizer
    import jax.numpy as jnp

    cfg = MODEL_CONFIGS["test"].with_dtype(jnp.bfloat16)
    tk = make_test_tokenizer()
    params = init_params(jax.random.PRNGKey(0), cfg)
    xa = encode(params, np.zeros((2, cfg.n_mels, 2 * cfg.n_audio_ctx),
                                 np.float32), cfg)
    dec = BatchDecoder(params, cfg, tk,
                       DecodingOptions(language="zh", temperatures=(0.0,),
                                       max_new_tokens=6, beam_size=3))
    results = dec.decode(xa)
    assert len(results) == 2


def test_finished_hypothesis_survives_eviction(setup, monkeypatch):
    """A hypothesis that finishes early, is EVICTED from the beam by
    briefly-higher-raw-score continuations, and ultimately has the best
    length-normalised score must still be returned (the completed-
    hypothesis set-aside; CT2/OpenAI semantics).  The decoder step is
    stubbed with scripted logits that force exactly that sequence:
    beam 3 (worst first token) takes EOT at step 1, beams 1-2 spawn
    enough higher-raw candidates to push the frozen hypothesis out of
    the top-k, then every continuation collapses."""
    import jax.numpy as jnp

    from manual_whisper_tpu.models import beam as beam_mod

    params, cfg, tk, xa = setup
    eot = tk.special.eot
    V = cfg.n_vocab
    prefix = np.asarray(tk.sot_sequence("zh", "transcribe"), np.int32)
    p = len(prefix)
    b = int(xa.shape[0])
    A, B, C, NXT = 5, 6, 7, 8   # first-step tokens and a continuation

    first_row = np.full(V, -20.0, np.float32)
    first_row[A], first_row[B], first_row[C] = 10.0, 9.5, 6.0

    def fake_decoder_forward(params_, tokens, xa_, cfg_, pos_offset=0,
                             kv_cache=None, cross_kv=None):
        logits = jnp.full((tokens.shape[0], tokens.shape[1], V), -20.0)
        logits = logits.at[:, -1, :].set(jnp.asarray(first_row))
        return logits, kv_cache

    def fake_beam_step(params_, cfg_, token, pos, cache, cross_kv, oh):
        k = token.shape[1]
        # step 1 (pos == p): C -> EOT; A/B -> two good continuations
        good = jnp.full((V,), -20.0).at[NXT].set(10.0).at[NXT + 1].set(9.0)
        good = good.at[eot].set(-40.0)
        end = jnp.full((V,), -20.0).at[eot].set(10.0)
        # later steps: flat and bad, EOT excluded (no new finishes)
        flat = jnp.full((V,), -20.0).at[eot].set(-40.0)
        step1 = jnp.where((token == C)[:, :, None], end[None, None, :],
                          good[None, None, :])
        logits = jnp.where(pos == p, step1,
                           jnp.broadcast_to(flat, (token.shape[0], k, V)))
        return logits.astype(jnp.float32), cache

    monkeypatch.setattr(beam_mod, "decoder_forward", fake_decoder_forward)
    monkeypatch.setattr(beam_mod, "_beam_step", fake_beam_step)

    from manual_whisper_tpu.models.beam import beam_decode_jit
    zero_mask = jnp.zeros(V, jnp.float32)
    # max_new=7 -> unique static key, guaranteed fresh trace of the stubs
    max_new = 7
    got_tokens, got_lp, got_len, _ = jax.device_get(beam_decode_jit(
        params, xa, jnp.asarray(prefix), zero_mask, zero_mask,
        eot, cfg, max_new, 3, sot_index=0,
        no_speech_token=tk.special.no_speech))

    def logsm(row):
        m = row.max()
        return row - (m + np.log(np.exp(row - m).sum()))

    c_first = logsm(first_row)
    end_row = np.full(V, -20.0, np.float32)
    end_row[eot] = 10.0
    expected_lp = c_first[C] + logsm(end_row)[eot]
    for r in range(b):
        assert got_tokens[r].tolist() == [C] + [eot] * (max_new - 1)
        assert got_len[r] == 2
        assert abs(got_lp[r] - expected_lp) < 1e-3
