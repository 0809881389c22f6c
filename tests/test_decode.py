"""Decode-loop tests on the tiny test config (random weights).

Greedy determinism, EOT handling, suppression, prompt conditioning, and the
fallback ladder's gating logic (SURVEY.md §4 model-parity plan).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manual_whisper_tpu.models import MODEL_CONFIGS, encode, init_params
from manual_whisper_tpu.models.decode import (BatchDecoder, DecodingOptions,
                                              SegmentResult,
                                              compression_ratio)
from manual_whisper_tpu.tokenizer import make_test_tokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = MODEL_CONFIGS["test"]
    tk = make_test_tokenizer()
    # test cfg n_vocab must cover the tokenizer's special tokens
    assert cfg.n_vocab >= tk.special.n_vocab
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((3, cfg.n_mels, 2 * cfg.n_audio_ctx)
                              ).astype(np.float32)
    xa = encode(params, mel, cfg)
    return params, cfg, tk, xa


def _decoder(params, cfg, tk, **kw):
    base = dict(language="zh", temperatures=(0.0,), max_new_tokens=8)
    base.update(kw)
    return BatchDecoder(params, cfg, tk, DecodingOptions(**base))


def test_greedy_is_deterministic(setup):
    params, cfg, tk, xa = setup
    dec = _decoder(params, cfg, tk)
    a = dec.decode(xa)
    b = dec.decode(xa)
    assert [r.tokens for r in a] == [r.tokens for r in b]
    assert all(len(r.tokens) <= 8 for r in a)


def test_special_tokens_suppressed(setup):
    params, cfg, tk, xa = setup
    dec = _decoder(params, cfg, tk)
    sp = tk.special
    banned = {sp.sot, sp.sot_prev, sp.no_speech, sp.translate, sp.transcribe}
    banned.update(tk.all_language_tokens)
    banned.update(range(sp.timestamp_begin, sp.n_vocab))
    for r in dec.decode(xa):
        assert not (set(r.tokens) & banned)


def test_prompt_conditioning_changes_output(setup):
    params, cfg, tk, xa = setup
    plain = _decoder(params, cfg, tk).decode(xa)
    prompted = _decoder(params, cfg, tk,
                        initial_prompt="术语参考").decode(xa)
    # random model: any prefix change should shift at least one row's output
    assert any(p.tokens != q.tokens for p, q in zip(plain, prompted))


def test_sampling_temperature_respects_seed(setup):
    """Reproducible given the seed AND the call index: two fresh decoders
    with the same seed replay identical samples call-for-call, while
    successive calls on ONE decoder draw fresh noise (a repeated ladder
    temperature must resample, not replay — otherwise the extra rung can
    never rescue a failing segment)."""
    params, cfg, tk, xa = setup
    a = _decoder(params, cfg, tk).decode(xa, temperature=1.0)
    b = _decoder(params, cfg, tk).decode(xa, temperature=1.0)
    assert [r.tokens for r in a] == [r.tokens for r in b]  # fixed seed
    assert all(r.temperature == 1.0 for r in a)
    dec = _decoder(params, cfg, tk)
    c = dec.decode(xa, temperature=1.0)
    d = dec.decode(xa, temperature=1.0)
    assert [r.tokens for r in c] != [r.tokens for r in d]  # resamples


def test_stats_populated(setup):
    params, cfg, tk, xa = setup
    for r in _decoder(params, cfg, tk).decode(xa):
        assert np.isfinite(r.avg_logprob) and r.avg_logprob <= 0.0
        assert 0.0 <= r.no_speech_prob <= 1.0
        assert r.compression_ratio >= 0.0


def test_compression_ratio():
    assert compression_ratio("") == 0.0
    loopy = "那个吧" * 50
    normal = "今天的会议讨论了三个互不相同的议题内容"
    assert compression_ratio(loopy) > compression_ratio(normal)
    assert compression_ratio(loopy) > 2.4  # typical hallucination gate


def test_fallback_ladder_retries_failing_rows(setup, monkeypatch):
    """log_prob_threshold ~0 makes every rung fail: the ladder must visit
    every retry temperature (the first rung goes through the async
    submit/finalize path, retries through decode())."""
    params, cfg, tk, xa = setup
    dec = _decoder(params, cfg, tk, temperatures=(0.0, 0.5, 1.0),
                   log_prob_threshold=-1e-9)
    calls = []
    real_decode = dec.decode

    def spy(xa_in, temperature=0.0, rng_tag=None):
        calls.append((int(xa_in.shape[0]), temperature))
        return real_decode(xa_in, temperature, rng_tag=rng_tag)

    monkeypatch.setattr(dec, "decode", spy)
    results = dec.decode_with_fallback(xa)
    assert [c[1] for c in calls] == [0.5, 1.0]   # retries only
    assert all(c[0] == 3 for c in calls)
    assert all(r.temperature == 1.0 for r in results)


def test_fallback_retries_pad_to_bucket(setup, monkeypatch):
    """Retry sub-batches reuse the compiled bucket shapes: 3 failing rows
    out of 4 retry as a padded 4-row call, not a fresh 3-row program."""
    params, cfg, tk, xa3 = setup
    xa = jnp.concatenate([xa3, xa3[:1]], axis=0)  # batch 4
    dec = _decoder(params, cfg, tk, temperatures=(0.0, 0.5))
    calls = []
    real_decode = dec.decode

    def spy(xa_in, temperature=0.0, rng_tag=None):
        calls.append(int(xa_in.shape[0]))
        return real_decode(xa_in, temperature, rng_tag=rng_tag)

    # rows 0-2 fail the first rung, row 3 passes; retries never fail
    verdicts = iter([True, True, True, False])
    monkeypatch.setattr(dec, "_needs_fallback",
                        lambda r: next(verdicts, False))
    monkeypatch.setattr(dec, "decode", spy)
    results = dec.decode_with_fallback(xa)
    assert calls == [4]  # one retry: 3 pending rows padded to the 4-bucket
    assert len(results) == 4
    assert all(r.temperature == 0.5 for r in results[:3])
    assert results[3].temperature == 0.0  # passing row untouched


def test_suppress_tokens_extra_ids(setup):
    """suppress_tokens (faster-whisper asr_option parity) bans arbitrary
    ids; suppressing EOT forces the full token budget (bench contract)."""
    params, cfg, tk, xa = setup
    dec = _decoder(params, cfg, tk,
                   suppress_tokens=(tk.special.eot,))
    for r in dec.decode(xa):
        assert len(r.tokens) == 8          # ran the whole budget
    banned_id = 7
    dec2 = _decoder(params, cfg, tk, suppress_tokens=(banned_id,))
    for r in dec2.decode(xa):
        assert banned_id not in r.tokens


def test_no_speech_gate():
    opts = DecodingOptions(no_speech_threshold=0.6, log_prob_threshold=-1.0)
    dec = object.__new__(BatchDecoder)
    dec.opts = opts
    silent = SegmentResult([], "", -2.0, 0.9, 1.0, 0.0)
    speech = SegmentResult([1], "好", -0.2, 0.9, 1.0, 0.0)
    assert BatchDecoder.is_no_speech(dec, silent)
    assert not BatchDecoder.is_no_speech(dec, speech)


def test_decoder_forward_accepts_precomputed_cross_kv(setup):
    """Prefill must be able to reuse a precomputed cross-KV (bf16 pair or
    int8 4-tuple) instead of re-projecting it in full precision inside the
    same program — the int8 path's OOM-avoidance depends on this."""
    from manual_whisper_tpu.models import decoder_forward
    from manual_whisper_tpu.models.whisper import precompute_cross_kv
    params, cfg, tk, xa = setup
    tokens = jnp.asarray([[tk.special.sot]] * int(xa.shape[0]), jnp.int32)

    ref_logits, _ = decoder_forward(params, tokens, xa, cfg)

    kv = precompute_cross_kv(params, xa, cfg)
    got, _ = decoder_forward(params, tokens, None, cfg, cross_kv=kv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_logits),
                               rtol=0, atol=1e-5)

    kv8 = precompute_cross_kv(params, xa, cfg, quantize=True)
    got8, _ = decoder_forward(params, tokens, None, cfg, cross_kv=kv8)
    # int8 K/V rounding only: logits stay close to full precision
    np.testing.assert_allclose(np.asarray(got8), np.asarray(ref_logits),
                               rtol=0, atol=0.15)


def test_int8_cross_kv_decode_matches_bf16(setup):
    """End-to-end greedy decode with the fused int8 cross-KV produces the
    same tokens as the full-precision path on the tiny model."""
    params, cfg, tk, xa = setup
    ref = _decoder(params, cfg, tk).decode(xa)
    q = _decoder(params, cfg, tk, int8_cross_kv=True).decode(xa)
    assert [r.tokens for r in q] == [r.tokens for r in ref]


def test_bf16_ckv_scales_decode_matches_f32_scales(setup):
    """bf16 per-position cross-KV scales (VERDICT r4 #8: halves the scale
    read) keep greedy tokens identical to f32 scales on the tiny model,
    and the dequantised K/V error stays within 1.3x of the f32-scale
    int8 path (bf16 rounds the per-position max by <= 2^-9 relative)."""
    import jax.numpy as jnp

    from manual_whisper_tpu.models.whisper import precompute_cross_kv
    params, cfg, tk, xa = setup
    f = _decoder(params, cfg, tk, int8_cross_kv=True).decode(xa)
    b = _decoder(params, cfg, tk, int8_cross_kv=True,
                 ckv_scale_bf16=True).decode(xa)
    assert [r.tokens for r in b] == [r.tokens for r in f]

    ref_k = np.asarray(
        precompute_cross_kv(params, xa, cfg, quantize=False)[0], np.float32)
    q32 = precompute_cross_kv(params, xa, cfg, quantize=True)
    q16 = precompute_cross_kv(params, xa, cfg, quantize=True,
                              scale_dtype=jnp.bfloat16)
    assert q16[1].dtype == jnp.bfloat16 and q16[3].dtype == jnp.bfloat16
    e32 = np.abs(np.asarray(q32[0], np.float32)
                 * np.asarray(q32[1], np.float32) - ref_k).max()
    e16 = np.abs(np.asarray(q16[0], np.float32)
                 * np.asarray(q16[1], np.float32) - ref_k).max()
    assert e16 <= 1.3 * e32 + 1e-6


def test_avg_logprob_denominator_is_len_plus_one(setup):
    """OpenAI/faster-whisper semantics: avg_logprob = sum over emitted
    steps / (len(tokens) + 1).  The loop's `lengths` counts the
    EOT-emitting step, so it equals len(tokens)+1 as-is — EXCEPT for
    rows truncated at max_new without EOT, where lengths == len(tokens)
    and the +1 must be added at finalize."""
    from manual_whisper_tpu.models.decode import greedy_decode_jit
    params, cfg, tk, xa = setup
    dec = _decoder(params, cfg, tk)
    prefix, sot_index = dec._prefix()
    out = greedy_decode_jit(
        params, xa, jnp.asarray(prefix), dec._suppress, dec._blank,
        jnp.float32(0.0), jax.random.PRNGKey(0), tk.special.eot, cfg, 8,
        sot_index=sot_index, no_speech_token=tk.special.no_speech)
    tokens, sum_lp, lengths, _ = jax.device_get(out)
    results = dec.decode(xa)
    for i, r in enumerate(results):
        n_tokens = len([t for t in tokens[i] if t != tk.special.eot])
        truncated = n_tokens == tokens.shape[1]
        assert int(lengths[i]) == (n_tokens if truncated else n_tokens + 1)
        denom = int(lengths[i]) + (1 if truncated else 0)
        expect = float(sum_lp[i]) / max(denom, 1)
        assert r.avg_logprob == pytest.approx(expect)


def test_fused_attention_matches_einsum_path(setup):
    """fused_attention=True (Pallas decode-step kernels, interpret mode on
    CPU) must reproduce the einsum path's tokens and stats exactly — same
    math, one kernel (VERDICT #5)."""
    from jax.experimental.pallas import tpu as pltpu
    params, cfg, tk, xa = setup
    ref = _decoder(params, cfg, tk).decode(xa)
    with pltpu.force_tpu_interpret_mode():
        fused = _decoder(params, cfg, tk, fused_attention=True).decode(xa)
    assert [r.tokens for r in fused] == [r.tokens for r in ref]
    for f, r in zip(fused, ref):
        assert f.avg_logprob == pytest.approx(r.avg_logprob, abs=1e-3)
        assert f.no_speech_prob == pytest.approx(r.no_speech_prob, abs=1e-3)


def test_fused_attention_timestamp_mode(setup):
    from jax.experimental.pallas import tpu as pltpu
    params, cfg, tk, xa = setup
    starts = [0.0] * xa.shape[0]
    durs = [2.0] * xa.shape[0]
    ref = _decoder(params, cfg, tk).decode_with_timestamps(xa, starts, durs)
    with pltpu.force_tpu_interpret_mode():
        fused = _decoder(params, cfg, tk, fused_attention=True
                         ).decode_with_timestamps(xa, starts, durs)
    assert fused == ref
