"""Timestamp-rule decoding tests (without_timestamps=False mode)."""

import numpy as np
import pytest

import jax

from manual_whisper_tpu.models import MODEL_CONFIGS, encode, init_params
from manual_whisper_tpu.models.decode import BatchDecoder, DecodingOptions
from manual_whisper_tpu.models.timestamps import split_segments_by_timestamps
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


def test_timestamp_decode_obeys_rules(setup):
    params, cfg, tk, xa = setup
    dec = BatchDecoder(params, cfg, tk, DecodingOptions(
        language="zh", temperatures=(0.0,), max_new_tokens=12))
    from manual_whisper_tpu.models.timestamps import greedy_timestamps_jit
    from manual_whisper_tpu.models.decode import build_suppress_mask
    import dataclasses
    import jax.numpy as jnp

    ts_opts = dataclasses.replace(dec.opts, without_timestamps=False)
    suppress = jnp.asarray(build_suppress_mask(tk, cfg, ts_opts))
    prefix = np.asarray(tk.sot_sequence("zh", "transcribe", False), np.int32)
    tokens, sum_lp, lengths = jax.device_get(greedy_timestamps_jit(
        params, xa, jnp.asarray(prefix), suppress,
        tk.special.eot, tk.special.timestamp_begin, cfg, 12))

    sp = tk.special
    for row in tokens:
        seq = [int(t) for t in row]
        # rule 1: begins with a timestamp within 1.0s
        assert seq[0] >= sp.timestamp_begin
        assert seq[0] <= sp.timestamp_begin + 50
        # rule 3: timestamps monotone
        ts = [t for t in seq if t >= sp.timestamp_begin and t != sp.eot]
        assert ts == sorted(ts)
        # rule 2: never three timestamps in a row before EOT
        run = 0
        for t in seq:
            if t == sp.eot:
                break
            if t >= sp.timestamp_begin:
                run += 1
                assert run <= 2
            else:
                run = 0


def test_decode_with_timestamps_segments(setup):
    params, cfg, tk, xa = setup
    dec = BatchDecoder(params, cfg, tk, DecodingOptions(
        language="zh", temperatures=(0.0,), max_new_tokens=12))
    segs = dec.decode_with_timestamps(xa, chunk_starts=[10.0, 40.0],
                                      chunk_durations=[1.2, 1.2])
    assert len(segs) == 2
    for chunk_start, row in zip([10.0, 40.0], segs):
        for s in row:
            assert set(s) == {"text", "start", "end"}
            assert chunk_start <= s["start"] <= s["end"]


def test_split_segments_host_logic():
    tk = make_test_tokenizer()
    sp = tk.special
    t = tk.timestamp_token
    hello = tk.encode("hi")
    there = tk.encode("yo")
    tokens = ([t(0.0)] + hello + [t(1.0), t(1.5)] + there
              + [t(2.0), sp.eot])
    segs = split_segments_by_timestamps(np.asarray(tokens), tk,
                                        chunk_start=100.0,
                                        chunk_duration=30.0)
    assert segs == [
        {"text": "hi", "start": 100.0, "end": 101.0},
        {"text": "yo", "start": 101.5, "end": 102.0},
    ]


def test_split_segments_unterminated_span():
    tk = make_test_tokenizer()
    t = tk.timestamp_token
    tokens = [t(0.5)] + tk.encode("end")
    segs = split_segments_by_timestamps(np.asarray(tokens), tk, 0.0, 30.0)
    assert segs == [{"text": "end", "start": 0.5, "end": 30.0}]


def test_split_segments_empty():
    tk = make_test_tokenizer()
    assert split_segments_by_timestamps(
        np.asarray([tk.special.eot]), tk, 0.0, 30.0) == []


def test_closing_timestamp_strictly_increases(setup, monkeypatch):
    """OpenAI's nonzero-duration force: inside a segment (or after a
    closed pair) the next timestamp must be STRICTLY greater than the
    last one — a model that favors one timestamp token must not loop on
    zero-duration segments.  Scripted logits favor re-emitting the same
    timestamp; only the rule forces each closing timestamp forward."""
    import jax.numpy as jnp

    from manual_whisper_tpu.models import timestamps as ts_mod

    params, cfg, tk, xa = setup
    sp = tk.special
    V = cfg.n_vocab
    TXT = 7   # an ordinary text token

    row = np.full(V, -20.0, np.float32)
    row[sp.timestamp_begin:] = 5.0 - 0.01 * np.arange(
        V - sp.timestamp_begin)           # earlier timestamps score best
    row[TXT] = 4.0                        # best text option
    row[sp.eot] = -30.0                   # never stop early
    row_j = jnp.asarray(row)

    def fake_decoder_forward(params_, tokens, xa_, cfg_, pos_offset=0,
                             kv_cache=None, cross_kv=None):
        logits = jnp.broadcast_to(
            row_j, (tokens.shape[0], tokens.shape[1], V))
        return logits, kv_cache

    def fake_decode_step(params_, last, pos, cache, cross_kv, cfg_,
                         use_fused=False, cross_len=None):
        return jnp.broadcast_to(row_j, (last.shape[0], V)), cache

    monkeypatch.setattr(ts_mod, "decoder_forward", fake_decoder_forward)
    monkeypatch.setattr(ts_mod, "decode_step", fake_decode_step)

    prefix = np.asarray(tk.sot_sequence("zh", "transcribe", False),
                        np.int32)
    max_new = 9   # unique static key -> fresh trace of the stubs
    tokens, _, _ = jax.device_get(ts_mod.greedy_timestamps_jit(
        params, xa, jnp.asarray(prefix), jnp.zeros(V, jnp.float32),
        sp.eot, sp.timestamp_begin, cfg, max_new))

    for seq in tokens:
        seq = [int(t) for t in seq if t != sp.eot]
        # pattern: t0 TXT t1 [t1 TXT t2 ...] — every closing timestamp
        # must exceed its opener
        opens = seq[0::3]
        closes = seq[2::3]
        for o, c in zip(opens, closes):
            assert o >= sp.timestamp_begin and c >= sp.timestamp_begin
            assert c > o, f"zero-duration pair in {seq}"
