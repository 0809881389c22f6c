"""Int8 weight-only quantization tests (CT2-int8 parity path,
reference: COMPUTE_TYPE='int8', transcribe.py:32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from manual_whisper_tpu.models import MODEL_CONFIGS, encode, init_params
from manual_whisper_tpu.models.decode import BatchDecoder, DecodingOptions
from manual_whisper_tpu.ops.quant import (int8_matmul_pallas, is_quantized,
                                          mm, quantize_params,
                                          quantize_weight)
from manual_whisper_tpu.tokenizer import make_test_tokenizer


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 128)).astype(np.float32)
    qw = quantize_weight(w)
    assert qw["q"].dtype == jnp.int8 and qw["q"].shape == (64, 128)
    assert qw["s"].shape == (128,)
    deq = np.asarray(qw["q"], np.float32) * np.asarray(qw["s"])
    # per-channel int8: max error bounded by scale/2 per channel
    err = np.abs(deq - w)
    bound = np.asarray(qw["s"]) * 0.5 + 1e-6
    assert (err <= bound[None, :]).all()


def test_mm_dispatch():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    dense = np.asarray(mm(x, w))
    quant = np.asarray(mm(x, quantize_weight(w)))
    assert dense.shape == quant.shape
    rel = np.abs(dense - quant).max() / (np.abs(dense).max() + 1e-9)
    assert rel < 0.02


def test_quantize_params_structure():
    cfg = MODEL_CONFIGS["test"]
    params = init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params)
    enc_attn = qparams["encoder"]["blocks"]["attn"]
    assert is_quantized(enc_attn["q_w"]) and is_quantized(enc_attn["o_w"])
    assert not is_quantized(qparams["encoder"]["conv1_w"])
    assert not is_quantized(qparams["decoder"]["tok_emb"])
    dec_mlp = qparams["decoder"]["blocks"]["mlp"]
    assert is_quantized(dec_mlp["fc1_w"])
    # stacked layer axis preserved
    assert enc_attn["q_w"]["q"].shape[0] == cfg.n_audio_layer


def test_quantized_model_close_to_full_precision():
    cfg = MODEL_CONFIGS["test"]
    params = init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params)
    mel = np.random.default_rng(2).standard_normal(
        (2, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    full = np.asarray(encode(params, mel, cfg)).astype(np.float32)
    quant = np.asarray(encode(qparams, mel, cfg)).astype(np.float32)
    # cosine similarity per position stays high under weight-only int8
    num = (full * quant).sum(-1)
    den = (np.linalg.norm(full, axis=-1)
           * np.linalg.norm(quant, axis=-1) + 1e-9)
    assert (num / den).min() > 0.99


def test_quantized_decode_runs():
    cfg = MODEL_CONFIGS["test"]
    tk = make_test_tokenizer()
    params = quantize_params(init_params(jax.random.PRNGKey(0), cfg))
    mel = np.random.default_rng(3).standard_normal(
        (2, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    xa = encode(params, mel, cfg)
    dec = BatchDecoder(params, cfg, tk, DecodingOptions(
        language="zh", temperatures=(0.0,), max_new_tokens=6))
    results = dec.decode(xa)
    assert len(results) == 2
    assert all(np.isfinite(r.avg_logprob) for r in results)


def test_pallas_int8_matmul_interpret():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 256)).astype(np.float32))
    qw = quantize_weight(w)
    ref = np.asarray(mm(x, qw))
    out = np.asarray(int8_matmul_pallas(x, qw["q"], qw["s"], block_n=128,
                                        interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_int8_cross_kv_decode_close_to_full():
    """Quantized cross-attention KV keeps greedy decode statistics close
    (scales factor out exactly; only int8 rounding of K/V remains)."""
    cfg = MODEL_CONFIGS["test"]
    tk = make_test_tokenizer()
    params = init_params(jax.random.PRNGKey(0), cfg)
    mel = np.random.default_rng(5).standard_normal(
        (2, cfg.n_mels, 2 * cfg.n_audio_ctx)).astype(np.float32)
    xa = encode(params, mel, cfg)

    full = BatchDecoder(params, cfg, tk, DecodingOptions(
        language="zh", temperatures=(0.0,), max_new_tokens=8)).decode(xa)
    q = BatchDecoder(params, cfg, tk, DecodingOptions(
        language="zh", temperatures=(0.0,), max_new_tokens=8,
        int8_cross_kv=True)).decode(xa)
    for a, b in zip(full, q):
        assert abs(a.avg_logprob - b.avg_logprob) < 0.3
        # token agreement on the prefix of the shorter sequence
        n = min(len(a.tokens), len(b.tokens))
        if n:
            agree = sum(x == y for x, y in
                        zip(a.tokens[:n], b.tokens[:n])) / n
            assert agree > 0.5


def test_init_params_host_matches_device_tree():
    """init_params_host must mirror init_params' structure exactly —
    same paths, shapes, dtypes — so the synthetic-bench model is the
    same compute graph as a converted checkpoint (whisper.py)."""
    from manual_whisper_tpu.models.whisper import init_params_host
    cfg = MODEL_CONFIGS["test"]
    dev = init_params(jax.random.PRNGKey(0), cfg)
    host = init_params_host(0, cfg)
    dev_s = jax.tree.map(lambda x: (x.shape, jnp.asarray(x).dtype), dev)
    host_s = jax.tree.map(lambda x: (x.shape, jnp.asarray(x).dtype), host)
    assert jax.tree.structure(dev_s) == jax.tree.structure(host_s)
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b, dev_s, host_s))


def test_init_params_host_int8_matches_quantize_params():
    """quantize_int8=True must produce the exact tree quantize_params
    would give (int8 q + f32 s on block matmuls, everything else raw)."""
    from manual_whisper_tpu.models.whisper import init_params_host
    cfg = MODEL_CONFIGS["test"]
    ref = quantize_params(init_params(jax.random.PRNGKey(0), cfg))
    host = init_params_host(0, cfg, quantize_int8=True)
    ref_s = jax.tree.map(lambda x: (x.shape, jnp.asarray(x).dtype), ref)
    host_s = jax.tree.map(lambda x: (x.shape, jnp.asarray(x).dtype), host)
    assert jax.tree.structure(ref_s) == jax.tree.structure(host_s)
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b, ref_s, host_s))
    # quantize_params must pass pre-quantized blocks through untouched
    again = quantize_params(host)
    assert jax.tree.structure(jax.tree.map(jnp.shape, again)) == \
        jax.tree.structure(jax.tree.map(jnp.shape, host))
