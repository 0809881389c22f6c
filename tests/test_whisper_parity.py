"""Numerical parity of the JAX Whisper vs HF PyTorch (random weights).

Per SURVEY.md §4: "Model parity: per-module numerics vs HF PyTorch Whisper
... on CPU".  No downloads: the torch model is built from a tiny config
with random init, converted through convert/from_hf, and both sides run
the same inputs in float32.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from manual_whisper_tpu.convert import (convert_whisper_state_dict,
                                        hf_config_to_whisper_config)
from manual_whisper_tpu.models import (decode_step, decoder_forward, encode,
                                       init_kv_cache, precompute_cross_kv,
                                       sinusoids)

TINY = dict(vocab_size=207, num_mel_bins=80, d_model=64,
            encoder_layers=2, encoder_attention_heads=2,
            decoder_layers=2, decoder_attention_heads=2,
            encoder_ffn_dim=256, decoder_ffn_dim=256,
            max_source_positions=60, max_target_positions=32,
            pad_token_id=0, bos_token_id=0, eos_token_id=0,
            decoder_start_token_id=0, suppress_tokens=None,
            begin_suppress_tokens=None)


@pytest.fixture(scope="module")
def hf_model_and_params():
    import torch
    from transformers import WhisperConfig, WhisperModel
    torch.manual_seed(0)
    hf_cfg = WhisperConfig(**TINY)
    model = WhisperModel(hf_cfg).eval()
    cfg = hf_config_to_whisper_config(TINY, name="tiny-test")
    cfg = cfg.with_dtype(jnp.float32)
    params = convert_whisper_state_dict(model.state_dict(), cfg)
    return model, params, cfg


def _mel(batch=2, n_mels=80, frames=120, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((batch, n_mels, frames)).astype(np.float32)


def test_encoder_positions_carried_from_checkpoint(hf_model_and_params):
    """Converted params carry HF's embed_positions verbatim (sinusoidal in
    real checkpoints, random in this test fixture)."""
    model, params, _ = hf_model_and_params
    hf_pos = model.encoder.embed_positions.weight.detach().numpy()
    np.testing.assert_allclose(np.asarray(params["encoder"]["pos"]), hf_pos,
                               atol=0)


def test_sinusoids_formula():
    """Fixed positions used for random init follow the OpenAI layout."""
    pos = sinusoids(8, 6)
    assert pos.shape == (8, 6)
    np.testing.assert_allclose(pos[0], [0, 0, 0, 1, 1, 1], atol=1e-7)
    # unit-energy pairs: sin^2 + cos^2 == 1
    np.testing.assert_allclose(pos[:, :3] ** 2 + pos[:, 3:] ** 2, 1.0,
                               atol=1e-6)


def test_encoder_parity(hf_model_and_params):
    import torch
    model, params, cfg = hf_model_and_params
    mel = _mel(frames=2 * cfg.n_audio_ctx)
    with torch.no_grad():
        theirs = model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    ours = np.asarray(encode(params, mel, cfg))
    assert ours.shape == theirs.shape
    # float32 accumulation-order noise between XLA and torch kernels
    np.testing.assert_allclose(ours, theirs, atol=3e-3)


def test_decoder_prefill_parity(hf_model_and_params):
    import torch
    model, params, cfg = hf_model_and_params
    mel = _mel(frames=2 * cfg.n_audio_ctx)
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.n_vocab, size=(2, 7)).astype(np.int32)

    with torch.no_grad():
        enc_t = model.encoder(torch.from_numpy(mel)).last_hidden_state
        dec_t = model.decoder(input_ids=torch.from_numpy(tokens).long(),
                              encoder_hidden_states=enc_t).last_hidden_state
        # tied lm head
        logits_t = (dec_t @ model.decoder.embed_tokens.weight.T).numpy()

    xa = encode(params, mel, cfg)
    logits_j, _ = decoder_forward(params, tokens, xa, cfg)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t, atol=5e-3)


def test_incremental_decode_matches_prefill(hf_model_and_params):
    """KV-cache step decoding must equal teacher-forced full passes."""
    _, params, cfg = hf_model_and_params
    mel = _mel(frames=2 * cfg.n_audio_ctx)
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, cfg.n_vocab, size=(2, 6)).astype(np.int32)

    xa = encode(params, mel, cfg)
    full_logits, _ = decoder_forward(params, tokens, xa, cfg)

    cross_kv = precompute_cross_kv(params, xa, cfg)
    cache = init_kv_cache(cfg, batch=2, max_len=16)
    step_logits = []
    for t in range(tokens.shape[1]):
        logits, cache = decode_step(params, jnp.asarray(tokens[:, t]),
                                    jnp.int32(t), cache, cross_kv, cfg)
        step_logits.append(np.asarray(logits))
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, np.asarray(full_logits),
                               atol=4e-3)


def test_prefill_then_steps_matches_full(hf_model_and_params):
    """Prefix prefill + incremental continuation == one full pass."""
    _, params, cfg = hf_model_and_params
    mel = _mel(frames=2 * cfg.n_audio_ctx)
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, cfg.n_vocab, size=(2, 8)).astype(np.int32)
    split = 5

    xa = encode(params, mel, cfg)
    full_logits, _ = decoder_forward(params, tokens, xa, cfg)

    cross_kv = precompute_cross_kv(params, xa, cfg)
    cache = init_kv_cache(cfg, batch=2, max_len=16)
    prefill_logits, cache = decoder_forward(
        params, tokens[:, :split], xa, cfg, pos_offset=0, kv_cache=cache)
    np.testing.assert_allclose(np.asarray(prefill_logits),
                               np.asarray(full_logits[:, :split]), atol=4e-3)
    for t in range(split, tokens.shape[1]):
        logits, cache = decode_step(params, jnp.asarray(tokens[:, t]),
                                    jnp.int32(t), cache, cross_kv, cfg)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full_logits[:, t]), atol=4e-3)


def test_orbax_param_cache_roundtrip(tmp_path, hf_model_and_params):
    """Converted-weight cache (convert.save_params/load_params) preserves
    the pytree exactly (reference parity: one-time HF download cache)."""
    _, params, cfg = hf_model_and_params
    from manual_whisper_tpu.convert import load_params, save_params
    path = tmp_path / "ckpt"
    save_params(params, path)
    restored = load_params(path)
    assert restored is not None
    import jax
    flat_a, tree_a = jax.tree.flatten(params)
    flat_b, tree_b = jax.tree.flatten(restored)
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert load_params(tmp_path / "missing") is None
