"""HF checkpoint -> JAX pytree conversion (offline weight pipeline).

The reference downloads CTranslate2-converted weights through the HF hub at
model-load time (whisperx.load_model, reference: transcribe.py:107-113;
README.md:94-95 "large-v3 ~3 GB, downloaded once").  This module is our
equivalent: given a local HF Whisper checkpoint directory (safetensors or
torch .bin), re-layout the tensors into the stacked-layer pytree that
models/whisper.py consumes, and cache the converted pytree with orbax.

Pure host-side re-layout: torch is only needed to read .bin files; the
conversion itself is numpy.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Mapping, Optional

import numpy as np

from ..models.whisper import MODEL_CONFIGS, Params, WhisperConfig


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (possibly bf16)
    import torch
    if t.dtype == torch.bfloat16:
        t = t.float()
    return t.detach().cpu().numpy()


def hf_config_to_whisper_config(hf_cfg: Mapping[str, Any],
                                name: str = "converted") -> WhisperConfig:
    """Map a transformers WhisperConfig dict to our WhisperConfig."""
    vocab = int(hf_cfg["vocab_size"])
    # 51865 => 99 languages (v1/v2 layout); 51866 => 100 (large-v3 adds yue)
    num_languages = 100 if vocab >= 51866 else 99
    return WhisperConfig(
        name=name,
        n_mels=int(hf_cfg["num_mel_bins"]),
        n_vocab=vocab,
        n_audio_ctx=int(hf_cfg.get("max_source_positions", 1500)),
        n_audio_state=int(hf_cfg["d_model"]),
        n_audio_head=int(hf_cfg["encoder_attention_heads"]),
        n_audio_layer=int(hf_cfg["encoder_layers"]),
        n_text_ctx=int(hf_cfg.get("max_target_positions", 448)),
        n_text_state=int(hf_cfg["d_model"]),
        n_text_head=int(hf_cfg["decoder_attention_heads"]),
        n_text_layer=int(hf_cfg["decoder_layers"]),
        num_languages=num_languages,
    )


def _ln(sd, prefix):
    return {"g": _to_numpy(sd[f"{prefix}.weight"]),
            "b": _to_numpy(sd[f"{prefix}.bias"])}


def _attn(sd, prefix):
    return {
        "q_w": _to_numpy(sd[f"{prefix}.q_proj.weight"]).T,
        "q_b": _to_numpy(sd[f"{prefix}.q_proj.bias"]),
        "k_w": _to_numpy(sd[f"{prefix}.k_proj.weight"]).T,
        "v_w": _to_numpy(sd[f"{prefix}.v_proj.weight"]).T,
        "v_b": _to_numpy(sd[f"{prefix}.v_proj.bias"]),
        "o_w": _to_numpy(sd[f"{prefix}.out_proj.weight"]).T,
        "o_b": _to_numpy(sd[f"{prefix}.out_proj.bias"]),
    }


def _block(sd, prefix, cross: bool):
    blk = {
        "ln1": _ln(sd, f"{prefix}.self_attn_layer_norm"),
        "attn": _attn(sd, f"{prefix}.self_attn"),
        "ln2": _ln(sd, f"{prefix}.final_layer_norm"),
        "mlp": {
            "fc1_w": _to_numpy(sd[f"{prefix}.fc1.weight"]).T,
            "fc1_b": _to_numpy(sd[f"{prefix}.fc1.bias"]),
            "fc2_w": _to_numpy(sd[f"{prefix}.fc2.weight"]).T,
            "fc2_b": _to_numpy(sd[f"{prefix}.fc2.bias"]),
        },
    }
    if cross:
        blk["lnx"] = _ln(sd, f"{prefix}.encoder_attn_layer_norm")
        blk["xattn"] = _attn(sd, f"{prefix}.encoder_attn")
    return blk


def _stack(blocks):
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs), *blocks)


def convert_whisper_state_dict(state_dict: Mapping[str, Any],
                               cfg: WhisperConfig,
                               dtype=None) -> Params:
    """HF WhisperModel/WhisperForConditionalGeneration weights -> pytree.

    Accepts torch tensors or numpy arrays; handles the optional ``model.``
    prefix of the ForConditionalGeneration wrapper.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("model."):
            k = k[len("model."):]
        sd[k] = v

    enc_blocks = [_block(sd, f"encoder.layers.{i}", cross=False)
                  for i in range(cfg.n_audio_layer)]
    dec_blocks = [_block(sd, f"decoder.layers.{i}", cross=True)
                  for i in range(cfg.n_text_layer)]

    params: Params = {
        "encoder": {
            # sinusoidal in real checkpoints; carried verbatim regardless
            "pos": _to_numpy(sd["encoder.embed_positions.weight"]),
            # torch conv weight [out, in, k] -> lax "TIO" [k, in, out]
            "conv1_w": _to_numpy(sd["encoder.conv1.weight"]).transpose(2, 1, 0),
            "conv1_b": _to_numpy(sd["encoder.conv1.bias"]),
            "conv2_w": _to_numpy(sd["encoder.conv2.weight"]).transpose(2, 1, 0),
            "conv2_b": _to_numpy(sd["encoder.conv2.bias"]),
            "blocks": _stack(enc_blocks),
            "ln_post": _ln(sd, "encoder.layer_norm"),
        },
        "decoder": {
            "tok_emb": _to_numpy(sd["decoder.embed_tokens.weight"]),
            "pos_emb": _to_numpy(sd["decoder.embed_positions.weight"]),
            "blocks": _stack(dec_blocks),
            "ln": _ln(sd, "decoder.layer_norm"),
        },
    }
    if dtype is not None:
        import jax
        params = jax.tree.map(lambda x: np.asarray(x).astype(dtype), params)
    return params


def load_whisper_checkpoint(path, dtype=None
                            ) -> tuple[Params, WhisperConfig]:
    """Load an HF Whisper checkpoint directory (config.json + weights).

    Supports ``model.safetensors`` (preferred, no torch needed) and
    ``pytorch_model.bin``.
    """
    path = Path(path)
    hf_cfg = json.loads((path / "config.json").read_text())
    cfg = hf_config_to_whisper_config(hf_cfg, name=path.name)

    st = path / "model.safetensors"
    index = path / "model.safetensors.index.json"
    if st.exists():
        from safetensors.numpy import load_file
        sd = load_file(str(st))
    elif index.exists():
        # sharded checkpoint (fp32 large models save this way by default)
        from safetensors.numpy import load_file
        shards = sorted({v for v in json.loads(
            index.read_text())["weight_map"].values()})
        sd = {}
        for shard in shards:
            sd.update(load_file(str(path / shard)))
    elif (path / "pytorch_model.bin").exists():
        import torch
        sd = torch.load(str(path / "pytorch_model.bin"),
                        map_location="cpu", weights_only=True)
    else:
        raise FileNotFoundError(
            f"no weights under {path}: expected model.safetensors, "
            "model.safetensors.index.json (+ shards), or "
            "pytorch_model.bin")
    return convert_whisper_state_dict(sd, cfg, dtype=dtype), cfg


# -- converted-weight cache (reference parity: HF hub cache, README.md:94) ---

def save_params(params: Params, path) -> None:
    """Persist a converted pytree with orbax (one-time conversion cache)."""
    import orbax.checkpoint as ocp
    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)   # overwrite a stale cache entry
    ckptr.wait_until_finished()


def load_params(path) -> Optional[Params]:
    import orbax.checkpoint as ocp
    path = Path(path).resolve()
    if not path.exists():
        return None
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)
