"""wav2vec2 CTC acoustic model in JAX (forced-alignment backbone).

The reference aligns Whisper segments to word timestamps with an HF
wav2vec2 CTC model via ``whisperx.load_align_model`` / ``whisperx.align``
(reference: transcribe.py:130-131; for zh the upstream default is a
large-xlsr checkpoint).  This is the TPU equivalent: conv feature
extractor + transformer encoder + CTC head, functional JAX with stacked
layers and lax.scan, bf16-ready.

Implements the *stable-layer-norm* variant (wav2vec2-large / XLSR:
``do_stable_layer_norm=True``, ``feat_extract_norm='layer'``) used by all
the alignment checkpoints WhisperX ships for zh/en/etc.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# (channels, kernel, stride) of the 7 conv feature-extractor layers;
# total stride 320 => one output frame per 20 ms at 16 kHz.
CONV_LAYERS: Tuple[Tuple[int, int, int], ...] = (
    (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
    (512, 2, 2), (512, 2, 2))


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    vocab_size: int = 32
    hidden: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    ffn: int = 4096
    conv_dim: int = 512
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    dtype: Any = jnp.float32

    @classmethod
    def tiny_test(cls) -> "Wav2Vec2Config":
        return cls(vocab_size=12, hidden=64, n_layers=2, n_heads=2, ffn=128,
                   conv_dim=32, pos_conv_kernel=16, pos_conv_groups=2)


def frames_for_samples(n_samples: int) -> int:
    n = n_samples
    for _, k, s in CONV_LAYERS:
        n = (n - k) // s + 1
    return max(n, 0)


def _ln(x, g, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return (((x32 - mean) * jax.lax.rsqrt(var + eps)) * g + b).astype(x.dtype)


@partial(jax.jit, static_argnames=("cfg",))
def wav2vec2_logits(params: Params, audio: jnp.ndarray,
                    cfg: Wav2Vec2Config,
                    n_valid: jnp.ndarray = None) -> jnp.ndarray:
    """audio [B, T] (zero-mean/unit-var normalised) -> CTC log-probs
    [B, frames, vocab].

    ``n_valid`` [B] gives the real (pre-padding) sample count per row:
    hidden states past the corresponding frame count are zeroed and
    attention keys there masked (HF attention_mask semantics) so
    length-bucket padding cannot contaminate the valid frames' logits.
    None = every row fully valid."""
    x = audio[:, :, None].astype(jnp.float32)            # [B, T, 1]

    # conv feature extractor (layer-norm variant: LN after every conv)
    for i, (ch, k, s) in enumerate(CONV_LAYERS):
        conv = params["conv"][i]
        x = jax.lax.conv_general_dilated(
            x, conv["w"], window_strides=(s,), padding="VALID",
            dimension_numbers=("NTC", "TIO", "NTC"))
        if "b" in conv:       # conv_bias=true checkpoints (XLSR-53 etc.)
            x = x + conv["b"]
        x = _ln(x, conv["ln_g"], conv["ln_b"])
        x = jax.nn.gelu(x, approximate=False)

    frame_mask = None
    if n_valid is not None:
        nf = jnp.asarray(n_valid, jnp.int32)
        for _, k, s in CONV_LAYERS:
            nf = jnp.maximum((nf - k) // s + 1, 0)
        nf = jnp.maximum(nf, 1)   # all-masked rows would NaN the softmax
        frame_mask = (jnp.arange(x.shape[1])[None, :]
                      < nf[:, None])                     # [B, frames]
        x = jnp.where(frame_mask[:, :, None], x, 0.0)

    # feature projection
    x = _ln(x, params["fp_ln_g"], params["fp_ln_b"])
    x = x @ params["fp_w"] + params["fp_b"]
    x = x.astype(cfg.dtype)
    if frame_mask is not None:
        x = jnp.where(frame_mask[:, :, None], x, 0.0)

    # positional conv embedding (grouped conv, SAME-ish padding k//2 both
    # sides then drop one if kernel even — HF semantics)
    pos_w = params["pos_conv_w"]                         # [k, h/g, h]
    pad = cfg.pos_conv_kernel // 2
    pos = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), pos_w.astype(jnp.float32),
        window_strides=(1,), padding=((pad, pad),),
        dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=cfg.pos_conv_groups)
    pos = pos + params["pos_conv_b"].astype(jnp.float32)
    if cfg.pos_conv_kernel % 2 == 0:
        pos = pos[:, :-1]
    x = x + jax.nn.gelu(pos, approximate=False).astype(cfg.dtype)

    # stable-layer-norm transformer: pre-LN blocks, final LN
    n_heads = cfg.n_heads
    dh = cfg.hidden // n_heads
    scale = dh ** -0.5

    def block(h, blk):
        a_in = _ln(h, blk["ln1_g"], blk["ln1_b"])
        b, t, d = a_in.shape
        def heads(y):
            return y.reshape(b, t, n_heads, dh).transpose(0, 2, 1, 3)
        q = heads(a_in @ blk["q_w"] + blk["q_b"]) * scale
        kk = heads(a_in @ blk["k_w"] + blk["k_b"])
        v = heads(a_in @ blk["v_w"] + blk["v_b"])
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kk,
                       preferred_element_type=jnp.float32)
        if frame_mask is not None:
            s = jnp.where(frame_mask[:, None, None, :], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1).astype(h.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        h = h + (o @ blk["o_w"] + blk["o_b"])
        f_in = _ln(h, blk["ln2_g"], blk["ln2_b"])
        f = jax.nn.gelu(f_in @ blk["fc1_w"] + blk["fc1_b"],
                        approximate=False)
        h = h + (f @ blk["fc2_w"] + blk["fc2_b"])
        return h, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    x = _ln(x, params["final_ln_g"], params["final_ln_b"])

    logits = x.astype(jnp.float32) @ params["lm_w"] + params["lm_b"]
    return jax.nn.log_softmax(logits, axis=-1)


def init_wav2vec2_params(key, cfg: Wav2Vec2Config) -> Params:
    """Random init (tests only)."""
    ks = iter(jax.random.split(key, 16 + cfg.n_layers))

    def dense(k, i, o):
        return (jax.random.normal(k, (i, o)) / math.sqrt(i)
                ).astype(np.float32)

    conv = []
    c_in = 1
    for ch, k, s in CONV_LAYERS:
        ch = cfg.conv_dim
        conv.append({
            "w": np.asarray(jax.random.normal(next(ks), (k, c_in, ch))
                            / math.sqrt(k * c_in), np.float32),
            "ln_g": np.ones(ch, np.float32),
            "ln_b": np.zeros(ch, np.float32),
        })
        c_in = ch

    def blk(k):
        kq, kk_, kv, ko, k1, k2 = jax.random.split(k, 6)
        h, f = cfg.hidden, cfg.ffn
        return {
            "ln1_g": np.ones(h, np.float32), "ln1_b": np.zeros(h, np.float32),
            "q_w": dense(kq, h, h), "q_b": np.zeros(h, np.float32),
            "k_w": dense(kk_, h, h), "k_b": np.zeros(h, np.float32),
            "v_w": dense(kv, h, h), "v_b": np.zeros(h, np.float32),
            "o_w": dense(ko, h, h), "o_b": np.zeros(h, np.float32),
            "ln2_g": np.ones(h, np.float32), "ln2_b": np.zeros(h, np.float32),
            "fc1_w": dense(k1, h, f), "fc1_b": np.zeros(f, np.float32),
            "fc2_w": dense(k2, f, h), "fc2_b": np.zeros(h, np.float32),
        }

    blocks = [blk(next(ks)) for _ in range(cfg.n_layers)]
    blocks = jax.tree.map(lambda *xs: np.stack(xs), *blocks)
    return {
        "conv": conv,
        "fp_ln_g": np.ones(cfg.conv_dim, np.float32),
        "fp_ln_b": np.zeros(cfg.conv_dim, np.float32),
        "fp_w": dense(next(ks), cfg.conv_dim, cfg.hidden),
        "fp_b": np.zeros(cfg.hidden, np.float32),
        "pos_conv_w": np.asarray(
            jax.random.normal(next(ks), (cfg.pos_conv_kernel,
                                         cfg.hidden // cfg.pos_conv_groups,
                                         cfg.hidden))
            / math.sqrt(cfg.pos_conv_kernel * cfg.hidden), np.float32),
        "pos_conv_b": np.zeros(cfg.hidden, np.float32),
        "blocks": blocks,
        "final_ln_g": np.ones(cfg.hidden, np.float32),
        "final_ln_b": np.zeros(cfg.hidden, np.float32),
        "lm_w": dense(next(ks), cfg.hidden, cfg.vocab_size),
        "lm_b": np.zeros(cfg.vocab_size, np.float32),
    }


def convert_wav2vec2_state_dict(state_dict, cfg: Wav2Vec2Config) -> Params:
    """HF Wav2Vec2ForCTC weights -> our pytree (stable-LN variant)."""
    def npy(t):
        import torch
        if isinstance(t, torch.Tensor):
            if t.dtype == torch.bfloat16:
                t = t.float()
            return t.detach().cpu().numpy()
        return np.asarray(t)

    sd = {k[len("wav2vec2."):] if k.startswith("wav2vec2.") else k: v
          for k, v in state_dict.items()}

    conv = []
    for i in range(len(CONV_LAYERS)):
        layer = {
            "w": npy(sd[f"feature_extractor.conv_layers.{i}.conv.weight"]
                     ).transpose(2, 1, 0),
            "ln_g": npy(sd[f"feature_extractor.conv_layers.{i}"
                           ".layer_norm.weight"]),
            "ln_b": npy(sd[f"feature_extractor.conv_layers.{i}"
                           ".layer_norm.bias"]),
        }
        # conv_bias=true checkpoints (every XLSR-53 fine-tune) carry a
        # per-channel conv bias that LN does NOT absorb — dropping it
        # silently corrupts all downstream logits
        bias_key = f"feature_extractor.conv_layers.{i}.conv.bias"
        if bias_key in sd:
            layer["b"] = npy(sd[bias_key])
        conv.append(layer)

    def blocks():
        out = []
        i = 0
        while f"encoder.layers.{i}.attention.q_proj.weight" in sd:
            p = f"encoder.layers.{i}"
            out.append({
                "ln1_g": npy(sd[f"{p}.layer_norm.weight"]),
                "ln1_b": npy(sd[f"{p}.layer_norm.bias"]),
                "q_w": npy(sd[f"{p}.attention.q_proj.weight"]).T,
                "q_b": npy(sd[f"{p}.attention.q_proj.bias"]),
                "k_w": npy(sd[f"{p}.attention.k_proj.weight"]).T,
                "k_b": npy(sd[f"{p}.attention.k_proj.bias"]),
                "v_w": npy(sd[f"{p}.attention.v_proj.weight"]).T,
                "v_b": npy(sd[f"{p}.attention.v_proj.bias"]),
                "o_w": npy(sd[f"{p}.attention.out_proj.weight"]).T,
                "o_b": npy(sd[f"{p}.attention.out_proj.bias"]),
                "ln2_g": npy(sd[f"{p}.final_layer_norm.weight"]),
                "ln2_b": npy(sd[f"{p}.final_layer_norm.bias"]),
                "fc1_w": npy(sd[f"{p}.feed_forward.intermediate_dense"
                                ".weight"]).T,
                "fc1_b": npy(sd[f"{p}.feed_forward.intermediate_dense"
                                ".bias"]),
                "fc2_w": npy(sd[f"{p}.feed_forward.output_dense.weight"]).T,
                "fc2_b": npy(sd[f"{p}.feed_forward.output_dense.bias"]),
            })
            i += 1
        return out

    blks = blocks()
    blks = jax.tree.map(lambda *xs: np.stack(xs), *blks)

    # pos-conv weight norm: torch stores weight_g/weight_v (or
    # parametrizations.weight.original0/1 in torch>=2.1)
    if "encoder.pos_conv_embed.conv.weight_g" in sd:
        g = npy(sd["encoder.pos_conv_embed.conv.weight_g"])
        v = npy(sd["encoder.pos_conv_embed.conv.weight_v"])
    else:
        g = npy(sd["encoder.pos_conv_embed.conv.parametrizations"
                   ".weight.original0"])
        v = npy(sd["encoder.pos_conv_embed.conv.parametrizations"
                   ".weight.original1"])
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True) + 1e-12)
    pos_w = (g / norm * v)                     # [out, in/g, k] torch layout
    pos_w = pos_w.transpose(2, 1, 0)           # -> [k, in/g, out]

    return {
        "conv": conv,
        "fp_ln_g": npy(sd["feature_projection.layer_norm.weight"]),
        "fp_ln_b": npy(sd["feature_projection.layer_norm.bias"]),
        "fp_w": npy(sd["feature_projection.projection.weight"]).T,
        "fp_b": npy(sd["feature_projection.projection.bias"]),
        "pos_conv_w": pos_w,
        "pos_conv_b": npy(sd["encoder.pos_conv_embed.conv.bias"]),
        "blocks": blks,
        "final_ln_g": npy(sd["encoder.layer_norm.weight"]),
        "final_ln_b": npy(sd["encoder.layer_norm.bias"]),
        "lm_w": npy(sd["lm_head.weight"]).T,
        "lm_b": npy(sd["lm_head.bias"]),
    }
