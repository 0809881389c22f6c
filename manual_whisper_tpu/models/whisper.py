"""Whisper encoder-decoder in functional JAX, TPU-first.

Replaces the CTranslate2 C++ engine the reference drives through
``whisperx.load_model(...)`` / ``model.transcribe(...)``
(reference: transcribe.py:107-123).  Design choices for TPU/XLA:

- **Stacked layers + lax.scan**: per-layer weights are stacked on a leading
  layer axis so a transformer stack is one scan (fast compile, one HLO body,
  natural pjit sharding specs).
- **Functional params pytree**: plain nested dict of jnp arrays; conversion
  from HF checkpoints is a pure re-layout (convert/from_hf.py).
- **bf16 by default** with float32 layernorm/softmax accumulation; the MXU
  natively consumes bf16.
- **KV cache decode**: `decode_step` consumes/updates [L, B, H, dh, T]
  caches via dynamic_update_slice (position axis on the 128-lane tile —
  a [.., T, 64] layout pads 2x); cross-attention K/V is precomputed once
  per segment (`precompute_cross_kv`) in the same transposed layout.
- Encoder self-attention (1500 ctx) can route to the Pallas flash kernel
  (ops/attention.py) via ``use_flash``.

Architecture follows OpenAI Whisper (conv1 s1 + conv2 s2 -> sinusoidal pos
-> pre-LN transformer; decoder with learned positions, causal self-attn,
cross-attn, tied output embedding).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.quant import mm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    name: str = "tiny"
    n_mels: int = 80
    n_vocab: int = 51865
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4
    num_languages: int = 99
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.n_audio_state // self.n_audio_head

    def with_dtype(self, dtype) -> "WhisperConfig":
        return dataclasses.replace(self, dtype=dtype)


def _cfg(name, d, h, l_enc, l_dec=None, n_mels=80, n_vocab=51865, langs=99):
    return WhisperConfig(
        name=name, n_mels=n_mels, n_vocab=n_vocab,
        n_audio_state=d, n_audio_head=h, n_audio_layer=l_enc,
        n_text_state=d, n_text_head=h,
        n_text_layer=l_dec if l_dec is not None else l_enc,
        num_languages=langs)


# Model menu mirrors the reference's WHISPER_MODEL options
# (.env.example:9: tiny/base/small/medium/large-v3; default large-v3).
MODEL_CONFIGS: Dict[str, WhisperConfig] = {
    "tiny": _cfg("tiny", 384, 6, 4),
    "base": _cfg("base", 512, 8, 6),
    "small": _cfg("small", 768, 12, 12),
    "medium": _cfg("medium", 1024, 16, 24),
    "large-v1": _cfg("large-v1", 1280, 20, 32),
    "large-v2": _cfg("large-v2", 1280, 20, 32),
    "large-v3": _cfg("large-v3", 1280, 20, 32, n_mels=128,
                     n_vocab=51866, langs=100),
    "large-v3-turbo": _cfg("large-v3-turbo", 1280, 20, 32, l_dec=4,
                           n_mels=128, n_vocab=51866, langs=100),
    # Tiny synthetic config for unit tests / CI (256-byte test tokenizer).
    # 3.0 s window (n_audio_ctx 150): the synth-eval corpus speaks
    # 4-8-word utterances of ~0.3 s/word (eval/synth.py v2), which must
    # fit one window the way real speech fits Whisper's 30 s.
    "test": WhisperConfig(name="test", n_mels=80, n_vocab=2000,
                          n_audio_ctx=150, n_audio_state=64, n_audio_head=2,
                          n_audio_layer=2, n_text_ctx=64, n_text_state=64,
                          n_text_head=2, n_text_layer=2, num_languages=100,
                          dtype=jnp.float32),
}


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Fixed sinusoidal encoder positions (OpenAI layout: [sin | cos])."""
    assert channels % 2 == 0
    log_timescale_increment = math.log(10000) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment
                            * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)],
                          axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Parameter init (random weights; real checkpoints come from convert/from_hf)
# ---------------------------------------------------------------------------

def _dense_init(key, d_in, d_out, dtype):
    scale = 1.0 / math.sqrt(d_in)
    return (jax.random.normal(key, (d_in, d_out)) * scale).astype(dtype)


def _attn_init(key, d, dtype):
    ks = jax.random.split(key, 4)
    return {
        "q_w": _dense_init(ks[0], d, d, dtype), "q_b": jnp.zeros(d, dtype),
        "k_w": _dense_init(ks[1], d, d, dtype),            # no k bias
        "v_w": _dense_init(ks[2], d, d, dtype), "v_b": jnp.zeros(d, dtype),
        "o_w": _dense_init(ks[3], d, d, dtype), "o_b": jnp.zeros(d, dtype),
    }


def _ln_init(d, dtype):
    return {"g": jnp.ones(d, dtype), "b": jnp.zeros(d, dtype)}


def _block_init(key, d, dtype, cross: bool):
    ks = jax.random.split(key, 4)
    blk = {
        "ln1": _ln_init(d, dtype),
        "attn": _attn_init(ks[0], d, dtype),
        "ln2": _ln_init(d, dtype),
        "mlp": {
            "fc1_w": _dense_init(ks[1], d, 4 * d, dtype),
            "fc1_b": jnp.zeros(4 * d, dtype),
            "fc2_w": _dense_init(ks[2], 4 * d, d, dtype),
            "fc2_b": jnp.zeros(d, dtype),
        },
    }
    if cross:
        blk["lnx"] = _ln_init(d, dtype)
        blk["xattn"] = _attn_init(ks[3], d, dtype)
    return blk


def _stack_blocks(keys, d, dtype, cross):
    blocks = [_block_init(k, d, dtype, cross) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def init_params_host(seed: int, cfg: WhisperConfig,
                     quantize_int8: bool = False) -> Params:
    """Numpy twin of init_params (same tree structure and scales).

    For billion-param synthetic-weight loads: threefry sampling is
    minutes on a single host core, and the eager per-leaf device path
    queues dozens of tiny compiles on some backends (each a multi-second
    stall).  Numpy generates the same-shaped pytree on the host; the
    arrays ship to the accelerator once, at first jitted use.

    ``quantize_int8`` emits the block matmul weights directly in the
    quantized {q: int8, s: f32} form ops.quant.quantize_params would
    produce — one random byte per weight, no float intermediates.  (The
    f32->bf16 cast paths churn gigabytes of temporaries, which this
    host's kernel services at an erratic 10-100x slowdown; int8 synthesis
    sidesteps that entirely for the dominant tensors.)"""
    import ml_dtypes
    bf16 = cfg.dtype == jnp.bfloat16
    dtype = ml_dtypes.bfloat16 if bf16 else np.dtype(cfg.dtype)
    rng = np.random.default_rng(seed)
    d = cfg.n_audio_state

    def cast(x_f32):
        if not bf16:
            return x_f32.astype(dtype)
        # round-to-nearest-even f32 -> bf16 via integer ops: ml_dtypes'
        # astype is a scalar loop (minutes for billion-param configs),
        # this is three vectorized passes (no NaN/inf in random weights)
        u = np.ascontiguousarray(x_f32, np.float32).view(np.uint32)
        r = (u + 0x7FFF + ((u >> 16) & 1)) >> 16
        return r.astype(np.uint16).view(ml_dtypes.bfloat16)

    def dense(d_in, d_out):
        if quantize_int8:
            # zero-filled int8: calloc'd pages are zero-page backed, so
            # synthesis is near-free even for billions of weights (this
            # host's kernel services written-page churn erratically
            # slowly).  TPU matmul timing is value-independent — shapes,
            # dtypes and HBM bytes are identical to a real quantized
            # checkpoint — and the residual stream keeps activations
            # well-defined (blocks add zero; norms see the nonzero conv/
            # embedding path), so the decode loop runs its full token
            # budget exactly like any other non-terminating random model.
            q = np.zeros((d_in, d_out), np.int8)
            s = np.full((d_out,), 1.0 / (73.9 * math.sqrt(d_in)),
                        np.float32)
            return {"q": q, "s": s}
        return cast(rng.standard_normal((d_in, d_out), np.float32)
                    * (1.0 / math.sqrt(d_in)))

    def attn():
        return {
            "q_w": dense(d, d), "q_b": np.zeros(d, dtype),
            "k_w": dense(d, d),                    # no k bias
            "v_w": dense(d, d), "v_b": np.zeros(d, dtype),
            "o_w": dense(d, d), "o_b": np.zeros(d, dtype),
        }

    def ln():
        return {"g": np.ones(d, dtype), "b": np.zeros(d, dtype)}

    def block(cross):
        blk = {
            "ln1": ln(), "attn": attn(), "ln2": ln(),
            "mlp": {"fc1_w": dense(d, 4 * d),
                    "fc1_b": np.zeros(4 * d, dtype),
                    "fc2_w": dense(4 * d, d),
                    "fc2_b": np.zeros(d, dtype)},
        }
        if cross:
            blk["lnx"] = ln()
            blk["xattn"] = attn()
        return blk

    def stack(n, cross):
        blocks = [block(cross) for _ in range(n)]
        return jax.tree.map(lambda *xs: np.stack(xs), *blocks)

    def emb(n, scale):
        if quantize_int8:
            # zero embeddings keep synthesis off the erratic host memory
            # path; decode argmax then repeats a sub-EOT token id, so the
            # loop still runs its full budget (the timing contract)
            return np.zeros((n, d), dtype)
        return cast(rng.standard_normal((n, d), np.float32) * scale)

    conv_scale = 1.0 / math.sqrt(3 * cfg.n_mels)
    return {
        "encoder": {
            "pos": cast(sinusoids(cfg.n_audio_ctx, d)),
            "conv1_w": cast(rng.standard_normal((3, cfg.n_mels, d),
                                                np.float32) * conv_scale),
            "conv1_b": np.zeros(d, dtype),
            "conv2_w": cast(rng.standard_normal((3, d, d), np.float32)
                            * (1.0 / math.sqrt(3 * d))),
            "conv2_b": np.zeros(d, dtype),
            "blocks": stack(cfg.n_audio_layer, cross=False),
            "ln_post": ln(),
        },
        "decoder": {
            "tok_emb": emb(cfg.n_vocab, 0.02),
            "pos_emb": emb(cfg.n_text_ctx, 0.02),
            "blocks": stack(cfg.n_text_layer, cross=True),
            "ln": ln(),
        },
    }


def init_params(key, cfg: WhisperConfig) -> Params:
    """Random-weight model (tests & synthetic benchmarks)."""
    dtype = cfg.dtype
    d = cfg.n_audio_state
    k_enc, k_dec, k_conv1, k_conv2, k_tok, k_pos = jax.random.split(key, 6)
    enc_keys = jax.random.split(k_enc, cfg.n_audio_layer)
    dec_keys = jax.random.split(k_dec, cfg.n_text_layer)
    conv_scale = 1.0 / math.sqrt(3 * cfg.n_mels)
    return {
        "encoder": {
            "pos": jnp.asarray(sinusoids(cfg.n_audio_ctx, d), dtype),
            "conv1_w": (jax.random.normal(k_conv1, (3, cfg.n_mels, d))
                        * conv_scale).astype(dtype),
            "conv1_b": jnp.zeros(d, dtype),
            "conv2_w": (jax.random.normal(k_conv2, (3, d, d))
                        * (1.0 / math.sqrt(3 * d))).astype(dtype),
            "conv2_b": jnp.zeros(d, dtype),
            "blocks": _stack_blocks(enc_keys, d, dtype, cross=False),
            "ln_post": _ln_init(d, dtype),
        },
        "decoder": {
            "tok_emb": (jax.random.normal(k_tok, (cfg.n_vocab, d))
                        * 0.02).astype(dtype),
            "pos_emb": (jax.random.normal(k_pos, (cfg.n_text_ctx, d))
                        * 0.02).astype(dtype),
            "blocks": _stack_blocks(dec_keys, d, dtype, cross=True),
            "ln": _ln_init(d, dtype),
        },
    }


# ---------------------------------------------------------------------------
# Forward pieces
# ---------------------------------------------------------------------------

def _layer_norm(x, ln):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    return (y * ln["g"].astype(jnp.float32)
            + ln["b"].astype(jnp.float32)).astype(x.dtype)


def _split_heads(x, n_head):
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def _qkv(x, attn, xa=None):
    """Project q from x and k,v from xa (or x for self-attention)."""
    src = x if xa is None else xa
    q = mm(x, attn["q_w"]) + attn["q_b"]
    k = mm(src, attn["k_w"])
    v = mm(src, attn["v_w"]) + attn["v_b"]
    return q, k, v


def _sdpa(q, k, v, n_head, mask=None, use_flash=False):
    """Scaled dot-product attention over [B, T, D] projections."""
    qh = _split_heads(q, n_head)
    kh = _split_heads(k, n_head)
    vh = _split_heads(v, n_head)
    if use_flash and mask is None:
        from ..ops.attention import flash_attention
        out = flash_attention(qh, kh, vh)
        return _merge_heads(out)
    dh = qh.shape[-1]
    scale = dh ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(qh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    return _merge_heads(out)


def _mlp(x, mlp):
    h = mm(x, mlp["fc1_w"]) + mlp["fc1_b"]
    h = jax.nn.gelu(h, approximate=False)
    return mm(h, mlp["fc2_w"]) + mlp["fc2_b"]


# -- encoder -----------------------------------------------------------------

def _conv1d(x, w, b, stride):
    """x [B, T, C_in], w [K, C_in, C_out] -> [B, T/stride, C_out], SAME pad."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32)
    return (y + b.astype(jnp.float32)).astype(x.dtype)


@partial(jax.jit, static_argnames=("cfg", "use_flash"))
def encode(params: Params, mel: jnp.ndarray, cfg: WhisperConfig,
           use_flash: bool = False) -> jnp.ndarray:
    """mel [B, n_mels, T_frames] -> audio states [B, T_frames//2, d]."""
    enc = params["encoder"]
    x = mel.astype(cfg.dtype).transpose(0, 2, 1)          # [B, T, n_mels]
    x = jax.nn.gelu(_conv1d(x, enc["conv1_w"], enc["conv1_b"], 1),
                    approximate=False)
    x = jax.nn.gelu(_conv1d(x, enc["conv2_w"], enc["conv2_b"], 2),
                    approximate=False)                    # [B, T/2, d]
    x = x + enc["pos"][: x.shape[1]].astype(cfg.dtype)

    n_head = cfg.n_audio_head

    def block_fn(carry, blk):
        h = carry
        a_in = _layer_norm(h, blk["ln1"])
        q, k, v = _qkv(a_in, blk["attn"])
        h = h + (mm(_sdpa(q, k, v, n_head, use_flash=use_flash),
                    blk["attn"]["o_w"]) + blk["attn"]["o_b"])
        m_in = _layer_norm(h, blk["ln2"])
        h = h + _mlp(m_in, blk["mlp"])
        return h, None

    x, _ = jax.lax.scan(block_fn, x, enc["blocks"])
    return _layer_norm(x, enc["ln_post"])


# -- decoder -----------------------------------------------------------------

def precompute_cross_kv(params: Params, xa: jnp.ndarray,
                        cfg: WhisperConfig, quantize: bool = False,
                        scale_dtype=jnp.float32):
    """Cross-attention K/V for all layers from encoder output xa [B, Ta, d].

    Returns (k, v) TRANSPOSED to [L, B, H, dh, Ta]; computed once per
    segment, reused by every decode step.  Layout matters: with dh (64) on
    the minor axis the TPU pads it to the 128-lane tile — a 2x expansion of
    the decode loop's dominant HBM tensor; with Ta (1500) minor the padding
    is ~2%, halving the bytes every step reads.

    With ``quantize``, each layer's K/V is int8-quantized INSIDE the scan
    body (the quantize_cross_kv semantics), so the full-precision tensor
    never materializes across layers — at large-v3 batch 32 the bf16
    intermediate alone is ~7 GB of HBM, enough to OOM a 16 GB chip.
    Returns the (k_q, k_s, v_q, v_s) 4-tuple in that case.
    """
    n_head = cfg.n_text_head

    def layer_kv(_, blk):
        k = _split_heads(mm(xa, blk["xattn"]["k_w"]), n_head)
        v = _split_heads(mm(xa, blk["xattn"]["v_w"]) + blk["xattn"]["v_b"],
                         n_head)
        k, v = jnp.swapaxes(k, -1, -2), jnp.swapaxes(v, -1, -2)
        if quantize:
            # one quantization recipe for both entry points
            return None, quantize_cross_kv((k, v), scale_dtype=scale_dtype)
        return None, (k, v)

    _, out = jax.lax.scan(layer_kv, None, params["decoder"]["blocks"])
    return out


def quantize_cross_kv(cross_kv, scale_dtype=jnp.float32):
    """Per-position symmetric int8 for the cross-attention K/V.

    The decode loop re-reads the full cross K/V every step (~7.9 GB/step at
    large-v3 batch 16) — the dominant HBM term.  Per-(layer,batch,head,pos)
    scales commute exactly out of the attention dots:
    (q . k_q[t]) * s_k[t] for scores and (p[t] * s_v[t]) @ v_q for values,
    so the only approximation is int8 rounding of K/V themselves.
    Takes/returns the transposed [..., dh, T] layout:
    (k_q, k_s, v_q, v_s) with scales shaped [..., 1, T] ``scale_dtype``.

    ``scale_dtype=bfloat16`` halves the scale read per step (scales are
    2/dh of the int8 payload — 3.1 % vs 6.3 % at dh=64; VERDICT r4 #8).
    Quantisation still divides by the ROUNDED bf16 scale so the int8
    codes stay exact for it; the only extra error is bf16 rounding of the
    per-position max (<=0.4 % relative), on top of int8's ~0.8 %.
    """
    def q(x):
        x32 = x.astype(jnp.float32)
        s = jnp.max(jnp.abs(x32), axis=-2, keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-8).astype(scale_dtype)
        qx = jnp.clip(jnp.round(x32 / s.astype(jnp.float32)),
                      -127, 127).astype(jnp.int8)
        return qx, s
    k, v = cross_kv
    k_q, k_s = q(k)
    v_q, v_s = q(v)
    return k_q, k_s, v_q, v_s


def init_kv_cache(cfg: WhisperConfig, batch: int, max_len: Optional[int] = None
                  ) -> Tuple[Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]]:
    """Self-attention KV cache as PER-LAYER arrays [B, H, dh, max_len].

    Returns (k_layers, v_layers), each a length-L tuple.  Two TPU reasons
    for per-layer (not [L, ...]-stacked) caches in the decode loop:

    - each layer's update is a dynamic_update_slice on its OWN while-loop
      carry element, which XLA turns into a true in-place write; a stacked
      cache scanned as lax.scan xs/ys re-materialized the full stack every
      token (measured: two 152 MB copies + fresh ys allocations per step
      at large-v3 batch 16 — more HBM traffic than the attention itself);
    - loop-carried stacked caches were also assigned a dh-minor layout
      (dh=64 padded to the 128-lane tile), doubling every read; per-layer
      arrays keep the position axis on the lane tile as designed.

    Transposed like the cross K/V: position on the 128-lane tile instead
    of the 64-wide head dim (which would pad 2x)."""
    max_len = max_len or cfg.n_text_ctx
    shape = (batch, cfg.n_text_head,
             cfg.n_text_state // cfg.n_text_head, max_len)
    k = tuple(jnp.zeros(shape, cfg.dtype) for _ in range(cfg.n_text_layer))
    v = tuple(jnp.zeros(shape, cfg.dtype) for _ in range(cfg.n_text_layer))
    return k, v


def unstack_layers(blocks, n_layers: int) -> tuple:
    """Stacked [L, ...] block pytree -> tuple of per-layer pytrees.

    Static slices: XLA executes them once per program (outside any decode
    loop), so the unrolled decode step reads each layer's weights directly
    instead of dynamic-slicing a stacked tensor every iteration."""
    return tuple(jax.tree.map(lambda x: x[layer], blocks)
                 for layer in range(n_layers))


def unstack_decoder(params: Params, cfg: WhisperConfig) -> Dict[str, Any]:
    """Decoder params with blocks unstacked per layer (see unstack_layers)."""
    dec = params["decoder"]
    return {"tok_emb": dec["tok_emb"], "pos_emb": dec["pos_emb"],
            "ln": dec["ln"],
            "layers": unstack_layers(dec["blocks"], cfg.n_text_layer)}


def unstack_cross_kv(cross_kv, n_layers: int) -> tuple:
    """Stacked cross K/V ((k, v) of [L, B, H, dh, Ta] or the int8 4-tuple)
    -> tuple of per-layer tuples, for the unrolled decode step."""
    return tuple(tuple(x[layer] for x in cross_kv)
                 for layer in range(n_layers))


def pad_cross_kv(cross_kv, multiple: int = 128):
    """Pad the cross-KV position axis up to a lane-tile multiple.

    The fused decode-step kernels (ops/decode_attention.py) take whole-
    array blocks whose last dim must tile to 128 lanes; padding ONCE here
    (scales padded with zeros) avoids a per-step jnp.pad copy of the
    loop's dominant HBM tensor inside the decode while_loop.  The true
    valid length is passed to the kernels separately (``cross_len``)."""
    ta = cross_kv[0].shape[-1]
    ta_pad = -(-ta // multiple) * multiple
    if ta_pad == ta:
        return cross_kv
    pad = [(0, 0)] * (cross_kv[0].ndim - 1) + [(0, ta_pad - ta)]
    return tuple(jnp.pad(x, pad) for x in cross_kv)


def _cross_attend_fused(xq, xkv, kv_len: int):
    """Fused-kernel cross attention (decode steps, q_len=1)."""
    from ..ops.decode_attention import (decode_cross_attention,
                                        decode_cross_attention_int8)
    if len(xkv) == 2:
        return decode_cross_attention(xq, *xkv, kv_len=kv_len)
    return decode_cross_attention_int8(xq, *xkv, kv_len=kv_len)


def _cross_attend(xq, xkv, dh):
    """Cross attention scores/values; xkv is transposed (k, v) of
    [B, H, dh, T] or the int8 4-tuple from quantize_cross_kv (scales
    commute out of the dots exactly)."""
    if len(xkv) == 2:
        x_k, x_v = xkv
        xscores = jnp.einsum("bhqd,bhdk->bhqk", xq, x_k,
                             preferred_element_type=jnp.float32) * dh ** -0.5
        xprobs = jax.nn.softmax(xscores, axis=-1).astype(xq.dtype)
        return jnp.einsum("bhqk,bhdk->bhqd", xprobs, x_v)
    k_q, k_s, v_q, v_s = xkv
    xscores = jnp.einsum("bhqd,bhdk->bhqk", xq, k_q.astype(xq.dtype),
                         preferred_element_type=jnp.float32) * dh ** -0.5
    xscores = xscores * k_s[..., 0, :][:, :, None, :]
    xprobs = jax.nn.softmax(xscores, axis=-1)
    xprobs = (xprobs * v_s[..., 0, :][:, :, None, :]).astype(xq.dtype)
    return jnp.einsum("bhqk,bhdk->bhqd", xprobs, v_q.astype(xq.dtype))


def _decoder_block(h, blk, n_head, self_k, self_v, self_mask, xkv,
                   fused_pos=None, cross_len: int = 0):
    """One decoder block given explicit self-attn K/V ([B, H, dh, T]
    transposed) and cross K/V.

    With ``fused_pos`` (decode steps, q_len=1) both attentions run as
    single Pallas kernels (ops/decode_attention.py): K/V stream through
    VMEM once, dequant/softmax stay on-chip, no score tensor touches HBM.
    ``cross_len`` is the true cross length when xkv was pre-padded."""
    a_in = _layer_norm(h, blk["ln1"])
    q = _split_heads(mm(a_in, blk["attn"]["q_w"]) + blk["attn"]["q_b"],
                     n_head)
    dh = q.shape[-1]
    if fused_pos is not None:
        from ..ops.decode_attention import decode_self_attention
        attn_out = _merge_heads(
            decode_self_attention(q, self_k, self_v, fused_pos))
    else:
        scores = jnp.einsum("bhqd,bhdk->bhqk", q, self_k,
                            preferred_element_type=jnp.float32) * dh ** -0.5
        if self_mask is not None:
            scores = scores + self_mask
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        attn_out = _merge_heads(jnp.einsum("bhqk,bhdk->bhqd", probs, self_v))
    h = h + (mm(attn_out, blk["attn"]["o_w"]) + blk["attn"]["o_b"])

    x_in = _layer_norm(h, blk["lnx"])
    xq = _split_heads(mm(x_in, blk["xattn"]["q_w"]) + blk["xattn"]["q_b"],
                      n_head)
    if fused_pos is not None:
        xout = _merge_heads(_cross_attend_fused(xq, xkv, cross_len))
    else:
        xout = _merge_heads(_cross_attend(xq, xkv, dh))
    h = h + (mm(xout, blk["xattn"]["o_w"]) + blk["xattn"]["o_b"])

    m_in = _layer_norm(h, blk["ln2"])
    h = h + _mlp(m_in, blk["mlp"])
    return h


@partial(jax.jit, static_argnames=("cfg",))
def decoder_forward(params: Params, tokens: jnp.ndarray, xa: jnp.ndarray,
                    cfg: WhisperConfig, pos_offset: int = 0,
                    kv_cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                    cross_kv=None,
                    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Teacher-forced / prefill decoder pass.

    tokens [B, T] -> logits [B, T, n_vocab].  If ``kv_cache`` given (shape
    [L, B, H, dh, max_len], transposed), writes K/V at positions
    [pos_offset, pos_offset+T) and attends over the full prefix; returns the
    updated cache for the decode loop to continue from.

    ``cross_kv`` takes an already-computed cross K/V — either the bf16
    (k, v) pair or the int8 4-tuple from ``precompute_cross_kv`` — so
    decode-loop prefills reuse the quantized tensors instead of
    re-projecting a full-precision copy inside the same program (at
    large-v3 batch 32 that bf16 intermediate alone is ~7 GB of HBM).
    ``xa`` may be None when ``cross_kv`` is supplied.

    ``kv_cache`` is the per-layer format of init_kv_cache; the prefill
    stacks it for one lax.scan over layers (a one-time copy per segment
    batch — unlike the decode loop, prefill runs once) and unstacks the
    result for the unrolled decode steps that follow.
    """
    dec = params["decoder"]
    n_head = cfg.n_text_head
    b, t = tokens.shape

    if kv_cache is None and pos_offset:
        # without a pre-sized cache the K/V write would clamp to slot 0
        # while the causal mask still assumes absolute positions — queries
        # would silently attend to their own future
        raise ValueError("decoder_forward with pos_offset > 0 requires a "
                         "kv_cache sized for pos_offset + T")

    pos = jax.lax.dynamic_slice_in_dim(dec["pos_emb"], pos_offset, t, axis=0)
    x = (dec["tok_emb"][tokens] + pos).astype(cfg.dtype)

    xkv_stacked = (precompute_cross_kv(params, xa, cfg)
                   if cross_kv is None else cross_kv)

    if kv_cache is None:
        max_len = t
        shape = (cfg.n_text_layer, b, n_head,
                 cfg.n_text_state // n_head, max_len)
        cache_k = jnp.zeros(shape, cfg.dtype)
        cache_v = jnp.zeros(shape, cfg.dtype)
    else:
        k_layers, v_layers = kv_cache
        cache_k = jnp.stack(k_layers)
        cache_v = jnp.stack(v_layers)
        max_len = cache_k.shape[-1]

    # causal mask over cache positions: query i (abs pos_offset+i) sees
    # cache slots <= pos_offset+i
    q_pos = pos_offset + jnp.arange(t)[:, None]
    k_pos = jnp.arange(max_len)[None, :]
    mask = jnp.where(k_pos <= q_pos, 0.0, -jnp.inf).astype(jnp.float32)

    def block_fn(carry, scanned):
        h = carry
        blk, ck, cv, xkv = scanned
        a_in = _layer_norm(h, blk["ln1"])
        new_k = _split_heads(mm(a_in, blk["attn"]["k_w"]), n_head)
        new_v = _split_heads(mm(a_in, blk["attn"]["v_w"])
                             + blk["attn"]["v_b"], n_head)
        ck = jax.lax.dynamic_update_slice(
            ck, jnp.swapaxes(new_k, -1, -2).astype(ck.dtype),
            (0, 0, 0, pos_offset))
        cv = jax.lax.dynamic_update_slice(
            cv, jnp.swapaxes(new_v, -1, -2).astype(cv.dtype),
            (0, 0, 0, pos_offset))
        h = _decoder_block(h, blk, n_head, ck, cv, mask, xkv)
        return h, (ck, cv)

    x, (new_ck, new_cv) = jax.lax.scan(
        block_fn, x, (dec["blocks"], cache_k, cache_v, xkv_stacked))

    x = _layer_norm(x, dec["ln"])
    # bf16 operands with f32 accumulation: materializing a f32 copy of the
    # 51866x1280 embedding would cost 265 MB of extra HBM traffic (the MXU
    # accumulates bf16 dots in f32 natively)
    logits = jnp.einsum("btd,vd->btv", x, dec["tok_emb"],
                        preferred_element_type=jnp.float32)
    new_cache = (tuple(new_ck[layer] for layer in range(new_ck.shape[0])),
                 tuple(new_cv[layer] for layer in range(new_cv.shape[0])))
    return logits, new_cache


def decode_step(dec_unstacked: Dict[str, Any], token: jnp.ndarray,
                pos: jnp.ndarray,
                kv_cache: Tuple[tuple, tuple],
                cross_layers: tuple,
                cfg: WhisperConfig, use_fused: bool = False,
                cross_len: int = 0,
                ) -> Tuple[jnp.ndarray, Tuple[tuple, tuple]]:
    """Single decode step (traced inside the decode loop's while body).

    token [B] int32, pos scalar int32 -> (logits [B, n_vocab], new cache).

    ``dec_unstacked``: per-layer decoder params from ``unstack_decoder``;
    ``kv_cache``: per-layer (k_layers, v_layers) from ``init_kv_cache``;
    ``cross_layers``: per-layer cross K/V from ``unstack_cross_kv``.

    The layer loop is UNROLLED (the JetStream/MaxText pattern for TPU
    decode): each layer's cache update is an in-place dynamic_update_slice
    on its own while-carry array and each layer's weights/cross-KV are
    plain loop-invariant arrays — a lax.scan over stacked layers instead
    re-materialized the full cache every token and pushed the cache into a
    dh-minor layout that padded every read 2x (measured 0.66 -> see
    tools/bench_decode_step.py).

    ``use_fused`` routes both attentions to the fused Pallas decode
    kernels (TPU); ``cross_len`` is the true cross length when the cross
    K/V was padded with pad_cross_kv.
    """
    dec = dec_unstacked
    n_head = cfg.n_text_head
    k_layers, v_layers = kv_cache
    max_len = k_layers[0].shape[-1]

    x = dec["tok_emb"][token] + jax.lax.dynamic_index_in_dim(
        dec["pos_emb"], pos, axis=0, keepdims=False)
    h = x[:, None, :].astype(cfg.dtype)                    # [B, 1, d]

    # valid cache slots: <= pos
    mask = jnp.where(jnp.arange(max_len)[None, :] <= pos,
                     0.0, -jnp.inf).astype(jnp.float32)

    new_k: list = []
    new_v: list = []
    for blk, ck, cv, xkv in zip(dec["layers"], k_layers, v_layers,
                                cross_layers):
        a_in = _layer_norm(h, blk["ln1"])
        k_proj = _split_heads(mm(a_in, blk["attn"]["k_w"]), n_head)
        v_proj = _split_heads(mm(a_in, blk["attn"]["v_w"])
                              + blk["attn"]["v_b"], n_head)
        ck = jax.lax.dynamic_update_slice(
            ck, jnp.swapaxes(k_proj, -1, -2).astype(ck.dtype), (0, 0, 0, pos))
        cv = jax.lax.dynamic_update_slice(
            cv, jnp.swapaxes(v_proj, -1, -2).astype(cv.dtype), (0, 0, 0, pos))
        h = _decoder_block(h, blk, n_head, ck, cv, mask, xkv,
                           fused_pos=pos if use_fused else None,
                           cross_len=cross_len)
        new_k.append(ck)
        new_v.append(cv)

    x = _layer_norm(h, dec["ln"])[:, 0, :]
    # bf16 x bf16 -> f32 accumulate (see decoder_forward's logits note)
    logits = jnp.einsum("bd,vd->bv", x, dec["tok_emb"],
                        preferred_element_type=jnp.float32)
    return logits, (tuple(new_k), tuple(new_v))
