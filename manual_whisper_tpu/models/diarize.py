"""Speaker diarization: embeddings + clustering + speaker assignment.

Replaces the pyannote.audio 3.1 pipeline the reference drives through
``whisperx.diarize.DiarizationPipeline`` and
``whisperx.assign_word_speakers`` (reference: transcribe.py:142-145; gated
models .env.example:4-5).  Structure mirrors pyannote 3.1:

1. local speaker activities from the PyanNet segmentation model
   (models/vad.py) over sliding windows — or VAD regions when no
   segmentation weights are available;
2. a speaker-embedding model per active region: ResNet34 with temporal
   statistics pooling over log-mel features (wespeaker-voxceleb layout) in
   JAX — or a spectral-statistics fallback embedding for weightless
   environments;
3. agglomerative clustering (cosine, average linkage) on host numpy with
   threshold / num_speakers control;
4. interval-overlap voting to attach speakers to segments and words
   (pure Python, matching whisperx.assign_word_speakers semantics).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mel import unnormalized_log_mel
from .vad import VadOptions, VoiceActivityDetector

SAMPLE_RATE = 16000


# ---------------------------------------------------------------------------
# Embedding model: ResNet34 + temporal stats pooling (wespeaker layout)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class EmbeddingConfig:
    n_mels: int = 80
    channels: Tuple[int, ...] = (32, 64, 128, 256)
    blocks: Tuple[int, ...] = (3, 4, 6, 3)       # ResNet34
    embed_dim: int = 256

    @classmethod
    def tiny_test(cls) -> "EmbeddingConfig":
        return cls(n_mels=80, channels=(8, 16, 16, 32), blocks=(1, 1, 1, 1),
                   embed_dim=32)


def _conv2d(x, w, stride):
    # torch-style symmetric padding (wespeaker uses Conv2d(..., padding=1)):
    # XLA's SAME pads (0, 1) under stride 2 on even inputs, which shifts
    # the sampling grid off torch's and breaks checkpoint parity
    kh, kw = int(w.shape[0]), int(w.shape[1])
    pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(x, p):
    inv = jax.lax.rsqrt(p["var"] + 1e-5)
    return (x - p["mean"]) * inv * p["g"] + p["b"]


def _basic_block(x, p, stride):
    y = jax.nn.relu(_bn(_conv2d(x, p["conv1_w"], stride), p["bn1"]))
    y = _bn(_conv2d(y, p["conv2_w"], 1), p["bn2"])
    if "down_w" in p:
        x = _bn(_conv2d(x, p["down_w"], stride), p["down_bn"])
    return jax.nn.relu(x + y)


@partial(jax.jit, static_argnames=("cfg",))
def embed_forward(params: Dict[str, Any], feats: jnp.ndarray,
                  cfg: EmbeddingConfig) -> jnp.ndarray:
    """feats [B, T, n_mels] (log-mel) -> L2-normalised embeddings [B, D].

    Variable-length batching note (measured on the synth eval, round 3):
    clips are zero-padded to length buckets.  The pooled statistics see
    the pad floor, which in principle skews mean/std by pad fraction —
    but both alternatives measured WORSE with the trained checkpoint
    (clip-tiling: DER 0.094/0.250 vs 0.066/0.228 on the 3/4-speaker
    conditions; masked pooling: cos 0.81 to the unpadded embedding with
    random weights — the deep conv receptive field smears the pad floor
    into the valid frames either way, and training also saw
    silence-padded clips).  Revisit with converted real wespeaker
    weights (pyannote itself pools with masks)."""
    x = feats[..., None].astype(jnp.float32)       # [B, T, F, 1]
    x = jax.nn.relu(_bn(_conv2d(x, params["stem_w"], 1), params["stem_bn"]))
    for si, stage in enumerate(params["stages"]):
        for bi, blk in enumerate(stage):
            stride = 2 if (si > 0 and bi == 0) else 1
            x = _basic_block(x, blk, stride)
    # temporal statistics pooling over time, wespeaker TSTP semantics:
    # flatten order (C, F) to match seg_1's weight layout, unbiased
    # variance (torch.var default), eps inside the sqrt
    b, t, f, c = x.shape
    x = x.transpose(0, 1, 3, 2).reshape(b, t, c * f)
    mean = x.mean(axis=1)
    std = jnp.sqrt(x.var(axis=1, ddof=1) + 1e-7)
    stats = jnp.concatenate([mean, std], axis=-1)
    emb = stats @ params["fc_w"] + params["fc_b"]
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True).clip(1e-8)


def init_embedding_params(key, cfg: EmbeddingConfig) -> Dict[str, Any]:
    """Random init (tests / weightless fallback experiments)."""
    ks = iter(jax.random.split(key, 256))

    def conv(k, kh, kw, ci, co):
        return np.asarray(jax.random.normal(k, (kh, kw, ci, co))
                          / np.sqrt(kh * kw * ci), np.float32)

    def bn(c):
        return {"g": np.ones(c, np.float32), "b": np.zeros(c, np.float32),
                "mean": np.zeros(c, np.float32),
                "var": np.ones(c, np.float32)}

    stages = []
    c_in = cfg.channels[0]
    for si, (c_out, n_blocks) in enumerate(zip(cfg.channels, cfg.blocks)):
        stage = []
        for bi in range(n_blocks):
            blk = {
                "conv1_w": conv(next(ks), 3, 3,
                                c_in if bi == 0 else c_out, c_out),
                "bn1": bn(c_out),
                "conv2_w": conv(next(ks), 3, 3, c_out, c_out),
                "bn2": bn(c_out),
            }
            if bi == 0 and (c_in != c_out or si > 0):
                blk["down_w"] = conv(next(ks), 1, 1, c_in, c_out)
                blk["down_bn"] = bn(c_out)
            stage.append(blk)
            c_in = c_out
        stages.append(stage)

    # after 3 stride-2 stages the freq axis is n_mels/8
    feat = (cfg.n_mels // 8) * cfg.channels[-1]
    return {
        "stem_w": conv(next(ks), 3, 3, 1, cfg.channels[0]),
        "stem_bn": bn(cfg.channels[0]),
        "stages": stages,
        "fc_w": np.asarray(jax.random.normal(next(ks),
                                             (2 * feat, cfg.embed_dim))
                           / np.sqrt(2 * feat), np.float32),
        "fc_b": np.zeros(cfg.embed_dim, np.float32),
    }


def convert_wespeaker_resnet(state_dict, cfg: EmbeddingConfig
                             ) -> Dict[str, Any]:
    """torchvision-style ResNet speaker checkpoint -> our pytree.

    Expects wespeaker's ResNet34 naming (conv1/bn1, layerN.M.convK/bnK,
    layerN.0.downsample.{0,1}, embedding linear at seg_1 or bottleneck),
    optionally behind a prefix like ``resnet.`` (pyannote wrapping).
    BatchNorm running stats fold into the inference-only _bn.
    """
    def npy(t):
        import torch
        return (t.detach().cpu().numpy()
                if isinstance(t, torch.Tensor) else np.asarray(t))

    sd = {k: npy(v) for k, v in state_dict.items()}
    prefixes = ("", "resnet.", "speaker_encoder.", "model.")
    prefix = next((p for p in prefixes if f"{p}conv1.weight" in sd), None)
    if prefix is None:
        raise KeyError("no conv1.weight found under known prefixes")

    def g(name):
        return sd[f"{prefix}{name}"]

    def conv(name):
        # torch conv2d [out, in, kh, kw] with kh over FREQ and kw over TIME
        # (wespeaker feeds [B, 1, F, T]); our NHWC layout is [B, T, F, C],
        # so the kernel's time axis (kw) must land on H and freq (kh) on W
        return g(name).transpose(3, 2, 1, 0)

    def bn(name):
        return {"g": g(f"{name}.weight"), "b": g(f"{name}.bias"),
                "mean": g(f"{name}.running_mean"),
                "var": g(f"{name}.running_var")}

    stages = []
    for si in range(1, len(cfg.blocks) + 1):
        stage = []
        bi = 0
        while f"{prefix}layer{si}.{bi}.conv1.weight" in sd:
            blk = {
                "conv1_w": conv(f"layer{si}.{bi}.conv1.weight"),
                "bn1": bn(f"layer{si}.{bi}.bn1"),
                "conv2_w": conv(f"layer{si}.{bi}.conv2.weight"),
                "bn2": bn(f"layer{si}.{bi}.bn2"),
            }
            if f"{prefix}layer{si}.{bi}.downsample.0.weight" in sd:
                blk["down_w"] = conv(f"layer{si}.{bi}.downsample.0.weight")
                blk["down_bn"] = bn(f"layer{si}.{bi}.downsample.1")
            stage.append(blk)
            bi += 1
        stages.append(stage)

    emb_key = next(
        (k for k in (f"{prefix}seg_1.weight", f"{prefix}bottleneck.weight",
                     f"{prefix}embedding.weight") if k in sd), None)
    if emb_key is None:
        raise KeyError("no embedding linear (seg_1/bottleneck) found")
    fc_w = sd[emb_key].T
    fc_b_key = emb_key.replace("weight", "bias")
    fc_b = sd.get(fc_b_key, np.zeros(fc_w.shape[1], np.float32))

    return {
        "stem_w": conv("conv1.weight"),
        "stem_bn": bn("bn1"),
        "stages": stages,
        "fc_w": fc_w,
        "fc_b": fc_b,
    }


def load_embedding_params(name: str = "wespeaker-voxceleb-resnet34-LM",
                          cfg: Optional[EmbeddingConfig] = None
                          ) -> Optional[Dict[str, Any]]:
    """Speaker-embedding weights from the registry, or None.

    Prefers an orbax checkpoint at <name>/jax (this module's layout,
    e.g. trained by tools/train_synth_embed.py — torch-free); falls back
    to converting a wespeaker torch state dict at <name>/pytorch_model.bin
    (the checkpoint pyannote 3.1 downloads, README.md:58-59)."""
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
                                             "speaker embedding")
            return params
    path = Path(root) / name / "pytorch_model.bin"
    if not path.exists():
        return None
    import torch
    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_wespeaker_resnet(sd, cfg or EmbeddingConfig())


_EMBED_CHUNK = 256  # windows per device dispatch (static shape)


@partial(jax.jit, static_argnames=("n_mels",))
def _stats_emb_jit(batch: jnp.ndarray, frames: jnp.ndarray, n_mels: int
                   ) -> jnp.ndarray:
    """Batched spectral_stats_embedding: rows [C, L] (zero-padded windows),
    per-row valid mel-frame counts [C] -> L2-normalised embs [C, 3*n_mels].

    One device dispatch embeds a whole chunk of sliding windows; the
    per-window eager version costs a host->device round trip each (~0.1 s+
    on a remote chip — minutes over the ~2400 windows of a 1-hour file).
    """
    mel = unnormalized_log_mel(batch, n_mels)            # [C, T, M]
    t = mel.shape[1]
    idx = jnp.arange(t)[None, :, None]
    f = frames[:, None, None]
    mask = (idx < f).astype(mel.dtype)
    cnt = jnp.maximum(frames[:, None].astype(mel.dtype), 1.0)
    mean = (mel * mask).sum(axis=1) / cnt
    var = (((mel - mean[:, None]) ** 2) * mask).sum(axis=1) / cnt
    std = jnp.sqrt(var)
    dmask = (idx[:, :-1] < f - 1).astype(mel.dtype)
    delta = (jnp.abs(mel[:, 1:] - mel[:, :-1]) * dmask).sum(axis=1) \
        / jnp.maximum(cnt - 1.0, 1.0)
    emb = jnp.concatenate([mean, std, delta], axis=-1)
    norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb / jnp.maximum(norm, 1e-12)


def spectral_stats_embedding(audio: np.ndarray, n_mels: int = 40
                             ) -> np.ndarray:
    """Weightless fallback speaker signature: mean/std/delta statistics of
    the log-mel spectrum (enough to separate distinct voices for tests and
    degraded operation; real deployments convert wespeaker weights)."""
    if len(audio) < 400:
        audio = np.pad(audio, (0, 400 - len(audio)))
    mel = np.asarray(unnormalized_log_mel(audio[None], n_mels))[0]
    mean = mel.mean(axis=0)
    std = mel.std(axis=0)
    delta = np.abs(np.diff(mel, axis=0)).mean(axis=0) if len(mel) > 1 \
        else np.zeros_like(mean)
    emb = np.concatenate([mean, std, delta])
    norm = np.linalg.norm(emb)
    return (emb / norm if norm > 0 else emb).astype(np.float32)


# ---------------------------------------------------------------------------
# Agglomerative clustering (cosine, average linkage) — host numpy
# ---------------------------------------------------------------------------

def agglomerative_cluster(embeddings: np.ndarray,
                          threshold: float = 0.7,
                          min_speakers: int = 1,
                          max_speakers: Optional[int] = None) -> np.ndarray:
    """Cluster L2-normalised embeddings; returns labels [N].

    Average-linkage cosine AHC cut at ``threshold``, re-cut to the
    speaker-count bounds when they bind.  Uses scipy's O(n^2) linkage — a
    1-hour recording yields ~2400 sliding windows, where a naive
    pairwise-rescan merge loop takes hours; falls back to that loop only
    when scipy is unavailable.
    """
    n = len(embeddings)
    if n == 0:
        return np.zeros(0, np.int64)
    if n == 1:
        return np.zeros(1, np.int64)
    max_speakers = max_speakers or n
    try:
        from scipy.cluster.hierarchy import fcluster, linkage
        from scipy.spatial.distance import squareform
    except ImportError:
        return _agglomerative_cluster_py(embeddings, threshold,
                                         min_speakers, max_speakers)

    dist = np.clip(1.0 - embeddings @ embeddings.T, 0.0, None)
    np.fill_diagonal(dist, 0.0)
    link = linkage(squareform(dist, checks=False), method="average")
    labels = fcluster(link, t=threshold, criterion="distance") - 1
    k = int(labels.max()) + 1
    if k > max_speakers:      # keep merging past the threshold (as the
        k = max_speakers      # merge loop would) until the cap holds
    elif k < min_speakers:    # never merge below the floor
        k = min(min_speakers, n)
    else:
        k = None
    if k is not None:
        labels = fcluster(link, t=k, criterion="maxclust") - 1
    return _stable_labels(labels)


def constrained_agglomerative_cluster(embeddings: np.ndarray,
                                      groups: np.ndarray,
                                      threshold: float = 0.7,
                                      min_speakers: int = 1,
                                      max_speakers: Optional[int] = None,
                                      cl_trust_floor: float = 0.3
                                      ) -> np.ndarray:
    """Average-linkage cosine AHC with CANNOT-LINK constraints: two
    entries sharing a ``groups`` id never merge into one cluster.

    pyannote-3.1's clustering applies the same rule: distinct local
    speakers of one segmentation window are, by construction, different
    people — an unconstrained merge of two such embeddings is the single
    biggest source of under-clustering (measured here: the 4-speaker
    eval's closest voice pair merged on 1 of 4 files, zeroing one
    speaker's accuracy and double-claiming frames downstream).

    ``cl_trust_floor`` (r5): a cannot-link edge between two clusters is
    ENFORCED only while their (average-linkage) distance exceeds this
    value; closer than it, the edge is treated as a segmentation
    artifact and ignored.  The constraint propagates transitively
    through merges, so windows where segmentation hallucinates one
    voice as two local speakers permanently split that speaker no
    matter the threshold (measured: threshold 0.7→0.85 left the same
    pred-4-of-3 splits at DER 0.22-0.26).  A hallucinated split yields
    embeddings of the SAME voice — near-identical — while genuinely
    distinct speakers in an overlap window are far apart, so distance
    separates trustworthy constraints from artifacts.  The floor is
    applied DYNAMICALLY against the evolving cluster distance, not once
    at entry level: the overlap-heavy segmentation checkpoint
    hallucinates often enough on hour-scale audio that every
    same-speaker cluster pair eventually accumulates an edge (measured:
    60-min 3-spk file predicted 8 speakers, DER 0.357, with entry-level
    dropping only), and the cluster-level average distance is the
    statistic that stays small for same-voice pairs.

    Vectorised Lance-Williams merge loop: O(n^2) memory, argmin over the
    full matrix per merge (n sliding-window entries for an hour of audio
    is ~2-3k, a few seconds of numpy; scipy's linkage cannot express
    constraints)."""
    n = len(embeddings)
    if n <= 1:
        return np.zeros(n, np.int64)
    max_speakers = max_speakers or n
    d = np.clip(1.0 - embeddings @ embeddings.T, 0.0, None
                ).astype(np.float64)
    cannot = np.asarray(groups)[:, None] == np.asarray(groups)[None, :]
    np.fill_diagonal(d, np.inf)
    np.fill_diagonal(cannot, False)
    # an edge only blocks a merge while the pair is far apart (see
    # docstring: near-identical cannot-linked clusters are one voice
    # segmentation split in two, not two people)
    dw = np.where(cannot & (d > cl_trust_floor), np.inf, d)
    size = np.ones(n)
    merged_into = np.arange(n)      # union-find, path-free (small n)
    n_active = n
    while n_active > min_speakers:
        flat = int(np.argmin(dw))
        i, j = divmod(flat, n)
        d_min = dw[i, j]
        if not np.isfinite(d_min):
            # every remaining pair cannot-link.  A user-supplied
            # max_speakers cap still wins over the heuristic constraint
            # (segmentation can hallucinate a second local speaker in a
            # window): keep merging by RAW distance until the cap holds.
            if n_active <= max_speakers:
                break
            flat = int(np.argmin(d))
            i, j = divmod(flat, n)
            d_min = d[i, j]
            if not np.isfinite(d_min):
                break
        elif d_min > threshold and n_active <= max_speakers:
            break
        if j < i:
            i, j = j, i
        # average linkage (Lance-Williams): d(i+j, c)
        new_row = (size[i] * d[i] + size[j] * d[j]) / (size[i] + size[j])
        d[i], d[:, i] = new_row, new_row
        cannot[i] |= cannot[j]
        cannot[:, i] |= cannot[:, j]
        d[i, i] = np.inf
        dw[i] = np.where(cannot[i] & (d[i] > cl_trust_floor),
                         np.inf, d[i])
        dw[:, i] = dw[i]
        d[j], d[:, j] = np.inf, np.inf
        dw[j], dw[:, j] = np.inf, np.inf
        size[i] += size[j]
        merged_into[merged_into == j] = i
        n_active -= 1
    return _stable_labels(merged_into)


def _absorb_small_clusters(labels: np.ndarray, embeddings: np.ndarray,
                           min_size: int = 2, floor: int = 1,
                           groups: Optional[np.ndarray] = None) -> np.ndarray:
    """Reassign clusters with fewer than ``min_size`` members to the
    nearest (cosine, centroid) surviving cluster — pyannote-3.1's
    min_cluster_size rule.  Residual mixture embeddings (overlap frames
    that never occur solo) otherwise mint one-window phantom speakers.
    Never drops below ``floor`` surviving clusters; no-op when every
    cluster is small."""
    if len(labels) == 0:
        return labels
    ids, counts = np.unique(labels, return_counts=True)
    big = [int(i) for i, c in zip(ids, counts) if c >= min_size]
    if not big or len(big) == len(ids):
        return labels
    if len(big) < floor:   # keep the largest `floor` clusters instead
        order = np.argsort(-counts)
        big = [int(ids[i]) for i in order[:floor]]
    centroids = {}
    for g in big:
        c = embeddings[labels == g].mean(axis=0)
        centroids[g] = c / max(float(np.linalg.norm(c)), 1e-8)
    out = labels.copy()
    for g in ids:
        if int(g) in big:
            continue
        members = labels == g
        e = embeddings[members].mean(axis=0)
        e = e / max(float(np.linalg.norm(e)), 1e-8)
        # cannot-link (same segmentation window as a member): absorbing
        # into such a cluster would put two simultaneous local speakers
        # under one label; fall back over the remaining candidates
        allowed = list(centroids)
        if groups is not None:
            member_groups = set(np.asarray(groups)[members].tolist())
            ok = [k for k in centroids
                  if not (member_groups
                          & set(np.asarray(groups)[labels == k].tolist()))]
            if ok:
                allowed = ok
        nearest = max(allowed, key=lambda k: float(e @ centroids[k]))
        out[members] = nearest
    return _stable_labels(out)


def _stable_labels(labels: np.ndarray) -> np.ndarray:
    """Renumber clusters by first appearance (SPEAKER_00 speaks first)."""
    out = np.zeros(len(labels), np.int64)
    remap: Dict[int, int] = {}
    for i, lab in enumerate(labels):
        if lab not in remap:
            remap[lab] = len(remap)
        out[i] = remap[lab]
    return out


def _agglomerative_cluster_py(embeddings: np.ndarray, threshold: float,
                              min_speakers: int, max_speakers: int
                              ) -> np.ndarray:
    """Pure-python merge loop (exact but O(n^3)-ish; small n only)."""
    n = len(embeddings)
    clusters: List[List[int]] = [[i] for i in range(n)]
    dist = 1.0 - embeddings @ embeddings.T

    def avg_dist(a: List[int], b: List[int]) -> float:
        return float(dist[np.ix_(a, b)].mean())

    while len(clusters) > min_speakers:
        best = None
        best_d = np.inf
        for i in range(len(clusters)):
            for j in range(i + 1, len(clusters)):
                d = avg_dist(clusters[i], clusters[j])
                if d < best_d:
                    best_d = d
                    best = (i, j)
        if best is None:
            break
        if best_d > threshold and len(clusters) <= max_speakers:
            break
        i, j = best
        clusters[i] = clusters[i] + clusters[j]
        del clusters[j]

    labels = np.zeros(n, np.int64)
    clusters.sort(key=min)
    for ci, members in enumerate(clusters):
        for m in members:
            labels[m] = ci
    return labels


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------

class DiarizationPipeline:
    """whisperx.diarize.DiarizationPipeline surface (transcribe.py:142-144).

    ``use_auth_token``/``device`` accepted for compatibility; weights come
    from converted checkpoints instead of the HF hub (the reference needs
    the token for the same gated models, README.md:58-59).
    """

    def __init__(self, use_auth_token: Optional[str] = None,
                 device: Optional[str] = None,
                 segmentation_params: Optional[dict] = None,
                 segmentation_cfg=None,
                 embedding_params: Optional[dict] = None,
                 embedding_cfg: Optional[EmbeddingConfig] = None,
                 window_sec: float = 3.0,
                 step_sec: float = 1.5,
                 seg_step_sec: Optional[float] = None,
                 # 0.8 (r5): with the cannot-link trust floor in place,
                 # 0.8 fixes the threshold-sensitive same-speaker splits
                 # (3-spk overlap DER 0.133 -> 0.053) with zero movement
                 # on 2-spk and 4-spk — see tools/der_ablation.py
                 threshold: float = 0.8,
                 min_cluster_size: int = 2,
                 activity_onset: float = 0.5,
                 activity_offset: float = 0.35,
                 powerset_decode: str = "argmax",
                 cl_trust_floor: float = 0.3):
        from .vad import PyanNetConfig, load_segmentation_params
        if segmentation_params is None:
            try:
                segmentation_params = load_segmentation_params()
            except Exception:
                segmentation_params = None
        self.vad = VoiceActivityDetector(
            segmentation_params, segmentation_cfg or PyanNetConfig())
        if embedding_params is None:
            try:
                embedding_params = load_embedding_params(
                    cfg=embedding_cfg or EmbeddingConfig())
            except Exception:
                embedding_params = None
        from .vad import embed_compute_device
        self._embed_device = embed_compute_device()
        if embedding_params is not None:
            if self._embed_device is not None:
                embedding_params = jax.device_put(embedding_params,
                                                  self._embed_device)
            else:
                # orbax restores numpy; commit once or every embed
                # dispatch re-ships the ResNet34 weights (jit does not
                # cache numpy-arg conversions)
                embedding_params = jax.tree.map(jnp.asarray,
                                                embedding_params)
        self.embedding_params = embedding_params
        self.embedding_cfg = embedding_cfg or EmbeddingConfig()
        self.window_sec = window_sec
        self.step_sec = step_sec
        # sliding stride of the PyanNet segmentation windows; None keeps
        # the default half-window overlap (step_sec only governs the
        # weightless windows flow — clamping it here silently discarded
        # sub-half-window values)
        self.seg_step_sec = seg_step_sec
        self.threshold = threshold
        # cannot-link pairs closer than this are segmentation artifacts
        # (one voice split across two local slots), not two people
        self.cl_trust_floor = cl_trust_floor
        # clusters smaller than this reassign to the nearest big cluster
        # (_absorb_small_clusters); pyannote-3.1's min_cluster_size rule
        self.min_cluster_size = min_cluster_size
        # binarisation of the stitched per-global-speaker activities;
        # calibration knobs for the trained segmentation model (its
        # class-weighted training deliberately over-weights overlap
        # classes, which shifts raw probabilities upward)
        self.activity_onset = activity_onset
        self.activity_offset = activity_offset
        # "argmax" = pyannote's Powerset.to_multilabel hard decode;
        # "marginal" sums class probs per speaker (softer, but inflates
        # overlap for class-weight-trained checkpoints)
        self.powerset_decode = powerset_decode

    # _embed pads clips to this ladder (seconds): embed_forward jits per
    # mel length, and the masked active-speaker clips have near-unique
    # lengths — unbucketed, an hour of audio compiles the ResNet hundreds
    # of times (multi-minute each) instead of <= 5 shapes total
    _EMBED_LEN_BUCKETS_SEC = (0.5, 1.0, 2.0, 4.0, 10.0)

    _EMBED_ROW_CHUNK = 32  # rows per bucketed embed dispatch (fixed shape)

    def _len_bucket_samples(self, n: int) -> int:
        for sec in self._EMBED_LEN_BUCKETS_SEC:
            if n <= int(sec * SAMPLE_RATE):
                return int(sec * SAMPLE_RATE)
        return int(self._EMBED_LEN_BUCKETS_SEC[-1] * SAMPLE_RATE)

    def _embed(self, clip: np.ndarray) -> np.ndarray:
        return self._embed_clips([clip])[0]

    def _embed_clips(self, clips) -> np.ndarray:
        """Variable-length clips -> [N, D] embeddings.

        Groups clips by length bucket and embeds each group in fixed
        _EMBED_ROW_CHUNK-row device batches: at most
        len(_EMBED_LEN_BUCKETS_SEC) compiled programs total, and ~N/32
        dispatches instead of N."""
        out = [None] * len(clips)
        groups: Dict[int, List[int]] = {}
        for i, c in enumerate(clips):
            groups.setdefault(self._len_bucket_samples(len(c)), []).append(i)
        for bucket, idxs in groups.items():
            for lo in range(0, len(idxs), self._EMBED_ROW_CHUNK):
                sel = idxs[lo: lo + self._EMBED_ROW_CHUNK]
                rows = np.zeros((self._EMBED_ROW_CHUNK, bucket), np.float32)
                frames = np.ones(self._EMBED_ROW_CHUNK, np.int32)
                for r, i in enumerate(sel):
                    c = clips[i][:bucket]
                    rows[r, : len(c)] = c
                    frames[r] = max(len(c), 400) // 160
                if self.embedding_params is None:
                    # batched masked fallback (same path as windows) —
                    # per-clip eager mels would pay a device round trip
                    # per entry
                    emb = np.asarray(_stats_emb_jit(rows, frames, 40))
                    for r, i in enumerate(sel):
                        out[i] = emb[r]
                    continue
                if self._embed_device is not None:
                    rows = jax.device_put(rows, self._embed_device)
                mel = unnormalized_log_mel(rows, self.embedding_cfg.n_mels)
                emb = np.asarray(embed_forward(
                    self.embedding_params, mel, self.embedding_cfg))
                for r, i in enumerate(sel):
                    out[i] = emb[r]
        return np.stack(out)

    def _embed_windows(self, audio: np.ndarray,
                       windows: List[Tuple[float, float]]) -> np.ndarray:
        """Embed every sliding window in _EMBED_CHUNK-row device batches
        (zero-padded rows + valid-frame masks for trailing short windows);
        per-window dispatches pay a device round trip each and dominate
        long recordings."""
        row_len = max(int(round(self.window_sec * SAMPLE_RATE)), 400)
        n = len(windows)
        rows = np.zeros((n, row_len), np.float32)
        frames = np.zeros(n, np.int32)
        for i, (s, e) in enumerate(windows):
            clip = audio[int(s * SAMPLE_RATE): int(e * SAMPLE_RATE)]
            clip = clip[:row_len]
            rows[i, : len(clip)] = clip
            frames[i] = max(len(clip), 400) // 160

        out = []
        for lo in range(0, n, _EMBED_CHUNK):
            chunk = rows[lo: lo + _EMBED_CHUNK]
            cnt = frames[lo: lo + _EMBED_CHUNK]
            pad = _EMBED_CHUNK - len(chunk)  # static shape across dispatches
            if pad:
                chunk = np.pad(chunk, ((0, pad), (0, 0)))
                cnt = np.pad(cnt, (0, pad), constant_values=1)
            if self.embedding_params is None:
                emb = _stats_emb_jit(chunk, cnt, 40)
            else:
                if self._embed_device is not None:
                    chunk = jax.device_put(chunk, self._embed_device)
                mel = unnormalized_log_mel(chunk, self.embedding_cfg.n_mels)
                emb = embed_forward(self.embedding_params, mel,
                                    self.embedding_cfg)
            out.append(np.asarray(emb)[: len(chunk) - pad if pad else None])
        return np.concatenate(out, axis=0)

    def _diarize_with_segmentation(self, audio: np.ndarray,
                                   min_speakers: Optional[int],
                                   max_speakers: Optional[int]
                                   ) -> List[dict]:
        """pyannote-3.1-style flow: sliding segmentation windows give local
        per-speaker activities (powerset); each active local speaker gets
        an embedding over its active samples; clustering maps local
        speakers to global labels; frame-level activities are stitched
        across windows and re-binarised per global speaker (supports
        overlapping speech).

        Split into `_segment_and_embed` (PyanNet forwards + ResNet
        embeddings — the expensive device work) and `_cluster_and_stitch`
        (cheap host-side clustering/binarisation) so calibration sweeps
        re-cluster cached embeddings instead of re-running the models."""
        state = self._segment_and_embed(audio)
        if state is None:
            return []
        return self._cluster_and_stitch(state, len(audio),
                                        min_speakers, max_speakers)

    def _segment_and_embed(self, audio: np.ndarray):
        from .vad import (powerset_to_speaker_activity,
                          powerset_to_speaker_probs,
                          pyannet_forward_chunked)

        seg_cfg = self.vad.cfg
        window = int(seg_cfg.window_sec * SAMPLE_RATE)
        step = (max(int(self.seg_step_sec * SAMPLE_RATE),
                    SAMPLE_RATE // 4)
                if self.seg_step_sec else window // 2)
        n = len(audio)
        starts = list(range(0, max(n - window // 2, 1), step))
        batch = np.zeros((len(starts), window), np.float32)
        for i, s in enumerate(starts):
            clip = audio[s: s + window]
            batch[i, : len(clip)] = clip

        log_probs = pyannet_forward_chunked(self.vad.params, batch, seg_cfg)
        spk = (powerset_to_speaker_activity(log_probs)
               if self.powerset_decode == "argmax"
               else powerset_to_speaker_probs(log_probs))       # [W,F,3]
        n_frames = spk.shape[1]
        frame_dur = seg_cfg.window_sec / n_frames

        # active-speaker clips first, embeddings second in bucketed device
        # batches: per-entry _embed dispatches cost a host->device round
        # trip each (an hour of audio has ~500 entries; over a remote chip
        # that alone is minutes of latency)
        keys = []   # (window_idx, local_spk)
        clips = []
        for wi, s in enumerate(starts):
            clip = batch[wi]
            for ls in range(spk.shape[2]):
                act = spk[wi, :, ls]
                if act.mean() < 0.1 or (act > 0.5).sum() * frame_dur < 0.4:
                    continue
                # embed on frames where this local speaker talks ALONE
                # (pyannote-3.1 semantics): frames shared with another
                # active local speaker carry a two-voice mixture whose
                # embedding lands between the true speakers — AHC then
                # mints phantom clusters from them (measured: spurious
                # SPEAKER_03 turns on 3-speaker overlap files).  Fall
                # back to all active frames when the speaker is never
                # alone in this window.
                others = np.delete(spk[wi], ls, axis=1).max(axis=1)
                solo = (act > 0.5) & (others < 0.5)
                frames_mask = solo if solo.sum() * frame_dur >= 0.4 \
                    else (act > 0.5)
                mask = np.repeat(frames_mask,
                                 int(np.ceil(window / n_frames)))[:window]
                active_audio = clip[mask]
                if len(active_audio) < SAMPLE_RATE // 4:
                    continue
                keys.append((wi, ls))
                clips.append(active_audio)
        if not keys:
            return None
        entries = [(wi, ls, emb) for (wi, ls), emb in
                   zip(keys, self._embed_clips(clips))]

        embs = np.stack([e[2] for e in entries])
        if len(embs) > 1:
            embs = embs - embs.mean(axis=0, keepdims=True)
            embs = embs / np.clip(
                np.linalg.norm(embs, axis=1, keepdims=True), 1e-8, None)
        return {"entries": entries, "embs": embs, "spk": spk,
                "starts": starts, "n_frames": n_frames,
                "frame_dur": frame_dur}

    def _cluster_and_stitch(self, state: dict, n_samples: int,
                            min_speakers: Optional[int],
                            max_speakers: Optional[int]) -> List[dict]:
        from .vad import binarize, VadOptions
        entries, embs = state["entries"], state["embs"]
        spk, starts = state["spk"], state["starts"]
        n_frames, frame_dur = state["n_frames"], state["frame_dur"]
        n = n_samples
        # cannot-link groups: entries from the same segmentation window
        # are distinct local speakers, hence distinct people
        groups = np.asarray([wi for wi, _, _ in entries])
        labels = constrained_agglomerative_cluster(
            embs, groups, threshold=self.threshold,
            min_speakers=min_speakers or 1, max_speakers=max_speakers,
            cl_trust_floor=self.cl_trust_floor)
        labels = _absorb_small_clusters(labels, embs,
                                        min_size=self.min_cluster_size,
                                        floor=min_speakers or 1,
                                        groups=groups)

        # stitch: accumulate global speaker activity on an absolute frame
        # grid (average across overlapping windows)
        n_global = int(labels.max()) + 1
        total_frames = int(np.ceil(n / SAMPLE_RATE / frame_dur)) + 1
        acc = np.zeros((n_global, total_frames), np.float64)
        cnt = np.zeros((n_global, total_frames), np.float64)
        for (wi, ls, _), g in zip(entries, labels):
            f0 = int(round(starts[wi] / SAMPLE_RATE / frame_dur))
            f1 = min(f0 + n_frames, total_frames)
            acc[g, f0:f1] += spk[wi, : f1 - f0, ls]
            cnt[g, f0:f1] += 1.0
        activity = np.where(cnt > 0, acc / np.maximum(cnt, 1), 0.0)

        segments: List[dict] = []
        duration = n / SAMPLE_RATE
        for g in range(n_global):
            for s, e in binarize(activity[g].astype(np.float32), frame_dur,
                                 VadOptions(vad_onset=self.activity_onset,
                                            vad_offset=self.activity_offset,
                                            min_duration_on=0.3,
                                            min_duration_off=0.3)):
                segments.append({"start": round(max(0.0, s), 3),
                                 "end": round(min(duration, e), 3),
                                 "speaker": f"SPEAKER_{g:02d}"})
        segments.sort(key=lambda d: (d["start"], d["end"]))
        return segments

    def __call__(self, audio: np.ndarray,
                 min_speakers: Optional[int] = None,
                 max_speakers: Optional[int] = None) -> List[dict]:
        """audio -> [{start, end, speaker}] (SPEAKER_00, SPEAKER_01, ...)."""
        audio = np.asarray(audio, np.float32)
        if self.vad.params is not None:
            return self._diarize_with_segmentation(audio, min_speakers,
                                                   max_speakers)
        regions = self.vad(audio, VadOptions(min_duration_on=0.3,
                                             min_duration_off=0.3))
        # slide windows over speech regions
        windows: List[Tuple[float, float]] = []
        for s, e in regions:
            t = s
            while t < e:
                w_end = min(t + self.window_sec, e)
                if w_end - t >= 0.4:
                    windows.append((t, w_end))
                if w_end >= e:
                    break
                t += self.step_sec
        if not windows:
            return []

        embs = self._embed_windows(audio, windows)
        # center across the recording: shared structure (channel, silence
        # floor) otherwise dominates cosine similarity between speakers
        if len(embs) > 1:
            embs = embs - embs.mean(axis=0, keepdims=True)
            norms = np.linalg.norm(embs, axis=1, keepdims=True)
            embs = embs / np.clip(norms, 1e-8, None)

        labels = agglomerative_cluster(
            embs, threshold=self.threshold,
            min_speakers=min_speakers or 1,
            max_speakers=max_speakers)

        # merge consecutive same-speaker windows into segments
        segments: List[dict] = []
        for (s, e), lab in zip(windows, labels):
            name = f"SPEAKER_{lab:02d}"
            if segments and segments[-1]["speaker"] == name \
                    and s <= segments[-1]["end"] + 1e-6:
                segments[-1]["end"] = max(segments[-1]["end"], e)
            else:
                segments.append({"start": round(s, 3), "end": round(e, 3),
                                 "speaker": name})
        return segments


# ---------------------------------------------------------------------------
# Word/segment -> speaker assignment (D7)
# ---------------------------------------------------------------------------

def _overlap(a_start, a_end, b_start, b_end) -> float:
    return max(0.0, min(a_end, b_end) - max(a_start, b_start))


def _best_speaker(diarize_segments: Sequence[dict], start: float,
                  end: float) -> Optional[str]:
    votes: Dict[str, float] = {}
    for d in diarize_segments:
        ov = _overlap(start, end, d["start"], d["end"])
        if ov > 0:
            votes[d["speaker"]] = votes.get(d["speaker"], 0.0) + ov
    if not votes:
        return None
    return max(votes.items(), key=lambda kv: kv[1])[0]


def assign_word_speakers(diarize_segments: Sequence[dict], result: dict,
                         fill_nearest: bool = False) -> dict:
    """Interval-overlap speaker voting (whisperx.assign_word_speakers
    surface, transcribe.py:145).  Adds ``speaker`` to segments and words."""
    diarize_segments = list(diarize_segments)
    out = dict(result)
    segments = [dict(s) for s in result.get("segments", [])]
    for seg in segments:
        spk = _best_speaker(diarize_segments, seg.get("start", 0),
                            seg.get("end", 0))
        if spk is None and fill_nearest and diarize_segments:
            mid = (seg.get("start", 0) + seg.get("end", 0)) / 2
            spk = min(diarize_segments,
                      key=lambda d: min(abs(d["start"] - mid),
                                        abs(d["end"] - mid)))["speaker"]
        if spk is not None:
            seg["speaker"] = spk
        words = []
        for w in seg.get("words", []):
            w = dict(w)
            wspk = _best_speaker(diarize_segments, w.get("start", 0),
                                 w.get("end", 0))
            if wspk is not None:
                w["speaker"] = wspk
            elif spk is not None:
                w["speaker"] = spk
            words.append(w)
        if words:
            seg["words"] = words
    out["segments"] = segments
    return out
