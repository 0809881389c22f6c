"""Diarization tests: clustering, embeddings, pipeline, speaker assignment
(reference behavior: whisperx diarize + assign_word_speakers,
transcribe.py:142-145)."""

import numpy as np
import pytest

import jax

from manual_whisper_tpu.models.diarize import (
    DiarizationPipeline, EmbeddingConfig, agglomerative_cluster,
    assign_word_speakers, embed_forward, init_embedding_params,
    spectral_stats_embedding)

SR = 16000


def _voice(freq, seconds, seed=0):
    """Synthetic 'speaker': harmonic stack at a base pitch."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * seconds)) / SR
    x = sum((0.3 / k) * np.sin(2 * np.pi * freq * k * t) for k in (1, 2, 3))
    return (x + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


def test_agglomerative_cluster_two_groups():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(8) + np.array([5] + [0] * 7)
    b = rng.standard_normal(8) + np.array([0] * 7 + [5])
    embs = np.stack([a + 0.05 * rng.standard_normal(8) for _ in range(4)]
                    + [b + 0.05 * rng.standard_normal(8) for _ in range(4)])
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    labels = agglomerative_cluster(embs, threshold=0.5)
    assert len(set(labels[:4])) == 1
    assert len(set(labels[4:])) == 1
    assert labels[0] != labels[4]
    # stable numbering: first-seen cluster is 0
    assert labels[0] == 0


def test_agglomerative_cluster_constraints():
    embs = np.eye(4, dtype=np.float32)  # all orthogonal
    labels = agglomerative_cluster(embs, threshold=0.1, min_speakers=1,
                                   max_speakers=2)
    assert len(set(labels)) <= 2
    labels1 = agglomerative_cluster(embs[:1], threshold=0.5)
    assert list(labels1) == [0]
    assert len(agglomerative_cluster(np.zeros((0, 4)), 0.5)) == 0


def test_spectral_stats_embedding_separates_voices():
    e_low = spectral_stats_embedding(_voice(110, 2.0, seed=1))
    e_low2 = spectral_stats_embedding(_voice(112, 2.0, seed=2))
    e_high = spectral_stats_embedding(_voice(280, 2.0, seed=3))
    same = float(e_low @ e_low2)
    diff = float(e_low @ e_high)
    assert same > diff


def test_embed_forward_shapes():
    cfg = EmbeddingConfig.tiny_test()
    params = init_embedding_params(jax.random.PRNGKey(0), cfg)
    feats = np.random.default_rng(0).standard_normal(
        (2, 64, cfg.n_mels)).astype(np.float32)
    emb = np.asarray(embed_forward(params, feats, cfg))
    assert emb.shape == (2, cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)


def test_diarization_pipeline_two_speakers():
    # alternating speakers with distinct pitch, separated by silences
    parts = []
    for i in range(4):
        parts.append(_voice(110 if i % 2 == 0 else 300, 2.0, seed=i))
        parts.append(np.zeros(int(0.8 * SR), np.float32))
    audio = np.concatenate(parts)
    diar = DiarizationPipeline(window_sec=2.0, step_sec=2.0, threshold=0.5)
    segments = diar(audio, max_speakers=2)
    assert segments, "no diarization segments produced"
    speakers = {s["speaker"] for s in segments}
    assert speakers <= {"SPEAKER_00", "SPEAKER_01"}
    assert len(speakers) == 2
    for s in segments:
        assert s["start"] < s["end"]

    def speaker_at(t):
        for s in segments:
            if s["start"] <= t <= s["end"]:
                return s["speaker"]
        return None
    # first and third bursts same voice; second different
    assert speaker_at(1.0) == speaker_at(6.6)
    assert speaker_at(1.0) != speaker_at(3.8)


def test_diarization_empty_audio():
    diar = DiarizationPipeline()
    assert diar(np.zeros(SR, np.float32)) == []


def test_assign_word_speakers():
    diarize_segments = [
        {"start": 0.0, "end": 5.0, "speaker": "SPEAKER_00"},
        {"start": 5.0, "end": 10.0, "speaker": "SPEAKER_01"},
    ]
    result = {"segments": [
        {"text": "甲说话", "start": 1.0, "end": 4.0,
         "words": [{"word": "甲", "start": 1.0, "end": 2.0},
                   {"word": "说", "start": 4.6, "end": 5.9},
                   {"word": "话", "start": 20.0, "end": 21.0}]},
        {"text": "乙说话", "start": 6.0, "end": 9.0},
        {"text": "外面", "start": 30.0, "end": 31.0},
    ]}
    out = assign_word_speakers(diarize_segments, result)
    segs = out["segments"]
    assert segs[0]["speaker"] == "SPEAKER_00"
    assert segs[1]["speaker"] == "SPEAKER_01"
    assert "speaker" not in segs[2]          # no overlap, no fill
    words = segs[0]["words"]
    assert words[0]["speaker"] == "SPEAKER_00"
    # word straddling 5.0 with more overlap in SPEAKER_01's turn
    assert words[1]["speaker"] == "SPEAKER_01"
    # unmatched word inherits segment speaker
    assert words[2]["speaker"] == "SPEAKER_00"
    # input untouched
    assert "speaker" not in result["segments"][0]


def test_assign_word_speakers_fill_nearest():
    diarize_segments = [{"start": 0.0, "end": 1.0, "speaker": "SPEAKER_00"}]
    result = {"segments": [{"text": "远", "start": 5.0, "end": 6.0}]}
    out = assign_word_speakers(diarize_segments, result, fill_nearest=True)
    assert out["segments"][0]["speaker"] == "SPEAKER_00"


def test_convert_wespeaker_resnet_contract():
    """Converter consumes a torchvision-style ResNet state dict (wespeaker
    naming) and the converted pytree runs through embed_forward."""
    import torch
    import torch.nn as nn

    cfg = EmbeddingConfig.tiny_test()

    def block(cin, cout, down):
        layers = {"conv1": nn.Conv2d(cin, cout, 3, padding=1, bias=False),
                  "bn1": nn.BatchNorm2d(cout),
                  "conv2": nn.Conv2d(cout, cout, 3, padding=1, bias=False),
                  "bn2": nn.BatchNorm2d(cout)}
        m = nn.ModuleDict(layers)
        if down:
            m["downsample"] = nn.Sequential(
                nn.Conv2d(cin, cout, 1, bias=False), nn.BatchNorm2d(cout))
        return m

    torch.manual_seed(0)
    model = nn.ModuleDict({
        "conv1": nn.Conv2d(1, cfg.channels[0], 3, padding=1, bias=False),
        "bn1": nn.BatchNorm2d(cfg.channels[0]),
    })
    cin = cfg.channels[0]
    for si, cout in enumerate(cfg.channels, start=1):
        blocks = nn.ModuleList(
            [block(cin if b == 0 else cout, cout,
                   down=(b == 0 and (cin != cout or si > 1)))
             for b in range(1)])
        model[f"layer{si}"] = blocks
        cin = cout
    feat = (cfg.n_mels // 8) * cfg.channels[-1]
    model["seg_1"] = torch.nn.Linear(2 * feat, cfg.embed_dim)

    # flatten ModuleList naming to layerN.M....
    sd = model.state_dict()
    from manual_whisper_tpu.models.diarize import convert_wespeaker_resnet
    params = convert_wespeaker_resnet(sd, cfg)
    assert params["stem_w"].shape == (3, 3, 1, cfg.channels[0])
    assert len(params["stages"]) == len(cfg.channels)

    import numpy as np
    feats = np.random.default_rng(0).standard_normal(
        (1, 48, cfg.n_mels)).astype(np.float32)
    emb = np.asarray(embed_forward(params, feats, cfg))
    assert emb.shape == (1, cfg.embed_dim)
    assert np.isfinite(emb).all()


def test_segmentation_based_pipeline_runs():
    """pyannote-3.1-style path (segmentation model present): mechanics on
    random PyanNet weights — valid segment schema, overlap allowed."""
    from manual_whisper_tpu.models.vad import PyanNetConfig, \
        init_pyannet_params

    seg_cfg = PyanNetConfig(window_sec=2.0)
    seg_params = init_pyannet_params(jax.random.PRNGKey(3), seg_cfg)
    diar = DiarizationPipeline(segmentation_params=seg_params,
                               segmentation_cfg=seg_cfg,
                               window_sec=2.0, step_sec=1.0, threshold=0.6)
    audio = np.concatenate([
        _voice(120, 2.5, seed=1), np.zeros(SR // 2, np.float32),
        _voice(260, 2.5, seed=2)])
    segments = diar(audio, max_speakers=3)
    duration = len(audio) / SR
    for s in segments:
        assert 0 <= s["start"] < s["end"] <= duration + 1e-6
        assert s["speaker"].startswith("SPEAKER_")
    # sorted by start time
    starts = [s["start"] for s in segments]
    assert starts == sorted(starts)


def test_batched_window_embeddings_match_single():
    """_embed_windows (chunked device batches) must match per-clip
    spectral_stats_embedding for full windows and stay close for the
    trailing short window (reflect-pad boundary differs by design)."""
    import numpy as np

    from manual_whisper_tpu.models.diarize import (DiarizationPipeline,
                                                   spectral_stats_embedding)

    rng = np.random.default_rng(0)
    sr = 16000
    audio = (0.2 * np.sin(2 * np.pi * 200 * np.arange(sr * 8) / sr)
             + 0.01 * rng.standard_normal(sr * 8)).astype(np.float32)
    dp = DiarizationPipeline(window_sec=3.0, step_sec=1.5)
    windows = [(0.0, 3.0), (1.5, 4.5), (3.0, 6.0), (6.0, 8.0)]  # last short
    batched = dp._embed_windows(audio, windows)
    assert batched.shape == (4, 120)
    for i, (s, e) in enumerate(windows):
        single = spectral_stats_embedding(audio[int(s * sr): int(e * sr)])
        cos = float(batched[i] @ single)
        if e - s >= 3.0:
            assert cos > 0.9999, (i, cos)
        else:
            assert cos > 0.99, (i, cos)


def test_load_embedding_params_jax_registry(tmp_path, monkeypatch):
    """An orbax checkpoint under $MWX_WEIGHTS_DIR/<name>/jax loads
    torch-free (the form tools/train_synth_embed.py writes) and drives
    embed_forward."""
    import jax
    import numpy as np
    from manual_whisper_tpu.convert.from_hf import save_params
    from manual_whisper_tpu.models.diarize import (EmbeddingConfig,
                                                   embed_forward,
                                                   init_embedding_params,
                                                   load_embedding_params)
    from manual_whisper_tpu.ops.mel import unnormalized_log_mel

    cfg = EmbeddingConfig.tiny_test()
    params = init_embedding_params(jax.random.PRNGKey(0), cfg)
    out = tmp_path / "wespeaker-voxceleb-resnet34-LM" / "jax"
    save_params(jax.device_get(params), out)

    monkeypatch.setenv("MWX_WEIGHTS_DIR", str(tmp_path))
    loaded = load_embedding_params(cfg=cfg)
    assert loaded is not None
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(loaded)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))

    clip = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    mel = unnormalized_log_mel(clip[None], cfg.n_mels)
    emb = np.asarray(embed_forward(loaded, mel, cfg))
    assert emb.shape == (1, cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, rtol=1e-4)


def test_embed_clips_batched_fallback_matches_windows_path():
    """Weightless _embed_clips must use the batched masked stats path
    (one dispatch per chunk, same function as the windows flow), not a
    per-clip eager mel — and its output must match the documented
    spectral_stats_embedding semantics."""
    from manual_whisper_tpu.models.diarize import (DiarizationPipeline,
                                                   spectral_stats_embedding)
    rng = np.random.default_rng(0)
    clips = [(0.3 * rng.standard_normal(int(SR * s))).astype(np.float32)
             for s in (0.7, 1.4, 2.9)]
    pipe = DiarizationPipeline(segmentation_params={},  # unused here
                               embedding_params=None)
    batched = pipe._embed_clips(clips)
    for c, got in zip(clips, batched):
        ref = spectral_stats_embedding(c)
        np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_pyannet_frames_per_window_matches_forward():
    import jax
    from manual_whisper_tpu.models.vad import (PyanNetConfig,
                                               init_pyannet_params,
                                               pyannet_forward)
    cfg = PyanNetConfig()
    params = init_pyannet_params(jax.random.PRNGKey(0), cfg)
    out = pyannet_forward(
        params, np.zeros((1, int(cfg.window_sec * SR)), np.float32), cfg)
    assert out.shape[1] == cfg.frames_per_window


def test_constrained_cluster_trust_floor_is_dynamic():
    """Cannot-link edges are enforced only while the cluster pair sits
    farther apart than cl_trust_floor (r5): a voice that segmentation
    hallucinates as two local speakers in MANY windows must still merge
    (hour-scale failure: every same-speaker cluster pair eventually
    accumulates an edge, 60-min pred 8-9 speakers, DER 0.36-0.37),
    while genuinely distinct speakers — far apart — stay split no
    matter how the threshold is raised."""
    from manual_whisper_tpu.models.diarize import (
        constrained_agglomerative_cluster)
    rng = np.random.default_rng(0)

    def unit(v):
        return v / np.linalg.norm(v)

    a = unit(rng.standard_normal(16))
    b = unit(rng.standard_normal(16))
    # two entries per window: a noisy copy of voice A twice (the
    # hallucinated split — same voice, cosine distance ~0) in windows
    # 0..5, and A vs B (genuine overlap, far apart) in windows 6..11
    embs, groups = [], []
    for w in range(6):
        embs += [unit(a + 0.02 * rng.standard_normal(16)),
                 unit(a + 0.02 * rng.standard_normal(16))]
        groups += [w, w]
    for w in range(6, 12):
        embs += [unit(a + 0.02 * rng.standard_normal(16)),
                 unit(b + 0.02 * rng.standard_normal(16))]
        groups += [w, w]
    embs = np.asarray(embs)
    groups = np.asarray(groups)

    labels = constrained_agglomerative_cluster(
        embs, groups, threshold=0.8, cl_trust_floor=0.3)
    # all A-entries merge into ONE cluster despite the 6 same-window
    # edges among them; B stays its own cluster
    a_labels = {int(l) for i, l in enumerate(labels)
                if i < 12 or i % 2 == 0}
    b_labels = {int(labels[i]) for i in range(13, 24, 2)}
    assert len(a_labels) == 1
    assert len(b_labels) == 1
    assert a_labels != b_labels

    # floor 0 restores hard constraints: the hallucinated split sticks
    labels0 = constrained_agglomerative_cluster(
        embs, groups, threshold=0.8, cl_trust_floor=0.0)
    a0 = {int(l) for i, l in enumerate(labels0) if i < 12}
    assert len(a0) > 1
