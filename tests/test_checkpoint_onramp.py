"""Dry-run of the real-checkpoint on-ramp (VERDICT r2 #9).

The documented path from "HF checkout present" to a serving registry is
ONE command:

    python tools/convert_weights.py <hf-repo-or-local-dir> <registry>
    export MWX_WEIGHTS_DIR=<registry>

No hub access exists here, so a torch-built tiny Whisper checkpoint
saved in the exact HF on-disk layout (save_pretrained) stands in for the
hub checkout; the test then drives the REAL product entry
(pipeline.load_model + transcribe) off the installed registry entry.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.filterwarnings("ignore::RuntimeWarning")
def test_convert_weights_onramp(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    torch.manual_seed(0)
    hf_cfg = WhisperConfig(
        vocab_size=2000, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=60, max_target_positions=64,
        pad_token_id=0, bos_token_id=0, eos_token_id=0,
        decoder_start_token_id=0, suppress_tokens=None,
        begin_suppress_tokens=None)
    hf_dir = tmp_path / "hf_checkout"
    WhisperForConditionalGeneration(hf_cfg).eval().save_pretrained(hf_dir)
    assert (hf_dir / "config.json").exists()
    assert (hf_dir / "model.safetensors").exists()

    # the one documented command (no --verify: that flag initialises jax,
    # which must not grab the shared chip from a test subprocess)
    registry = tmp_path / "registry"
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "convert_weights.py"),
         str(hf_dir), str(registry), "--name", "tiny-onramp"],
        capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    assert "export MWX_WEIGHTS_DIR" in proc.stdout
    assert (registry / "tiny-onramp" / "config.json").exists()
    assert (registry / "tiny-onramp" / "model.safetensors").exists()

    # the registry entry serves the real product entry point
    monkeypatch.setenv("MWX_WEIGHTS_DIR", str(registry))
    from manual_whisper_tpu import config
    config.clear_env_cache()
    from manual_whisper_tpu.pipeline import load_model
    model = load_model("tiny-onramp", language="zh")
    assert model.cfg.n_audio_state == 64

    t = np.arange(16000 * 5) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)
             * (0.5 + 0.5 * np.sign(np.sin(2 * np.pi * 0.7 * t)))
             ).astype(np.float32)
    result = model.transcribe(audio, batch_size=2, language="zh")
    assert "segments" in result and result["language"] == "zh"
