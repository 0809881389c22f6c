"""Sharding tests.

Fast checks run in-process on 1 CPU device (sharding *rules* are pure
metadata); the full multi-chip execution check runs the driver dry-run in a
subprocess with 8 virtual CPU devices (forcing the flag in-process would
slow every other compile ~13x on this host, see conftest)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from manual_whisper_tpu.models import MODEL_CONFIGS, init_params
from manual_whisper_tpu.parallel import (make_mesh, param_sharding_rules,
                                         shard_batch, shard_params,
                                         sharding_pytree)

REPO = Path(__file__).resolve().parent.parent


def test_param_rules_cover_every_leaf():
    cfg = MODEL_CONFIGS["test"]
    params = init_params(jax.random.PRNGKey(0), cfg)
    rules = param_sharding_rules(params)
    flat, treedef = jax.tree.flatten(params)
    flat_rules = treedef.flatten_up_to(rules)
    assert len(flat) == len(flat_rules)
    for leaf, spec in zip(flat, flat_rules):
        assert isinstance(spec, P)
        # spec rank never exceeds leaf rank
        assert len(spec) <= leaf.ndim


def test_tensor_parallel_specs_megatron_layout():
    cfg = MODEL_CONFIGS["test"]
    params = init_params(jax.random.PRNGKey(0), cfg)
    rules = param_sharding_rules(params)
    attn = rules["encoder"]["blocks"]["attn"]
    assert attn["q_w"] == P(None, None, "model")   # column parallel
    assert attn["o_w"] == P(None, "model", None)   # row parallel
    mlp = rules["decoder"]["blocks"]["mlp"]
    assert mlp["fc1_w"] == P(None, None, "model")
    assert mlp["fc2_w"] == P(None, "model", None)
    assert rules["decoder"]["tok_emb"] == P(None)  # replicated


def test_single_device_mesh_placement():
    cfg = MODEL_CONFIGS["test"]
    params = init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(1, model_parallel=1)
    sharded = shard_params(params, mesh)
    leaf = sharded["encoder"]["blocks"]["attn"]["q_w"]
    assert leaf.sharding.mesh.shape == {"data": 1, "model": 1}
    batch = shard_batch(np.zeros((4, 8), np.float32), mesh)
    assert batch.sharding.spec == P("data", None)


def test_make_mesh_validates():
    with pytest.raises(ValueError):
        make_mesh(1, model_parallel=2)


def test_sharding_pytree_handles_int8_params():
    """TP specs apply to int8 checkpoints: the quantized tensor inherits
    the weight's spec, the per-channel scale drops the contraction axis."""
    from manual_whisper_tpu.ops.quant import quantize_params
    cfg = MODEL_CONFIGS["test"]
    params = quantize_params(init_params(jax.random.PRNGKey(0), cfg))
    mesh = make_mesh(1, model_parallel=1)
    shardings = sharding_pytree(params, mesh)
    q_w = shardings["encoder"]["blocks"]["attn"]["q_w"]
    assert q_w["q"].spec == P(None, None, "model")
    assert q_w["s"].spec == P(None, "model")
    o_w = shardings["decoder"]["blocks"]["xattn"]["o_w"]
    assert o_w["q"].spec == P(None, "model", None)
    assert o_w["s"].spec == P(None, None)
    # and placement actually works end to end
    placed = shard_params(params, mesh)
    leaf = placed["encoder"]["blocks"]["mlp"]["fc1_w"]
    assert leaf["q"].sharding.mesh.shape == {"data": 1, "model": 1}


def test_bucket_ladder_respects_mesh_divisor():
    """Data-parallel inference needs every batch bucket divisible by the
    mesh's data axis (GSPMD divisibility)."""
    from manual_whisper_tpu.pipeline.chunking import _bucket_for
    assert _bucket_for(1, 16, divisor=4) == 4
    assert _bucket_for(3, 16, divisor=4) == 4
    assert _bucket_for(5, 16, divisor=4) == 8
    assert _bucket_for(16, 16, divisor=4) == 16
    # non-power-of-two data axis still rounds up cleanly
    assert _bucket_for(2, 16, divisor=3) == 3
    assert _bucket_for(16, 16, divisor=3) == 18


def test_load_model_auto_mesh_single_device(monkeypatch):
    """auto mesh stays off on one device and honors the opt-out knob."""
    from manual_whisper_tpu.pipeline import load_model
    from manual_whisper_tpu.pipeline.transcribe import _auto_mesh
    assert _auto_mesh() is None or jax.device_count() > 1
    monkeypatch.setenv("MWX_AUTO_MESH", "false")
    assert _auto_mesh() is None
    pipe = load_model("test", language="zh")
    assert pipe.mesh is None and pipe.data_parallel == 1


@pytest.mark.slow
def test_dryrun_multichip_subprocess():
    """8 virtual CPU devices (the driver's own entry point): sharded
    batched inference matches the 1-device segments exactly, then the
    dp=4 x tp=2 train step runs with sharded optimizer state."""
    proc = subprocess.run(
        [sys.executable, str(REPO / "__graft_entry__.py"), "dryrun", "8"],
        capture_output=True, text=True, timeout=560, cwd=str(REPO))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout
    assert "'data': 4, 'model': 2" in proc.stdout
    assert "(== 1-device)" in proc.stdout


@pytest.mark.slow
def test_sharded_inference_int8_and_fallback_subprocess():
    """Data-parallel inference on a pure-dp 8-device mesh with the int8
    weight path and a non-trivial bucket tail (uneven chunk count), plus
    the timestamp decode mode — asserting parity with 1-device output."""
    code = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import numpy as np
from manual_whisper_tpu.parallel import make_mesh
from manual_whisper_tpu.pipeline import load_model

sr = 16000
t = np.arange(sr * 9) / sr
audio = (0.3 * np.sin(2 * np.pi * 220 * t)
         * (0.5 + 0.5 * np.sign(np.sin(2 * np.pi * 0.53 * t)))
         ).astype(np.float32)
mesh = make_mesh(8, model_parallel=1)

for kwargs in ({"compute_type": "int8"},
               {"asr_options": {"without_timestamps": False}}):
    ref = load_model("test", language="zh", mesh=None, **kwargs)
    exp = ref.transcribe(audio, batch_size=8, language="zh", chunk_size=1.3)
    shd = load_model("test", language="zh", mesh=mesh, **kwargs)
    got = shd.transcribe(audio, batch_size=8, language="zh", chunk_size=1.3)
    k = lambda r: [(s["text"], s["start"], s["end"]) for s in r["segments"]]
    assert k(got) == k(exp), (kwargs, k(got), k(exp))
    assert k(exp), "no segments produced"
print("SHARDED-INT8-TS OK")
"""
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=560, cwd=str(REPO))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SHARDED-INT8-TS OK" in proc.stdout
