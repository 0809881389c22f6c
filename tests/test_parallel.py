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


@pytest.mark.slow
def test_dryrun_multichip_subprocess():
    """Full dp=4 x tp=2 train step on 8 virtual CPU devices (the driver's
    own entry point)."""
    proc = subprocess.run(
        [sys.executable, str(REPO / "__graft_entry__.py"), "dryrun", "8"],
        capture_output=True, text=True, timeout=560, cwd=str(REPO))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout
    assert "'data': 4, 'model': 2" in proc.stdout
