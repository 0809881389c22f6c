"""Test config: force JAX onto CPU (tests must not grab the shared TPU).

This environment boots an `axon` TPU plugin from sitecustomize and pins
``JAX_PLATFORMS=axon`` in the process env, so the env-var route cannot be
overridden from here — ``jax.config.update`` after import can.

Sharding/pjit tests run in a *subprocess* with
``--xla_force_host_platform_device_count=8`` (see test_parallel.py) rather
than forcing 8 virtual devices globally: on this 1-core host the 8-device
CPU backend makes every XLA compile ~13x slower, which would dominate the
whole suite.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _clear_env_cache():
    from manual_whisper_tpu import config
    config.clear_env_cache()
    yield
    config.clear_env_cache()


@pytest.fixture(autouse=True)
def _hermetic_weights_registry(tmp_path_factory, monkeypatch):
    """Pin the checkpoint registry to an empty dir for every test.

    config.weights_dir() falls back to the repo-local .weights/ (which
    carries trained synth checkpoints); tests must not change behavior
    based on that repo state — the trained PyanNet VAD, for example,
    rejects the plain-sine fixtures as non-speech.  Tests that exercise
    the registry set MWX_WEIGHTS_DIR themselves (overrides this).
    Subprocess tests inherit the env automatically."""
    monkeypatch.setenv("MWX_WEIGHTS_DIR",
                       str(tmp_path_factory.mktemp("empty_weights")))
