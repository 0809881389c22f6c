"""Test config: JAX on CPU (no TPU needed).

Sharding/pjit tests run in a *subprocess* with
``--xla_force_host_platform_device_count=8`` (see test_parallel.py) rather
than forcing 8 virtual devices globally: on this 1-core host the 8-device
CPU backend makes every XLA compile ~13x slower, which would dominate the
whole suite.  Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _clear_env_cache():
    from manual_whisper_tpu import config
    config.clear_env_cache()
    yield
    config.clear_env_cache()
