"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU needed).

Mirrors SURVEY.md §4's plan: sharding/pjit tests run against
``--xla_force_host_platform_device_count=8`` so CI needs no hardware.
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _clear_env_cache():
    from manual_whisper_tpu import config
    config.clear_env_cache()
    yield
    config.clear_env_cache()
