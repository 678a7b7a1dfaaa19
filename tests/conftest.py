"""Test configuration: force an 8-device virtual CPU mesh before JAX
backends initialize, and enable x64.

This is the TPU analogue of "multi-node testing without a cluster"
(SURVEY.md §4): sharding/collective tests run SPMD over 8 host devices.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: kernel compiles amortize across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/femo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs[:8]
