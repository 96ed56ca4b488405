"""Test config: force an 8-device virtual CPU platform before jax import.

This is the JAX-native substitute for a fake-cluster fixture: multi-chip
sharding tests run on 8 virtual CPU devices (SURVEY.md §4).
"""

import os

# The session environment pins JAX_PLATFORMS=axon (tunneled TPU); tests must
# run on the virtual CPU mesh, so override unconditionally unless the caller
# explicitly asks for another platform via DIFFBIR_TPU_TEST_PLATFORM.
os.environ["JAX_PLATFORMS"] = os.environ.get("DIFFBIR_TPU_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon plugin ignores the JAX_PLATFORMS env var; the config update is
# authoritative (must run before any backend is initialized).
jax.config.update(
    "jax_platforms", os.environ.get("DIFFBIR_TPU_TEST_PLATFORM", "cpu")
)
jax.config.update("jax_compilation_cache_dir", "/tmp/diffbir_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# parity tests compare fp32 against torch: disable bf16-pass matmul lowering
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running convergence/e2e tests (DIFFBIR_RUN_SLOW=1)"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
