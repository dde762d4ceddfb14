"""Test configuration: force CPU with 8 virtual devices for sharding tests.

The container's sitecustomize registers the remote 'axon' TPU backend and
pins jax_platforms; tests must run hermetically on host CPU, so we
re-pin to CPU before any computation and expose an 8-device virtual mesh
(SURVEY.md §4: sharding logic testable without a pod).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if os.environ.get("BH_TPU_TESTS") != "1":
    # Hermetic CPU suite.  BH_TPU_TESTS=1 leaves the session backend
    # (a real TPU) in place for tests/test_tpu_compiled.py.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def f64():
    import jax.numpy as jnp

    return jnp.float64
