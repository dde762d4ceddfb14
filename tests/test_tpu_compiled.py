"""Compiled-TPU Pallas parity — @pytest.mark.tpu, skipped off-TPU.

The shared checks live in tools/tpu_parity.py so the bench environment
runs them too (bench.py embeds the outcome in its JSON line); here they
are exposed to pytest for TPU-attached runs
(`BH_TPU_TESTS=1 pytest tests/test_tpu_compiled.py`).  The regular CPU
suite pins jax to the host backend (conftest.py), so these skip there.
"""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

requires_tpu = pytest.mark.skipif(
    os.environ.get("BH_TPU_TESTS") != "1",
    reason="compiled-TPU parity runs only with BH_TPU_TESTS=1 on a TPU "
           "backend (the CPU suite pins jax_platforms=cpu)",
)


@requires_tpu
@pytest.mark.tpu
@pytest.mark.parametrize("integrator", ["rk4", "rkf45"])
@pytest.mark.parametrize("spin,disk", [(0.0, True), (0.9, True),
                                       (0.9, False)])
def test_compiled_forward_parity(integrator, spin, disk):
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")
    import tpu_parity

    tpu_parity.check_forward(spin, disk, integrator)


@requires_tpu
@pytest.mark.tpu
def test_compiled_jvp_parity():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")
    import tpu_parity

    tpu_parity.check_jvp()
