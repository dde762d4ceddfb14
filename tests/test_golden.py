"""Golden-image regression: float64 CPU renders pinned bit-for-bit-ish.

BASELINE.md correctness row: rendered pixels allclose vs a float64 CPU
reference.  tests/golden_renders.npz holds 24x24 Schwarzschild and Kerr
a=0.9 disk renders produced by this same code at a known-good commit
(validated against the analytic shadow oracle and the C engine's
correct subset via tools/ref_parity.py); any physics/shading regression
shifts pixels and trips this.
"""

import os

import jax.numpy as jnp
import numpy as np

from blackhole_tpu.geom.types import BlackHole, Camera, Disk, Scene, SimConfig
from blackhole_tpu.render import image

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_renders.npz")


def _scene(spin):
    return Scene(
        blackhole=BlackHole.create(1.0, spin, dtype=jnp.float64),
        disk=Disk.create(6.0, 20.0, dtype=jnp.float64),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=80.0, max_steps=600,
            dtype=jnp.float64,
        ),
        disk_enabled=True,
    )


def _camera():
    return Camera.create(
        position=(0.0, -30.0, 8.0),
        direction=(0.0, 30.0, -8.0),
        up=(0.0, 0.0, 1.0),
        fov_deg=25.0,
        dtype=jnp.float64,
    )


def test_golden_renders_unchanged():
    golden = np.load(GOLDEN)
    for name, spin in (("schw", 0.0), ("kerr09", 0.9)):
        img = np.asarray(
            image.render_image(_scene(spin), _camera(), width=24,
                               height=24)
        )
        # f64 end-to-end: generous atol still catches any real physics
        # or shading change (those move pixels by >> 1e-6).
        np.testing.assert_allclose(
            img, golden[name], atol=1e-6,
            err_msg=f"golden render {name} drifted",
        )
