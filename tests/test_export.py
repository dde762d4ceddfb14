"""Deployment export (blackhole_tpu.export): the WASM-target analog.

The reference ships its 18 bh_* symbols to Emscripten
(/root/reference/Makefile:47); here the deployable artifact is
serialized StableHLO from jax.export — runnable without this package's
source, with scene parameters as runtime inputs.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from blackhole_tpu import export as bh_export
from blackhole_tpu.geom.types import (
    BlackHole, Camera, Disk, Scene, SimConfig,
)
from blackhole_tpu.render import camera as cam_mod
from blackhole_tpu.render import trace


def _scene(mass=1.0, spin=0.5):
    return Scene(
        blackhole=BlackHole.create(mass, spin),
        disk=Disk.create(6.0, 20.0),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=60.0, max_steps=80
        ),
        disk_enabled=True,
    )


def _camera():
    return Camera.create(
        position=(0.0, -30.0, 8.0), direction=(0.0, 30.0, -8.0),
        up=(0.0, 0.0, 1.0), fov_deg=25.0,
    )


def test_roundtrip_trace_matches_live():
    scene = _scene()
    o, d = cam_mod.generate_rays(_camera(), 8, 8)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    blob = bh_export.export_trace(scene, n_rays=64)
    assert isinstance(blob, bytes) and len(blob) > 1000
    exported = bh_export.load(blob)
    got = bh_export.call_trace(exported, scene, o, d)
    want = trace.trace_rays(o, d, scene).color
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_artifact_serves_new_scene_params():
    """One artifact, many parameter settings (bh_configure_* analog):
    the serialized computation must track runtime mass/spin changes."""
    scene = _scene()
    o, d = cam_mod.generate_rays(_camera(), 8, 8)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    exported = bh_export.load(bh_export.export_trace(scene, n_rays=64))
    hot = dataclasses.replace(
        scene,
        blackhole=BlackHole.create(1.3, 0.9),
        disk=dataclasses.replace(scene.disk,
                                 inner_radius=jnp.float32(7.0)),
    )
    got = bh_export.call_trace(exported, hot, o, d)
    want = trace.trace_rays(o, d, hot).color
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # And it actually differs from the original params' output (8x8
    # oblique view is mostly lensed sky, so the bar is modest).
    base = bh_export.call_trace(exported, scene, o, d)
    assert np.abs(np.asarray(got) - np.asarray(base)).max() > 1e-4


def test_poly_batch_accepts_any_ray_count():
    scene = _scene()
    exported = bh_export.load(
        bh_export.export_trace(scene, poly_batch=True)
    )
    for size in (4, 10):
        o, d = cam_mod.generate_rays(_camera(), size, size)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        got = bh_export.call_trace(exported, scene, o, d)
        want = trace.trace_rays(o, d, scene).color
        # Symbolic-shape lowering reassociates a few ops: ~1e-6 noise.
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_render_artifact_camera_is_runtime():
    scene = _scene()
    exported = bh_export.load(
        bh_export.export_render(scene, _camera(), 12, 12)
    )
    img = bh_export.call_render(exported, scene, _camera())
    assert img.shape == (12, 12, 3)
    moved = dataclasses.replace(
        _camera(), position=jnp.asarray([0.0, -40.0, 12.0], jnp.float32),
        direction=jnp.asarray([0.0, 40.0, -12.0], jnp.float32),
    )
    img2 = bh_export.call_render(exported, scene, moved)
    assert np.abs(np.asarray(img2) - np.asarray(img)).max() > 1e-3
