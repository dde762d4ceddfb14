"""Lensed environment-map backgrounds (Scene.env_map).

Escaped rays sample an equirect panorama along their final deflected
direction — the physically-correct version of the reference's
screen-space starfield + lens warp (renderer.cpp:1349-1378, 1491-1689).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from blackhole_tpu.geom.types import (
    BlackHole, Camera, Disk, RayResult, Scene, SimConfig,
)
from blackhole_tpu.render import camera as cam
from blackhole_tpu.render import pallas_kernel, shading, trace
from blackhole_tpu.viz import effects


def test_sample_environment_uniform_map_is_constant():
    env = jnp.full((8, 16, 3), 0.25)
    dirs = jnp.array([
        [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0],
        [-0.6, 0.4, 0.2], [0.0, 0.0, -1.0],
    ])
    out = shading.sample_environment(dirs, env)
    np.testing.assert_allclose(np.asarray(out), 0.25, rtol=1e-6)


def test_sample_environment_hits_expected_texel():
    h, w = 64, 128
    env = jnp.zeros((h, w, 3))
    # Paint the texel at the +x equator direction: phi=0 -> u=w/2-0.5,
    # theta=pi/2 -> v=h/2-0.5; the -0.5 offsets land exactly between
    # texels, so paint the 2x2 neighbourhood.
    env = env.at[h // 2 - 1:h // 2 + 1, w // 2 - 1:w // 2 + 1].set(1.0)
    out = shading.sample_environment(jnp.array([1.0, 0.0, 0.0]), env)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)
    # Orthogonal direction reads zero.
    out2 = shading.sample_environment(jnp.array([0.0, 0.0, 1.0]), env)
    np.testing.assert_allclose(np.asarray(out2), 0.0, atol=1e-6)


def test_sample_environment_wraps_in_azimuth():
    """Bilinear filtering must be continuous across the phi = +-pi seam."""
    env = effects.starfield_envmap(32, 64, density=0.05)
    eps = 1e-4
    d1 = jnp.array([-1.0, -eps, 0.3])
    d2 = jnp.array([-1.0, +eps, 0.3])
    c1 = np.asarray(shading.sample_environment(d1, env))
    c2 = np.asarray(shading.sample_environment(d2, env))
    np.testing.assert_allclose(c1, c2, atol=1e-2)


def _scene(env, max_steps=300):
    return Scene(
        blackhole=BlackHole.create(1.0, 0.5),
        disk=Disk.create(6.0, 20.0),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=80.0, max_steps=max_steps,
        ),
        disk_enabled=True,
        env_map=env,
    )


def test_trace_uses_env_map_for_background():
    env = jnp.broadcast_to(
        jnp.array([0.9, 0.1, 0.2]), (16, 32, 3)
    )  # unmistakably non-gradient color
    scene = _scene(env, max_steps=1500)
    camera = Camera.create(
        position=(0.0, -30.0, 8.0),
        direction=(0.0, 30.0, -8.0),
        up=(0.0, 0.0, 1.0),
        fov_deg=25.0,
    )
    o, d = cam.generate_rays(camera, 24, 24)
    hit = trace.trace_rays(o.reshape(-1, 3), d.reshape(-1, 3), scene)
    res = np.asarray(hit.result)
    col = np.asarray(hit.color)
    bg = (res == RayResult.MAX_DISTANCE) | (res == RayResult.BACKGROUND)
    assert bg.any()
    np.testing.assert_allclose(
        col[bg], np.broadcast_to([0.9, 0.1, 0.2], col[bg].shape),
        rtol=1e-5,
    )
    # Captured rays stay black.
    capt = res == RayResult.HORIZON
    if capt.any():
        np.testing.assert_allclose(col[capt], 0.0, atol=1e-6)
    # Without the env map the same rays show the gradient instead.
    hit0 = trace.trace_rays(
        o.reshape(-1, 3), d.reshape(-1, 3),
        dataclasses.replace(scene, env_map=None),
    )
    col0 = np.asarray(hit0.color)
    assert not np.allclose(col0[bg], [0.9, 0.1, 0.2], rtol=1e-2)


def test_env_map_pallas_parity():
    env = effects.starfield_envmap(32, 64, density=0.01, seed=3)
    scene = _scene(env)
    camera = Camera.create(
        position=(0.0, -30.0, 8.0),
        direction=(0.0, 30.0, -8.0),
        up=(0.0, 0.0, 1.0),
        fov_deg=25.0,
    )
    o, d = cam.generate_rays(camera, 32, 32)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    hit_ref = trace.trace_rays(o, d, scene)
    hit_pal = pallas_kernel.trace_rays_pallas(o, d, scene, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(hit_pal.result), np.asarray(hit_ref.result)
    )
    np.testing.assert_allclose(
        np.asarray(hit_pal.color), np.asarray(hit_ref.color), atol=2e-4
    )
