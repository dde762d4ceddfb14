"""Step-bucketed gradient accumulation == full-budget gradients."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from blackhole_tpu.geom.types import BlackHole, Camera, Disk, Scene, SimConfig
from blackhole_tpu.grad import bucketed, diff_trace
from blackhole_tpu.render import camera as cam


def setup():
    scene = Scene(
        blackhole=BlackHole.create(1.0, 0.9),
        disk=Disk.create(6.0, 20.0),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=80.0, max_steps=128
        ),
        disk_enabled=True,
    )
    camera = Camera.create(
        position=(0.0, -30.0, 8.0),
        direction=(0.0, 30.0, -8.0),
        up=(0.0, 0.0, 1.0),
        fov_deg=25.0,
    )
    o, d = cam.generate_rays(camera, 16, 16)
    return scene, o.reshape(-1, 3), d.reshape(-1, 3)


def test_bucket_ladder():
    assert bucketed._buckets_for(1000) == (62, 125, 250, 500, 1000)
    assert bucketed._buckets_for(64) == (64,)


def test_bucketed_matches_full():
    scene, o, d = setup()

    def scene_fn(params):
        return dataclasses.replace(
            scene,
            blackhole=dataclasses.replace(
                scene.blackhole, mass=params["mass"], spin=params["spin"]
            ),
        )

    def loss_fn(colors, idx):
        return jnp.sum(colors)

    params = {"mass": jnp.float32(1.0), "spin": jnp.float32(0.9)}
    cache = {}
    loss, grads = bucketed.grad_over_chunks(
        scene_fn, params, o, d, loss_fn, chunks=4, cache=cache
    )

    def full_loss(params):
        hit = diff_trace.trace_rays_diff(o, d, scene_fn(params))
        return jnp.sum(hit.color)

    ref_loss, ref_grads = jax.value_and_grad(full_loss)(params)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for k in params:
        np.testing.assert_allclose(
            float(grads[k]), float(ref_grads[k]), rtol=1e-3, atol=1e-7
        )
    # Buckets drawn from the ladder only (at this tiny resolution every
    # chunk may straddle the shadow edge and use the full budget).
    assert set(cache) <= set(bucketed._buckets_for(128)), cache


def test_cache_reused_across_calls():
    scene, o, d = setup()

    def scene_fn(params):
        return dataclasses.replace(
            scene,
            blackhole=dataclasses.replace(
                scene.blackhole, mass=params["mass"]
            ),
        )

    cache = {}
    params = {"mass": jnp.float32(1.0)}
    bucketed.grad_over_chunks(
        scene_fn, params, o, d, lambda c, i: jnp.sum(c), chunks=4,
        cache=cache,
    )
    n_buckets = len(cache)
    params = {"mass": jnp.float32(1.01)}
    bucketed.grad_over_chunks(
        scene_fn, params, o, d, lambda c, i: jnp.sum(c), chunks=4,
        cache=cache,
    )
    assert len(cache) == n_buckets  # no recompiles for new param values
