"""Pallas kernel parity: interpret-mode kernel vs the XLA while_loop path.

The fused kernel must agree with trace.trace_rays (identical arithmetic,
different execution engine).  Runs in interpreter mode on the CPU test
backend; the compiled-TPU parity check lives in the benchmark harness.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_tpu.geom.types import BlackHole, Camera, Disk, Scene, SimConfig
from blackhole_tpu.render import camera as cam
from blackhole_tpu.render import pallas_kernel, trace


def make_case(spin, disk_enabled, max_steps=250, integrator="rk4"):
    scene = Scene(
        blackhole=BlackHole.create(1.0, spin),
        disk=Disk.create(6.0, 20.0),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=80.0, max_steps=max_steps,
            integrator=integrator,
        ),
        disk_enabled=disk_enabled,
    )
    camera = Camera.create(
        position=(0.0, -30.0, 8.0),
        direction=(0.0, 30.0, -8.0),
        up=(0.0, 0.0, 1.0),
        fov_deg=25.0,
    )
    o, d = cam.generate_rays(camera, 32, 32)
    return scene, o.reshape(-1, 3), d.reshape(-1, 3)


@pytest.mark.parametrize(
    "spin,disk", [(0.0, True), (0.9, True), (0.9, False)]
)
def test_pallas_matches_while_loop(spin, disk):
    scene, o, d = make_case(spin, disk)
    hit_ref = trace.trace_rays(o, d, scene)
    hit_pal = pallas_kernel.trace_rays_pallas(o, d, scene, interpret=True)

    np.testing.assert_array_equal(
        np.asarray(hit_pal.result), np.asarray(hit_ref.result)
    )
    np.testing.assert_allclose(
        np.asarray(hit_pal.color), np.asarray(hit_ref.color), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(hit_pal.distance), np.asarray(hit_ref.distance),
        atol=1e-3, rtol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(hit_pal.steps), np.asarray(hit_ref.steps)
    )


def test_pallas_pads_non_tile_batch():
    """Batch size not a multiple of 1024 must round-trip unchanged."""
    scene, o, d = make_case(0.9, True, max_steps=100)
    o, d = o[:777], d[:777]
    hit_ref = trace.trace_rays(o, d, scene)
    hit_pal = pallas_kernel.trace_rays_pallas(o, d, scene, interpret=True)
    assert hit_pal.result.shape == (777,)
    np.testing.assert_array_equal(
        np.asarray(hit_pal.result), np.asarray(hit_ref.result)
    )


@pytest.mark.slow
def test_pallas_forward_mode_gradients():
    """jax.jvp through the tangent-augmented kernel must match the
    reverse-mode checkpointed scan driver."""
    import dataclasses

    import jax

    from blackhole_tpu.grad import diff_trace

    scene, o, d = make_case(0.9, True, max_steps=200)
    o, d = o[:256], d[:256]
    m0, a0 = jnp.float32(1.0), jnp.float32(0.9)

    def loss_pallas(mass, spin):
        s = dataclasses.replace(
            scene,
            blackhole=dataclasses.replace(
                scene.blackhole, mass=mass, spin=spin
            ),
        )
        hit = pallas_kernel.trace_rays_pallas(o, d, s, interpret=True)
        return jnp.sum(hit.color) / hit.color.size

    def loss_rev(mass, spin):
        s = dataclasses.replace(
            scene,
            blackhole=dataclasses.replace(
                scene.blackhole, mass=mass, spin=spin
            ),
        )
        hit = diff_trace.trace_rays_diff(o, d, s)
        return jnp.sum(hit.color) / hit.color.size

    v1, dm = jax.jvp(lambda m: loss_pallas(m, a0), (m0,),
                     (jnp.float32(1.0),))
    _, da = jax.jvp(lambda a: loss_pallas(m0, a), (a0,),
                    (jnp.float32(1.0),))
    v2, (gm, ga) = jax.value_and_grad(loss_rev, argnums=(0, 1))(m0, a0)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(float(dm), float(gm), rtol=1e-3, atol=1e-8)
    np.testing.assert_allclose(float(da), float(ga), rtol=1e-3, atol=1e-8)


@pytest.mark.parametrize("spin,disk", [(0.9, True), (0.0, False)])
def test_pallas_rkf45_matches_while_loop(spin, disk):
    """Adaptive kernel vs the XLA adaptive path.  Result codes must be
    identical; colors agree in distribution only — RKF45's accept/reject
    cascade amplifies ulp-level arithmetic-order differences into
    different step *sequences* (steps counts differ by a few), so
    bitwise color parity is impossible for chaotic geodesics."""
    from blackhole_tpu.geom.types import RayResult

    scene, o, d = make_case(spin, disk, max_steps=192, integrator="rkf45")
    o, d = o[:512], d[:512]
    hit_ref = trace.trace_rays(o, d, scene)
    hit_pal = pallas_kernel.trace_rays_pallas(o, d, scene, interpret=True)
    res = np.asarray(hit_ref.result)
    np.testing.assert_array_equal(np.asarray(hit_pal.result), res)
    dc = np.max(
        np.abs(np.asarray(hit_pal.color) - np.asarray(hit_ref.color)),
        axis=-1,
    )
    # Budget-exhausted rays are excluded from color comparison: their
    # terminal radius (hence trapped-black vs sky classification) is a
    # function of the engine's exact step sequence.
    dc = dc[res != RayResult.MAX_STEPS]
    assert float(dc.mean()) < 2e-3
    assert float(np.percentile(dc, 99)) < 3e-2


@pytest.mark.slow
def test_pallas_fast_grad_value_and_grad():
    """grad.fast_grad drives one jvp per scalar through the kernel and
    must reproduce reverse-mode gradients for a params pytree.

    slow: the value_and_grad_fwd DRIVER is what this adds; its
    single-tangent kernel path keeps default coverage via
    test_kerr_shading.test_kerr_mode_engine_parity_and_grad and
    test_grad.test_near_critical_tangents_are_finite_and_bounded
    (both jvp through the same tangent-augmented kernel), and the
    multi-tangent driver (the bench headline path) stays default in
    test_pallas_multi_tangent_value_and_grad."""
    import dataclasses

    import jax

    from blackhole_tpu.grad import diff_trace, fast_grad

    scene, o, d = make_case(0.9, True, max_steps=80)
    o, d = o[:128], d[:128]

    def build(p):
        return dataclasses.replace(
            scene,
            blackhole=dataclasses.replace(
                scene.blackhole, mass=p["mass"], spin=p["spin"]
            ),
        )

    def loss_fwd(p):
        hit = pallas_kernel.trace_rays_pallas(o, d, build(p),
                                              interpret=True)
        return jnp.sum(hit.color) / hit.color.size

    def loss_rev(p):
        hit = diff_trace.trace_rays_diff(o, d, build(p))
        return jnp.sum(hit.color) / hit.color.size

    p0 = {"mass": jnp.float32(1.0), "spin": jnp.float32(0.9)}
    v1, g1 = jax.jit(fast_grad.value_and_grad_fwd(loss_fwd))(p0)
    v2, g2 = jax.jit(jax.value_and_grad(loss_rev))(p0)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(
        float(g1["mass"]), float(g2["mass"]), rtol=1e-3, atol=1e-8
    )
    np.testing.assert_allclose(
        float(g1["spin"]), float(g2["spin"]), rtol=1e-3, atol=1e-8
    )


def test_pallas_multi_tangent_value_and_grad():
    """scene_value_and_grad propagates ALL parameter tangents in one
    kernel pass and must agree with reverse mode.  Kept in the DEFAULT
    suite (shrunk to 128 rays / 100 steps): this is the only default
    coverage of the multi-tangent JVP kernel the bench headline runs."""
    import dataclasses

    import jax

    from blackhole_tpu.grad import diff_trace, fast_grad

    scene, o, d = make_case(0.9, True, max_steps=48)
    o, d = o[:64], d[:64]

    def scene_fn(p):
        return dataclasses.replace(
            scene,
            blackhole=dataclasses.replace(
                scene.blackhole, mass=p["mass"], spin=p["spin"]
            ),
        )

    def loss_of_hit(hit):
        return jnp.sum(hit.color) / hit.color.size

    vg = fast_grad.scene_value_and_grad(loss_of_hit, scene_fn,
                                        interpret=True)
    p0 = {"mass": jnp.float32(1.0), "spin": jnp.float32(0.9)}
    # jit the whole pass: the fwdgrad driver is eager python around the
    # interpret kernel, and eager per-op dispatch costs ~40 s here.
    v1, g1 = jax.jit(lambda p: vg(p, o, d))(p0)
    v2, g2 = jax.value_and_grad(
        lambda p: loss_of_hit(diff_trace.trace_rays_diff(o, d, scene_fn(p)))
    )(p0)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(
        float(g1["mass"]), float(g2["mass"]), rtol=1e-3, atol=1e-8
    )
    np.testing.assert_allclose(
        float(g1["spin"]), float(g2["spin"]), rtol=1e-3, atol=1e-8
    )


def test_pallas_depth_sorted_is_bitwise_identical():
    """Depth-sorted tiling only regroups rays across tiles; per-ray math
    is mask-based and lane-independent, so results must be BITWISE equal
    to the raster-order trace after un-permuting."""
    import jax

    from blackhole_tpu.render import image as image_mod

    scene, o, d = make_case(0.9, True, max_steps=150)
    camera = Camera.create(
        position=(0.0, -30.0, 8.0),
        direction=(0.0, 30.0, -8.0),
        up=(0.0, 0.0, 1.0),
        fov_deg=25.0,
    )
    order = image_mod.predicted_depth_order(
        scene, camera, 32, 32, block=4, interpret=True
    )
    perm = np.asarray(order)
    assert sorted(perm.tolist()) == list(range(1024))  # valid permutation
    hit_raster = pallas_kernel.trace_rays_pallas(o, d, scene,
                                                 interpret=True)
    hit_sorted = pallas_kernel.trace_rays_pallas(o, d, scene,
                                                 interpret=True,
                                                 order=order)
    for leaf_r, leaf_s in zip(
        jax.tree_util.tree_leaves(hit_raster),
        jax.tree_util.tree_leaves(hit_sorted),
    ):
        np.testing.assert_array_equal(np.asarray(leaf_r),
                                      np.asarray(leaf_s))


@pytest.mark.slow
def test_pallas_depth_sorted_fwdgrad_matches_unsorted():
    """The multi-tangent kernel under a depth-sort permutation must
    return the same hit AND tangents as the unsorted call."""
    import dataclasses

    import jax

    from blackhole_tpu.grad import fast_grad

    scene, o, d = make_case(0.9, True, max_steps=120)
    o, d = o[:512], d[:512]

    def scene_fn(p):
        return dataclasses.replace(
            scene,
            blackhole=dataclasses.replace(
                scene.blackhole, mass=p["mass"], spin=p["spin"]
            ),
        )

    def loss_of_hit(hit):
        return jnp.sum(hit.color) / hit.color.size

    vg = fast_grad.scene_value_and_grad(loss_of_hit, scene_fn,
                                        interpret=True)
    p0 = {"mass": jnp.float32(1.0), "spin": jnp.float32(0.9)}
    key = jax.random.PRNGKey(7)
    order = jax.random.permutation(key, 512)
    v1, g1 = vg(p0, o, d)
    v2, g2 = vg(p0, o, d, order=order)
    np.testing.assert_array_equal(np.float32(v1), np.float32(v2))
    np.testing.assert_allclose(
        float(g1["mass"]), float(g2["mass"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(g1["spin"]), float(g2["spin"]), rtol=1e-6
    )


def test_engine_fallback_to_xla_when_pallas_unavailable():
    """On a CPU backend a compiled (non-interpret) pallas call cannot
    lower; trace_rays_fast must degrade to the XLA path — the analog of
    the reference's GPU -> CPU raytrace fallback
    (renderer.cpp:1880-1887, 2086-2092)."""
    from blackhole_tpu.render import image as image_mod

    scene, o, d = make_case(0.9, True, max_steps=100)
    o, d = o[:64], d[:64]
    hit_ref = trace.trace_rays(o, d, scene)
    hit_fb = image_mod.trace_rays_fast(o, d, scene, engine="pallas")
    np.testing.assert_array_equal(
        np.asarray(hit_fb.result), np.asarray(hit_ref.result)
    )


def test_pallas_rejects_unsupported_integrator():
    scene, o, d = make_case(0.9, True)
    import dataclasses

    cfg = SimConfig.create(integrator="leapfrog")
    scene2 = dataclasses.replace(scene, config=cfg)
    with pytest.raises(ValueError):
        pallas_kernel.trace_rays_pallas(o, d, scene2, interpret=True)


def test_pallas_soft_shadow_matches_while_loop():
    """Engine parity with the differentiable shadow boundary ON
    (min_r output plane + soft compositing share trace.finalize)."""
    import dataclasses

    scene, o, d = make_case(0.9, True, max_steps=400)
    scene = dataclasses.replace(
        scene,
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=80.0, max_steps=400,
            shadow_softness=0.25,
        ),
    )
    hit_ref = trace.trace_rays(o, d, scene)
    hit_pal = pallas_kernel.trace_rays_pallas(o, d, scene, interpret=True)
    np.testing.assert_allclose(
        np.asarray(hit_pal.min_r), np.asarray(hit_ref.min_r), rtol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(hit_pal.color), np.asarray(hit_ref.color), atol=2e-5
    )
