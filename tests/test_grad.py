"""Gradient correctness: differentiable trace vs finite differences,
checkpointed-scan vs while_loop forward parity, inverse-rendering descent.

SURVEY.md §4 implication (d): gradient checks through the renderer; the
reference engine has no differentiability at all, so the oracle is
float64 finite differencing of our own forward pass.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from blackhole_tpu.geom.types import BlackHole, Camera, Disk, Scene, SimConfig
from blackhole_tpu.grad import diff_trace, inverse
from blackhole_tpu.render import image as image_mod


def small_scene(spin=0.5, dtype=jnp.float64, max_steps=150):
    return Scene(
        blackhole=BlackHole.create(1.0, spin, dtype=dtype),
        disk=Disk.create(6.0, 20.0, dtype=dtype),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=80.0, max_steps=max_steps,
            dtype=dtype,
        ),
        disk_enabled=True,
    )


def small_camera(dtype=jnp.float64):
    return Camera.create(
        position=(0.0, -30.0, 8.0),
        direction=(0.0, 30.0, -8.0),
        up=(0.0, 0.0, 1.0),
        fov_deg=25.0,
        dtype=dtype,
    )


def test_diff_forward_matches_while_loop():
    """The scan-driven differentiable forward must reproduce the
    while_loop renderer (identical step function, identical masks)."""
    scene, camera = small_scene(), small_camera()
    img_ref = image_mod.render_image(scene, camera, width=16, height=16)
    img_diff = diff_trace.render_image_diff(scene, camera, 16, 16)
    np.testing.assert_allclose(
        np.asarray(img_diff), np.asarray(img_ref), atol=1e-10
    )


@pytest.mark.parametrize("param", ["mass", "spin"])
def test_pixel_gradients_match_finite_differences(param):
    """d(mean image)/d(param) vs float64 central differences.

    Interior pixels vary smoothly with (M, a); the FD step is small
    enough that no pixel changes its hit branch for this scene."""
    scene, camera = small_scene(), small_camera()

    def loss(v):
        bh = dataclasses.replace(scene.blackhole, **{param: v})
        s = dataclasses.replace(scene, blackhole=bh)
        return jnp.mean(diff_trace.render_image_diff(s, camera, 8, 8))

    v0 = jnp.float64(1.0 if param == "mass" else 0.5)
    g = jax.grad(loss)(v0)
    eps = 1e-6
    fd = (loss(v0 + eps) - loss(v0 - eps)) / (2 * eps)
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-3)


def test_gradients_finite_at_high_spin():
    scene, camera = small_scene(spin=0.95), small_camera()

    def loss(spin):
        bh = dataclasses.replace(scene.blackhole, spin=spin)
        return jnp.mean(
            diff_trace.render_image_diff(
                dataclasses.replace(scene, blackhole=bh), camera, 6, 6
            )
        )

    g = jax.grad(loss)(jnp.float64(0.95))
    assert np.isfinite(float(g))


def test_inverse_rendering_recovers_mass():
    """Gradient descent on mass from a perturbed start must move toward
    the target (BASELINE.json config 5, single-host slice)."""
    scene, camera = small_scene(max_steps=150), small_camera()
    target = diff_trace.render_image_diff(scene, camera, 16, 16)

    bad = dataclasses.replace(
        scene, blackhole=BlackHole.create(1.15, 0.5, dtype=jnp.float64)
    )
    # lr 2e-2: the default "auto" kinematics' exact g-factor steepens
    # d(loss)/d(mass) near the disk inner edge; 5e-2 (tuned on compat
    # shading) oscillates around the optimum instead of descending.
    fitted_scene, _, losses = inverse.fit(
        target, bad, camera, 16, 16, steps=25, learning_rate=2e-2,
        optimize=("log_mass",),
    )
    assert losses[-1] < 0.5 * losses[0]
    assert abs(float(fitted_scene.blackhole.mass) - 1.0) < abs(1.15 - 1.0)
    # Frozen parameters must not move.
    assert float(fitted_scene.blackhole.spin) == pytest.approx(0.5)


def test_inverse_rendering_recovers_spin():
    """Spin recovery (BASELINE config 5 names mass, spin, disk radii,
    camera pose — each group gets its own convergence test)."""
    scene, camera = small_scene(spin=0.9, max_steps=150), small_camera()
    target = diff_trace.render_image_diff(scene, camera, 16, 16)

    bad = dataclasses.replace(
        scene, blackhole=BlackHole.create(1.0, 0.6, dtype=jnp.float64)
    )
    fitted_scene, _, losses = inverse.fit(
        target, bad, camera, 16, 16, steps=40, learning_rate=8e-2,
        optimize=("spin_raw",),
    )
    assert losses[-1] < 0.5 * losses[0]
    assert abs(float(fitted_scene.blackhole.spin) - 0.9) < abs(0.6 - 0.9)
    assert float(fitted_scene.blackhole.mass) == pytest.approx(1.0)


def test_inverse_rendering_recovers_disk_radii():
    scene, camera = small_scene(max_steps=150), small_camera()
    target = diff_trace.render_image_diff(scene, camera, 16, 16)

    bad = dataclasses.replace(
        scene, disk=Disk.create(7.5, 17.0, dtype=jnp.float64)
    )
    fitted_scene, _, losses = inverse.fit(
        target, bad, camera, 16, 16, steps=40, learning_rate=5e-2,
        optimize=("log_disk_inner", "log_disk_width"),
    )
    assert losses[-1] < 0.5 * losses[0]
    assert abs(float(fitted_scene.disk.inner_radius) - 6.0) < abs(7.5 - 6.0)
    assert abs(float(fitted_scene.disk.outer_radius) - 20.0) < abs(
        17.0 - 20.0
    )


def test_inverse_rendering_recovers_camera_pose():
    """Camera-position recovery: gradients flow through ray generation
    (generate_rays is part of the differentiable graph)."""
    scene, camera = small_scene(max_steps=150), small_camera()
    target = diff_trace.render_image_diff(scene, camera, 16, 16)

    bad_cam = dataclasses.replace(
        camera,
        position=jnp.asarray([0.5, -29.0, 8.7], jnp.float64),
    )
    _, fitted_cam, losses = inverse.fit(
        target, scene, bad_cam, 16, 16, steps=40, learning_rate=3e-2,
        optimize=("cam_position",),
    )
    err0 = float(jnp.linalg.norm(bad_cam.position - camera.position))
    err1 = float(jnp.linalg.norm(fitted_cam.position - camera.position))
    assert losses[-1] < 0.5 * losses[0]
    assert err1 < err0


@pytest.mark.slow
def test_fit_forward_recovers_mass_and_spin():
    """Forward-mode inverse rendering (one multi-tangent Pallas pass per
    step, interpret mode on CPU) must descend like the reverse path."""
    scene = Scene(
        blackhole=BlackHole.create(1.0, 0.9, dtype=jnp.float32),
        disk=Disk.create(6.0, 20.0, dtype=jnp.float32),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=80.0, max_steps=120,
            dtype=jnp.float32,
        ),
        disk_enabled=True,
    )
    camera = small_camera(dtype=jnp.float32)
    target = image_mod.render_image(scene, camera, width=16, height=16)

    bad = dataclasses.replace(
        scene, blackhole=BlackHole.create(1.12, 0.7, dtype=jnp.float32)
    )
    fitted_scene, _, losses = inverse.fit_forward(
        target, bad, camera, 16, 16, steps=20, learning_rate=5e-2,
        optimize=("log_mass", "spin_raw"), interpret=True,
    )
    assert losses[-1] < 0.6 * losses[0]
    assert abs(float(fitted_scene.blackhole.mass) - 1.0) < abs(1.12 - 1.0)


def test_pack_unpack_roundtrip():
    scene, camera = small_scene(spin=0.7), small_camera()
    params = inverse.pack_params(scene, camera)
    s2, c2 = inverse.unpack_params(params, scene, camera)
    np.testing.assert_allclose(float(s2.blackhole.mass), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(s2.blackhole.spin), 0.7, rtol=1e-5)
    np.testing.assert_allclose(
        float(s2.disk.outer_radius), 20.0, rtol=1e-6
    )
    np.testing.assert_allclose(float(c2.fov_deg), 25.0, rtol=1e-6)


def _near_critical_rays(n=8, dtype=jnp.float32):
    """Equatorial Schwarzschild rays bracketing b_crit = sqrt(27) M.

    Chaotic photon-shell orbits have positive Lyapunov exponents, so
    forward-mode tangents of these rays grow exponentially and overflow
    float32 within the step budget unless guarded
    (integrate.sensitivity.tangent_guard).
    """
    b_crit = float(np.sqrt(27.0))
    offsets = np.concatenate([
        b_crit + np.geomspace(1e-5, 1e-3, n // 2),
        b_crit - np.geomspace(1e-5, 1e-3, n // 2),
    ])
    o = jnp.stack(
        [jnp.full((n,), -30.0, dtype),
         jnp.asarray(offsets, dtype),
         jnp.zeros((n,), dtype)], axis=-1,
    )
    d = jnp.tile(jnp.asarray([1.0, 0.0, 0.0], dtype), (n, 1))
    return o, d


@pytest.mark.parametrize("engine", ["xla", "pallas"])
def test_near_critical_tangents_are_finite_and_bounded(engine):
    """Forward-mode tangents of photon-shell-grazing rays stay finite.

    Regression: at 1024^2 / a=0.9 / f32, 21 rays' d(color)/d(mass) went
    NaN and the finite tail reached 2.5e9 before the per-step tangent
    guard; now every tangent is finite and the per-ray magnitude is
    bounded by the guard (modulo bounded post-loop shading growth)."""
    from blackhole_tpu.integrate.sensitivity import TANGENT_LIMIT
    from blackhole_tpu.render import pallas_kernel, trace

    o, d = _near_critical_rays()
    scene = Scene(
        blackhole=BlackHole.create(1.0, 0.0, dtype=jnp.float32),
        disk=Disk.create(6.0, 20.0, dtype=jnp.float32),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=150.0, max_steps=500,
            dtype=jnp.float32,
        ),
        disk_enabled=True,
    )

    def color_of(mass):
        s = dataclasses.replace(
            scene, blackhole=dataclasses.replace(scene.blackhole, mass=mass)
        )
        if engine == "xla":
            return trace.trace_rays(o, d, s).color
        return pallas_kernel.trace_rays_pallas(o, d, s, interpret=True).color

    _, dc = jax.jvp(
        color_of, (jnp.float32(1.0),), (jnp.float32(1.0),)
    )
    dc = np.asarray(dc)
    assert np.isfinite(dc).all(), dc
    assert np.abs(dc).max() <= 10.0 * TANGENT_LIMIT, np.abs(dc).max()


def _oblique_rays(size=48, dtype=jnp.float32):
    from blackhole_tpu.render import camera as cam_mod

    camera = Camera.create(
        position=(0.0, -35.0, 12.0), direction=(0.0, 35.0, -12.0),
        up=(0.0, 0.0, 1.0), fov_deg=22.0, dtype=dtype,
    )
    o, d = cam_mod.generate_rays(camera, size, size)
    return o.reshape(-1, 3), d.reshape(-1, 3)


def _soft_scene(softness, dtype=jnp.float32):
    return Scene(
        blackhole=BlackHole.create(1.0, 0.9, dtype=dtype),
        disk=Disk.create(6.0, 20.0, dtype=dtype),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=150.0, max_steps=800,
            shadow_softness=softness, dtype=dtype,
        ),
        disk_enabled=True,
    )


def test_min_r_matches_analytic_periapsis():
    """Hit.min_r of an escaping equatorial Schwarzschild ray equals the
    analytic periapsis: the largest root of r^3 - b^2 r + 2 M b^2 = 0."""
    from blackhole_tpu.render import trace

    b = 10.0
    o = jnp.asarray([[-60.0, b, 0.0]], jnp.float64)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float64)
    scene = Scene(
        blackhole=BlackHole.create(1.0, 0.0, dtype=jnp.float64),
        disk=Disk.create(6.0, 20.0, dtype=jnp.float64),
        config=SimConfig.create(
            time_step=0.05, max_ray_distance=200.0, max_steps=6000,
            dtype=jnp.float64,
        ),
        disk_enabled=False,
    )
    hit = trace.trace_rays(o, d, scene)
    roots = np.roots([1.0, 0.0, -b * b, 2.0 * b * b])
    r_peri = float(np.max(roots[np.isreal(roots)].real))
    np.testing.assert_allclose(float(hit.min_r[0]), r_peri, rtol=2e-3)


def test_soft_shadow_gradients_track_finite_differences():
    """With shadow_softness on, visibility gradients become pathwise-
    visible: d(mean color)/d(disk inner radius) matches FD closely (the
    annulus window carries the whole edge), and d/d(mass) has the right
    SIGN and magnitude band (shadow-boundary flips are smoothed; some
    residual hard flips remain at 48^2).  With a hard edge (softness 0)
    the mass gradient at this scene is an order of magnitude off FD —
    measured wrong-signed at 256^2."""
    from blackhole_tpu.render import trace

    o, d = _oblique_rays(48)
    soft = 0.3

    def loss_mass(m):
        s = _soft_scene(soft)
        s = dataclasses.replace(
            s, blackhole=dataclasses.replace(s.blackhole, mass=m)
        )
        return jnp.mean(trace.trace_rays(o, d, s).color)

    def loss_rin(r):
        s = _soft_scene(soft)
        s = dataclasses.replace(
            s, disk=dataclasses.replace(s.disk, inner_radius=r)
        )
        return jnp.mean(trace.trace_rays(o, d, s).color)

    v, dv = jax.jvp(loss_rin, (jnp.float32(6.0),), (jnp.float32(1.0),))
    eps = 1e-2
    fd = (float(loss_rin(jnp.float32(6.0 + eps)))
          - float(loss_rin(jnp.float32(6.0 - eps)))) / (2 * eps)
    assert np.sign(fd) == np.sign(float(dv))
    np.testing.assert_allclose(float(dv), fd, rtol=0.3)

    v, dv = jax.jvp(loss_mass, (jnp.float32(1.0),), (jnp.float32(1.0),))
    eps = 3e-3
    fd = (float(loss_mass(jnp.float32(1.0 + eps)))
          - float(loss_mass(jnp.float32(1.0 - eps)))) / (2 * eps)
    assert np.sign(fd) == np.sign(float(dv))
    assert 0.2 * abs(fd) <= abs(float(dv)) <= 2.0 * abs(fd)


def test_crossing_opacity_mse_gradient_matches_fd():
    """The round-4 acceptance bar (VERDICT r3 #2): with the full soft
    stack (min_r shadow survival + annulus window + crossing opacity +
    TANGENT_CLIP), pathwise d(MSE)/d(mass) tracks central finite
    differences within 20% on BOTH sides of the optimum.  Before the
    crossing-opacity carry this plateaued at ~73% of FD (PERF.md):
    disk plane enter/exit flips carried no pathwise gradient."""
    from blackhole_tpu.grad import fast_grad
    from blackhole_tpu.render import trace

    o, d = _oblique_rays(48)

    def render(mass):
        # 300 steps: enough to resolve every primary disk image at this
        # oblique view; at deeper budgets the chaotic photon-shell tail
        # grows and the TANGENT_CLIP winsorization bites harder (48^2 is
        # also FD-noisy there) — the 256^2 measurement lives in
        # tools/grad_fidelity.py + PERF.md.
        s = _soft_scene(0.3)
        s = dataclasses.replace(
            s,
            blackhole=dataclasses.replace(s.blackhole, mass=mass),
            config=dataclasses.replace(s.config, max_steps=300),
        )
        return fast_grad.clip_color_tangent(trace.trace_rays(o, d, s)).color

    target = render(jnp.float32(1.0))

    def loss(mass):
        return 0.5 * jnp.mean((render(mass) - target) ** 2)

    for m0, eps in ((1.03, 3e-3), (0.98, 3e-3)):
        m0 = jnp.float32(m0)
        _, dv = jax.jvp(loss, (m0,), (jnp.float32(1.0),))
        fd = (float(loss(m0 + eps)) - float(loss(m0 - eps))) / (2 * eps)
        assert np.sign(float(dv)) == np.sign(fd), (float(dv), fd)
        np.testing.assert_allclose(float(dv), fd, rtol=0.2)


def test_near_critical_reverse_gradients_are_finite():
    """Reverse-mode twin of the tangent-guard regression: the adjoint
    of photon-shell-grazing rays overflows f32 without the per-step
    cotangent guard in grad.diff_trace."""
    o, d = _near_critical_rays()
    scene = Scene(
        blackhole=BlackHole.create(1.0, 0.0, dtype=jnp.float32),
        disk=Disk.create(6.0, 20.0, dtype=jnp.float32),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=150.0, max_steps=500,
            dtype=jnp.float32,
        ),
        disk_enabled=True,
    )

    def loss(mass):
        s = dataclasses.replace(
            scene, blackhole=dataclasses.replace(scene.blackhole, mass=mass)
        )
        return jnp.sum(diff_trace.trace_rays_diff(o, d, s).color)

    g = jax.grad(loss)(jnp.float32(1.0))
    assert np.isfinite(float(g)), g
