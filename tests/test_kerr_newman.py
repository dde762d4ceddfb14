"""Kerr-Newman (charged) spacetime: metric family, tracer, gradients.

The reference only uses charge in its horizon discriminant
(spacetime.c:331-366, sqrt(M^2 - a^2 - Q^2)); here the whole charged
family is traced end-to-end.  Correctness oracles: the closed-form
Reissner-Nordstrom photon sphere / critical impact parameter, metric
inverse identity, Hamiltonian conservation, and autodiff of the
Hamiltonian as the RHS oracle.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_tpu.geom.types import BlackHole, Disk, RayResult, Scene, SimConfig
from blackhole_tpu.metrics import christoffel, derived, kerr
from blackhole_tpu.render import geodesic, pallas_kernel, trace


def test_kerr_newman_metric_inverse_identity():
    r = jnp.array([3.0, 5.3, 12.0])
    th = jnp.array([0.4, 1.1, 2.2])
    for a, Q in [(0.0, 0.6), (0.6, 0.5), (0.9, 0.3)]:
        g = kerr.metric_matrix(r, th, 1.0, a, Q)
        gi = kerr.inverse_metric_matrix(r, th, 1.0, a, Q)
        np.testing.assert_allclose(
            np.asarray(g @ gi), np.broadcast_to(np.eye(4), (3, 4, 4)),
            atol=1e-5,
        )


def test_kerr_newman_reduces_to_kerr_at_zero_charge():
    g0 = kerr.metric(5.0, 1.2, 1.0, 0.7)
    g1 = kerr.metric(5.0, 1.2, 1.0, 0.7, 0.0)
    for c0, c1 in zip(g0, g1):
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))


def test_kerr_newman_rhs_matches_hamiltonian_autodiff():
    """The hand-derived charged dH/dr and dH/dtheta must equal jax.grad
    of the closed-form Hamiltonian."""
    M, a, Q = 1.0, 0.6, 0.5
    E, L = 1.0, 3.2
    y = jnp.array([5.3, 1.1, 0.2, 0.1, -0.3, 0.0], jnp.float64)
    dH_r = jax.grad(geodesic.hamiltonian, argnums=0)(
        y[0], y[1], y[3], y[4], E, L, M, a, Q
    )
    dH_th = jax.grad(geodesic.hamiltonian, argnums=1)(
        y[0], y[1], y[3], y[4], E, L, M, a, Q
    )
    d = geodesic.rhs(y, E, L, M, a, Q)
    np.testing.assert_allclose(float(d[3]), -float(dH_r), rtol=1e-10)
    np.testing.assert_allclose(float(d[4]), -float(dH_th), rtol=1e-10)


def test_kerr_newman_christoffel_metric_compatibility():
    """nabla_c g_ab = d_c g_ab - Gamma^d_ca g_db - Gamma^d_cb g_ad = 0."""
    r, th, M, a, Q = 4.7, 1.0, 1.0, 0.5, 0.6
    gamma = christoffel.christoffel(r, th, M, a, Q)
    dg_dr = jax.jacfwd(lambda rr: kerr.metric_matrix(rr, th, M, a, Q))(r)
    dg_dth = jax.jacfwd(lambda t: kerr.metric_matrix(r, t, M, a, Q))(th)
    g = kerr.metric_matrix(r, th, M, a, Q)
    partial = jnp.stack(
        [jnp.zeros_like(dg_dr), dg_dr, dg_dth, jnp.zeros_like(dg_dr)], 0
    )
    nabla = (
        partial
        - jnp.einsum("dca,db->cab", gamma, g)
        - jnp.einsum("dcb,ad->cab", gamma, g)
    )
    np.testing.assert_allclose(np.asarray(nabla), 0.0, atol=1e-6)


def _rn_scene(charge, max_steps=4000):
    return Scene(
        blackhole=BlackHole.create(1.0, 0.0, charge),
        disk=Disk.create(6.0, 20.0),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=120.0, max_steps=max_steps,
        ),
        disk_enabled=False,
    )


def test_reissner_nordstrom_capture_threshold():
    """Capture/escape classification around the analytic RN critical
    impact parameter: b_crit = r_ph / sqrt(f(r_ph)) with
    r_ph = (3M + sqrt(9M^2 - 8Q^2))/2.  Q = 0.6 M shrinks b_crit from
    sqrt(27) = 5.196 M to ~4.846 M; a Schwarzschild tracer would
    misclassify rays between the two."""
    charge = 0.6
    # r_ph = (3 + sqrt(9 - 8*0.36))/2 = 2.7369,
    # b = r_ph / sqrt(1 - 2/r_ph + 0.36/r_ph^2) = 4.8586.
    b_crit = float(derived.rn_critical_impact_parameter(1.0, charge))
    np.testing.assert_allclose(b_crit, 4.8586, atol=2e-3)

    scene = _rn_scene(charge)
    bs = jnp.array([0.80, 0.90, 0.96, 1.04, 1.10, 1.20]) * b_crit
    n = bs.shape[0]
    origins = jnp.stack(
        [bs, jnp.full((n,), -60.0), jnp.zeros((n,))], axis=-1
    )
    dirs = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))
    hit = trace.trace_rays(origins, dirs, scene)
    res = np.asarray(hit.result)
    assert (res[:3] == RayResult.HORIZON).all(), res
    assert (res[3:] != RayResult.HORIZON).all(), res

    # Schwarzschild comparison: the ray at 1.04 b_crit(RN) = 5.05 M is
    # INSIDE the uncharged critical radius sqrt(27) = 5.196 M and must
    # be captured there (so an uncharged tracer would misclassify it),
    # while 1.10 b_crit(RN) = 5.34 M stays outside and escapes.
    scene0 = _rn_scene(0.0)
    hit0 = trace.trace_rays(origins, dirs, scene0)
    res0 = np.asarray(hit0.result)
    assert res0[3] == RayResult.HORIZON, res0
    assert res0[4] != RayResult.HORIZON, res0


def test_kerr_newman_hamiltonian_conservation():
    """H = 0 and the Carter constant are conserved along a charged-Kerr
    null geodesic (float64 XLA path)."""
    M, a_spin, Q = 1.0, 0.6, 0.5
    scene = Scene(
        blackhole=BlackHole.create(M, a_spin, Q, dtype=jnp.float64),
        disk=Disk.create(6.0, 20.0, dtype=jnp.float64),
        config=SimConfig.create(
            time_step=0.05, max_ray_distance=80.0, max_steps=2000,
            dtype=jnp.float64,
        ),
        disk_enabled=False,
    )
    o = jnp.array([[6.5, -40.0, 3.0]], jnp.float64)
    d = jnp.array([[0.0, 1.0, 0.05]], jnp.float64)
    d = d / jnp.linalg.norm(d)
    a = scene.blackhole.a
    y0, E, L, Q_carter0 = geodesic.init_null_rays(
        o, d, scene.blackhole.mass, a, scene.blackhole.charge
    )
    H0 = geodesic.hamiltonian(
        y0[..., 0], y0[..., 1], y0[..., 3], y0[..., 4], E, L,
        scene.blackhole.mass, a, scene.blackhole.charge,
    )
    np.testing.assert_allclose(np.asarray(H0), 0.0, atol=1e-12)

    # Integrate a stretch and re-evaluate H and the Carter constant.
    step_fn, adaptive = trace.make_step_fn(scene)
    carry = trace.init_carry(o, d, scene)
    for _ in range(400):
        carry = trace.trace_step(carry, scene, step_fn, adaptive)
    y = carry.y
    H = geodesic.hamiltonian(
        y[..., 0], y[..., 1], y[..., 3], y[..., 4], E, L,
        scene.blackhole.mass, a, scene.blackhole.charge,
    )
    Q_carter = geodesic.carter_constant(y, E, L, a)
    assert float(jnp.max(jnp.abs(H))) < 1e-7
    np.testing.assert_allclose(
        np.asarray(Q_carter), np.asarray(Q_carter0), rtol=1e-6
    )


def test_kerr_newman_pallas_parity():
    """Interpret-mode kernel vs XLA path for a charged, spinning hole."""
    from blackhole_tpu.geom.types import Camera
    from blackhole_tpu.render import camera as cam

    scene = Scene(
        blackhole=BlackHole.create(1.0, 0.6, 0.5),
        disk=Disk.create(6.0, 20.0),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=80.0, max_steps=250,
        ),
        disk_enabled=True,
    )
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
        np.asarray(hit_pal.color), np.asarray(hit_ref.color), atol=2e-5
    )


@pytest.mark.slow
def test_charge_gradient_through_kernel():
    """d(loss)/d(charge) via the multi-tangent kernel must match the
    reverse-mode checkpointed scan."""
    from blackhole_tpu.geom.types import Camera
    from blackhole_tpu.grad import diff_trace, fast_grad
    from blackhole_tpu.render import camera as cam

    scene = Scene(
        blackhole=BlackHole.create(1.0, 0.3, 0.5),
        disk=Disk.create(6.0, 20.0),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=80.0, max_steps=150,
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
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)

    def scene_fn(p):
        return dataclasses.replace(
            scene,
            blackhole=dataclasses.replace(
                scene.blackhole, charge=p["charge"]
            ),
        )

    def loss_of_hit(hit):
        return jnp.sum(hit.color) / hit.color.size

    vg = fast_grad.scene_value_and_grad(loss_of_hit, scene_fn,
                                        interpret=True)
    p0 = {"charge": jnp.float32(0.5)}
    v1, g1 = vg(p0, o, d)
    v2, g2 = jax.value_and_grad(
        lambda p: loss_of_hit(diff_trace.trace_rays_diff(o, d, scene_fn(p)))
    )(p0)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    assert abs(float(g2["charge"])) > 0.0  # charge actually matters
    np.testing.assert_allclose(
        float(g1["charge"]), float(g2["charge"]), rtol=1e-3, atol=1e-8
    )


def test_inverse_recovers_charge():
    """BASELINE config 5 extended to the charged family: recover Q from
    a target image by forward-mode gradient descent through the kernel."""
    from blackhole_tpu.geom.types import Camera
    from blackhole_tpu.grad import diff_trace, inverse

    true_scene = Scene(
        blackhole=BlackHole.create(1.0, 0.0, 0.6),
        disk=Disk.create(6.0, 20.0),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=80.0, max_steps=200,
        ),
        disk_enabled=True,
    )
    camera = Camera.create(
        position=(0.0, -30.0, 8.0),
        direction=(0.0, 30.0, -8.0),
        up=(0.0, 0.0, 1.0),
        fov_deg=25.0,
    )
    target = diff_trace.render_image_diff(true_scene, camera, 16, 16)
    start = dataclasses.replace(
        true_scene, blackhole=BlackHole.create(1.0, 0.0, 0.15)
    )
    fitted, _, losses = inverse.fit_forward(
        target, start, camera, 16, 16, steps=40, learning_rate=5e-2,
        optimize=("charge_raw",), interpret=True,
    )
    assert losses[-1] < 0.1 * losses[0], losses
    np.testing.assert_allclose(
        float(fitted.blackhole.charge), 0.6, atol=0.05
    )


def test_api_rejects_super_extremal_charge():
    from blackhole_tpu import api

    ctx = api.bh_initialize()
    assert api.bh_configure_black_hole(ctx, 1.0, 0.8, 0.7) == \
        api.BHError.INVALID_PARAMETER  # 0.64 + 0.49 > 1
    assert api.bh_configure_black_hole(ctx, 1.0, 0.6, 0.5) == \
        api.BHError.SUCCESS


def test_rn_photon_sphere_closed_form():
    np.testing.assert_allclose(
        float(derived.photon_sphere_radius(1.0, 0.0)), 3.0, rtol=1e-7
    )
    # Extremal RN: r_ph = 2M at Q = M.
    np.testing.assert_allclose(
        float(derived.photon_sphere_radius(1.0, 1.0)), 2.0, rtol=1e-6
    )
    # b_crit is monotone decreasing in charge.
    bs = [
        float(derived.rn_critical_impact_parameter(1.0, q))
        for q in (0.0, 0.3, 0.6, 0.9)
    ]
    np.testing.assert_allclose(bs[0], np.sqrt(27.0), rtol=1e-6)
    assert all(b1 > b2 for b1, b2 in zip(bs, bs[1:]))
