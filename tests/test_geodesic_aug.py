"""Trig-augmented hot-path formulation vs the direct-theta oracle.

The hot path (trace.py / pallas_kernel.py) integrates the augmented
state [r, th, ph, p_r, p_th, t, sin th, cos th, sin ph, cos ph]
(geodesic.rhs_aug): sin/cos ride as slaved ODE components with exact
dynamics, so the per-step flow is purely rational — zero
transcendentals — while keeping theta's analytic continuation through
the poles (unlike a u = cos theta chart change, which is singular
there; polar-plane L ~ 0 rays pass through the axis).  The direct form
(geodesic.rhs) is retained as the independently-validated oracle (its
closed forms are checked against jax.grad of the Hamiltonian in
test_christoffel.py); these tests pin the augmentation's exactness in
float64 and its drift control in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_tpu.geom import coords
from blackhole_tpu.geom.types import (
    BlackHole, Disk, Integrator, RayResult, Scene, SimConfig,
)
from blackhole_tpu.render import geodesic, trace

# x64 comes from conftest's hermetic-CPU setup; a module-level
# jax.config.update here would leak into other modules sharing the
# xdist worker process when BH_TPU_TESTS=1 deliberately leaves x64 off.


def _sample_states(n=64, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.uniform(2.5, 40.0, n)
    theta = rng.uniform(0.2, np.pi - 0.2, n)
    phi = rng.uniform(-np.pi, np.pi, n)
    p_r = rng.uniform(-1.5, 1.5, n)
    p_theta = rng.uniform(-8.0, 8.0, n)
    t = np.zeros(n)
    y = jnp.asarray(np.stack([r, theta, phi, p_r, p_theta, t], -1))
    L = jnp.asarray(rng.uniform(-6.0, 6.0, n))
    return y, L


@pytest.mark.parametrize("a,Q", [(0.0, 0.0), (0.9, 0.0), (0.6, 0.5)])
def test_rhs_aug_matches_rhs(a, Q):
    """The first 6 components of the augmented RHS must equal the
    direct-theta RHS, and the trig components must obey the exact
    slaved dynamics d(sin x)/dl = cos x * dx/dl."""
    y, L = _sample_states()
    ya = geodesic.augment_state(y)
    d6 = geodesic.rhs(y, 1.0, L, 1.0, a, Q)
    da = geodesic.rhs_aug(ya, 1.0, L, 1.0, a, Q)
    np.testing.assert_allclose(da[..., :6], d6, rtol=1e-12, atol=1e-12)
    theta, phi = y[..., geodesic.ITH], y[..., geodesic.IPH]
    dth, dph = d6[..., geodesic.ITH], d6[..., geodesic.IPH]
    np.testing.assert_allclose(
        da[..., geodesic.IST], jnp.cos(theta) * dth, rtol=1e-12
    )
    np.testing.assert_allclose(
        da[..., geodesic.ICT], -jnp.sin(theta) * dth, rtol=1e-12
    )
    np.testing.assert_allclose(
        da[..., geodesic.ISP], jnp.cos(phi) * dph, rtol=1e-12
    )
    np.testing.assert_allclose(
        da[..., geodesic.ICP], -jnp.sin(phi) * dph, rtol=1e-12
    )


def test_rhs_core_matches_autodiff_hamiltonian():
    """rhs_core's hand-derived dH/dr, dH/dtheta (evaluated through the
    carried trig) must equal jax.grad of the Hamiltonian."""
    y, L = _sample_states(n=16, seed=3)
    a, Q = 0.85, 0.3
    r, theta = y[..., 0], y[..., 1]
    p_r, p_th = y[..., 3], y[..., 4]
    d = geodesic.rhs_core(
        r, jnp.sin(theta), jnp.cos(theta), p_r, p_th, 1.0, L, 1.0, a, Q
    )
    dH_dr = jax.vmap(jax.grad(geodesic.hamiltonian, argnums=0),
                     in_axes=(0, 0, 0, 0, None, 0, None, None, None))
    dH_dth = jax.vmap(jax.grad(geodesic.hamiltonian, argnums=1),
                      in_axes=(0, 0, 0, 0, None, 0, None, None, None))
    args = (r, theta, p_r, p_th, 1.0, L, 1.0, a, Q)
    np.testing.assert_allclose(d[3], -dH_dr(*args), rtol=1e-10)
    np.testing.assert_allclose(d[4], -dH_dth(*args), rtol=1e-10)


def test_augment_and_cartesian_roundtrip():
    y, _ = _sample_states(seed=7)
    a = 0.7
    ya = geodesic.augment_state(y)
    cart = trace.aug_to_cartesian(ya, a)
    cart_ref = coords.boyer_lindquist_to_cartesian(y[..., :3], a)
    np.testing.assert_allclose(cart, cart_ref, rtol=1e-10, atol=1e-12)


def test_renormalize_trig_projects_and_preserves_phase():
    y, _ = _sample_states(seed=9)
    ya = geodesic.augment_state(y)
    # Perturb the trig norm, keep the phase.
    scale = 1.0 + 1e-3
    ya_drift = ya.at[..., geodesic.IST].mul(scale) \
                 .at[..., geodesic.ICT].mul(scale)
    yn = trace.renormalize_trig(ya_drift)
    np.testing.assert_allclose(
        yn[..., geodesic.IST] ** 2 + yn[..., geodesic.ICT] ** 2,
        1.0, rtol=1e-12,
    )
    np.testing.assert_allclose(
        yn[..., geodesic.IST], ya[..., geodesic.IST], rtol=1e-9
    )


def test_trig_drift_stays_below_f32_noise():
    """Integrate a strongly bent f32 ray for 600 steps: the carried
    sin/cos must stay within ~1e-5 of trig of the integrated angles
    (drift is the same order as the trajectory's own truncation
    error)."""
    scene = Scene(
        blackhole=BlackHole.create(1.0, 0.9),
        disk=Disk.create(6.0, 20.0),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=100.0, max_steps=600
        ),
        disk_enabled=False,
    )
    o = jnp.asarray([[5.5, -30.0, 7.0]], jnp.float32)
    d = coords.normalize(jnp.asarray([[0.0, 1.0, -0.15]], jnp.float32))
    step_fn, adaptive = trace.make_step_fn(scene)
    carry = trace.init_carry(o, d, scene)

    @jax.jit
    def run(c):
        def body(i, c):
            return trace.trace_step(c, scene, step_fn, adaptive)
        return jax.lax.fori_loop(0, 600, body, c)

    y = run(carry).y
    np.testing.assert_allclose(
        y[..., geodesic.IST], jnp.sin(y[..., geodesic.ITH]), atol=2e-5
    )
    np.testing.assert_allclose(
        y[..., geodesic.ICT], jnp.cos(y[..., geodesic.ITH]), atol=2e-5
    )
    np.testing.assert_allclose(
        y[..., geodesic.ISP], jnp.sin(y[..., geodesic.IPH]), atol=2e-5
    )


def test_polar_plane_ray_crosses_axis():
    """A ray launched parallel to the polar axis (L = 0, trajectory in
    a phi = const plane) must pass the axis and escape — the regression
    that rules out a u = cos(theta) chart for the hot path."""
    scene = Scene(
        blackhole=BlackHole.create(1.0, 0.0),
        disk=Disk.create(6.0, 20.0),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=200.0, max_steps=3000
        ),
        disk_enabled=False,
    )
    b = float(np.sqrt(27.0)) + 0.4
    o = jnp.asarray([[b, 0.0, 30.0]], jnp.float64)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float64)
    hit = trace.trace_rays(o, d, scene)
    # Escapes (radially or by exhausting the path budget far away) —
    # NOT captured, and well past the axis on the far side.
    assert int(hit.result[0]) in (
        int(RayResult.BACKGROUND), int(RayResult.MAX_DISTANCE)
    ), (np.asarray(hit.result), np.asarray(hit.position))
    assert float(hit.position[0, 0]) < -5.0  # crossed x=0 (the axis)
    # It bent around the hole: the escape direction tilts inward
    # (negative x component).
    assert float(hit.sky_direction[0, 0]) < -0.05


def test_rkf45_error_excludes_trig_components():
    """The RKF45 controller's error must span only the 6 physical
    components (n_err) — sin/cos crossing zero must not reject steps."""
    from blackhole_tpu.integrate import steppers

    def f(t, y, args):
        # Rotation at unit rate: components (sin, cos) cross zero.
        return jnp.stack([jnp.ones_like(y[..., 0]) * 0.0,
                          y[..., 1] * 0.0,
                          y[..., 2] * 0.0,
                          y[..., 3] * 0.0,
                          y[..., 4] * 0.0,
                          y[..., 5] * 0.0,
                          y[..., 7],
                          -y[..., 6],
                          y[..., 9],
                          -y[..., 8]], axis=-1)

    y0 = jnp.asarray([[1.0, 1.0, 1.0, 1.0, 1.0, 1.0,
                       1e-9, 1.0, 1e-9, 1.0]])
    _, err_all = steppers.rkf45_step(f, 0.0, y0, jnp.asarray([[0.3]]),
                                     None)
    _, err_6 = steppers.rkf45_step(f, 0.0, y0, jnp.asarray([[0.3]]),
                                   None, n_err=6)
    # With the trig included, the near-zero sin component dominates the
    # relative error; restricted to the physical 6 it vanishes (their
    # derivatives are zero here).
    assert float(err_all[0]) > float(err_6[0])
    assert float(err_6[0]) < 1e-12
