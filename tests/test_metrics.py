"""Metric tensors and derived quantities vs closed-form values.

Oracles: textbook Schwarzschild/Kerr formulas and the
Bardeen-Press-Teukolsky ISCO (reference: spacetime.c:285-308).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_tpu.metrics import derived, kerr, schwarzschild


class TestKerrMetric:
    def test_reduces_to_schwarzschild_at_zero_spin(self):
        r, theta, M = 7.3, 1.1, 1.0
        g = kerr.metric(r, theta, M, 0.0)
        s = schwarzschild.metric(r, theta, M)
        np.testing.assert_allclose(g.g_tt, s.g_tt, rtol=1e-12)
        np.testing.assert_allclose(g.g_rr, s.g_rr, rtol=1e-12)
        np.testing.assert_allclose(g.g_thth, s.g_thth, rtol=1e-12)
        np.testing.assert_allclose(g.g_phph, s.g_phph, rtol=1e-12)
        np.testing.assert_allclose(g.g_tphi, 0.0, atol=1e-14)

    @pytest.mark.parametrize("a", [0.0, 0.5, 0.9, 0.998])
    def test_inverse_metric_is_inverse(self, a):
        r, theta, M = 5.7, 0.9, 1.0
        g = kerr.metric_matrix(
            jnp.float64(r), jnp.float64(theta), jnp.float64(M), jnp.float64(a)
        )
        gi = kerr.inverse_metric_matrix(
            jnp.float64(r), jnp.float64(theta), jnp.float64(M), jnp.float64(a)
        )
        np.testing.assert_allclose(g @ gi, np.eye(4), atol=1e-10)

    def test_metric_signature(self):
        g = kerr.metric(10.0, 1.3, 1.0, 0.7)
        assert g.g_tt < 0
        assert g.g_rr > 0 and g.g_thth > 0 and g.g_phph > 0

    def test_frame_dragging_cross_term_sign(self):
        # Prograde frame dragging: g_tphi < 0 for a > 0 in BL form.
        g = kerr.metric(4.0, jnp.pi / 2, 1.0, 0.9)
        assert g.g_tphi < 0


class TestDerived:
    def test_schwarzschild_isco_is_6M(self):
        np.testing.assert_allclose(derived.isco_radius(1.0, 0.0), 6.0, rtol=1e-12)
        np.testing.assert_allclose(derived.isco_radius(2.0, 0.0), 12.0, rtol=1e-12)

    def test_kerr_isco_known_values(self):
        # Bardeen, Press & Teukolsky (1972): a/M = 0.9 prograde ISCO.
        np.testing.assert_allclose(
            derived.isco_radius(1.0, 0.9, prograde=True), 2.320883, rtol=1e-5
        )
        # Extremal limit: prograde -> M, retrograde -> 9M.
        np.testing.assert_allclose(
            derived.isco_radius(1.0, 1.0, prograde=True), 1.0, atol=1e-3
        )
        np.testing.assert_allclose(
            derived.isco_radius(1.0, 1.0, prograde=False), 9.0, atol=1e-3
        )

    def test_retrograde_isco_larger(self):
        pro = derived.isco_radius(1.0, 0.6, prograde=True)
        ret = derived.isco_radius(1.0, 0.6, prograde=False)
        assert float(ret) > float(pro) > 0

    def test_event_horizons(self):
        np.testing.assert_allclose(derived.event_horizon(1.0, 0.0), 2.0)
        # Kerr a=0.9: r+ = 1 + sqrt(1 - 0.81)
        np.testing.assert_allclose(
            derived.event_horizon(1.0, 0.9), 1.0 + np.sqrt(0.19), rtol=1e-12
        )
        # Charged: r+ = M + sqrt(M^2 - a^2 - Q^2)  (spacetime.c:352-361)
        np.testing.assert_allclose(
            derived.event_horizon(1.0, 0.5, 0.3),
            1.0 + np.sqrt(1 - 0.25 - 0.09),
            rtol=1e-12,
        )

    def test_ergosphere(self):
        # Equator: 2M regardless of spin; pole: r+.
        np.testing.assert_allclose(
            derived.ergosphere_radius(jnp.pi / 2, 1.0, 0.9), 2.0, rtol=1e-12
        )
        np.testing.assert_allclose(
            derived.ergosphere_radius(0.0, 1.0, 0.9),
            derived.event_horizon(1.0, 0.9),
            rtol=1e-12,
        )

    def test_time_dilation(self):
        # 1/sqrt(1 - 2/10) at r=10, M=1  (spacetime.c:192-196)
        np.testing.assert_allclose(
            derived.time_dilation(10.0, 1.0), 1.0 / np.sqrt(0.8), rtol=1e-12
        )

    def test_shadow_radius_schwarzschild(self):
        np.testing.assert_allclose(
            derived.shadow_radius(1.0, 0.0), np.sqrt(27.0), rtol=1e-6
        )

    def test_photon_sphere(self):
        np.testing.assert_allclose(derived.photon_sphere_radius(1.0), 3.0)

    def test_frame_dragging_omega(self):
        # omega = -g_tphi / g_phph must match the closed form.
        r, th, M, a_om = 4.0, 1.2, 1.0, 0.8
        g = kerr.metric(r, th, M, a_om * M)
        np.testing.assert_allclose(
            derived.frame_dragging_omega(r, th, M, a_om),
            -g.g_tphi / g.g_phph,
            rtol=1e-10,
        )

    def test_keplerian_velocity(self):
        np.testing.assert_allclose(
            derived.keplerian_orbital_velocity(20.0, 1.0),
            np.sqrt(1.0 / 20.0),
            rtol=1e-12,
        )

    def test_hawking_temperature(self):
        np.testing.assert_allclose(
            derived.hawking_temperature(1.0), 1.0 / (8 * np.pi), rtol=1e-12
        )

    def test_effective_potential_schwarzschild_minimum(self):
        # Circular orbit at r with l^2 = M r^2/(r - 3M): V' = 0 there.
        import jax

        M, r0 = 1.0, 10.0
        l = np.sqrt(M * r0**2 / (r0 - 3 * M))
        dV = jax.grad(lambda r: derived.effective_potential(r, l, M))(
            jnp.float64(r0)
        )
        np.testing.assert_allclose(dV, 0.0, atol=1e-10)

    def test_effective_potential_kerr_values(self):
        """Kerr branch vs the reference's closed form
        (spacetime.c:256-277): V = (E^2-1) + (2M/r)(l^2/r^2 - 2Mal/r^3),
        r clamped at r+ (not rs)."""
        M, a_over_M, l = 1.0, 0.9, 4.0
        a = a_over_M * M
        for r in (3.0, 6.0, 12.0, 30.0):
            expect = (2.0 * M / r) * (
                l * l / r**2 - 2.0 * M * a * l / r**3
            )
            got = float(derived.effective_potential(
                jnp.float64(r), l, M, a_over_M
            ))
            np.testing.assert_allclose(got, expect, rtol=1e-12)
        # Inside the horizon the clamp pins to r+ (= M + sqrt(M^2-a^2)).
        r_plus = M + np.sqrt(M * M - a * a)
        inside = float(derived.effective_potential(
            jnp.float64(0.5), l, M, a_over_M
        ))
        at_rp = float(derived.effective_potential(
            jnp.float64(r_plus), l, M, a_over_M
        ))
        np.testing.assert_allclose(inside, at_rp, rtol=1e-9)

    def test_effective_potential_spin_gradient_finite_at_zero(self):
        """d(V)/d(spin) at a=0 flows through both where-branches and
        must stay finite (VERDICT weak #8)."""
        import jax

        g = jax.grad(
            lambda s: derived.effective_potential(10.0, 4.0, 1.0, s)
        )(jnp.float64(0.0))
        assert np.isfinite(float(g))


class TestCaptureMargin:
    """Analytic photon capture margin (derived.capture_margin_length) —
    the budget-independent soft shadow boundary (PERF.md r5)."""

    def test_schwarzschild_critical_impact_parameter(self):
        """Equatorial photon (L = b, Qc = 0): the margin's sign flips
        exactly at b = sqrt(27) M, the textbook critical value."""
        b_crit = np.sqrt(27.0)
        for b, captured in ((4.0, True), (b_crit - 1e-3, True),
                            (b_crit + 1e-3, False), (7.0, False)):
            m = float(derived.capture_margin_length(
                jnp.float64(b), 0.0, 1.0, 0.0
            ))
            assert (m > 0) == captured, (b, m)

    def test_margin_length_matches_periapsis_height(self):
        """For an escaping ray, |margin| ~ periapsis height above the
        shell: at b = sqrt(27)(1+eps) the turning point of R sits at
        r_t with R(r_t) = 0; check margin ~ -(r_t - 3M)."""
        b = np.sqrt(27.0) * 1.01
        m = float(derived.capture_margin_length(
            jnp.float64(b), 0.0, 1.0, 0.0
        ))
        # outer root of r^4 - (r^2 - 2r) b^2 above 3M
        roots = np.roots([1.0, 0.0, -b * b, 2 * b * b])
        r_t = max(r.real for r in roots if abs(r.imag) < 1e-9)
        np.testing.assert_allclose(-m, r_t - 3.0, rtol=0.15)

    def test_margin_sign_matches_traced_outcomes_kerr(self):
        """Margin sign vs the actual integrator on a Kerr a=0.9 ray
        batch: every ingoing ray's capture/escape class must agree."""
        from blackhole_tpu.geom.types import (
            BlackHole, Camera, Disk, RayResult, Scene, SimConfig,
        )
        from blackhole_tpu.render import camera as cam
        from blackhole_tpu.render import geodesic, trace

        scene = Scene(
            blackhole=BlackHole.create(1.0, 0.9),
            disk=Disk.create(6.0, 20.0),
            config=SimConfig.create(
                time_step=0.1, max_ray_distance=150.0, max_steps=3000
            ),
            disk_enabled=False,
        )
        camera = Camera.create(
            position=(0.0, -35.0, 12.0), direction=(0.0, 35.0, -12.0),
            up=(0.0, 0.0, 1.0), fov_deg=16.0,
        )
        o, d = cam.generate_rays(camera, 24, 24)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        hit = trace.trace_rays(o, d, scene)
        res = np.asarray(hit.result)
        margin, valid = trace.compute_capture_margin(o, d, scene)
        margin, valid = np.asarray(margin), np.asarray(valid)
        captured = res == int(RayResult.HORIZON)
        escaped = (res == int(RayResult.BACKGROUND)) | (
            res == int(RayResult.MAX_DISTANCE)
        )
        # Exclude exact-boundary noise: |margin| > 0.02 M is decisive.
        decisive = valid & (np.abs(margin) > 0.02)
        assert (captured | escaped).all()
        assert np.all(margin[decisive & escaped] < 0)
        assert np.all(margin[decisive & captured] > 0)

    def test_margin_differentiable_in_mass_and_spin(self):
        import jax

        for f in (
            lambda m: derived.capture_margin_length(5.0, 1.0, m, 0.9 * m),
            lambda s: derived.capture_margin_length(5.0, 1.0, 1.0, s),
        ):
            g = jax.grad(lambda x: f(x))(jnp.float64(1.0) * 0.9)
            assert np.isfinite(float(g))
