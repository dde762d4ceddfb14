"""Christoffel symbols: autodiff-complete set vs analytic oracles.

The reference's Kerr symbols are knowingly partial (spacetime.c:158-159);
here the autodiff set is validated against the analytic Schwarzschild
table and internal-consistency identities.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_tpu.metrics import christoffel, kerr
from blackhole_tpu.render import geodesic


class TestChristoffel:
    def test_matches_analytic_schwarzschild(self):
        r, theta, M = jnp.float64(7.0), jnp.float64(1.1), jnp.float64(1.0)
        auto = christoffel.christoffel(r, theta, M, jnp.float64(0.0))
        analytic = christoffel.schwarzschild_christoffel_analytic(r, theta, M)
        np.testing.assert_allclose(auto, analytic, atol=1e-10)

    @pytest.mark.parametrize("a", [0.3, 0.9])
    def test_symmetry_lower_indices(self, a):
        g = christoffel.christoffel(
            jnp.float64(5.0), jnp.float64(0.8), jnp.float64(1.0), jnp.float64(a)
        )
        np.testing.assert_allclose(g, np.swapaxes(np.array(g), 1, 2), atol=1e-12)

    @pytest.mark.parametrize("a", [0.0, 0.9])
    def test_metric_compatibility(self, a):
        """nabla_c g_ab = 0: d_c g_ab = Gamma^d_ca g_db + Gamma^d_cb g_ad."""
        r, theta, M = jnp.float64(6.0), jnp.float64(1.2), jnp.float64(1.0)
        a = jnp.float64(a)
        gam = christoffel.christoffel(r, theta, M, a)
        g = kerr.metric_matrix(r, theta, M, a)
        dg_dr = jax.jacfwd(lambda rr: kerr.metric_matrix(rr, theta, M, a))(r)
        dg_dth = jax.jacfwd(lambda th: kerr.metric_matrix(r, th, M, a))(theta)
        partial = jnp.stack(
            [jnp.zeros_like(dg_dr), dg_dr, dg_dth, jnp.zeros_like(dg_dr)], 0
        )
        rhs = jnp.einsum("dca,db->cab", gam, g) + jnp.einsum(
            "dcb,ad->cab", gam, g
        )
        np.testing.assert_allclose(partial, rhs, atol=1e-10)


class TestHamiltonianDerivatives:
    @pytest.mark.parametrize("a", [0.0, 0.5, 0.95])
    def test_closed_form_matches_autodiff(self, a):
        """The hand-derived dH/dr, dH/dtheta in geodesic.py must equal
        jax.grad of the Hamiltonian."""
        args = dict(
            r=jnp.float64(4.3),
            theta=jnp.float64(0.9),
            p_r=jnp.float64(0.31),
            p_theta=jnp.float64(-1.2),
            E=jnp.float64(1.0),
            L=jnp.float64(3.7),
            M=jnp.float64(1.0),
            a=jnp.float64(a),
        )
        vals = tuple(args.values())
        auto_dr = jax.grad(geodesic.hamiltonian, argnums=0)(*vals)
        auto_dth = jax.grad(geodesic.hamiltonian, argnums=1)(*vals)
        np.testing.assert_allclose(
            geodesic._dH_dr_batched(*vals), auto_dr, rtol=1e-10
        )
        np.testing.assert_allclose(
            geodesic._dH_dtheta_batched(*vals), auto_dth, rtol=1e-10
        )

    def test_geodesic_acceleration_consistent_with_hamiltonian_flow(self):
        """For a null ray, d(ẋ^mu)/dlambda from the Hamiltonian flow must
        equal -Gamma^mu_ab ẋ^a ẋ^b from the Christoffel path."""
        M, a = jnp.float64(1.0), jnp.float64(0.7)
        o = jnp.array([[3.0, 2.0, 11.0]])
        d = jnp.array([[-0.2, 0.1, -1.0]])
        y, E, L, _ = geodesic.init_null_rays(o, d, M, a)
        y = y[0]
        E, L = E[0], L[0]

        def four_velocity(y):
            gi = kerr.inverse_metric(y[geodesic.IR], y[geodesic.ITH], M, a)
            td = -gi.g_tt * E + gi.g_tphi * L
            rd = gi.g_rr * y[geodesic.IPR]
            thd = gi.g_thth * y[geodesic.IPT]
            phd = -gi.g_tphi * E + gi.g_phph * L
            return jnp.stack([td, rd, thd, phd])

        # d(v^mu)/dlambda = J(four_velocity) . dy/dlambda
        dy = geodesic.rhs(y, E, L, M, a)
        _, dv = jax.jvp(four_velocity, (y,), (dy,))

        pos = jnp.stack(
            [y[geodesic.IT], y[geodesic.IR], y[geodesic.ITH], y[geodesic.IPH]]
        )
        accel = christoffel.geodesic_acceleration(pos, four_velocity(y), M, a)
        np.testing.assert_allclose(dv, accel, rtol=1e-8, atol=1e-10)


class TestNullInit:
    @pytest.mark.parametrize("a", [0.0, 0.9])
    def test_initial_state_is_null(self, a):
        M = jnp.float64(1.0)
        o = jnp.array([[0.0, 3.0, 25.0], [10.0, -4.0, 12.0]])
        d = jnp.array([[0.1, 0.0, -1.0], [-0.7, 0.2, -0.5]])
        y, E, L, Q = geodesic.init_null_rays(o, d, M, jnp.float64(a))
        H = geodesic.hamiltonian(
            y[..., 0], y[..., 1], y[..., 3], y[..., 4], E, L, M, jnp.float64(a)
        )
        np.testing.assert_allclose(H, 0.0, atol=1e-10)
        np.testing.assert_allclose(E, 1.0)

    def test_flat_space_limit_direction(self):
        """Far from the hole the BL coordinate velocity must match the
        flat-space chord: integrate one tiny step and compare cartesian
        displacement with the requested direction."""
        from blackhole_tpu.geom import coords

        M = jnp.float64(1e-8)
        o = jnp.array([[0.0, 5.0, 40.0]])
        d = coords.normalize(jnp.array([[0.3, -0.2, -1.0]]))
        y, E, L, _ = geodesic.init_null_rays(o, d, M, jnp.float64(0.0))
        dy = geodesic.rhs(y, E, L, M, jnp.float64(0.0))
        eps = 1e-4
        y2 = y + eps * dy
        c1 = coords.boyer_lindquist_to_cartesian(y[..., :3], 0.0)
        c2 = coords.boyer_lindquist_to_cartesian(y2[..., :3], 0.0)
        step = coords.normalize(c2 - c1)
        np.testing.assert_allclose(step, d, atol=1e-5)
