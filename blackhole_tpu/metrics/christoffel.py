"""Christoffel symbols and the covariant geodesic right-hand side.

The reference hand-codes the 9 unique Schwarzschild symbols
(/root/reference/src/spacetime.c:109-125) and explicitly leaves Kerr
incomplete ("small subset", spacetime.c:158-159, 509-511).  The TPU-native
approach: obtain the *complete* symbol set for any stationary axisymmetric
metric by forward-mode autodiff of the metric matrix —
    Gamma^mu_ab = 1/2 g^{mu nu} (d_a g_{nu b} + d_b g_{nu a} - d_nu g_{ab})
with d/dt = d/dphi = 0.  This is exact (not numerical differencing),
vectorizes on the VPU, and is itself differentiable w.r.t. (M, a) for
inverse rendering.  The analytic Schwarzschild set is kept as a test
oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from blackhole_tpu.metrics import kerr


def christoffel(r, theta, M, a, Q=0.0):
    """Complete Christoffel symbols Gamma[mu, alpha, beta] at (r, theta).

    Returns a (4, 4, 4) array (scalar inputs; vmap for batches).
    Q: Kerr-Newman charge — the autodiff construction covers the whole
    metric family for free.
    """
    # d g / d r and d g / d theta via forward-mode autodiff (exact).
    dg_dr = jax.jacfwd(
        lambda rr: kerr.metric_matrix(rr, theta, M, a, Q)
    )(r)
    dg_dth = jax.jacfwd(
        lambda th: kerr.metric_matrix(r, th, M, a, Q)
    )(theta)
    zeros = jnp.zeros_like(dg_dr)
    # partial[c, a, b] = d_c g_{ab}; only c=r(1), theta(2) nonzero.
    partial = jnp.stack([zeros, dg_dr, dg_dth, zeros], axis=0)
    ginv = kerr.inverse_metric_matrix(r, theta, M, a, Q)
    # Gamma^mu_ab = 1/2 g^{mu nu} (partial[a, nu, b] + partial[b, nu, a]
    #                              - partial[nu, a, b])
    term = (
        jnp.einsum("anb->nab", partial)
        + jnp.einsum("bna->nab", partial)
        - partial
    )
    return 0.5 * jnp.einsum("mn,nab->mab", ginv, term)


def geodesic_acceleration(position, velocity, M, a, Q=0.0):
    """a^mu = -Gamma^mu_ab v^a v^b (spacetime.c:166-187, 624-655).

    position: (4,) = (t, r, theta, phi); velocity: (4,) coordinate
    4-velocity.  Complete for Kerr(-Newman), unlike the reference which
    zeroes the Kerr accelerations in its CPU ray path (raytracer.c:131-138).
    """
    gamma = christoffel(position[1], position[2], M, a, Q)
    return -jnp.einsum("mab,a,b->m", gamma, velocity, velocity)


def schwarzschild_christoffel_analytic(r, theta, M):
    """Hand-derived Schwarzschild symbols — oracle for the autodiff path.

    Matches the reference's table (spacetime.c:109-125) with full index
    symmetrization.
    """
    rs = 2.0 * M
    st, ct = jnp.sin(theta), jnp.cos(theta)
    g = jnp.zeros((4, 4, 4), dtype=jnp.result_type(r, theta, M))
    g = g.at[0, 0, 1].set(rs / (2.0 * r * (r - rs)))
    g = g.at[0, 1, 0].set(rs / (2.0 * r * (r - rs)))
    g = g.at[1, 0, 0].set(rs * (r - rs) / (2.0 * r**3))
    g = g.at[1, 1, 1].set(-rs / (2.0 * r * (r - rs)))
    g = g.at[1, 2, 2].set(-(r - rs))
    g = g.at[1, 3, 3].set(-(r - rs) * st * st)
    g = g.at[2, 1, 2].set(1.0 / r)
    g = g.at[2, 2, 1].set(1.0 / r)
    g = g.at[2, 3, 3].set(-st * ct)
    g = g.at[3, 1, 3].set(1.0 / r)
    g = g.at[3, 3, 1].set(1.0 / r)
    g = g.at[3, 2, 3].set(ct / st)
    g = g.at[3, 3, 2].set(ct / st)
    return g
