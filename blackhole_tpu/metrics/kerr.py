"""Kerr-Newman metric family in Boyer-Lindquist coordinates.

TPU-native equivalent of /root/reference/src/spacetime.c:38-69 (metric),
:429-468 (inverse).  Closed-form components as pure scalar functions of
(r, theta); broadcastable and differentiable.  One code path covers the
whole family: Schwarzschild (a=0, Q=0), Kerr (Q=0), Reissner-Nordstrom
(a=0), and Kerr-Newman — the charge generalization is Delta += Q^2 and
2Mr -> 2Mr - Q^2 in every mass term.  The reference only uses charge in
its horizon formula (spacetime.c:331-366, sqrt(M^2-a^2-Q^2)) and traces
rays in uncharged metrics; here charged spacetimes are first-class
(XLA constant-folds a=0 / Q=0 back to the cheaper special cases).

Component convention (t, r, theta, phi).  Nonzero entries:
    g_tt, g_tphi (= g_phit), g_rr, g_thth, g_phph.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from blackhole_tpu.constants import EPSILON


class Metric(NamedTuple):
    """Nonzero Kerr metric components (covariant)."""

    g_tt: jnp.ndarray
    g_tphi: jnp.ndarray
    g_rr: jnp.ndarray
    g_thth: jnp.ndarray
    g_phph: jnp.ndarray


class InverseMetric(NamedTuple):
    """Nonzero Kerr metric components (contravariant)."""

    g_tt: jnp.ndarray
    g_tphi: jnp.ndarray
    g_rr: jnp.ndarray
    g_thth: jnp.ndarray
    g_phph: jnp.ndarray


def sigma_delta(r, theta, M, a, Q=0.0):
    """Sigma = r^2 + a^2 cos^2(theta),
    Delta = r^2 - 2 M r + a^2 + Q^2 (Kerr-Newman)."""
    ct = jnp.cos(theta)
    sigma = r * r + a * a * ct * ct
    delta = r * r - 2.0 * M * r + a * a + Q * Q
    return sigma, delta


def metric(r, theta, M, a, Q=0.0):
    """Covariant Kerr-Newman metric components (spacetime.c:38-69,
    :377-418 for the Kerr case).  tm = 2 M r - Q^2 is the charged
    generalization of every 2 M r mass term."""
    st = jnp.sin(theta)
    st2 = st * st
    sigma, delta = sigma_delta(r, theta, M, a, Q)
    tm = 2.0 * M * r - Q * Q
    g_tt = -(1.0 - tm / sigma)
    g_tphi = -tm * a * st2 / sigma
    g_rr = sigma / delta
    g_thth = sigma
    g_phph = (r * r + a * a + tm * a * a * st2 / sigma) * st2
    return Metric(g_tt, g_tphi, g_rr, g_thth, g_phph)


def inverse_metric(r, theta, M, a, Q=0.0):
    """Contravariant Kerr-Newman metric components (spacetime.c:429-468
    for the Kerr case).  With tm = 2 M r - Q^2:

    g^tt   = -A / (Sigma Delta)      with A = (r^2+a^2)^2 - Delta a^2 sin^2
    g^tphi = -tm a / (Sigma Delta)
    g^rr   = Delta / Sigma
    g^thth = 1 / Sigma
    g^phph = (Delta - a^2 sin^2) / (Sigma Delta sin^2)
    """
    st = jnp.sin(theta)
    st2 = st * st
    sigma, delta = sigma_delta(r, theta, M, a, Q)
    r2a2 = r * r + a * a
    A = r2a2 * r2a2 - delta * a * a * st2
    inv_sd = 1.0 / (sigma * delta)
    g_tt = -A * inv_sd
    g_tphi = -(2.0 * M * r - Q * Q) * a * inv_sd
    g_rr = delta / sigma
    g_thth = 1.0 / sigma
    st2_safe = jnp.maximum(st2, EPSILON)
    g_phph = (delta - a * a * st2) * inv_sd / st2_safe
    return InverseMetric(g_tt, g_tphi, g_rr, g_thth, g_phph)


def metric_matrix(r, theta, M, a, Q=0.0):
    """Full 4x4 covariant metric as a (..., 4, 4) array (for autodiff
    Christoffels and generic tensor algebra)."""
    g = metric(r, theta, M, a, Q)
    zeros = jnp.zeros_like(g.g_tt)
    row_t = jnp.stack([g.g_tt, zeros, zeros, g.g_tphi], axis=-1)
    row_r = jnp.stack([zeros, g.g_rr, zeros, zeros], axis=-1)
    row_th = jnp.stack([zeros, zeros, g.g_thth, zeros], axis=-1)
    row_ph = jnp.stack([g.g_tphi, zeros, zeros, g.g_phph], axis=-1)
    return jnp.stack([row_t, row_r, row_th, row_ph], axis=-2)


def inverse_metric_matrix(r, theta, M, a, Q=0.0):
    """Full 4x4 contravariant metric as a (..., 4, 4) array."""
    g = inverse_metric(r, theta, M, a, Q)
    zeros = jnp.zeros_like(g.g_tt)
    row_t = jnp.stack([g.g_tt, zeros, zeros, g.g_tphi], axis=-1)
    row_r = jnp.stack([zeros, g.g_rr, zeros, zeros], axis=-1)
    row_th = jnp.stack([zeros, zeros, g.g_thth, zeros], axis=-1)
    row_ph = jnp.stack([g.g_tphi, zeros, zeros, g.g_phph], axis=-1)
    return jnp.stack([row_t, row_r, row_th, row_ph], axis=-2)
