"""Kerr metric in Boyer-Lindquist coordinates.

TPU-native equivalent of /root/reference/src/spacetime.c:38-69 (metric),
:429-468 (inverse).  Closed-form components as pure scalar functions of
(r, theta); broadcastable and differentiable.  Schwarzschild is the a=0
special case and shares this code path (the reference keeps two separate
structs; here one family suffices and XLA constant-folds a=0).

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


def sigma_delta(r, theta, M, a):
    """Sigma = r^2 + a^2 cos^2(theta),  Delta = r^2 - 2 M r + a^2."""
    ct = jnp.cos(theta)
    sigma = r * r + a * a * ct * ct
    delta = r * r - 2.0 * M * r + a * a
    return sigma, delta


def metric(r, theta, M, a):
    """Covariant Kerr metric components (spacetime.c:38-69, :377-418)."""
    st = jnp.sin(theta)
    st2 = st * st
    sigma, delta = sigma_delta(r, theta, M, a)
    two_mr = 2.0 * M * r
    g_tt = -(1.0 - two_mr / sigma)
    g_tphi = -two_mr * a * st2 / sigma
    g_rr = sigma / delta
    g_thth = sigma
    g_phph = (r * r + a * a + two_mr * a * a * st2 / sigma) * st2
    return Metric(g_tt, g_tphi, g_rr, g_thth, g_phph)


def inverse_metric(r, theta, M, a):
    """Contravariant Kerr metric components (spacetime.c:429-468).

    g^tt   = -A / (Sigma Delta)      with A = (r^2+a^2)^2 - Delta a^2 sin^2
    g^tphi = -2 M r a / (Sigma Delta)
    g^rr   = Delta / Sigma
    g^thth = 1 / Sigma
    g^phph = (Delta - a^2 sin^2) / (Sigma Delta sin^2)
    """
    st = jnp.sin(theta)
    st2 = st * st
    sigma, delta = sigma_delta(r, theta, M, a)
    r2a2 = r * r + a * a
    A = r2a2 * r2a2 - delta * a * a * st2
    inv_sd = 1.0 / (sigma * delta)
    g_tt = -A * inv_sd
    g_tphi = -2.0 * M * r * a * inv_sd
    g_rr = delta / sigma
    g_thth = 1.0 / sigma
    st2_safe = jnp.maximum(st2, EPSILON)
    g_phph = (delta - a * a * st2) * inv_sd / st2_safe
    return InverseMetric(g_tt, g_tphi, g_rr, g_thth, g_phph)


def metric_matrix(r, theta, M, a):
    """Full 4x4 covariant metric as a (..., 4, 4) array (for autodiff
    Christoffels and generic tensor algebra)."""
    g = metric(r, theta, M, a)
    zeros = jnp.zeros_like(g.g_tt)
    row_t = jnp.stack([g.g_tt, zeros, zeros, g.g_tphi], axis=-1)
    row_r = jnp.stack([zeros, g.g_rr, zeros, zeros], axis=-1)
    row_th = jnp.stack([zeros, zeros, g.g_thth, zeros], axis=-1)
    row_ph = jnp.stack([g.g_tphi, zeros, zeros, g.g_phph], axis=-1)
    return jnp.stack([row_t, row_r, row_th, row_ph], axis=-2)


def inverse_metric_matrix(r, theta, M, a):
    """Full 4x4 contravariant metric as a (..., 4, 4) array."""
    g = inverse_metric(r, theta, M, a)
    zeros = jnp.zeros_like(g.g_tt)
    row_t = jnp.stack([g.g_tt, zeros, zeros, g.g_tphi], axis=-1)
    row_r = jnp.stack([zeros, g.g_rr, zeros, zeros], axis=-1)
    row_th = jnp.stack([zeros, zeros, g.g_thth, zeros], axis=-1)
    row_ph = jnp.stack([g.g_tphi, zeros, zeros, g.g_phph], axis=-1)
    return jnp.stack([row_t, row_r, row_th, row_ph], axis=-2)
