"""Schwarzschild metric — analytic special case used as test oracle.

Mirrors /root/reference/src/spacetime.c:15-33 (but without the reference's
equator-only g_phph simplification at :30, which is wrong off-equator;
here the full r^2 sin^2(theta) is used).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class SchwarzschildMetric(NamedTuple):
    g_tt: jnp.ndarray
    g_rr: jnp.ndarray
    g_thth: jnp.ndarray
    g_phph: jnp.ndarray


def metric(r, theta, M):
    """Diagonal Schwarzschild components at (r, theta)."""
    rs = 2.0 * M
    f = 1.0 - rs / r
    st = jnp.sin(theta)
    return SchwarzschildMetric(
        g_tt=-f,
        g_rr=1.0 / f,
        g_thth=r * r,
        g_phph=r * r * st * st,
    )


def metric_equatorial(r, M):
    """Equatorial-plane components (theta = pi/2), as the reference's
    simplified struct effectively assumes (spacetime.c:30)."""
    rs = 2.0 * M
    f = 1.0 - rs / r
    return SchwarzschildMetric(
        g_tt=-f, g_rr=1.0 / f, g_thth=r * r, g_phph=r * r
    )
