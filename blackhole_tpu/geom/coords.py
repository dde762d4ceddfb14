"""Coordinate transforms: cartesian <-> spherical <-> Boyer-Lindquist.

TPU-native equivalent of the reference's conversions
(/root/reference/src/spacetime.c:201-237).  Also implements the
Boyer-Lindquist conversions the reference *declared* but never defined
(math_util.h:138-151) — exact, including the quartic-root radial solve.

All functions are pure, broadcastable over leading batch dims, and
differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

from blackhole_tpu.constants import EPSILON, TWO_PI


def cartesian_to_spherical(xyz):
    """(x, y, z) -> (r, theta, phi) with phi in [0, 2pi).

    Matches spacetime.c:201-224 semantics including pole/origin guards.
    xyz: (..., 3) -> (..., 3)
    """
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    r = jnp.sqrt(x * x + y * y + z * z)
    safe_r = jnp.maximum(r, EPSILON)
    theta = jnp.arccos(jnp.clip(z / safe_r, -1.0, 1.0))
    phi = jnp.arctan2(y, x)
    phi = jnp.where(phi < 0.0, phi + TWO_PI, phi)
    return jnp.stack([r, theta, phi], axis=-1)


def spherical_to_cartesian(sph):
    """(r, theta, phi) -> (x, y, z).  spacetime.c:229-237."""
    r, theta, phi = sph[..., 0], sph[..., 1], sph[..., 2]
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    return jnp.stack([r * st * cp, r * st * sp, r * ct], axis=-1)


def spherical_direction_from_cartesian(sph, dxyz):
    """Coordinate velocities (dr, dtheta, dphi) of a cartesian direction.

    Inverse-Jacobian rows as in the reference's ray init
    (raytracer.c:388-405), with the same pole guard on dphi.

    sph: (..., 3) position (r, theta, phi); dxyz: (..., 3) direction.
    """
    r, theta, phi = sph[..., 0], sph[..., 1], sph[..., 2]
    dx, dy, dz = dxyz[..., 0], dxyz[..., 1], dxyz[..., 2]
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    safe_r = jnp.maximum(r, EPSILON)
    dr = st * cp * dx + st * sp * dy + ct * dz
    dtheta = (ct * cp * dx + ct * sp * dy - st * dz) / safe_r
    # Guard the azimuthal component at the poles (raytracer.c:402-405).
    st_safe = jnp.where(jnp.abs(st) < EPSILON, 1.0, st)
    dphi = jnp.where(
        jnp.abs(st) < EPSILON,
        0.0,
        (-sp * dx + cp * dy) / (safe_r * st_safe),
    )
    return jnp.stack([dr, dtheta, dphi], axis=-1)


def cartesian_direction_from_spherical(sph, dsph):
    """Jacobian push-forward: (dr, dtheta, dphi) -> (dx, dy, dz)."""
    r, theta, phi = sph[..., 0], sph[..., 1], sph[..., 2]
    dr, dth, dph = dsph[..., 0], dsph[..., 1], dsph[..., 2]
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    dx = st * cp * dr + r * ct * cp * dth - r * st * sp * dph
    dy = st * sp * dr + r * ct * sp * dth + r * st * cp * dph
    dz = ct * dr - r * st * dth
    return jnp.stack([dx, dy, dz], axis=-1)


def cartesian_to_boyer_lindquist(xyz, a):
    """Exact cartesian -> Boyer-Lindquist (r, theta, phi) for spin a.

    BL radius solves  (x^2 + y^2)/(r^2 + a^2) + z^2/r^2 = 1, i.e.
        r^2 = 0.5 * (rho^2 - a^2) + sqrt(0.25 (rho^2 - a^2)^2 + a^2 z^2)
    with rho^2 = x^2+y^2+z^2.  Reduces to spherical for a = 0.

    Implements the conversion the reference only declared
    (math_util.h:138-145).
    """
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    rho2 = x * x + y * y + z * z
    half = 0.5 * (rho2 - a * a)
    r2 = half + jnp.sqrt(half * half + a * a * z * z)
    r = jnp.sqrt(jnp.maximum(r2, EPSILON))
    theta = jnp.arccos(jnp.clip(z / jnp.maximum(r, EPSILON), -1.0, 1.0))
    phi = jnp.arctan2(y, x)
    phi = jnp.where(phi < 0.0, phi + TWO_PI, phi)
    return jnp.stack([r, theta, phi], axis=-1)


def boyer_lindquist_to_cartesian(bl, a):
    """Boyer-Lindquist (r, theta, phi) -> cartesian (math_util.h:147-151).

    x = sqrt(r^2+a^2) sin(theta) cos(phi), ..., z = r cos(theta).
    """
    r, theta, phi = bl[..., 0], bl[..., 1], bl[..., 2]
    w = jnp.sqrt(r * r + a * a)
    st, ct = jnp.sin(theta), jnp.cos(theta)
    return jnp.stack(
        [w * st * jnp.cos(phi), w * st * jnp.sin(phi), r * ct], axis=-1
    )


def normalize(v, axis=-1):
    """Unit vector with zero-safe guard (math_util.c:115-122)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return jnp.where(n < EPSILON, jnp.zeros_like(v), v / jnp.maximum(n, EPSILON))
