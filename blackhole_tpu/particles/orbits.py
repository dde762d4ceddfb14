"""Keplerian orbital mechanics for test particles.

TPU-native equivalent of /root/reference/src/particle_sim.c:173-227
(orbital elements) and :604-626 (circular orbits).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from blackhole_tpu.constants import EPSILON
from blackhole_tpu.metrics import derived


class OrbitalParams(NamedTuple):
    """Orbital elements (particle_sim.h:46-55)."""

    semi_major_axis: jnp.ndarray
    eccentricity: jnp.ndarray
    inclination: jnp.ndarray
    specific_angular_momentum: jnp.ndarray
    specific_energy: jnp.ndarray


def orbit_parameters(position, velocity, M) -> OrbitalParams:
    """Keplerian elements from a state vector (particle_sim.c:173-227).

    Batched over leading dims of position/velocity (..., 3).
    """
    r = jnp.linalg.norm(position, axis=-1)
    v = jnp.linalg.norm(velocity, axis=-1)
    l_vec = jnp.cross(position, velocity)
    L = jnp.linalg.norm(l_vec, axis=-1)
    E = 0.5 * v * v - M / jnp.maximum(r, EPSILON)

    r_hat = position / jnp.maximum(r, EPSILON)[..., None]
    term1 = r_hat * (v * v - M / jnp.maximum(r, EPSILON))[..., None]
    r_dot_v = jnp.sum(position * velocity, axis=-1)
    term2 = velocity * r_dot_v[..., None]
    e_vec = (term1 - term2) / M
    e = jnp.linalg.norm(e_vec, axis=-1)

    # Bound: a = -M/2E; unbound: M/2E; parabolic: inf
    # (particle_sim.c:201-213).
    a = jnp.where(
        jnp.abs(E) < EPSILON,
        jnp.inf,
        jnp.where(E < 0, -M / (2.0 * E), M / (2.0 * E)),
    )
    cos_i = l_vec[..., 2] / jnp.maximum(L, EPSILON)
    inclination = jnp.arccos(jnp.clip(cos_i, -1.0, 1.0))
    return OrbitalParams(a, e, inclination, L, E)


def circular_orbit_velocity(r, blackhole):
    """Tangential velocity vector for a circular orbit at radius r on the
    +x axis (particle_sim.c:604-626).  Returns (velocity, exists):
    exists is False inside the ISCO."""
    isco = derived.isco_radius(blackhole.mass, blackhole.spin)
    v = jnp.sqrt(blackhole.mass / jnp.maximum(r, EPSILON))
    vel = jnp.stack([jnp.zeros_like(v), v, jnp.zeros_like(v)], axis=-1)
    return vel, r > isco


def orbital_period(r, M):
    """Newtonian period 2 pi r / v = 2 pi sqrt(r^3 / M) (main.c:160)."""
    v = jnp.sqrt(M / jnp.maximum(r, EPSILON))
    return 2.0 * jnp.pi * r / v
