"""Scene generators: accretion-disk particle seeding, Hawking radiation.

TPU-native equivalent of /root/reference/src/particle_sim.c:339-500.
The C engine uses global rand(); here every generator takes an explicit
jax.random key, so scenes are reproducible and shardable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from blackhole_tpu.constants import TWO_PI
from blackhole_tpu.geom import coords
from blackhole_tpu.metrics import derived
from blackhole_tpu.particles.system import (
    ParticleSystem,
    ParticleType,
    add_particles_batch,
)


def accretion_disk_particles(key, n, blackhole, disk):
    """Sample disk particles (particle_sim.c:339-422).

    * radii: sqrt-distribution for uniform surface density, clamped to
      [max(inner, ISCO, 1.1 r_s), outer]
    * Keplerian tangential velocity + 5% random turbulence
    * z-thickness jitter proportional to thickness_factor * r
    * T = temp_scale * 10000 * (r_in / r)^0.75

    Returns (positions, velocities, temperatures).
    """
    k_phi, k_z, k_turb = jax.random.split(key, 3)
    M = blackhole.mass
    isco = derived.isco_radius(M, blackhole.spin)
    inner = jnp.maximum(disk.inner_radius, isco)
    inner = jnp.maximum(inner, 1.1 * blackhole.schwarzschild_radius)
    outer = disk.outer_radius

    t = jnp.linspace(0.0, 1.0, n)
    r = inner + (outer - inner) * jnp.sqrt(t)
    phi = jax.random.uniform(k_phi, (n,)) * TWO_PI
    z = (jax.random.uniform(k_z, (n,)) - 0.5) * disk.thickness_factor * r
    positions = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)

    v_orbit = jnp.sqrt(M / r)
    velocities = jnp.stack(
        [-positions[:, 1] * v_orbit / r, positions[:, 0] * v_orbit / r,
         jnp.zeros_like(r)],
        axis=-1,
    )
    turb = (jax.random.uniform(k_turb, (n, 3)) - 0.5) * (
        0.05 * v_orbit
    )[:, None]
    velocities = velocities + turb

    temperatures = disk.temperature_scale * 10000.0 * (inner / r) ** 0.75
    return positions, velocities, temperatures


def hawking_radiation_particles(key, n, blackhole, temp_factor=1.0):
    """Hawking-radiation visualization particles
    (particle_sim.c:427-500): spawned isotropically at 1.01 r_s with
    ~0.9c outward velocity + perturbation, T = temp_factor / (8 pi M).

    Returns (positions, velocities, temperatures).
    """
    k_th, k_ph, k_pert = jax.random.split(key, 3)
    rs = blackhole.schwarzschild_radius
    # Uniform on the sphere (the reference samples theta uniformly,
    # which clusters at poles — cos-uniform is the correct density).
    cos_t = jax.random.uniform(k_th, (n,), minval=-1.0, maxval=1.0)
    theta = jnp.arccos(cos_t)
    phi = jax.random.uniform(k_ph, (n,)) * TWO_PI
    r = 1.01 * rs
    sph = jnp.stack([jnp.full((n,), r), theta, phi], axis=-1)
    positions = coords.spherical_to_cartesian(sph)

    radial = coords.normalize(positions)
    velocities = radial * 0.9
    pert = (jax.random.uniform(k_pert, (n, 3)) - 0.5) * 0.2
    velocities = coords.normalize(velocities + pert) * 0.9

    temp = jnp.full(
        (n,), temp_factor * derived.hawking_temperature(blackhole.mass)
    )
    return positions, velocities, temp


def create_accretion_disk(system: ParticleSystem, key, n, blackhole, disk):
    """Seed n disk particles into the pool; returns (system, ids)."""
    pos, vel, temp = accretion_disk_particles(key, n, blackhole, disk)
    return add_particles_batch(
        system, pos, vel, jnp.zeros((n,)),
        jnp.full((n,), ParticleType.DISK, jnp.int32), temp
    )


def generate_hawking_radiation(system: ParticleSystem, key, n, blackhole,
                               temp_factor=1.0):
    """Add n Hawking particles to the pool; returns (system, ids)."""
    pos, vel, temp = hawking_radiation_particles(key, n, blackhole, temp_factor)
    return add_particles_batch(
        system, pos, vel, jnp.zeros((n,)),
        jnp.full((n,), ParticleType.HAWKING, jnp.int32), temp
    )
