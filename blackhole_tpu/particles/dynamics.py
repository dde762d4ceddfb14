"""Massive-particle dynamics: relativistic geodesics + Newtonian far field.

TPU-native equivalent of /root/reference/src/particle_sim.c:232-334 and
:505-566.  Improvements over the reference, per SURVEY.md §2 C14:

* The C engine converts cartesian->spherical velocity with an admittedly
  wrong Jacobian ("This is a simplification", particle_sim.c:257-262) and
  advances with a single *Euler* step.  Here timelike geodesics use the
  same exact Hamiltonian machinery as the photon tracer (H = -1/2 for
  unit-mass normalization) with an RK4 step and exact coordinate
  conversions.
* Regime selection (geodesic near the hole, Newtonian far away,
  particle_sim.c:530-535) is a branch-free jnp.where over the batch.
* Horizon capture soft-deletes via the active mask (particle_sim.c:541).

All updates are vmapped over the whole SoA pool in one fused computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from blackhole_tpu.constants import EPSILON
from blackhole_tpu.geom import coords
from blackhole_tpu.metrics import derived, kerr
from blackhole_tpu.particles.system import ParticleSystem, ParticleType


def _timelike_init(position, velocity, M, a, Q=0.0):
    """Build (r, theta, phi, p_r, p_theta, E, L) for a massive particle
    from cartesian position + coordinate 3-velocity.

    dt/dtau from the timelike normalization g_mn u^m u^n = -1.
    """
    bl = coords.cartesian_to_boyer_lindquist(position, a)
    r, theta = bl[..., 0], bl[..., 1]

    def bl_map(x):
        return coords.cartesian_to_boyer_lindquist(x, a)

    _, dbl = jax.jvp(bl_map, (position,), (velocity,))
    dr, dtheta, dphi = dbl[..., 0], dbl[..., 1], dbl[..., 2]

    g = kerr.metric(r, theta, M, a, Q)
    S = g.g_rr * dr**2 + g.g_thth * dtheta**2 + g.g_phph * dphi**2
    # g_tt dt^2 + 2 g_tphi dt dphi + S = -1
    disc = jnp.maximum(
        g.g_tphi**2 * dphi**2 - g.g_tt * (S + 1.0), 0.0
    )
    dt = (g.g_tphi * dphi + jnp.sqrt(disc)) / jnp.maximum(-g.g_tt, EPSILON)
    E = -(g.g_tt * dt + g.g_tphi * dphi)
    L = g.g_tphi * dt + g.g_phph * dphi
    p_r = g.g_rr * dr
    p_theta = g.g_thth * dtheta
    return bl, jnp.stack([p_r, p_theta], -1), E, L


def _timelike_rhs(y, E, L, M, a, Q=0.0):
    """Hamiltonian flow for massive particles; state
    y = (r, theta, phi, p_r, p_theta).  Identical force terms as the
    photon path (the mass term is constant and drops out of dH/dx)."""
    from blackhole_tpu.render import geodesic

    r, theta = y[..., 0], y[..., 1]
    p_r, p_theta = y[..., 3], y[..., 4]
    gi = kerr.inverse_metric(r, theta, M, a, Q)
    dr = gi.g_rr * p_r
    dtheta = gi.g_thth * p_theta
    dphi = -gi.g_tphi * E + gi.g_phph * L
    dpr = -geodesic._dH_dr_batched(r, theta, p_r, p_theta, E, L, M, a, Q)
    dpth = -geodesic._dH_dtheta_batched(
        r, theta, p_r, p_theta, E, L, M, a, Q
    )
    return jnp.stack([dr, dtheta, dphi, dpr, dpth], axis=-1)


def geodesic_update(position, velocity, dt, M, a, Q=0.0):
    """One RK4 proper-time step of the timelike geodesic; returns new
    cartesian (position, velocity).  Replaces the reference's Euler step
    with approximate Jacobians (particle_sim.c:232-301)."""
    bl, p, E, L = _timelike_init(position, velocity, M, a, Q)
    y = jnp.concatenate([bl, p], axis=-1)

    def f(y):
        return _timelike_rhs(y, E, L, M, a, Q)

    k1 = f(y)
    k2 = f(y + 0.5 * dt * k1)
    k3 = f(y + 0.5 * dt * k2)
    k4 = f(y + dt * k3)
    y_new = y + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

    new_bl = y_new[..., :3]
    new_pos = coords.boyer_lindquist_to_cartesian(new_bl, a)
    # Coordinate velocity back to cartesian via the forward Jacobian.
    dy = f(y_new)
    dsph = dy[..., :3]

    def fwd(bl3):
        return coords.boyer_lindquist_to_cartesian(bl3, a)

    _, new_vel = jax.jvp(fwd, (new_bl,), (dsph,))
    return new_pos, new_vel


def newtonian_update(position, velocity, dt, M):
    """Euler step under Newtonian gravity a = -M r_hat / r^2
    (particle_sim.c:306-334, same integrator for parity)."""
    r = jnp.linalg.norm(position, axis=-1, keepdims=True)
    accel = -M * position / jnp.maximum(r, EPSILON) ** 3
    new_vel = velocity + dt * accel
    new_pos = position + dt * new_vel
    return new_pos, new_vel


def update_particles(system: ParticleSystem, blackhole, config
                     ) -> ParticleSystem:
    """Advance every active particle one time step
    (particle_sim.c:505-566).

    Regime: TEST particles within 20 r_s use the relativistic geodesic,
    everything else Newtonian (particle_sim.c:530-535).  Captured
    particles (r <= r_s) are deactivated.
    """
    M = blackhole.mass
    a = blackhole.a
    rs = blackhole.schwarzschild_radius
    dt = config.time_step

    r = jnp.linalg.norm(system.position, axis=-1)
    use_geo = (system.ptype == ParticleType.TEST) & (r < 20.0 * rs)

    geo_pos, geo_vel = geodesic_update(
        system.position, system.velocity, dt, M, a, blackhole.charge
    )
    newt_pos, newt_vel = newtonian_update(system.position, system.velocity, dt, M)

    new_pos = jnp.where(use_geo[..., None], geo_pos, newt_pos)
    new_vel = jnp.where(use_geo[..., None], geo_vel, newt_vel)

    act = system.active
    new_pos = jnp.where(act[..., None], new_pos, system.position)
    new_vel = jnp.where(act[..., None], new_vel, system.velocity)

    r_new = jnp.linalg.norm(new_pos, axis=-1)
    captured = act & (r_new <= rs)

    return system.replace(
        position=new_pos,
        velocity=new_vel,
        age=jnp.where(act, system.age + dt, system.age),
        active=act & ~captured,
        time_dilation=jnp.where(
            act, derived.time_dilation(r_new, M), system.time_dilation
        ),
    )
