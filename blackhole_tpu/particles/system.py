"""Structure-of-arrays particle system.

TPU-native equivalent of /root/reference/src/particle_sim.c:73-168
(fixed-capacity pool, id allocation, soft-delete via active flags).
The C engine stores an array-of-structs and loops; here every field is a
flat device array so updates are one fused vmapped computation, and the
"pool" semantics (add/find/remove by id) are expressed functionally —
each op returns a new ParticleSystem pytree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


class ParticleType:
    """Particle categories (particle_sim.h:16-21)."""

    TEST = 0
    DISK = 1
    HAWKING = 2
    JET = 3


@struct.dataclass
class ParticleSystem:
    """Fixed-capacity SoA particle pool.

    capacity is static; `count` and `next_id` are traced scalars so the
    whole system can live inside jit.
    """

    position: jnp.ndarray  # (cap, 3)
    velocity: jnp.ndarray  # (cap, 3)
    mass: jnp.ndarray  # (cap,)
    ptype: jnp.ndarray  # (cap,) int32
    pid: jnp.ndarray  # (cap,) int32 (0 = never allocated)
    active: jnp.ndarray  # (cap,) bool
    age: jnp.ndarray  # (cap,)
    temperature: jnp.ndarray  # (cap,)
    time_dilation: jnp.ndarray  # (cap,)
    count: jnp.ndarray  # () int32 slots ever used
    next_id: jnp.ndarray  # () int32

    @classmethod
    def create(cls, capacity: int, dtype=jnp.float32):
        z3 = jnp.zeros((capacity, 3), dtype)
        z = jnp.zeros((capacity,), dtype)
        zi = jnp.zeros((capacity,), jnp.int32)
        return cls(
            position=z3,
            velocity=z3,
            mass=z,
            ptype=zi,
            pid=zi,
            active=jnp.zeros((capacity,), bool),
            age=z,
            temperature=z,
            time_dilation=jnp.ones((capacity,), dtype),
            count=jnp.int32(0),
            next_id=jnp.int32(1),
        )

    @property
    def capacity(self) -> int:
        return self.position.shape[0]

    def num_active(self):
        return jnp.sum(self.active.astype(jnp.int32))


def add_particle(system: ParticleSystem, position, velocity, mass,
                 ptype, temperature=0.0):
    """Append one particle (particle_sim.c:108-133).

    Returns (new_system, pid); pid is -1 when the pool is full.
    """
    idx = system.count
    full = idx >= system.capacity
    safe_idx = jnp.minimum(idx, system.capacity - 1)
    pid = jnp.where(full, -1, system.next_id)

    def set_at(cur, val):
        """New slot value: keep the current value when the pool is full."""
        val = jnp.asarray(val, cur.dtype)
        return jnp.where(full, cur, val)

    new = system.replace(
        position=system.position.at[safe_idx].set(
            set_at(system.position[safe_idx], position)
        ),
        velocity=system.velocity.at[safe_idx].set(
            set_at(system.velocity[safe_idx], velocity)
        ),
        mass=system.mass.at[safe_idx].set(set_at(system.mass[safe_idx], mass)),
        ptype=system.ptype.at[safe_idx].set(
            jnp.where(full, system.ptype[safe_idx], jnp.int32(ptype))
        ),
        pid=system.pid.at[safe_idx].set(
            jnp.where(full, system.pid[safe_idx], system.next_id)
        ),
        active=system.active.at[safe_idx].set(
            jnp.where(full, system.active[safe_idx], True)
        ),
        age=system.age.at[safe_idx].set(set_at(system.age[safe_idx], 0.0)),
        temperature=system.temperature.at[safe_idx].set(
            set_at(system.temperature[safe_idx], temperature)
        ),
        count=jnp.where(full, system.count, system.count + 1),
        next_id=jnp.where(full, system.next_id, system.next_id + 1),
    )
    return new, pid


def add_particles_batch(system: ParticleSystem, positions, velocities,
                        masses, ptypes, temperatures=None):
    """Vectorized bulk insert — the idiomatic path for disk seeding /
    Hawking bursts (replaces the reference's per-particle loop,
    particle_sim.c:371-419).  Returns (new_system, ids)."""
    n = positions.shape[0]
    cap = system.capacity
    start = system.count
    slots = start + jnp.arange(n, dtype=jnp.int32)
    fits = slots < cap
    safe = jnp.minimum(slots, cap - 1)
    ids = jnp.where(fits, system.next_id + jnp.arange(n, dtype=jnp.int32), -1)
    if temperatures is None:
        temperatures = jnp.zeros((n,), system.temperature.dtype)

    def scatter(arr, vals):
        vals = jnp.asarray(vals, arr.dtype)
        cur = arr[safe]
        return arr.at[safe].set(jnp.where(
            fits.reshape((n,) + (1,) * (vals.ndim - 1)), vals, cur
        ))

    n_added = jnp.sum(fits.astype(jnp.int32))
    new = system.replace(
        position=scatter(system.position, positions),
        velocity=scatter(system.velocity, velocities),
        mass=scatter(system.mass, masses),
        ptype=scatter(system.ptype, jnp.asarray(ptypes, jnp.int32)),
        pid=scatter(system.pid, system.next_id + jnp.arange(n, dtype=jnp.int32)),
        active=scatter(system.active, jnp.ones((n,), bool)),
        age=scatter(system.age, jnp.zeros((n,))),
        temperature=scatter(system.temperature, temperatures),
        # Pin the int dtypes: under x64 the int-scalar arithmetic here
        # otherwise drifts to int64, and the next add_particle scatter
        # into the int32 pool warns (error in future jax).
        count=jnp.minimum(start + n, cap).astype(jnp.int32),
        next_id=(system.next_id + n_added).astype(jnp.int32),
    )
    return new, ids


def find_particle(system: ParticleSystem, pid):
    """Index of a live particle by id, or -1 (particle_sim.c:138-150)."""
    match = (system.pid == pid) & system.active
    idx = jnp.argmax(match)
    return jnp.where(jnp.any(match), idx, -1)


def remove_particle(system: ParticleSystem, pid):
    """Soft-delete by id (particle_sim.c:155-168)."""
    match = system.pid == pid
    return system.replace(active=system.active & ~match)


def get_particle_data(system: ParticleSystem):
    """Compacted copy-out of active particles for rendering
    (blackhole_api.c:384-427).  Returns (positions, velocities, types,
    count): active entries packed to the front, order preserved."""
    order = jnp.argsort(~system.active, stable=True)
    return (
        system.position[order],
        system.velocity[order],
        system.ptype[order],
        system.num_active(),
    )
