"""Public API facade — the `bh_*` surface of the framework.

Mirrors the reference's C API (/root/reference/include/blackhole_api.h,
/root/reference/src/blackhole_api.c) function-for-function, so a user of
the C engine finds every entry point here (the WASM export list at
Makefile:47 is the canonical enumeration):

    bh_initialize / bh_shutdown
    bh_configure_black_hole / bh_configure_accretion_disk /
    bh_configure_simulation
    bh_trace_ray / bh_trace_rays_batch
    bh_create_particle_system / bh_destroy_particle_system
    bh_add_test_particle / bh_create_accretion_disk_particles /
    bh_generate_hawking_radiation / bh_update_particles /
    bh_get_particle_data
    bh_calculate_time_dilation / bh_get_version
    bh_calculate_orbital_velocity / blackhole_get_mass
    bh_generate_shader_data

Design: the context is a thin mutable holder around immutable pytree
scenes; all computation is jitted pure functions.  Errors are raised as
exceptions *and* returned as BHError codes for C-API-style callers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from blackhole_tpu import constants
from blackhole_tpu.geom.types import (
    BlackHole,
    Camera,
    Disk,
    Hit,
    Scene,
    SimConfig,
)
from blackhole_tpu.metrics import derived
from blackhole_tpu.particles import dynamics, generators, system as psys
from blackhole_tpu.render import trace


class BHError:
    """Error codes (blackhole_api.h:30-36)."""

    SUCCESS = 0
    INVALID_PARAMETER = -1
    MEMORY_ALLOCATION = -2
    INITIALIZATION = -3
    SIMULATION = -4


@dataclasses.dataclass
class BHContext:
    """Engine context (blackhole_api.c:26-31): black hole + disk +
    config + disk_enabled flag, with reference defaults
    (blackhole_api.c:52-79)."""

    blackhole: BlackHole
    disk: Disk
    config: SimConfig
    disk_enabled: bool = False
    dtype: object = jnp.float32

    def scene(self) -> Scene:
        return Scene(
            blackhole=self.blackhole,
            disk=self.disk,
            config=self.config,
            disk_enabled=self.disk_enabled,
        )


def bh_initialize(dtype=jnp.float32) -> BHContext:
    """Create a context with the reference defaults: M=1 Schwarzschild,
    disk 6..20 M (disabled), step 0.1, 1000 steps, tol 1e-6
    (blackhole_api.c:52-79)."""
    return BHContext(
        blackhole=BlackHole.create(1.0, 0.0, 0.0, dtype=dtype),
        disk=Disk.create(6.0, 20.0, 1.0, 1.0, dtype=dtype),
        config=SimConfig.create(
            time_step=0.1,
            max_ray_distance=100.0,
            max_steps=1000,
            tolerance=1e-6,
            dtype=dtype,
        ),
        disk_enabled=False,
        dtype=dtype,
    )


def bh_shutdown(context: BHContext) -> None:
    """No-op for API parity (device memory is GC-managed;
    blackhole_api.c:85-89)."""


def bh_get_version():
    """(major, minor, patch) (blackhole_api.c:464-476)."""
    return (
        constants.VERSION_MAJOR,
        constants.VERSION_MINOR,
        constants.VERSION_PATCH,
    )


def blackhole_get_mass(context: BHContext) -> float:
    """blackhole_api.c:33-39."""
    return float(context.blackhole.mass)


def bh_calculate_orbital_velocity(context: BHContext, r: float) -> float:
    """v = sqrt(M/r) (blackhole_api.c:42-48)."""
    if r <= 0:
        raise ValueError("r must be positive")
    return float(
        derived.keplerian_orbital_velocity(
            jnp.asarray(r, context.dtype), context.blackhole.mass
        )
    )


def bh_configure_black_hole(context: BHContext, mass, spin, charge=0.0
                            ) -> int:
    """Validated setter (blackhole_api.c:94-118): mass > 0,
    0 <= spin <= 1, and sub-extremal overall: (spin*M)^2 + Q^2 <= M^2
    (the condition under which the reference's horizon discriminant
    sqrt(M^2 - a^2 - Q^2) is real, spacetime.c:331-366)."""
    if mass <= 0.0 or not (0.0 <= spin <= 1.0):
        return BHError.INVALID_PARAMETER
    if (spin * mass) ** 2 + charge**2 > mass**2:
        return BHError.INVALID_PARAMETER
    context.blackhole = BlackHole.create(mass, spin, charge, dtype=context.dtype)
    return BHError.SUCCESS


def bh_configure_accretion_disk(context: BHContext, inner_radius,
                                outer_radius, temperature_scale,
                                density_scale, **kw) -> int:
    """Validated setter; enables the disk (blackhole_api.c:123-148)."""
    if (
        inner_radius <= 0.0
        or outer_radius <= inner_radius
        or temperature_scale <= 0.0
        or density_scale <= 0.0
    ):
        return BHError.INVALID_PARAMETER
    context.disk = Disk.create(
        inner_radius, outer_radius, temperature_scale, density_scale,
        dtype=context.dtype, **kw
    )
    context.disk_enabled = True
    return BHError.SUCCESS


def bh_configure_simulation(context: BHContext, time_step,
                            max_ray_distance, max_integration_steps,
                            tolerance, **kw) -> int:
    """Validated setter (blackhole_api.c:153-177)."""
    if (
        time_step <= 0.0
        or max_ray_distance <= 0.0
        or max_integration_steps <= 0
        or tolerance <= 0.0
    ):
        return BHError.INVALID_PARAMETER
    try:
        context.config = SimConfig.create(
            time_step=time_step,
            max_ray_distance=max_ray_distance,
            max_steps=max_integration_steps,
            tolerance=tolerance,
            dtype=context.dtype,
            **kw,
        )
    except (ValueError, TypeError):
        # Bad keyword option (e.g. disk_kinematics="newtonian"):
        # C-API semantics return an error code, never raise
        # (blackhole_api.c:153-177).
        return BHError.INVALID_PARAMETER
    return BHError.SUCCESS


def bh_trace_ray(context: BHContext, origin, direction) -> Hit:
    """Trace a single ray (blackhole_api.c:182-220); direction is
    normalized internally.  Returns a Hit with scalar leaves."""
    o = jnp.asarray(origin, context.dtype)[None, :]
    d = jnp.asarray(direction, context.dtype)[None, :]
    hit = trace.trace_rays(o, d, context.scene())
    return jax.tree_util.tree_map(lambda x: x[0], hit)


def bh_trace_rays_batch(context: BHContext, origins, directions,
                        engine: str = "auto") -> Hit:
    """Batch trace (blackhole_api.c:225-250) — one fused device
    computation instead of the reference's sequential host loop.  On a
    TPU backend the fused Pallas kernel is used automatically."""
    from blackhole_tpu.render import image as image_mod

    o = jnp.asarray(origins, context.dtype)
    d = jnp.asarray(directions, context.dtype)
    return image_mod.trace_rays_fast(o, d, context.scene(), engine)


# --- particle system facade (blackhole_api.c:256-427) ---


def bh_create_particle_system(context: BHContext, capacity: int
                              ) -> psys.ParticleSystem:
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    return psys.ParticleSystem.create(capacity, dtype=context.dtype)


def bh_destroy_particle_system(context: BHContext,
                               system: psys.ParticleSystem) -> None:
    """No-op for parity (device memory is GC-managed)."""


def bh_add_test_particle(context: BHContext, system, position, velocity,
                         mass):
    """Returns (new_system, particle_id) (blackhole_api.c:296-313)."""
    if mass < 0.0:
        raise ValueError("mass must be non-negative")
    return psys.add_particle(
        system,
        jnp.asarray(position, context.dtype),
        jnp.asarray(velocity, context.dtype),
        mass,
        psys.ParticleType.TEST,
    )


def bh_create_accretion_disk_particles(context: BHContext, system,
                                       num_particles, key=None):
    """Seed disk particles (blackhole_api.c:318-338); returns
    (new_system, n_created)."""
    if not context.disk_enabled:
        return system, 0
    if key is None:
        key = jax.random.PRNGKey(0)
    new_sys, ids = generators.create_accretion_disk(
        system, key, num_particles, context.blackhole, context.disk
    )
    return new_sys, int(jnp.sum(ids >= 0))


def bh_generate_hawking_radiation(context: BHContext, system,
                                  num_particles, key=None):
    """blackhole_api.c:343-359; returns (new_system, n_created)."""
    if key is None:
        key = jax.random.PRNGKey(1)
    new_sys, ids = generators.generate_hawking_radiation(
        system, key, num_particles, context.blackhole
    )
    return new_sys, int(jnp.sum(ids >= 0))


def bh_update_particles(context: BHContext, system) -> psys.ParticleSystem:
    """One time step for the whole pool (blackhole_api.c:364-379)."""
    return dynamics.update_particles(
        system, context.blackhole, context.config
    )


def bh_get_particle_data(context: BHContext, system):
    """Compacted (positions, velocities, types, count)
    (blackhole_api.c:384-427)."""
    return psys.get_particle_data(system)


def bh_calculate_time_dilation(context: BHContext, position1, position2
                               ) -> float:
    """Ratio of time passage between two points
    (blackhole_api.c:432-459)."""
    r1 = jnp.linalg.norm(jnp.asarray(position1, context.dtype))
    r2 = jnp.linalg.norm(jnp.asarray(position2, context.dtype))
    d1 = derived.time_dilation(r1, context.blackhole.mass)
    d2 = derived.time_dilation(r2, context.blackhole.mass)
    return float(d1 / d2)


def bh_generate_shader_data(
    context: BHContext,
    observer_pos,
    observer_dir,
    up_vector,
    width: int,
    height: int,
    fov: float,
    enable_doppler: bool = True,
    enable_redshift: bool = True,
    show_disk: bool = True,
) -> np.ndarray:
    """Packed float32 parameter block for kernel dispatch — same field
    order as the reference's GPU marshalling (blackhole_api.c:495-608):
    [mass, spin, rs, r_isco, r_horizon,
     disk_inner, disk_outer, disk_temp_scale, disk_density_scale,
     observer_pos(3), observer_dir(3), up_vector(3),
     fov_radians, aspect_ratio,
     enable_doppler, enable_redshift, show_disk,
     max_steps, step_size, tolerance, max_distance,
     padding(4)]
    """
    bh = context.blackhole
    show = bool(show_disk and context.disk_enabled)
    if show:
        disk_block = [
            float(context.disk.inner_radius),
            float(context.disk.outer_radius),
            float(context.disk.temperature_scale),
            float(context.disk.density_scale),
        ]
    else:
        # Disable by inverted radii (blackhole_api.c:573-579).
        disk_block = [1000.0, 100.0, 0.0, 0.0]
    out = np.array(
        [
            float(bh.mass),
            float(bh.spin),
            float(bh.schwarzschild_radius),
            float(derived.isco_radius(bh.mass, bh.spin)),
            float(bh.r_plus),
            *disk_block,
            *[float(v) for v in observer_pos],
            *[float(v) for v in observer_dir],
            *[float(v) for v in up_vector],
            float(fov) * np.pi / 180.0,
            width / height,
            float(enable_doppler),
            float(enable_redshift),
            float(show),
            float(context.config.max_steps),
            float(context.config.time_step),
            float(context.config.tolerance),
            float(context.config.max_ray_distance),
            0.0, 0.0, 0.0, 0.0,
        ],
        dtype=np.float32,
    )
    return out
