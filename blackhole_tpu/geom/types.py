"""Scene pytrees: black hole, accretion disk, camera, and simulation config.

TPU-native analog of the reference engine's POD structs
(/root/reference/include/blackhole_types.h:15-129).  Everything is an
immutable pytree dataclass so scenes can flow through jit / grad / vmap /
shard_map; *derived* quantities (horizons, ISCO, ergosphere) are computed
as differentiable functions of the primaries rather than cached fields, so
gradients w.r.t. mass and spin stay exact.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from blackhole_tpu import constants


Array = Any


class RayResult:
    """Ray trace outcome codes (reference: raytracer.h:16-28)."""

    HORIZON = 0
    DISK = 1
    BACKGROUND = 2
    MAX_DISTANCE = 3
    MAX_STEPS = 4
    ERROR = 5


class Integrator:
    """Integration methods (reference: raytracer.h:30-36).

    Unlike the reference — which stubs out LEAPFROG and YOSHIDA with an
    error printf (raytracer.c:616-624) — all four are implemented here.
    """

    RK4 = "rk4"
    RKF45 = "rkf45"
    LEAPFROG = "leapfrog"
    YOSHIDA = "yoshida"


class Jitter:
    """Sub-pixel jitter methods (reference: raytracer.h:38-44)."""

    NONE = "none"
    REGULAR_GRID = "grid"
    RANDOM = "random"
    HALTON = "halton"
    BLUE_NOISE = "blue_noise"


@struct.dataclass
class BlackHole:
    """Black hole primaries (reference: blackhole_types.h:77-86).

    mass:   M in geometric units.
    spin:   dimensionless a/M in [0, 1).
    charge: Q for Reissner-Nordstrom horizons.
    """

    mass: Array
    spin: Array
    charge: Array

    @classmethod
    def create(cls, mass=1.0, spin=0.0, charge=0.0, dtype=jnp.float32):
        return cls(
            mass=jnp.asarray(mass, dtype),
            spin=jnp.asarray(spin, dtype),
            charge=jnp.asarray(charge, dtype),
        )

    @property
    def a(self):
        """Spin in length units: a = J/M = spin * M."""
        return self.spin * self.mass

    @property
    def schwarzschild_radius(self):
        return 2.0 * self.mass

    @property
    def r_plus(self):
        """Outer horizon: M + sqrt(M^2 - a^2 - Q^2) (spacetime.c:331-366)."""
        a = self.a
        disc = jnp.maximum(self.mass**2 - a**2 - self.charge**2, 0.0)
        return self.mass + jnp.sqrt(disc)

    @property
    def r_minus(self):
        """Inner horizon: M - sqrt(M^2 - a^2 - Q^2); 0 for Schwarzschild."""
        a = self.a
        disc = jnp.maximum(self.mass**2 - a**2 - self.charge**2, 0.0)
        return jnp.where(
            (self.spin == 0.0) & (self.charge == 0.0),
            jnp.zeros_like(self.mass),
            self.mass - jnp.sqrt(disc),
        )

    @property
    def ergosphere_radius(self):
        """Equatorial ergosphere radius (= 2M for all theta=pi/2)."""
        return 2.0 * self.mass


@struct.dataclass
class Disk:
    """Thin accretion disk (reference: blackhole_types.h:91-98).

    inclination rotates the disk plane about the x-axis
    (reference GPU path: ray_tracer.comp:240-254).
    """

    inner_radius: Array
    outer_radius: Array
    temperature_scale: Array
    density_scale: Array
    thickness_factor: Array
    alpha_viscosity: Array
    inclination: Array

    @classmethod
    def create(
        cls,
        inner_radius=6.0,
        outer_radius=20.0,
        temperature_scale=1.0,
        density_scale=1.0,
        thickness_factor=0.05,
        alpha_viscosity=0.1,
        inclination=0.0,
        dtype=jnp.float32,
    ):
        as_ = lambda v: jnp.asarray(v, dtype)
        return cls(
            inner_radius=as_(inner_radius),
            outer_radius=as_(outer_radius),
            temperature_scale=as_(temperature_scale),
            density_scale=as_(density_scale),
            thickness_factor=as_(thickness_factor),
            alpha_viscosity=as_(alpha_viscosity),
            inclination=as_(inclination),
        )


@struct.dataclass
class Camera:
    """Pinhole camera (reference: raytracer.c:999-1039, renderer.h:385-400).

    position/direction/up are cartesian; fov_deg is the vertical field of
    view in degrees.
    """

    position: Array
    direction: Array
    up: Array
    fov_deg: Array

    @classmethod
    def create(
        cls,
        position=(0.0, 0.0, 75.0),
        direction=(0.0, 0.0, -1.0),
        up=(0.0, 1.0, 0.0),
        fov_deg=40.0,
        dtype=jnp.float32,
    ):
        return cls(
            position=jnp.asarray(position, dtype),
            direction=jnp.asarray(direction, dtype),
            up=jnp.asarray(up, dtype),
            fov_deg=jnp.asarray(fov_deg, dtype),
        )


@struct.dataclass
class SimConfig:
    """Numerical integration configuration (blackhole_types.h:103-115).

    Static (non-traced) fields control compiled loop structure; traced
    fields may be tuned without recompilation.
    """

    time_step: Array
    max_ray_distance: Array
    tolerance: Array

    # Static: these change the structure of the compiled program.
    max_steps: int = struct.field(pytree_node=False, default=1000)
    integrator: str = struct.field(pytree_node=False, default=Integrator.RK4)

    # Feature flags (static so the compiler can prune dead shading paths).
    enable_doppler: bool = struct.field(pytree_node=False, default=True)
    enable_redshift: bool = struct.field(pytree_node=False, default=True)
    enable_beaming: bool = struct.field(pytree_node=False, default=True)
    show_disk: bool = struct.field(pytree_node=False, default=True)
    # Differentiable shadow boundary (OFF by default -> hard edge, the
    # reference's semantics).  > 0: escaped-ray color is multiplied by
    # sigmoid((min_r - r_photon) / (shadow_softness * M)), making the
    # shadow SIZE differentiable w.r.t. (mass, spin) — pathwise AD sees
    # no gradient from capture/escape flips, so hard-edge mass
    # gradients can point the wrong way (the classic visibility-term
    # gap of differentiable rendering).  Used by inverse rendering.
    shadow_softness: float = struct.field(pytree_node=False, default=0.0)
    # Disk kinematic model for relativistic shading:
    # "auto"   — (default) exact Kerr circular-orbit g-factor
    #            (shading.kerr_g_factor) wherever it is valid —
    #            equatorial disks, conserved L available — and the
    #            compat factors otherwise (per-ray jnp.where select);
    # "compat" — flat-space Keplerian speed + special-relativistic
    #            Doppler + Schwarzschild dilation (the reference's
    #            physics, raytracer.c:244-294 / ray_tracer.comp:278-292);
    # "kerr"   — like auto, but REQUESTING the exact factor: a
    #            concretely inclined disk (no circular geodesics off
    #            the equator) logs a loud warning as it falls back.
    disk_kinematics: str = struct.field(pytree_node=False, default="auto")

    @classmethod
    def create(
        cls,
        time_step=0.1,
        max_ray_distance=100.0,
        tolerance=1e-6,
        max_steps=1000,
        integrator=Integrator.RK4,
        enable_doppler=True,
        enable_redshift=True,
        enable_beaming=True,
        show_disk=True,
        shadow_softness=0.0,
        disk_kinematics="auto",
        dtype=jnp.float32,
    ):
        if disk_kinematics not in ("auto", "compat", "kerr"):
            raise ValueError(
                f"disk_kinematics must be 'auto', 'compat' or 'kerr', "
                f"got {disk_kinematics!r}"
            )
        return cls(
            time_step=jnp.asarray(time_step, dtype),
            max_ray_distance=jnp.asarray(max_ray_distance, dtype),
            tolerance=jnp.asarray(tolerance, dtype),
            max_steps=int(max_steps),
            integrator=integrator,
            enable_doppler=bool(enable_doppler),
            enable_redshift=bool(enable_redshift),
            enable_beaming=bool(enable_beaming),
            show_disk=bool(show_disk),
            shadow_softness=float(shadow_softness),
            disk_kinematics=str(disk_kinematics),
        )


@struct.dataclass
class Scene:
    """Complete scene: black hole + optional disk + config.

    env_map: optional (H, W, 3) equirect sky panorama; escaped rays
    sample it along their final (gravitationally deflected) direction
    instead of the procedural gradient — true lensed backgrounds,
    where the reference fakes them with a screen-space warp
    (renderer.cpp:1491-1689).
    """

    blackhole: BlackHole
    disk: Disk
    config: SimConfig
    disk_enabled: bool = struct.field(pytree_node=False, default=True)
    env_map: Any = None


@struct.dataclass
class Hit:
    """Per-ray trace result (reference RayTraceHit, raytracer.h:79-92).

    All leaves have a common leading batch shape; scalars per ray.
    """

    result: Array  # int32 RayResult code
    position: Array  # (..., 3) cartesian hit / termination position
    distance: Array  # affine path length traveled (cartesian chord sum)
    steps: Array  # int32 number of integration steps taken
    time_dilation: Array  # 1/sqrt(1 - rs/r) at termination
    sky_direction: Array  # (..., 3) unit direction for background lookups
    doppler: Array  # doppler factor at disk hit (1 elsewhere)
    temperature: Array  # disk temperature at hit (0 elsewhere)
    redshift: Array  # gravitational redshift factor at hit
    color: Array  # (..., 3) shaded RGB
    # Optical depth through the disk at the crossing (0 elsewhere).
    # The reference declares this field but never computes it
    # (raytracer.h:91); here it is real: tau = kappa Sigma(r) / |cos|
    # of the slant angle, Shakura-Sunyaev-flavored Sigma ~ r^{-3/5}.
    optical_depth: Array
    # Closest Boyer-Lindquist radial approach along the trajectory.
    # Powers photon-ring diagnostics and the differentiable shadow
    # boundary (SimConfig.shadow_softness): the hard capture/escape
    # flip is the visibility discontinuity pathwise AD cannot see.
    min_r: Array

    def __getitem__(self, idx):
        import jax

        return jax.tree_util.tree_map(lambda x: x[idx], self)
