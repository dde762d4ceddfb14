"""Public API facade + particle system + CLI parity tests.

Covers the full bh_* surface (blackhole_api.h:47-286; WASM export list
Makefile:47) and reproduces the reference CLI driver's scenario
(main.c:190-247): context setup, the 5 canonical rays, the orbit table.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blackhole_tpu import api
from blackhole_tpu.geom.types import RayResult
from blackhole_tpu.particles import orbits, system as psys


@pytest.fixture
def ctx():
    context = api.bh_initialize()
    assert api.bh_configure_black_hole(context, 1.0, 0.0, 0.0) == 0
    assert api.bh_configure_accretion_disk(context, 6.0, 20.0, 1.0, 1.0) == 0
    assert api.bh_configure_simulation(context, 0.1, 100.0, 1000, 1e-6) == 0
    return context


def test_version():
    major, minor, patch = api.bh_get_version()
    assert (major, minor, patch) >= (0, 1, 0)


def test_config_validation():
    context = api.bh_initialize()
    assert api.bh_configure_black_hole(context, -1.0, 0.0) == \
        api.BHError.INVALID_PARAMETER
    assert api.bh_configure_black_hole(context, 1.0, 1.5) == \
        api.BHError.INVALID_PARAMETER
    assert api.bh_configure_accretion_disk(context, 6.0, 5.0, 1.0, 1.0) == \
        api.BHError.INVALID_PARAMETER
    assert api.bh_configure_simulation(context, -0.1, 100.0, 10, 1e-6) == \
        api.BHError.INVALID_PARAMETER
    # Bad keyword options return the error code too (never raise).
    assert api.bh_configure_simulation(
        context, 0.1, 100.0, 10, 1e-6, disk_kinematics="newtonian"
    ) == api.BHError.INVALID_PARAMETER
    assert api.bh_configure_simulation(
        context, 0.1, 100.0, 10, 1e-6, disk_kinematics="kerr"
    ) == api.BHError.SUCCESS
    assert context.config.disk_kinematics == "kerr"
    assert api.blackhole_get_mass(context) == 1.0


def test_five_canonical_rays(ctx):
    """The reference's 5 test rays (main.c:69-107) with physically
    correct expectations: straight at the hole -> horizon; wide miss ->
    background; disk-angle shots -> disk."""
    origins = np.array([
        [0.0, 0.0, 30.0],
        [0.0, 0.0, 30.0],
        [0.0, 0.0, 30.0],
        [0.0, 0.0, 30.0],
        [30.0, 0.0, 0.0],
    ])
    dirs = np.array([
        [0.0, 0.0, -1.0],
        [0.2, 0.0, -1.0],
        [0.5, 0.0, -1.0],
        [0.3, 0.0, -1.0],
        [-1.0, 0.0, 0.1],
    ])
    hits = api.bh_trace_rays_batch(ctx, origins, dirs)
    results = np.asarray(hits.result)
    # Ray 1: aimed dead-center from the polar axis -> captured.
    assert results[0] == RayResult.HORIZON
    # Ray 3: impact parameter 30*0.5/sqrt(1.25) ~ 13.4 M >> b_crit -> the
    # ray bends but escapes (may cross the disk annulus on the way out).
    assert results[2] in (RayResult.DISK, RayResult.BACKGROUND,
                          RayResult.MAX_DISTANCE)
    # Ray 2 (b ~ 5.9 M) crosses the plane near the disk inner edge —
    # just inside 6 M, so it misses the annulus and escapes.
    assert results[1] in (RayResult.DISK, RayResult.BACKGROUND,
                          RayResult.MAX_DISTANCE)
    # Ray 4 (b ~ 8.6 M) crosses squarely inside the annulus.
    assert results[3] == RayResult.DISK
    # Single-ray API agrees with the batch.
    h0 = api.bh_trace_ray(ctx, origins[0], dirs[0])
    assert int(h0.result) == results[0]


def test_orbital_velocity_table(ctx):
    """v = sqrt(M/r) table (main.c:131-167)."""
    for r in (20.0, 30.0, 40.0, 50.0, 60.0):
        v = api.bh_calculate_orbital_velocity(ctx, r)
        np.testing.assert_allclose(v, np.sqrt(1.0 / r), rtol=1e-6)
    with pytest.raises(ValueError):
        api.bh_calculate_orbital_velocity(ctx, -1.0)


def test_time_dilation_ratio(ctx):
    ratio = api.bh_calculate_time_dilation(
        ctx, (3.0, 0.0, 0.0), (1000.0, 0.0, 0.0)
    )
    # 1/sqrt(1-2/3) / 1/sqrt(1-2/1000)
    expect = (1 / np.sqrt(1 - 2 / 3)) / (1 / np.sqrt(1 - 2 / 1000))
    np.testing.assert_allclose(ratio, expect, rtol=1e-5)


def test_particle_system_lifecycle(ctx):
    system = api.bh_create_particle_system(ctx, 64)
    assert system.capacity == 64
    system, pid = api.bh_add_test_particle(
        ctx, system, (30.0, 0.0, 0.0), (0.0, 0.18, 0.0), 1e-6
    )
    assert int(pid) == 1
    system, n_disk = api.bh_create_accretion_disk_particles(
        ctx, system, 32, key=jax.random.PRNGKey(0)
    )
    assert n_disk == 32
    system, n_hawking = api.bh_generate_hawking_radiation(
        ctx, system, 8, key=jax.random.PRNGKey(1)
    )
    assert n_hawking == 8
    assert int(system.num_active()) == 41

    for _ in range(5):
        system = api.bh_update_particles(ctx, system)
    pos, vel, types, count = api.bh_get_particle_data(ctx, system)
    assert int(count) <= 41
    active_pos = np.asarray(pos[: int(count)])
    assert np.all(np.isfinite(active_pos))

    # Disk particles stay within ~the disk annulus after a few steps.
    types_np = np.asarray(types[: int(count)])
    radii = np.linalg.norm(active_pos, axis=-1)
    disk_r = radii[types_np == psys.ParticleType.DISK]
    assert np.all(disk_r > 2.0) and np.all(disk_r < 40.0)


def test_particle_pool_overflow(ctx):
    system = api.bh_create_particle_system(ctx, 4)
    system, n = api.bh_create_accretion_disk_particles(
        ctx, system, 10, key=jax.random.PRNGKey(0)
    )
    assert n == 4  # silently clamped to capacity, like the C pool
    system, pid = api.bh_add_test_particle(
        ctx, system, (30.0, 0.0, 0.0), (0.0, 0.1, 0.0), 0.0
    )
    assert int(pid) == -1


def test_remove_and_find_particle(ctx):
    system = api.bh_create_particle_system(ctx, 8)
    system, pid = api.bh_add_test_particle(
        ctx, system, (30.0, 0.0, 0.0), (0.0, 0.1, 0.0), 0.0
    )
    assert int(psys.find_particle(system, pid)) == 0
    system = psys.remove_particle(system, pid)
    assert int(psys.find_particle(system, pid)) == -1
    assert int(system.num_active()) == 0


def test_circular_orbit_is_stable():
    """A test particle on a circular orbit at r=30 M keeps its radius
    over many geodesic steps (validates the timelike integrator)."""
    from blackhole_tpu.geom.types import BlackHole, SimConfig
    from blackhole_tpu.particles import dynamics

    bh = BlackHole.create(1.0, 0.0, dtype=jnp.float64)
    pos = jnp.array([[30.0, 0.0, 0.0]], jnp.float64)
    vel, exists = orbits.circular_orbit_velocity(
        jnp.float64(30.0), bh
    )
    assert bool(exists)
    vel = vel[None, :]
    for _ in range(50):
        pos, vel = dynamics.geodesic_update(pos, vel, 0.5, bh.mass, bh.a)
    r = float(jnp.linalg.norm(pos[0]))
    assert abs(r - 30.0) < 0.5  # < 2% drift over 25 M of proper time


def test_orbit_parameters_circular():
    pos = jnp.array([30.0, 0.0, 0.0])
    vel = jnp.array([0.0, jnp.sqrt(1.0 / 30.0), 0.0])
    p = orbits.orbit_parameters(pos, vel, 1.0)
    np.testing.assert_allclose(float(p.eccentricity), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(p.semi_major_axis), 30.0, rtol=1e-6)
    np.testing.assert_allclose(float(p.specific_energy), -1.0 / 60.0,
                               rtol=1e-6)


def test_shader_data_block(ctx):
    blk = api.bh_generate_shader_data(
        ctx, (0.0, 0.0, 50.0), (0.0, 0.0, -1.0), (0.0, 1.0, 0.0),
        640, 480, 60.0,
    )
    assert blk.shape == (31,)  # 5 bh + 4 disk + 9 observer + 2 camera
    #                            + 3 flags + 4 integration + 4 padding
    assert blk.dtype == np.float32
    assert blk[0] == 1.0  # mass
    assert blk[2] == 2.0  # rs
    np.testing.assert_allclose(blk[18], np.radians(60.0))
    np.testing.assert_allclose(blk[19], 640 / 480)


def test_cli_runs(capsys):
    from blackhole_tpu import cli

    assert cli.main(["tests"]) == 0
    out = capsys.readouterr().out
    assert "API Version" in out
    assert "Ray 5" in out
    assert "Orbital Velocity" in out
    assert "Tests completed." in out
