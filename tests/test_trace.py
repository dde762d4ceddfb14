"""End-to-end ray tracing: shadow geometry, conservation, disk hits.

Physics oracles (not the reference's buggy disk path — see
tests/golden_reference_output.txt where its disk-normal bug makes every
ray a disk hit): the Schwarzschild critical impact parameter sqrt(27) M,
exact conservation of H/L/Q, and analytic flat-space limits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackhole_tpu.geom.types import (
    BlackHole,
    Camera,
    Disk,
    Integrator,
    RayResult,
    Scene,
    SimConfig,
)
from blackhole_tpu.render import geodesic, image, trace


def make_scene(spin=0.0, disk=False, dtype=jnp.float64, **cfg):
    cfg.setdefault("max_steps", 3000)
    return Scene(
        blackhole=BlackHole.create(1.0, spin, 0.0, dtype=dtype),
        disk=Disk.create(dtype=dtype),
        config=SimConfig.create(dtype=dtype, **cfg),
        disk_enabled=disk,
    )


def parallel_rays(bs, z0=30.0):
    bs = jnp.asarray(bs, jnp.float64)
    n = len(bs)
    origins = jnp.stack([bs, jnp.zeros(n), jnp.full(n, z0)], axis=-1)
    dirs = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (n, 1))
    return origins, dirs


class TestShadow:
    def test_critical_impact_parameter(self):
        """Rays with b < sqrt(27) M are captured; b > sqrt(27) M escape.
        (Closed-form Schwarzschild photon capture cross-section.)"""
        scene = make_scene()
        b_crit = np.sqrt(27.0)
        bs = [b_crit - 0.1, b_crit - 0.02, b_crit + 0.02, b_crit + 0.1]
        o, d = parallel_rays(bs)
        hit = trace.trace_rays(o, d, scene)
        res = np.array(hit.result)
        assert (res[:2] == RayResult.HORIZON).all(), res
        assert (res[2:] != RayResult.HORIZON).all(), res

    def test_radial_ray_captured(self):
        scene = make_scene()
        o, d = parallel_rays([0.0])
        hit = trace.trace_rays(o, d, scene)
        assert int(hit.result[0]) == RayResult.HORIZON

    def test_far_ray_nearly_straight(self):
        """b = 20 M deflects by ~4M/b = 0.2 rad; the ray must escape and
        its bend angle must match the weak-field formula to ~15%."""
        scene = make_scene(max_ray_distance=400.0, max_steps=6000)
        o, d = parallel_rays([20.0], z0=150.0)
        hit = trace.trace_rays(o, d, scene)
        assert int(hit.result[0]) in (
            RayResult.BACKGROUND,
            RayResult.MAX_DISTANCE,
        )
        out_dir = np.array(hit.sky_direction[0])
        cosang = -out_dir[2]  # angle from the initial -z direction
        bend = np.arccos(np.clip(cosang, -1, 1))
        # Deflection series: 4M/b + 15 pi/4 (M/b)^2 + 128/3 (M/b)^3 + ...
        mb = 1.0 / 20.0
        alpha = 4.0 * mb + (15.0 * np.pi / 4.0) * mb**2 + (128.0 / 3.0) * mb**3
        np.testing.assert_allclose(bend, alpha, rtol=0.02)

    def test_kerr_shadow_asymmetry(self):
        """Frame dragging shifts the Kerr shadow: at a=0.9 the capture
        threshold differs between prograde and retrograde sides."""
        scene = make_scene(spin=0.9)
        # Equatorial critical impact parameters at a=0.9 (Bardeen 1972):
        # prograde b+ ~ 2.85 M, retrograde b- ~ 6.83 M.  Rays travel in
        # -x with offset +-y; y>0 has L_z>0 (prograde vs spin +z).
        bvals = jnp.array([4.5, -4.5, 8.0, -8.0, 2.0, -2.0])
        n = len(bvals)
        o = jnp.stack([jnp.full(n, 30.0), bvals, jnp.zeros(n)], axis=-1)
        d = jnp.tile(jnp.array([-1.0, 0.0, 0.0]), (n, 1))
        hit = trace.trace_rays(o, d, scene)
        res = np.array(hit.result)
        cap = res == RayResult.HORIZON
        assert not cap[0] and cap[1], res  # |b|=4.5: prograde escapes
        assert not cap[2] and not cap[3], res  # |b|=8: both escape
        assert cap[4] and cap[5], res  # |b|=2: both captured


class TestConservation:
    @pytest.mark.parametrize("spin", [0.0, 0.9])
    def test_hamiltonian_and_carter_drift(self, spin):
        """H stays ~0 and Q is conserved along the trace (the invariant
        the reference GPU shader monitors, ray_tracer.comp:522-528)."""
        scene = make_scene(spin=spin)
        o, d = parallel_rays([5.5, 7.0, 10.0])
        step_fn, adaptive = trace.make_step_fn(scene)
        carry = trace.init_carry(o, d, scene)
        Q0 = geodesic.carter_constant(carry.y, 1.0, carry.L, scene.blackhole.a)
        for _ in range(400):
            carry = trace.trace_step(carry, scene, step_fn, adaptive)
        active_or_escaped = np.array(carry.result) != RayResult.HORIZON
        H = geodesic.hamiltonian(
            carry.y[..., 0], carry.y[..., 1], carry.y[..., 3],
            carry.y[..., 4], 1.0, carry.L, scene.blackhole.mass,
            scene.blackhole.a,
        )
        Q1 = geodesic.carter_constant(carry.y, 1.0, carry.L, scene.blackhole.a)
        np.testing.assert_allclose(
            np.array(H)[active_or_escaped], 0.0, atol=1e-6
        )
        np.testing.assert_allclose(
            np.array(Q1)[active_or_escaped],
            np.array(Q0)[active_or_escaped],
            rtol=1e-5, atol=1e-7,
        )


class TestDisk:
    def test_equatorial_crossing_hits_disk(self):
        """A ray aimed to cross z=0 inside [6, 20] M hits the disk.

        compat kinematics: the no-Doppler-when-perpendicular assertion
        below is the reference's flat-space convention; the default
        "auto" mode's exact g-factor includes transverse Doppler +
        emitter time dilation, so doppler != 1 there (and rightly so —
        see test_kerr_shading)."""
        scene = make_scene(disk=True, disk_kinematics="compat")
        o = jnp.array([[12.0, 0.0, 10.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        hit = trace.trace_rays(o, d, scene)
        assert int(hit.result[0]) == RayResult.DISK
        pos = np.array(hit.position[0])
        r_hit = np.hypot(pos[0], pos[1])
        assert 6.0 <= r_hit <= 20.0
        assert abs(pos[2]) < 0.2  # on the disk plane
        assert float(hit.temperature[0]) > 2000.0
        # Photon arrives perpendicular to the Keplerian flow: no Doppler.
        np.testing.assert_allclose(float(hit.doppler[0]), 1.0, atol=1e-3)

    def test_crossing_outside_annulus_passes_through(self):
        """Crossing the plane at r=25 (outside r_out=20): no disk hit."""
        scene = make_scene(disk=True)
        o = jnp.array([[25.0, 0.0, 10.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        hit = trace.trace_rays(o, d, scene)
        assert int(hit.result[0]) != RayResult.DISK

    def test_no_disk_when_disabled(self):
        scene = make_scene(disk=False)
        o = jnp.array([[12.0, 0.0, 10.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        hit = trace.trace_rays(o, d, scene)
        assert int(hit.result[0]) != RayResult.DISK

    def test_inclined_disk(self):
        """With 90-degree inclination the disk lies in the x-z plane: a
        ray crossing y=0 at r in-range must hit."""
        scene = make_scene(disk=True)
        scene = scene.replace(
            disk=scene.disk.replace(inclination=jnp.float64(np.pi / 2))
        )
        o = jnp.array([[12.0, 10.0, 0.0]])
        d = jnp.array([[0.0, -1.0, 0.0]])
        hit = trace.trace_rays(o, d, scene)
        assert int(hit.result[0]) == RayResult.DISK

    def test_doppler_blueshift_on_approaching_side(self):
        """Keplerian flow rotates +phi; on the side where gas approaches
        the camera the received light is blueshifted (delta < 1 in the
        sqrt convention means approaching emitter)."""
        scene = make_scene(disk=True)
        # Oblique camera at (0, 30, 25) aiming at disk points (+-12, 0, 0):
        # the Keplerian flow (+phi) has opposite line-of-sight components
        # on the two sides.
        o = jnp.array([[0.0, 30.0, 25.0], [0.0, 30.0, 25.0]])
        d = jnp.array([[12.0, -30.0, -25.0], [-12.0, -30.0, -25.0]])
        hit = trace.trace_rays(o, d, scene)
        assert (np.array(hit.result) == RayResult.DISK).all()
        # The two sides must have opposite Doppler asymmetry.
        d0, d1 = float(hit.doppler[0]), float(hit.doppler[1])
        assert (d0 - 1.0) * (d1 - 1.0) < 0


class TestIntegrators:
    @pytest.mark.parametrize(
        "method",
        [Integrator.RK4, Integrator.RKF45, Integrator.LEAPFROG,
         Integrator.YOSHIDA],
    )
    def test_all_integrators_agree_on_capture(self, method):
        scene = make_scene(integrator=method)
        o, d = parallel_rays([3.0, 9.0])
        hit = trace.trace_rays(o, d, scene)
        res = np.array(hit.result)
        assert res[0] == RayResult.HORIZON, (method, res)
        assert res[1] != RayResult.HORIZON, (method, res)

    def test_rkf45_disk_clamp_image_quality(self):
        """The disk-aware adaptive step clamp: without it, RKF45 steps
        (up to 50x the base step) can enter AND exit the disk plane
        between two samples, so crossings are silently skipped and the
        image error saturates near 4e-4 regardless of tolerance
        (CONVERGENCE.md, pre-clamp).  With the clamp the adaptive engine
        must track a fine-step RK4 reference to < 1.5e-4 mean pixel
        error — a level the unclamped integrator cannot reach."""
        from blackhole_tpu.render import camera as cam_mod

        size = 48  # 32^2 misses the double-crossing rays; 48^2 shows
        # 3.8e-4 (unclamped) vs 5.0e-5 (clamped) under these settings.
        scene_ref = make_scene(
            spin=0.9, disk=True, time_step=0.05,
            max_ray_distance=120.0, max_steps=2400,
        )
        scene_ad = make_scene(
            spin=0.9, disk=True, time_step=0.1,
            max_ray_distance=120.0, max_steps=3000,
            integrator=Integrator.RKF45, tolerance=1e-8,
        )
        camera = Camera.create(
            position=(0.0, -35.0, 12.0),
            direction=(0.0, 35.0, -12.0),
            up=(0.0, 0.0, 1.0),
            fov_deg=22.0,
            dtype=jnp.float64,
        )
        o, d = cam_mod.generate_rays(camera, size, size)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        ref = trace.trace_rays(o, d, scene_ref)
        ad = trace.trace_rays(o, d, scene_ad)
        err = float(jnp.mean(jnp.abs(ad.color - ref.color)))
        assert err < 1.5e-4, f"adaptive image error {err:.2e}"
        # The step-count advantage must survive the clamp.
        assert float(jnp.mean(ad.steps)) < 0.25 * float(
            jnp.mean(ref.steps)
        )

    def test_rkf45_uses_fewer_steps_far_field(self):
        """Adaptive stepping must beat the fixed schedule on an easy
        escaping ray."""
        o, d = parallel_rays([15.0])
        hit4 = trace.trace_rays(o, d, make_scene(integrator=Integrator.RK4))
        hit45 = trace.trace_rays(
            o, d, make_scene(integrator=Integrator.RKF45, tolerance=1e-8)
        )
        assert int(hit45.steps[0]) < int(hit4.steps[0])


class TestImage:
    def test_shadow_in_rendered_image(self):
        """64x64 render: black shadow disk of the right angular size at
        the center (BASELINE config 1)."""
        scene = make_scene(disk=False, max_steps=2000)
        camera = Camera.create(
            position=(0.0, 0.0, 30.0),
            direction=(0.0, 0.0, -1.0),
            up=(0.0, 1.0, 0.0),
            fov_deg=40.0,
            dtype=jnp.float64,
        )
        hits = image.render_hits(scene, camera, 64, 64)
        res = np.array(hits.result)
        center = res[28:36, 28:36]
        assert (center == RayResult.HORIZON).all()
        # Corners see the sky.
        assert res[0, 0] != RayResult.HORIZON
        # Shadow angular radius seen by a static observer at r0:
        # sin(psi) = b_crit sqrt(1 - rs/r0) / r0 (Synge 1966).  The
        # camera maps tan(angle) linearly with half-height
        # 2 tan(fov/2) (reference convention, raytracer.c:1027-1032).
        row = res[32]
        frac = (row == RayResult.HORIZON).sum() / 64.0
        r0 = 30.0
        sin_psi = np.sqrt(27.0) * np.sqrt(1.0 - 2.0 / r0) / r0
        tan_psi = sin_psi / np.sqrt(1.0 - sin_psi**2)
        expected = tan_psi / (2.0 * np.tan(np.radians(20.0)))
        np.testing.assert_allclose(frac, expected, rtol=0.12)

    def test_render_image_shapes_and_range(self):
        scene = make_scene(disk=True, max_steps=500)
        camera = Camera.create(position=(0.0, 3.0, 28.0), dtype=jnp.float64)
        img = image.render_image(scene, camera, width=32, height=16, spp=2)
        assert img.shape == (16, 32, 3)
        assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0

    def test_optical_depth_on_disk_hits(self):
        """tau is computed only at disk crossings (the reference
        declares the field, never fills it — raytracer.h:91): positive
        there, zero elsewhere, and larger for grazing incidence."""
        scene = make_scene(disk=True, max_steps=800)
        # Steep crossing: straight down onto the disk at r ~ 10.
        o = jnp.array([[10.0, 0.0, 15.0], [0.0, 0.0, 30.0]])
        d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
        hit = trace.trace_rays(o, d, scene)
        res = np.asarray(hit.result)
        tau = np.asarray(hit.optical_depth)
        assert res[0] == RayResult.DISK and tau[0] > 0.0
        assert res[1] == RayResult.HORIZON and tau[1] == 0.0
        # Grazing crossing (same radius, shallow angle) -> larger tau.
        o2 = jnp.array([[16.0, 0.0, 1.2]])
        d2 = jnp.array([[-1.0, 0.0, -0.2]])
        hit2 = trace.trace_rays(o2, d2 / jnp.linalg.norm(d2), scene)
        if int(hit2.result[0]) == RayResult.DISK:
            assert float(hit2.optical_depth[0]) > tau[0]

    def test_temporal_accumulation_converges(self):
        h = jnp.zeros((4, 4, 3))
        frame = jnp.ones((4, 4, 3))
        idx = jnp.int32(0)
        for _ in range(20):
            h, idx = image.temporal_accumulate(h, frame, idx)
        assert float(h.min()) > 0.9
