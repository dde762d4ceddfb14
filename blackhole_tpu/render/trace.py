"""Batched geodesic ray tracing with masked lockstep termination.

TPU-native replacement for /root/reference/src/raytracer.c:338-807
(`integrate_photon_path`, `trace_ray`, `trace_rays_batch`).  Key design
differences from the C engine, driven by the TPU execution model:

* All rays advance together inside one `lax.while_loop`; per-ray
  divergence (capture / escape / disk hit at different steps) is handled
  with masks, not control flow.  The loop exits when every lane is done.
* Disk intersections are detected *inline* per step via a sign change of
  the (possibly inclined) disk-plane coordinate — no path buffer and
  re-scan like raytracer.c:698-759 (which also passed the previous path
  point as the plane normal, a reference bug this design is immune to).
* Step size is a smooth per-ray function of radius — geometric growth in
  the far field and geometric decay toward the horizon — replacing the
  reference's hard tier table (raytracer.c:555-571).
* RKF45 keeps per-ray step size + accept/reject state in the carry
  (math_util.c:212-457 semantics), with rejected trials burning a loop
  iteration exactly like the reference's retry counting.

Hot-loop arithmetic (r4): the integration state is the trig-AUGMENTED
form (geodesic.rhs_aug) — sin/cos of theta and phi ride as slaved ODE
components with exact dynamics, renormalized to the unit circle once
per accepted step — so a step evaluates ZERO transcendentals: the RHS
is purely rational in the carried values and the per-step cartesian
conversion (disk test, chords) is multiplies only.  The direct form
cost 8-12 sin/cos per RK4 step.  Unlike a u = cos(theta) chart change,
this keeps theta's analytic continuation through the poles, so
polar-plane rays (L ~ 0) stay regular.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from blackhole_tpu.constants import EPSILON, HORIZON_CAPTURE_FACTOR
from blackhole_tpu.geom import coords
from blackhole_tpu.geom.types import Hit, Integrator, RayResult, Scene
from blackhole_tpu.integrate import sensitivity, steppers
from blackhole_tpu.metrics import derived
from blackhole_tpu.render import geodesic, shading

ACTIVE = -1  # sentinel result code while a ray is still integrating

# RKF45 error criterion spans the 6 physical components only (r, theta,
# phi, p_r, p_theta, t) — identical to the pre-augmentation semantics
# and the reference's per-component relative error (math_util.c:376-391).
N_ERR_COMPONENTS = 6


class TraceCarry(NamedTuple):
    y: jnp.ndarray  # (N, 10) trig-augmented geodesic state
    h: jnp.ndarray  # (N,) current step size (used by adaptive mode)
    L: jnp.ndarray  # (N,) conserved angular momentum (E normalized to 1)
    dist: jnp.ndarray  # (N,) accumulated cartesian path length
    steps: jnp.ndarray  # (N,) int32 steps taken
    result: jnp.ndarray  # (N,) int32; ACTIVE while integrating
    hit_pos: jnp.ndarray  # (N, 3) recorded hit position (cartesian)
    last_dir: jnp.ndarray  # (N, 3) unit direction of last step chord
    min_r: jnp.ndarray  # (N,) closest BL radial approach so far
    iter: jnp.ndarray  # () int32 global iteration counter
    # Crossing-opacity tracking (None unless SimConfig.shadow_softness
    # > 0 with the disk on): closest sampled approach to the disk plane
    # while radially inside the annulus, and the position/direction
    # there.  finalize composites disk emission over non-disk rays by a
    # smooth function of min_az, so a ray FLIPPING between crossing and
    # not crossing the plane (a tangential graze) changes color
    # continuously and the flip carries pathwise gradient — the
    # plane-crossing analog of the min_r soft shadow boundary.
    min_az: jnp.ndarray | None = None  # (N,) min |z'| sampled in-band
    gpos: jnp.ndarray | None = None  # (N, 3) cartesian position at min
    gdir: jnp.ndarray | None = None  # (N, 3) unit chord direction at min


def track_crossing(scene: Scene) -> bool:
    """Static predicate: carry the crossing-opacity planes?  True only
    for soft-boundary differentiable rendering with the disk enabled —
    the hard-edge default pays zero extra carry cost."""
    return bool(
        scene.disk_enabled
        and scene.config.show_disk
        and float(scene.config.shadow_softness) > 0.0
    )


def _disk_plane_z(cart, incl):
    """Signed distance-like coordinate of the (inclined) disk plane.

    The disk lies in z'=0 of the frame rotated by `incl` about x
    (ray_tracer.comp:240-254).  z' = -sin(incl) y + cos(incl) z.
    """
    return -jnp.sin(incl) * cart[..., 1] + jnp.cos(incl) * cart[..., 2]


def _disk_plane_radius(cart, incl):
    """In-plane radius of a point in the rotated disk frame."""
    x = cart[..., 0]
    yp = jnp.cos(incl) * cart[..., 1] + jnp.sin(incl) * cart[..., 2]
    return jnp.sqrt(x * x + yp * yp)


def aug_to_cartesian(y, a):
    """Quasi-cartesian position from the trig-augmented state —
    multiplies only (the carried sin/cos replace per-step trig):
    x = sqrt(r^2+a^2) sin th cos ph, y = ... sin ph, z = r cos th."""
    r = y[..., geodesic.IR]
    st, ct = y[..., geodesic.IST], y[..., geodesic.ICT]
    sp, cp = y[..., geodesic.ISP], y[..., geodesic.ICP]
    w = jnp.sqrt(r * r + a * a)
    rho = w * st
    return jnp.stack([rho * cp, rho * sp, r * ct], axis=-1)


def renormalize_trig(y):
    """Project the slaved (sin, cos) pairs back to the unit circle.

    The augmented flow preserves s^2 + c^2 = 1 exactly in continuum;
    the integrator drifts it by O(local truncation error) per step, and
    this projection (applied once per step) keeps the drift from
    compounding.  Phase error is NOT corrected — it is the same order
    as the trajectory's own truncation error, i.e. already paid.
    Grad-safe: the radicand is bounded away from 0 near the unit
    circle."""
    st, ct = y[..., geodesic.IST], y[..., geodesic.ICT]
    sp, cp = y[..., geodesic.ISP], y[..., geodesic.ICP]
    n_th = jax.lax.rsqrt(jnp.maximum(st * st + ct * ct, 0.25))
    n_ph = jax.lax.rsqrt(jnp.maximum(sp * sp + cp * cp, 0.25))
    return y.at[..., geodesic.IST].set(st * n_th) \
            .at[..., geodesic.ICT].set(ct * n_th) \
            .at[..., geodesic.ISP].set(sp * n_ph) \
            .at[..., geodesic.ICP].set(cp * n_ph)


@jax.custom_jvp
def slave_trig_tangent(y):
    """Identity on the primal; under jax.jvp, OVERWRITES the four trig
    tangent components with their constraint-consistent values
    d(sin x) = cos x dx, d(cos x) = -sin x dx.

    The augmented state's tangent space is 6-dimensional (the trig
    components are functions of theta/phi); integrating their tangents
    as free variables both drifts them off the constraint AND pays
    stage arithmetic for values this rule reproduces from d(theta),
    d(phi) in four multiplies — applied once per step, the integrated
    trig-tangent stage arithmetic (and the renormalization's tangent)
    becomes dead code the compiler eliminates.  Reverse-mode scan
    drivers differentiate through this wrapper too: they TRANSPOSE the
    slaved (linear) JVP, which routes the trig cotangents into the
    theta/phi slots — gradients stay correct, just via the constraint
    instead of the integrated recurrence."""
    return y


@slave_trig_tangent.defjvp
def _slave_trig_tangent_jvp(primals, tangents):
    (y,), (dy,) = primals, tangents
    st, ct = y[..., geodesic.IST], y[..., geodesic.ICT]
    sp, cp = y[..., geodesic.ISP], y[..., geodesic.ICP]
    dth, dph = dy[..., geodesic.ITH], dy[..., geodesic.IPH]
    dy = dy.at[..., geodesic.IST].set(ct * dth) \
           .at[..., geodesic.ICT].set(-st * dth) \
           .at[..., geodesic.ISP].set(cp * dph) \
           .at[..., geodesic.ICP].set(-sp * dph)
    return y, dy


def step_size_schedule(r, time_step, M, r_capture):
    """Smooth per-ray step size.

    h grows ~ r in the far field (logarithmic escape cost), shrinks
    geometrically approaching the capture radius, and is clamped to
    [0.05, 20] x time_step.  Replaces the tier table at
    raytracer.c:555-571 with a branch-free schedule.
    """
    rs = 2.0 * M
    h = time_step * jnp.clip(r / (7.5 * rs), 0.05, 20.0)
    h = jnp.minimum(h, 0.5 * (r - r_capture) + 1e-3 * time_step)
    return jnp.maximum(h, 1e-4 * time_step)


def make_step_fn(scene: Scene):
    """Returns (rhs_step, adaptive) for the configured integrator.

    All integrators advance the trig-augmented 10-state via
    geodesic.rhs_aug."""
    M = scene.blackhole.mass
    a = scene.blackhole.a
    Qc = scene.blackhole.charge

    def f(t, y, L):
        return geodesic.rhs_aug(y, 1.0, L, M, a, Qc)

    integ = scene.config.integrator
    if integ == Integrator.RK4:
        def step(y, h, L):
            y_new = steppers.rk4_step(f, 0.0, y, h[..., None], L)
            err = jnp.zeros(y.shape[:-1], y.dtype)
            return y_new, err
        return step, False
    if integ == Integrator.RKF45:
        def step(y, h, L):
            return steppers.rkf45_step(
                f, 0.0, y, h[..., None], L, n_err=N_ERR_COMPONENTS
            )
        return step, True
    if integ in (Integrator.LEAPFROG, Integrator.YOSHIDA):
        # Split state: x = (r, theta, phi, t, sin/cos planes) advances
        # with dx/dl = dH/dp evaluated at current p; p = (p_r, p_theta)
        # with dp/dl = -dH/dx.  The Hamiltonian is not separable, so
        # this is a semi-explicit (symplectic-Euler-flavored)
        # composition — implements the capability the reference stubs
        # out (raytracer.c:616-624).
        POS = (geodesic.IR, geodesic.ITH, geodesic.IPH, geodesic.IT,
               geodesic.IST, geodesic.ICT, geodesic.ISP, geodesic.ICP)
        MOM = (geodesic.IPR, geodesic.IPT)

        def assemble(x, v):
            comps = [None] * geodesic.NAUG
            for i, idx in enumerate(POS):
                comps[idx] = x[..., i]
            for i, idx in enumerate(MOM):
                comps[idx] = v[..., i]
            return jnp.stack(comps, axis=-1)

        def accel(t, x, v, L):
            d = geodesic.rhs_aug(assemble(x, v), 1.0, L, M, a, Qc)
            return jnp.stack([d[..., i] for i in MOM], axis=-1)

        def drift(x, v, h, L):
            d = geodesic.rhs_aug(assemble(x, v), 1.0, L, M, a, Qc)
            dx = jnp.stack([d[..., i] for i in POS], axis=-1)
            return x + h * dx

        def split(y):
            x = jnp.stack([y[..., i] for i in POS], axis=-1)
            v = jnp.stack([y[..., i] for i in MOM], axis=-1)
            return x, v

        if integ == Integrator.LEAPFROG:
            def step(y, h, L):
                hh = h[..., None]
                x, v = split(y)
                v = v + 0.5 * hh * accel(0.0, x, v, L)
                x = drift(x, v, hh, L)
                v = v + 0.5 * hh * accel(0.0, x, v, L)
                return assemble(x, v), jnp.zeros(y.shape[:-1], y.dtype)
        else:  # YOSHIDA
            def step(y, h, L):
                hh = h[..., None]
                x, v = split(y)
                for i in range(3):
                    x = drift(x, v, steppers._YOSHIDA_C[i] * hh, L)
                    v = v + steppers._YOSHIDA_D[i] * hh * accel(0.0, x, v, L)
                x = drift(x, v, steppers._YOSHIDA_C[3] * hh, L)
                return assemble(x, v), jnp.zeros(y.shape[:-1], y.dtype)
        return step, False
    raise ValueError(f"unknown integrator {integ!r}")


def trace_step(carry: TraceCarry, scene: Scene, step_fn, adaptive: bool
               ) -> TraceCarry:
    """One masked integration step for all rays (the loop body).

    Pure function — shared by the forward `lax.while_loop` driver here
    and the differentiable `lax.scan` driver in blackhole_tpu.grad.
    """
    bh = scene.blackhole
    disk = scene.disk
    cfg = scene.config
    M, a = bh.mass, bh.a
    r_capture = HORIZON_CAPTURE_FACTOR * bh.r_plus
    active = carry.result == ACTIVE

    r = carry.y[..., geodesic.IR]
    if adaptive:
        h = carry.h
    else:
        h = step_size_schedule(r, cfg.time_step, M, r_capture)

    y_trial, err = step_fn(carry.y, h, carry.L)

    if adaptive:
        tol = jnp.maximum(cfg.tolerance, 1e-12)
        accepted = err <= tol
        h_next = steppers.rkf45_next_h(h, err / tol, accepted)
        h_next = jnp.clip(h_next, 1e-4 * cfg.time_step, 50.0 * cfg.time_step)
        # Keep the horizon-approach clamp so adaptive lanes cannot
        # overshoot through the horizon.
        h_next = jnp.minimum(
            h_next, 0.5 * (r - r_capture) + 1e-3 * cfg.time_step
        )
        h_next = jnp.maximum(h_next, 1e-5 * cfg.time_step)
    else:
        accepted = jnp.ones_like(active)
        h_next = h

    # Non-finite trial states must never enter the carry: freeze the lane
    # this step (the capture/error classification below will retire it).
    # Plays the role of the reference's NaN scrubbing (raytracer.c:140-153)
    # without rewriting state.
    finite = jnp.all(jnp.isfinite(y_trial), axis=-1)
    advance = active & accepted & finite
    # Slaving the trig tangents (slave_trig_tangent) BEFORE the
    # cartesian conversion lets the compiler drop the integrated
    # trig-tangent stage arithmetic under jax.jvp; identity otherwise.
    y_new = slave_trig_tangent(renormalize_trig(
        jnp.where(advance[..., None], y_trial, carry.y)
    ))
    h_new = jnp.where(active, h_next, carry.h)

    cart_prev = aug_to_cartesian(carry.y, a)
    cart_new = aug_to_cartesian(y_new, a)
    chord = cart_new - cart_prev
    # Grad-safe norm: frozen lanes have chord ~ 0 (renormalize_trig
    # still nudges their trig components at ulp level, so not exactly 0)
    # and the VJP of an unguarded norm near 0 explodes; the 1e-24 floor
    # plus the advance-masking of every consumer keeps reverse mode
    # finite.
    step_len = jnp.sqrt(jnp.sum(chord * chord, axis=-1) + 1e-24)
    unit_dir = chord / jnp.maximum(step_len, EPSILON)[..., None]
    dist_new = carry.dist + jnp.where(advance, step_len, 0.0)
    last_dir = jnp.where(advance[..., None], unit_dir, carry.last_dir)

    result = carry.result
    hit_pos = carry.hit_pos
    min_az, gpos, gdir = carry.min_az, carry.gpos, carry.gdir

    # --- disk crossing (inline sign-change detection) ---
    if scene.disk_enabled and cfg.show_disk:
        incl = disk.inclination
        z_prev = _disk_plane_z(cart_prev, incl)
        z_new = _disk_plane_z(cart_new, incl)
        crossed = (z_prev * z_new < 0.0) & advance
        frac = z_prev / jnp.where(
            jnp.abs(z_prev - z_new) < EPSILON, EPSILON, z_prev - z_new
        )
        cross_pt = cart_prev + frac[..., None] * chord
        r_plane = _disk_plane_radius(cross_pt, incl)
        in_annulus = (r_plane >= disk.inner_radius) & (
            r_plane <= disk.outer_radius
        )
        disk_hit = crossed & in_annulus
        result = jnp.where(disk_hit, RayResult.DISK, result)
        hit_pos = jnp.where(disk_hit[..., None], cross_pt, hit_pos)
        # Refine traveled distance to the crossing point.
        dist_new = jnp.where(
            disk_hit, carry.dist + frac * step_len, dist_new
        )
        if track_crossing(scene):
            # Closest sampled approach to the disk plane while radially
            # inside the annulus.  Near a tangential graze dz'/dlambda
            # ~ 0, so the samples resolve the trajectory minimum well —
            # exactly the regime where the crossing/not-crossing flip
            # lives.  (Transversal near-crossings outside the annulus
            # keep min_az large: they are not disk-visibility events.)
            z_abs = jnp.abs(z_new)
            r_plane_new = _disk_plane_radius(cart_new, incl)
            in_band = (r_plane_new >= disk.inner_radius) & (
                r_plane_new <= disk.outer_radius
            )
            cand = advance & in_band & (z_abs < min_az)
            min_az = jnp.where(cand, z_abs, min_az)
            gpos = jnp.where(cand[..., None], cart_new, gpos)
            gdir = jnp.where(cand[..., None], unit_dir, gdir)
        if adaptive:
            # Disk-aware step clamp: an adaptive step many times the
            # plane-crossing time can ENTER and EXIT the disk plane
            # between two samples, leaving the endpoint signs equal —
            # a sampling error the local truncation-error controller
            # cannot see (it saturated the RKF45 image error at ~4e-4,
            # CONVERGENCE.md).  When a ray inside the disk's radial
            # band is approaching the plane, cap the next step at
            # ~1.25x the estimated crossing time so each step crosses
            # at most once.  dz/h from the step just taken estimates
            # the approach rate; receding rays are never clamped.
            dz = z_new - z_prev
            approaching = z_new * dz < 0.0
            lam_cross = h * jnp.abs(z_new) / jnp.maximum(
                jnp.abs(dz), EPSILON
            )
            near = y_new[..., geodesic.IR] < 1.5 * disk.outer_radius
            h_cap = jnp.maximum(1.25 * lam_cross, 0.05 * cfg.time_step)
            h_new = jnp.where(
                active & approaching & near,
                jnp.minimum(h_new, h_cap),
                h_new,
            )

    still = result == ACTIVE

    # --- horizon capture (raytracer.c:650-656) ---
    # Besides the radius test, capture on diverging ingoing radial
    # momentum: in Boyer-Lindquist coordinates p_r ~ 1/Delta blows up at
    # the horizon, so |p_r| beyond any physical exterior value means the
    # ray is asymptotically pinned at the capture radius (the step clamp
    # above makes r approach but never cross it).  Without this, p_r
    # overflows float32 after a few hundred stalled steps -> NaN.
    r_new = y_new[..., geodesic.IR]
    p_r_new = y_new[..., geodesic.IPR]
    pinned = (p_r_new < -1e6) | (jnp.abs(p_r_new) > 1e7)
    # Early shell capture: an INGOING photon below the (prograde)
    # photon-shell radius can never turn around — escaping periapses
    # bottom out at r_ph_pro (turning points are roots of the radial
    # potential; the infimum over escaping rays is the prograde
    # spherical-orbit radius).  Retiring such lanes here (a) is exact
    # physics, (b) saves the ~r_ph -> 1.01 r_+ creep the step clamp
    # otherwise pays, and (c) retires lanes BEFORE the near-horizon
    # zone where dH/dtheta * p_r^2 stiffness can catapult a
    # fixed-step trial back out with garbage state (observed at
    # 1.01 r_+: r 1.459 -> 6.65 -> -1.6e4 in two accepted steps,
    # misclassified as escape).  0.999: near-critical escapers touch
    # r_ph_pro only in the exact-criticality limit.
    r_shell_min = derived.kerr_photon_orbit_radius(
        M, jnp.abs(bh.spin), 1.0
    )
    shell_capture = (p_r_new < 0.0) & (r_new < 0.999 * r_shell_min)
    captured = still & active & (
        (r_new <= r_capture) | shell_capture | pinned | ~finite
    )
    result = jnp.where(captured, RayResult.HORIZON, result)
    hit_pos = jnp.where(captured[..., None], cart_new, hit_pos)
    still = result == ACTIVE

    # --- path-length budget (raytracer.c:658-662) ---
    budget = still & advance & (dist_new >= cfg.max_ray_distance)
    result = jnp.where(budget, RayResult.MAX_DISTANCE, result)
    hit_pos = jnp.where(budget[..., None], cart_new, hit_pos)
    still = result == ACTIVE

    # --- radial escape: far away and outgoing -> background ---
    escaped = (
        still
        & advance
        & (r_new >= cfg.max_ray_distance)
        & (y_new[..., geodesic.IPR] > 0.0)
    )
    result = jnp.where(escaped, RayResult.BACKGROUND, result)
    hit_pos = jnp.where(escaped[..., None], cart_new, hit_pos)

    return TraceCarry(
        y=y_new,
        h=h_new,
        L=carry.L,
        dist=dist_new,
        steps=carry.steps + active.astype(jnp.int32),
        result=result,
        hit_pos=hit_pos,
        last_dir=last_dir,
        min_r=jnp.where(
            advance, jnp.minimum(carry.min_r, r_new), carry.min_r
        ),
        iter=carry.iter + 1,
        min_az=min_az,
        gpos=gpos,
        gdir=gdir,
    )


def init_carry(origins, directions, scene: Scene) -> TraceCarry:
    """Build the initial trace carry from cartesian rays (flattened)."""
    bh = scene.blackhole
    y, _, L, _ = geodesic.init_null_rays_aug(
        origins, coords.normalize(directions), bh.mass, bh.a, bh.charge
    )
    dtype = y.dtype
    track = track_crossing(scene)
    # Every per-ray plane is DERIVED from per-ray state (y) rather than
    # splatted with jnp.full/zeros: under shard_map with varying-manual-
    # axes checking, a splat is unvarying while the loop body's updates
    # are varying, and the while_loop carry would need a vma cast at the
    # backedge.  Deriving keeps the carry uniformly varying, so the
    # sharded drivers (parallel.mesh) run with check_vma on.
    zeros = y[..., geodesic.IR] * 0
    izeros = zeros.astype(jnp.int32)
    return TraceCarry(
        y=y,
        h=zeros + scene.config.time_step,
        L=L,
        dist=zeros,
        steps=izeros,
        result=izeros + ACTIVE,
        hit_pos=jnp.asarray(origins, dtype),
        last_dir=coords.normalize(jnp.asarray(directions, dtype)),
        min_r=y[..., geodesic.IR],
        iter=jnp.zeros((), jnp.int32),
        min_az=zeros + 1e9 if track else None,
        gpos=jnp.asarray(origins, dtype) if track else None,
        gdir=(coords.normalize(jnp.asarray(directions, dtype))
              if track else None),
    )


def compute_capture_margin(origins, directions, scene: Scene):
    """(margin, valid) for the analytic soft shadow boundary.

    margin: signed capture-margin LENGTH per ray
    (metrics.derived.capture_margin_length) from the conserved (L, Qc)
    — positive = captured, negative = escapes, |margin| ~ periapsis
    distance above the photon shell.  Computed once at init, OUTSIDE
    the integration loop: unlike the r3/r4 min_r measure it cannot be
    truncated by the step budget (budget-truncated min_r was measured
    to be the dominant source of spurious visibility flips at
    256^2/800).  valid: the criterion applies — ray initially ingoing
    with a positive potential-normalization C; finalize falls back to
    the min_r measure elsewhere (such rays never sit on the capture
    boundary, so the switch carries no gradient).

    Differentiable in everything (camera, M, a, charge).
    """
    bh = scene.blackhole
    y0, _, L, Qc = geodesic.init_null_rays_aug(
        origins, coords.normalize(directions), bh.mass, bh.a, bh.charge
    )
    margin = derived.capture_margin_length(
        L, Qc, bh.mass, bh.a, bh.charge
    )
    C = Qc + (L - bh.a) * (L - bh.a)
    valid = (y0[..., geodesic.IPR] < 0.0) & (C > EPSILON)
    return margin, valid


def finalize(carry: TraceCarry, scene: Scene, margin=None) -> Hit:
    """Convert the final carry into a shaded Hit record.

    margin: optional (margin, valid) pair from compute_capture_margin —
    the analytic capture boundary used for the soft shadow survival
    factor (and the smooth budget-ray classification) when
    shadow_softness > 0; None falls back to the min_r measure."""
    bh = scene.blackhole
    cfg = scene.config
    result = jnp.where(
        carry.result == ACTIVE, RayResult.MAX_STEPS, carry.result
    )
    final_cart = aug_to_cartesian(carry.y, bh.a)
    pos = jnp.where(
        (result == RayResult.DISK)[..., None], carry.hit_pos, final_cart
    )
    r_term = jnp.linalg.norm(pos, axis=-1)
    tdil = derived.time_dilation(r_term, bh.mass)

    is_disk = result == RayResult.DISK
    is_horizon = result == RayResult.HORIZON

    disk_rgb, temp, doppler, grav = shading.shade_disk_hit(
        carry.hit_pos, carry.last_dir, bh, scene.disk, cfg, L=carry.L
    )
    if scene.env_map is not None:
        sky_rgb = shading.sample_environment(carry.last_dir, scene.env_map)
    else:
        sky_rgb = shading.sky_color(carry.last_dir)
    black = jnp.zeros_like(sky_rgb)
    # Budget-exhausted rays that ended deep in the potential (inside
    # ~4M: between the photon sphere 3M and the ISCO) are trapped —
    # paint them black like captures instead of sky.  The reference
    # colors every non-horizon ray as sky (raytracer.c:1146-1160),
    # which erases the shadow whenever the step budget runs out first
    # (its engine *always* exhausts the budget — tools/ref_parity.py).
    # With the analytic capture margin available (soft mode), this
    # HARD r_term threshold is replaced by the smooth survival factor
    # below: a budget ray on a captured trajectory has margin > 0 and
    # fades to black through the same sigmoid as resolved captures —
    # one less unsoftened visibility boundary (measured: budget-ray
    # flips carried ~25% of d(MSE)/d(mass) FD mass at 256^2/800 that
    # pathwise AD could not see).
    is_trapped = (result == RayResult.MAX_STEPS) & (
        r_term < 4.0 * bh.mass
    )
    if margin is not None:
        is_trapped = is_trapped & jnp.zeros_like(is_trapped)
    dark = (is_horizon | is_trapped)[..., None]
    if float(cfg.shadow_softness) > 0.0:
        # Soft disk edges: composite emission over the (straight-line
        # continuation) sky by the smooth annulus opacity window, so
        # disk/background flips are continuous in the parameters (see
        # shading.disk_edge_window).
        window = shading.disk_edge_window(
            carry.hit_pos, scene.disk, cfg.shadow_softness * bh.mass
        )[..., None]
        disk_rgb = disk_rgb * window + sky_rgb * (1.0 - window)
    color = jnp.where(
        is_disk[..., None], disk_rgb, jnp.where(dark, black, sky_rgb)
    )
    if track_crossing(scene) and carry.min_az is not None:
        # Crossing opacity: composite disk emission (evaluated at the
        # ray's closest in-band approach to the disk plane) over every
        # NON-disk ray by alpha(min_az) * annulus_window.  At a
        # tangential graze min_az -> 0 and alpha -> sigmoid(3) ~ 0.95,
        # matching (to the same ~5% convention as the other soft
        # boundaries) the color the ray takes the instant it flips to
        # an actual crossing — so enter/exit-the-disk flips carry
        # pathwise gradient through d(min_az)/d(params) instead of
        # being invisible to AD.  The reference has no analog; this is
        # differentiable-rendering machinery (soft rasterization of
        # the disk's visibility function).
        w = cfg.shadow_softness * bh.mass
        g_rgb, _, _, _ = shading.shade_disk_hit(
            carry.gpos, carry.gdir, bh, scene.disk, cfg, L=carry.L
        )
        window_g = shading.disk_edge_window(carry.gpos, scene.disk, w)
        alpha = jax.nn.sigmoid(3.0 - carry.min_az / w)
        cw = (alpha * window_g)[..., None]
        color = jnp.where(
            is_disk[..., None], color, color * (1.0 - cw) + g_rgb * cw
        )
    if float(cfg.shadow_softness) > 0.0:
        # Differentiable shadow boundary: pathwise AD sees zero
        # gradient from a ray FLIPPING capture<->escape, so shadow-size
        # dependence on (mass, spin) is invisible to hard-edge
        # gradients (measured at 256^2/a=0.9 the hard-edge d/d(mass)
        # of an MSE fit had the WRONG SIGN above the optimum).
        # Multiply by a smooth survival factor of the ray's closest
        # approach relative to the (prograde/retrograde) photon-orbit
        # radius — both differentiable in (M, a) — so the boundary
        # itself carries gradient.  Width ~ softness * M.  The
        # threshold uses the ray's conserved L only through its SIGN
        # (prograde vs retrograde), stop-gradiented.
        sgn = jnp.where(
            jax.lax.stop_gradient(carry.L) * bh.a >= 0.0, 1.0, -1.0
        )
        r_ph = derived.kerr_photon_orbit_radius(bh.mass, bh.spin, sgn)
        # Offset by -3: a ray that flips capture<->escape does so with
        # periapsis at the photon orbit, i.e. min_r -> r_ph from above;
        # centering the sigmoid AT r_ph would leave a half-height
        # discontinuity (survival = 0.5 at the flip).  With the offset,
        # survival ~ sigmoid(-3) = 5% there, so the flip is nearly
        # invisible in color and the boundary's gradient is carried by
        # the smooth factor instead.
        x_minr = (carry.min_r - r_ph) / (cfg.shadow_softness * bh.mass)
        if margin is not None:
            # Analytic boundary (compute_capture_margin): -margin is
            # the same "periapsis height above the shell" length as
            # (min_r - r_ph), but from the conserved quantities —
            # immune to step-budget truncation of min_r.  Disk hits
            # keep the pathwise min_r measure: a sub-critical ray can
            # legitimately hit the disk BEFORE plunging (its margin
            # says "captured" but its emission is real), and min_r is
            # fully resolved for any ray that actually hit.
            m_arr, m_valid = margin
            x_analytic = -m_arr / (cfg.shadow_softness * bh.mass)
            is_disk_s = result == RayResult.DISK
            x = jnp.where(
                m_valid & ~is_disk_s, x_analytic, x_minr
            )
        else:
            x = x_minr
        survival = jax.nn.sigmoid(x - 3.0)
        color = color * survival[..., None]
    one = jnp.ones_like(tdil)

    # Optical depth through the disk at the crossing — implements the
    # RayTraceHit field the reference declares but never computes
    # (raytracer.h:91).  Slant depth of a Shakura-Sunyaev-flavored
    # surface density Sigma(r) = density_scale * (r_in/r)^(3/5) through
    # the (possibly inclined) disk plane: tau = Sigma / |cos(angle
    # between the ray and the disk normal)|.
    disk = scene.disk
    incl = disk.inclination
    normal = jnp.stack(
        [jnp.zeros_like(incl), -jnp.sin(incl), jnp.cos(incl)], axis=-1
    )
    cos_slant = jnp.abs(jnp.sum(carry.last_dir * normal, axis=-1))
    r_plane = _disk_plane_radius(carry.hit_pos, incl)
    sigma = disk.density_scale * (
        disk.inner_radius / jnp.maximum(r_plane, EPSILON)
    ) ** 0.6
    tau = sigma / jnp.maximum(cos_slant, 1e-3)

    return Hit(
        result=result,
        position=pos,
        distance=carry.dist,
        steps=carry.steps,
        time_dilation=tdil,
        sky_direction=carry.last_dir,
        doppler=jnp.where(is_disk, doppler, one),
        temperature=jnp.where(is_disk, temp, jnp.zeros_like(temp)),
        redshift=jnp.where(is_disk, grav, one),
        color=color,
        optical_depth=jnp.where(is_disk, tau, jnp.zeros_like(tau)),
        min_r=carry.min_r,
    )


@partial(jax.jit, static_argnames=("unroll",))
def trace_rays(origins, directions, scene: Scene, unroll: int = 1) -> Hit:
    """Trace a batch of rays to completion.  origins/directions: (..., 3).

    Equivalent of bh_trace_rays_batch (blackhole_api.c:225-250) — but one
    fused XLA computation over the whole batch instead of a host loop.
    """
    batch_shape = origins.shape[:-1]
    o = origins.reshape(-1, 3)
    d = directions.reshape(-1, 3)
    step_fn, adaptive = make_step_fn(scene)
    carry0 = init_carry(o, d, scene)
    max_steps = scene.config.max_steps

    def cond(c):
        return (c.iter < max_steps) & jnp.any(c.result == ACTIVE)

    def body(c):
        # Per-step tangent guard (integrate.sensitivity): identity on
        # the primal; under jax.jvp it rescales each ray's tangent to
        # TANGENT_LIMIT and zeroes non-finite ones — the same guard the
        # tangent-augmented Pallas kernels apply, keeping forward-mode
        # parity between the two engines.  Reverse mode never reaches
        # here (while_loop is not reverse-differentiable; use
        # grad.diff_trace).
        return sensitivity.tangent_guard(
            1, trace_step(c, scene, step_fn, adaptive)
        )

    carry = jax.lax.while_loop(cond, body, carry0)
    margin = (
        compute_capture_margin(o, d, scene)
        if float(scene.config.shadow_softness) > 0.0 else None
    )
    hit = finalize(carry, scene, margin=margin)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(batch_shape + x.shape[1:]), hit
    )
