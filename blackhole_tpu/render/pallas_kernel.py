"""Fused Pallas TPU kernel for the photon geodesic hot loop.

TPU-native analog of the reference's GPU compute shader
(/root/reference/src/visualization/shaders/ray_tracer.comp:323-548 — a
16x16-workgroup GLSL kernel doing the full RK4 integration on-device,
fed by SSBO ray batches).  Here each Pallas grid cell owns a tile of
TILE_ROWS x 128 rays (32x128 = 4096 compiled; see the tile-size note
below) whose entire state lives in VMEM/registers for the whole
integration: HBM traffic is one read of (origin, direction) and one
write of the hit record per ray, instead of the XLA while_loop path's
full carry round-trip per step.  The loop body is identical
arithmetic to blackhole_tpu.render.trace.trace_step (RK4 branch), so the
kernel is validated by bit-level-close comparison against that path.

Per-tile early exit: the while_loop terminates when every ray in the
tile has retired, so tiles inside the shadow or pointing at empty sky
stop hundreds of steps before worst-case tiles (the lockstep analog of
the reference CPU path's per-ray early exit).

Differentiation: forward mode (jax.jvp / jax.jacfwd) flows through the
tangent-augmented kernel (_make_kernel_jvp) — the fast path for
few-parameter gradients (mass, spin, camera pose), see
blackhole_tpu.grad.fast_grad.  Reverse mode is NOT defined on the
kernel; use the checkpointed scan driver in blackhole_tpu.grad.
"""

from __future__ import annotations

import functools
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blackhole_tpu.constants import EPSILON, HORIZON_CAPTURE_FACTOR
from blackhole_tpu.geom import coords
from blackhole_tpu.geom.types import Hit, Integrator, RayResult, Scene
from blackhole_tpu.integrate import sensitivity
from blackhole_tpu.integrate import steppers as sp_mod
from blackhole_tpu.render import geodesic, trace

TILE_LANES = 128
# Compiled tile: 32x128 = 4096 rays resident per grid cell — measured
# fastest of 8/16/32 rows on v5e at 1024^2/1000 steps (2.25 / 3.31 /
# 3.73 M rays/s): longer vectors amortize the while_loop's per-step
# control overhead and the coarser early-exit granularity costs less
# than it saves.  Interpret mode (CPU tests) keeps 8 rows so small
# batches don't pay 4x padded-lane simulation.
TILE_ROWS = int(os.environ.get("BH_PALLAS_TILE_ROWS", "32"))
# The multi-tangent kernel carries (1 + n_tan) * 21 state planes, so its
# VMEM sweet spot is smaller: with the trig-augmented state, 8 rows
# measured 1.88M vs 1.83M rays/s fwd+bwd at 16 rows (1024^2, 2
# tangents, v5e; 8 is also Mosaic's f32 sublane minimum).
TILE_ROWS_MULTI = int(os.environ.get("BH_PALLAS_TILE_ROWS_MULTI", "8"))
TILE_ROWS_INTERPRET = 8
TILE = TILE_ROWS * TILE_LANES




def _out_vma(*xs):
    """Varying-manual-axes set for pallas out_shapes: under shard_map
    (check_vma on) pallas_call requires out_shape.vma; the output varies
    over exactly the axes the ray inputs vary over.  Outside shard_map
    every input's vma is empty and the argument is omitted-equivalent."""
    vma = frozenset()
    for x in xs:
        vma = vma | getattr(jax.typeof(x), "vma", frozenset())
    return vma


def _rows_for(interpret: bool, multi: bool = False) -> int:
    if interpret:
        return TILE_ROWS_INTERPRET
    return TILE_ROWS_MULTI if multi else TILE_ROWS

# Scene parameters are fed as broadcast (8, 128) VMEM planes rather than
# SMEM scalars: Mosaic (jax 0.9 / this libtpu) hits an "Invalid relayout"
# bug when *traced* SMEM scalars mix into vector arithmetic inside the
# while_loop (constant-folded scalars compile fine).  Plane layout:
# [M, a, Q, time_step, max_ray_distance, r_capture,
#  disk_inner, disk_outer, sin_incl, cos_incl, tol, r_shell_min]
# r_shell_min: prograde photon-shell radius for the early ingoing
# capture (trace.trace_step) — computed once in _prepare so the loop
# body stays transcendental-free.
_N_SCAL_PLANES = 12
# Output planes per ray set (primal or one tangent direction):
# result, dist, steps, hit xyz, last-dir xyz, final (r, sin/cos th,
# sin/cos ph), min_r; +7 (min_az, closest-approach pos xyz, dir xyz)
# when the kernel is compiled with crossing-opacity tracking
# (trace.track_crossing — the soft-boundary differentiable-rendering
# mode).  The final cartesian position is reconstructed XLA-side in
# _postprocess from the stored radius/trig planes.
_N_OUT_PLANES = 15
_N_TRACK_PLANES = 7
# Input planes per ray: BL state (r, th, phi, p_r, p_th), conserved L,
# cartesian origin (3), initial direction (3), and the initial trig
# planes (sin/cos theta0, sin/cos phi0) computed differentiably in
# _prepare.
_N_INP_PLANES = 16

# State-tuple slot indices (see _load_init).  The four trig slots carry
# sin/cos of theta and phi as slaved ODE state (geodesic.rhs_aug): the
# loop body is transcendental-free; they are renormalized to the unit
# circle once per step.  The 7 tracking slots ride at the end under
# trace.track_crossing.
(_S_R, _S_TH, _S_PH, _S_PR, _S_PTH, _S_ST, _S_CT, _S_SP, _S_CP,
 _S_DIST, _S_STEPS, _S_RESULT, _S_HX, _S_HY, _S_HZ,
 _S_LX, _S_LY, _S_LZ, _S_T, _S_H, _S_MINR) = range(21)
_N_BASE_STATE = 21
_S_MINAZ = _N_BASE_STATE


def _n_state(track: bool) -> int:
    return _N_BASE_STATE + (7 if track else 0)


def _n_out(track: bool) -> int:
    return _N_OUT_PLANES + (_N_TRACK_PLANES if track else 0)


def _zero_ctrl_tangents(ds, dzero, track: bool):
    """Zero the tangent slots whose primal inits are constants the
    _load_init derivation trick seeded with nonzero values: dist, steps,
    result, and (under track) min_az.  The trig slots' tangents are
    genuine — they load from the differentiable sin/cos input planes
    _prepare produced."""
    ds = list(ds)
    for i in (_S_DIST, _S_STEPS, _S_RESULT):
        ds[i] = dzero
    if track:
        ds[_S_MINAZ] = dzero
    return tuple(ds)


def _rhs(r, pr, pth, st, ct, sp, cp, L, M, a, Q):
    """Geodesic RHS on tiles for the trig-augmented state — same closed
    form as blackhole_tpu.render.geodesic.rhs_core/rhs_aug with E = 1
    (affine normalization).  Purely rational: ZERO transcendentals per
    evaluation (the r4 hot-loop rework; the direct form cost 2 sin/cos
    per evaluation = 8-12 per integrator step).
    Q: Kerr-Newman charge (tm = 2Mr - Q^2 replaces every 2Mr mass term).
    Returns (dr, dth, dph, dpr, dpth, dt, dst, dct, dsp, dcp)."""
    E = 1.0
    st2 = jnp.maximum(st * st, EPSILON)
    a2 = a * a
    sigma = r * r + a2 * ct * ct
    delta = r * r - 2.0 * M * r + a2 + Q * Q
    tm = 2.0 * M * r - Q * Q
    r2a2 = r * r + a2
    A = r2a2 * r2a2 - delta * a2 * st2
    inv_sd = 1.0 / (sigma * delta)
    inv_sigma = 1.0 / sigma

    g_rr_up = delta * inv_sigma
    g_thth_up = inv_sigma
    g_tphi_up = -tm * a * inv_sd
    g_tt_up = -A * inv_sd
    g_phph_up = (delta - a2 * st2) * inv_sd / st2

    dr = g_rr_up * pr
    dth = g_thth_up * pth
    dph = -g_tphi_up * E + g_phph_up * L
    dtt = -g_tt_up * E + g_tphi_up * L

    # dH/dr (matches geodesic.rhs_core)
    dsigma = 2.0 * r
    ddelta = 2.0 * r - 2.0 * M
    dA = 4.0 * r * r2a2 - ddelta * a2 * st2
    dinv_sd = -(dsigma * delta + sigma * ddelta) * inv_sd * inv_sd
    dg_tt = -(dA * inv_sd + A * dinv_sd)
    dg_tphi = -a * (2.0 * M * inv_sd + tm * dinv_sd)
    dg_rr = (ddelta * sigma - delta * dsigma) * inv_sigma * inv_sigma
    dg_thth = -dsigma * inv_sigma * inv_sigma
    dg_phph = (ddelta * inv_sd + (delta - a2 * st2) * dinv_sd) / st2
    dH_dr = 0.5 * (
        dg_tt * E * E
        - 2.0 * dg_tphi * E * L
        + dg_phph * L * L
        + dg_rr * pr * pr
        + dg_thth * pth * pth
    )

    # dH/dtheta (matches geodesic.rhs_core)
    dst2 = 2.0 * st * ct
    dsigma_th = -a2 * dst2
    dA_th = -delta * a2 * dst2
    dinv_sd_th = -(dsigma_th * delta) * inv_sd * inv_sd
    dg_tt_th = -(dA_th * inv_sd + A * dinv_sd_th)
    dg_tphi_th = -tm * a * dinv_sd_th
    dg_rr_th = -delta * dsigma_th * inv_sigma * inv_sigma
    dg_thth_th = -dsigma_th * inv_sigma * inv_sigma
    num = delta - a2 * st2
    dnum = -a2 * dst2
    dg_phph_th = (
        dnum * inv_sd / st2
        + num * dinv_sd_th / st2
        - num * inv_sd * dst2 / (st2 * st2)
    )
    dH_dth = 0.5 * (
        dg_tt_th * E * E
        - 2.0 * dg_tphi_th * E * L
        + dg_phph_th * L * L
        + dg_rr_th * pr * pr
        + dg_thth_th * pth * pth
    )
    # Slaved trig dynamics: d(sin x)/dl = cos x * dx/dl, etc.
    return (dr, dth, dph, -dH_dr, -dH_dth, dtt,
            ct * dth, -st * dth, cp * dph, -sp * dph)


def _cart(r, st, ct, sp, cp, a):
    """Quasi-cartesian position from the carried trig — multiplies only
    (trace.aug_to_cartesian twin)."""
    w = jnp.sqrt(r * r + a * a)
    rho = w * st
    return rho * cp, rho * sp, r * ct


@jax.custom_jvp
def _slave_trig(st, ct, sp, cp, th, ph):
    """Identity on the primal; under jax.jvp the four trig tangents are
    OVERWRITTEN with the constraint-consistent d(sin x) = cos x dx,
    d(cos x) = -sin x dx (trace.slave_trig_tangent twin) — the
    integrated trig-tangent stage arithmetic becomes dead code the
    compiler eliminates, and the tangents stay exactly on the unit
    circle's tangent space."""
    return st, ct, sp, cp


@_slave_trig.defjvp
def _slave_trig_jvp(primals, tangents):
    st, ct, sp, cp, th, ph = primals
    _dst, _dct, _dsp, _dcp, dth, dph = tangents
    return (st, ct, sp, cp), (
        ct * dth, -st * dth, cp * dph, -sp * dph
    )


def _step_update(state, scal, disk_enabled: bool, adaptive: bool = False,
                 track: bool = False, slave: bool = False):
    """One masked integration step as a pure function of
    (state, scal) tuples of (rows, 128) vectors — shared by the plain
    forward kernel and the tangent-augmented (JVP) kernels, where it is
    differentiated in forward mode *inside* the Pallas kernel.

    state (see the _S_* slot constants):
      (r, th, ph, pr, pth, sth, cth, sph, cph,
       dist, steps, result, hx, hy, hz, lx, ly, lz, t, h, min_r
       [, min_az, gx, gy, gz, gdx, gdy, gdz when track])
    scal:  (M, a, Q, dt, max_dist, r_capture, disk_inner, disk_outer,
            sin_incl, cos_incl, tol, r_shell_min, L)
           [L rides with scal: per-ray const]

    The loop body evaluates ZERO transcendentals: sin/cos of theta and
    phi are slaved ODE components (geodesic.rhs_aug) advanced by the
    same stages as the trajectory and renormalized each step, and the
    cartesian conversion uses them directly.  Identical arithmetic to
    trace.trace_step — the parity tests compare the two engines.

    track: carry the crossing-opacity planes (closest in-band approach
    to the disk plane + position/direction there) — identical tracking
    to trace.trace_step under trace.track_crossing.

    adaptive=False: fixed-step RK4 with the radius schedule
    (trace.step_size_schedule); the carried h plane rides unchanged.
    adaptive=True: embedded Fehlberg 4(5) with per-ray step size and
    accept/reject in the carry — same semantics as the XLA path
    (steppers.rkf45_step + trace.trace_step adaptive branch, mirroring
    math_util.c:212-457; the reference's GPU kernel also adapts in-loop,
    ray_tracer.comp:522-541).
    """
    (r, th, ph, pr, pth, sth, cth, sph, cph,
     dist, steps, result, hx, hy, hz, lx, ly, lz,
     tt, h_carry, min_r) = state[:21]
    if track:
        (min_az, gx, gy, gz, gdx, gdy, gdz) = state[21:]
    (M, a, Q, dt, max_dist, r_capture, disk_inner, disk_outer,
     sin_incl, cos_incl, tol, r_shell_min, L) = scal
    active = result == float(trace.ACTIVE)
    rs = 2.0 * M

    if adaptive:
        h = h_carry
    else:
        # Step size schedule (trace.step_size_schedule).
        h = dt * jnp.clip(r / (7.5 * rs), 0.05, 20.0)
        h = jnp.minimum(h, 0.5 * (r - r_capture) + 1e-3 * dt)
        h = jnp.maximum(h, 1e-4 * dt)

    cur = (r, th, ph, pr, pth, tt, sth, cth, sph, cph)

    def eval_rhs(c):
        return _rhs(c[0], c[3], c[4], c[6], c[7], c[8], c[9],
                    L, M, a, Q)

    def k_to_cur_order(k):
        # _rhs returns state-layout order (r, th, ph, pr, pth, t, trig);
        # `cur` uses (r, th, ph, pr, pth, t, st, ct, sp, cp) — identical
        # ordering, so this is the identity; kept for clarity.
        return k

    def advance_cur(c, *terms):
        """c + sum(coeff * k) per component."""
        out = []
        for comp in range(10):
            acc = c[comp]
            for coeff, k in terms:
                acc = acc + coeff * k[comp]
            out.append(acc)
        return tuple(out)

    if not adaptive:
        # RK4 over the augmented 10-state.
        k1 = eval_rhs(cur)
        k2 = eval_rhs(advance_cur(cur, (0.5 * h, k1)))
        k3 = eval_rhs(advance_cur(cur, (0.5 * h, k2)))
        k4 = eval_rhs(advance_cur(cur, (h, k3)))
        sixth = h / 6.0
        new = []
        for comp in range(10):
            new.append(
                cur[comp] + sixth * (
                    k1[comp] + 2.0 * (k2[comp] + k3[comp]) + k4[comp]
                )
            )
        (r_t, th_t, ph_t, pr_t, pth_t, t_t,
         sth_t, cth_t, sph_t, cph_t) = new
        accepted = active | ~active  # all-True, same shape as active
        h_next = h_carry
    else:
        # Embedded Fehlberg 4(5) pair (steppers tableau constants).
        k1 = eval_rhs(cur)
        k2 = eval_rhs(advance_cur(cur, (h * sp_mod._B21, k1)))
        k3 = eval_rhs(advance_cur(
            cur, (h * sp_mod._B31, k1), (h * sp_mod._B32, k2)))
        k4 = eval_rhs(advance_cur(
            cur, (h * sp_mod._B41, k1), (h * sp_mod._B42, k2),
            (h * sp_mod._B43, k3)))
        k5 = eval_rhs(advance_cur(
            cur, (h * sp_mod._B51, k1), (h * sp_mod._B52, k2),
            (h * sp_mod._B53, k3), (h * sp_mod._B54, k4)))
        k6 = eval_rhs(advance_cur(
            cur, (h * sp_mod._B61, k1), (h * sp_mod._B62, k2),
            (h * sp_mod._B63, k3), (h * sp_mod._B64, k4),
            (h * sp_mod._B65, k5)))

        y4 = advance_cur(
            cur, (h * sp_mod._C[0], k1), (h * sp_mod._C[2], k3),
            (h * sp_mod._C[3], k4), (h * sp_mod._C[4], k5))
        y5 = advance_cur(
            cur, (h * sp_mod._D[0], k1), (h * sp_mod._D[2], k3),
            (h * sp_mod._D[3], k4), (h * sp_mod._D[4], k5),
            (h * sp_mod._D[5], k6))
        # Max per-component relative error over the 6 PHYSICAL
        # components with scale = max(|y|, |y5|) floored at 1e-12 —
        # identical to steppers.rkf45_step with n_err=6 (mirroring
        # math_util.c:376-391; the slaved trig components stay out of
        # the criterion, see the steppers docstring).
        err = None
        for comp in range(trace.N_ERR_COMPONENTS):
            c0, c4, c5 = cur[comp], y4[comp], y5[comp]
            scale = jnp.maximum(jnp.maximum(jnp.abs(c0), jnp.abs(c5)),
                                1e-12)
            e = jnp.abs(c5 - c4) / scale
            err = e if err is None else jnp.maximum(err, e)

        (r_t, th_t, ph_t, pr_t, pth_t, t_t,
         sth_t, cth_t, sph_t, cph_t) = y5
        accepted = err <= tol
        # Step-size controller (steppers.rkf45_next_h + trace clamps).
        ratio = jnp.maximum(err / tol, 1e-30)
        log_ratio = jnp.log(ratio)
        scale_ok = sp_mod.SAFETY * jnp.exp(-0.2 * log_ratio)
        scale_bad = sp_mod.SAFETY * jnp.exp(-0.25 * log_ratio)
        sc = jnp.where(accepted, scale_ok, scale_bad)
        sc = jnp.where(err / tol <= 0.0, sp_mod.MAX_SCALE, sc)
        h_next = h * jnp.clip(sc, sp_mod.MIN_SCALE, sp_mod.MAX_SCALE)
        h_next = jnp.clip(h_next, 1e-4 * dt, 50.0 * dt)
        h_next = jnp.minimum(h_next, 0.5 * (r - r_capture) + 1e-3 * dt)
        h_next = jnp.maximum(h_next, 1e-5 * dt)

    finite = (
        jnp.isfinite(r_t) & jnp.isfinite(th_t) & jnp.isfinite(ph_t)
        & jnp.isfinite(pr_t) & jnp.isfinite(pth_t)
    )
    advance = active & accepted & finite
    r_n = jnp.where(advance, r_t, r)
    th_n = jnp.where(advance, th_t, th)
    ph_n = jnp.where(advance, ph_t, ph)
    pr_n = jnp.where(advance, pr_t, pr)
    pth_n = jnp.where(advance, pth_t, pth)
    t_n = jnp.where(advance, t_t, tt)
    sth_n = jnp.where(advance, sth_t, sth)
    cth_n = jnp.where(advance, cth_t, cth)
    sph_n = jnp.where(advance, sph_t, sph)
    cph_n = jnp.where(advance, cph_t, cph)
    h_new = jnp.where(active, h_next, h_carry)

    # Unit-circle renormalization (trace.renormalize_trig twin).
    n_th = jax.lax.rsqrt(jnp.maximum(sth_n * sth_n + cth_n * cth_n, 0.25))
    sth_n = sth_n * n_th
    cth_n = cth_n * n_th
    n_ph = jax.lax.rsqrt(jnp.maximum(sph_n * sph_n + cph_n * cph_n, 0.25))
    sph_n = sph_n * n_ph
    cph_n = cph_n * n_ph
    if slave:
        # Trig-tangent slaving (trace.slave_trig_tangent twin), BEFORE
        # the cartesian conversion so the downstream tangents consume
        # the slaved values and the integrated trig-tangent stage
        # arithmetic is dead code.  Only the differentiated kernels
        # compile this wrapper: routing the custom_jvp through the
        # plain kernel was measured to blow its Mosaic compile time up
        # ~5x for zero semantic effect.
        sth_n, cth_n, sph_n, cph_n = _slave_trig(
            sth_n, cth_n, sph_n, cph_n, th_n, ph_n
        )

    cx, cy, cz = _cart(r, sth, cth, sph, cph, a)
    cx_n, cy_n, cz_n = _cart(r_n, sth_n, cth_n, sph_n, cph_n, a)
    dxc = cx_n - cx
    dyc = cy_n - cy
    dzc = cz_n - cz
    step_len = jnp.sqrt(dxc * dxc + dyc * dyc + dzc * dzc + 1e-24)
    inv_len = 1.0 / jnp.maximum(step_len, EPSILON)
    dist_n = dist + jnp.where(advance, step_len, 0.0)
    lx_n = jnp.where(advance, dxc * inv_len, lx)
    ly_n = jnp.where(advance, dyc * inv_len, ly)
    lz_n = jnp.where(advance, dzc * inv_len, lz)

    # --- disk crossing (inline sign change; trace.trace_step) ---
    if disk_enabled:
        z_prev = -sin_incl * cy + cos_incl * cz
        z_new = -sin_incl * cy_n + cos_incl * cz_n
        crossed = (z_prev * z_new < 0.0) & advance
        denom = z_prev - z_new
        frac = z_prev / jnp.where(
            jnp.abs(denom) < EPSILON, EPSILON, denom
        )
        px = cx + frac * dxc
        py = cy + frac * dyc
        pz = cz + frac * dzc
        yp = cos_incl * py + sin_incl * pz
        r_plane = jnp.sqrt(px * px + yp * yp)
        in_annulus = (r_plane >= disk_inner) & (r_plane <= disk_outer)
        disk_hit = crossed & in_annulus
        result = jnp.where(disk_hit, float(RayResult.DISK), result)
        hx = jnp.where(disk_hit, px, hx)
        hy = jnp.where(disk_hit, py, hy)
        hz = jnp.where(disk_hit, pz, hz)
        dist_n = jnp.where(disk_hit, dist + frac * step_len, dist_n)
        if track:
            # Crossing-opacity tracking (trace.trace_step twin): min
            # sampled |z'| while radially inside the annulus, plus the
            # position/chord-direction there.
            z_abs = jnp.abs(z_new)
            yp_n = cos_incl * cy_n + sin_incl * cz_n
            r_plane_n = jnp.sqrt(cx_n * cx_n + yp_n * yp_n)
            in_band = (r_plane_n >= disk_inner) & (r_plane_n <= disk_outer)
            cand = advance & in_band & (z_abs < min_az)
            min_az = jnp.where(cand, z_abs, min_az)
            gx = jnp.where(cand, cx_n, gx)
            gy = jnp.where(cand, cy_n, gy)
            gz = jnp.where(cand, cz_n, gz)
            gdx = jnp.where(cand, dxc * inv_len, gdx)
            gdy = jnp.where(cand, dyc * inv_len, gdy)
            gdz = jnp.where(cand, dzc * inv_len, gdz)
        if adaptive:
            # Disk-aware step clamp — identical formula to
            # trace.trace_step (see the comment there): approaching
            # rays inside the disk's radial band cap the next step at
            # ~1.25x the estimated plane-crossing time so one step
            # cannot enter AND exit the disk between samples.
            dz = z_new - z_prev
            approaching = z_new * dz < 0.0
            lam_cross = h * jnp.abs(z_new) / jnp.maximum(
                jnp.abs(dz), EPSILON
            )
            near = r_n < 1.5 * disk_outer
            h_cap = jnp.maximum(1.25 * lam_cross, 0.05 * dt)
            h_new = jnp.where(
                active & approaching & near,
                jnp.minimum(h_new, h_cap),
                h_new,
            )

    still = result == float(trace.ACTIVE)

    # --- horizon capture + momentum pinning + NaN scrub + early
    # ingoing shell capture (see trace.trace_step for the physics) ---
    pinned = (pr_n < -1e6) | (jnp.abs(pr_n) > 1e7)
    shell_capture = (pr_n < 0.0) & (r_n < 0.999 * r_shell_min)
    captured = still & active & (
        (r_n <= r_capture) | shell_capture | pinned | ~finite
    )
    result = jnp.where(captured, float(RayResult.HORIZON), result)
    hx = jnp.where(captured, cx_n, hx)
    hy = jnp.where(captured, cy_n, hy)
    hz = jnp.where(captured, cz_n, hz)
    still = result == float(trace.ACTIVE)

    # --- path-length budget ---
    budget = still & advance & (dist_n >= max_dist)
    result = jnp.where(budget, float(RayResult.MAX_DISTANCE), result)
    hx = jnp.where(budget, cx_n, hx)
    hy = jnp.where(budget, cy_n, hy)
    hz = jnp.where(budget, cz_n, hz)
    still = result == float(trace.ACTIVE)

    # --- radial escape ---
    escaped = still & advance & (r_n >= max_dist) & (pr_n > 0.0)
    result = jnp.where(escaped, float(RayResult.BACKGROUND), result)
    hx = jnp.where(escaped, cx_n, hx)
    hy = jnp.where(escaped, cy_n, hy)
    hz = jnp.where(escaped, cz_n, hz)

    # NOT active.astype(f32) + add: Mosaic (as of jax 0.9) fails with an
    # "Invalid relayout" on bool->f32 vector casts here.
    steps_n = jnp.where(active, steps + 1.0, steps)
    min_r_n = jnp.where(advance, jnp.minimum(min_r, r_n), min_r)
    out = (r_n, th_n, ph_n, pr_n, pth_n, sth_n, cth_n, sph_n, cph_n,
           dist_n, steps_n, result, hx, hy, hz, lx_n, ly_n, lz_n,
           t_n, h_new, min_r_n)
    if track:
        out = out + (min_az, gx, gy, gz, gdx, gdy, gdz)
    return out


def _load_init(inp_ref, base, h0, track: bool = False):
    """State tuple from the input planes of one tile.

    h0: initial step-size plane (time_step for the adaptive mode; the
    RK4 mode carries it untouched)."""
    r0 = inp_ref[base, 0]
    th0 = inp_ref[base, 1]
    ph0 = inp_ref[base, 2]
    pr0 = inp_ref[base, 3]
    pth0 = inp_ref[base, 4]
    cx0 = inp_ref[base, 6]
    cy0 = inp_ref[base, 7]
    cz0 = inp_ref[base, 8]
    ldx0 = inp_ref[base, 9]
    ldy0 = inp_ref[base, 10]
    ldz0 = inp_ref[base, 11]
    sth0 = inp_ref[base, 12]
    cth0 = inp_ref[base, 13]
    sph0 = inp_ref[base, 14]
    cph0 = inp_ref[base, 15]
    # r0 is loaded from VMEM, so it carries a non-replicated vector
    # layout; derive every init value from it.  A jnp.zeros_like /
    # jnp.full splat would enter the while carry with a *replicated*
    # Mosaic layout, and the loop body's non-replicated updates then
    # need a {0,0} -> {*,*} relayout at the backedge, which Mosaic
    # rejects ("Invalid relayout", jax 0.9).
    zeros = r0 * 0.0
    result0 = zeros + float(trace.ACTIVE)
    state = (r0, th0, ph0, pr0, pth0, sth0, cth0, sph0, cph0,
             zeros, zeros, result0, cx0, cy0, cz0, ldx0, ldy0, ldz0,
             zeros, zeros + h0, r0)
    if track:
        # min_az starts far (1e9, matches trace.init_carry); closest-
        # approach pos/dir start at the ray origin/direction.
        state = state + (zeros + 1e9, cx0, cy0, cz0, ldx0, ldy0, ldz0)
    return state


def _store_out(out_ref, offset, state, track: bool = False):
    """Write the _n_out(track) output planes starting at `offset`.

    Final cartesian reconstruction happens XLA-side in _postprocess
    (it needs primal x tangent cross terms the per-set tangent stores
    here cannot form), so the final BL radius and trig planes are
    stored raw."""
    out_ref[0, offset + 0] = state[_S_RESULT]
    out_ref[0, offset + 1] = state[_S_DIST]
    out_ref[0, offset + 2] = state[_S_STEPS]
    out_ref[0, offset + 3] = state[_S_HX]
    out_ref[0, offset + 4] = state[_S_HY]
    out_ref[0, offset + 5] = state[_S_HZ]
    out_ref[0, offset + 6] = state[_S_LX]
    out_ref[0, offset + 7] = state[_S_LY]
    out_ref[0, offset + 8] = state[_S_LZ]
    out_ref[0, offset + 9] = state[_S_R]
    out_ref[0, offset + 10] = state[_S_ST]
    out_ref[0, offset + 11] = state[_S_CT]
    out_ref[0, offset + 12] = state[_S_SP]
    out_ref[0, offset + 13] = state[_S_CP]
    out_ref[0, offset + 14] = state[_S_MINR]
    if track:
        for k in range(_N_TRACK_PLANES):
            out_ref[0, offset + 15 + k] = state[_S_MINAZ + k]


def _make_kernel(disk_enabled: bool, max_steps: int, adaptive: bool,
                 rows: int, track: bool = False):
    """Build the kernel body; disk handling, the step budget, the
    integrator mode, and crossing-opacity tracking are compiled in
    (static in SimConfig)."""

    def kernel(scal_ref, inp_ref, out_ref):
        scal = tuple(scal_ref[k] for k in range(_N_SCAL_PLANES)) + (
            inp_ref[0, 5],  # L (per-ray constant)
        )
        state0 = _load_init(inp_ref, 0, scal[3], track)  # h0 = time_step

        def cond(carry):
            # Mosaic cannot lower a vector->scalar reduction inside the
            # while condition; the body maintains the active count as a
            # scalar carry instead.
            (i, n_active, *_rest) = carry
            return (i < max_steps) & (n_active > 0)

        def body(carry):
            i, _n, *state = carry
            new = _step_update(tuple(state), scal, disk_enabled, adaptive,
                               track)
            n_active = jnp.sum(
                (new[_S_RESULT] == float(trace.ACTIVE)).astype(jnp.int32)
            ).astype(jnp.int32)
            return (i + 1, n_active) + new

        init = (jnp.int32(0), jnp.int32(rows * TILE_LANES)) + state0
        final = jax.lax.while_loop(cond, body, init)
        _store_out(out_ref, 0, final[2:], track)

    return kernel


def _make_kernel_jvp(disk_enabled: bool, max_steps: int, adaptive: bool,
                     rows: int, track: bool = False):
    """Tangent-augmented kernel: integrates (state, dstate) together,
    with the tangent recurrence generated by jax.jvp of _step_update
    *inside* the kernel.  One tangent direction per call (the caller
    loops/backs over parameter basis directions).

    This is the forward-mode path for few-parameter gradients
    (mass, spin, camera pose): cost ~ 3x the plain kernel per direction,
    no checkpointing, full early exit — versus the reverse-mode scan
    driver which cannot early-exit and rematerializes.
    """

    def kernel(scal_ref, dscal_ref, inp_ref, dinp_ref, out_ref):
        scal = tuple(scal_ref[k] for k in range(_N_SCAL_PLANES)) + (
            inp_ref[0, 5],
        )
        dscal = tuple(dscal_ref[k] for k in range(_N_SCAL_PLANES)) + (
            dinp_ref[0, 5],
        )
        state0 = _load_init(inp_ref, 0, scal[3], track)
        dstate0 = _load_init(dinp_ref, 0, dscal[3], track)
        # Tangents of (dist, steps, result) start at exact zero; the
        # _load_init trick put result0 = ACTIVE into the tangent tuple's
        # result slot, so rebuild those slots from dinp zeros.  Same for
        # min_az: its 1e9 init is a constant.
        dzero = dinp_ref[0, 0] * 0.0
        dstate0 = _zero_ctrl_tangents(dstate0, dzero, track)

        n_state = len(state0)

        def f(state, scal_in):
            # tangent_guard: per-ray tangent rescale + non-finite scrub
            # once per step (integrate.sensitivity) — identity on the
            # primal, so the plain kernel path is untouched.  slave=True
            # slaves the trig tangents to d(theta), d(phi) in-step.
            return sensitivity.tangent_guard(
                2, _step_update(state, scal_in, disk_enabled, adaptive,
                                track, slave=True)
            )

        def cond(carry):
            (i, n_active, *_rest) = carry
            return (i < max_steps) & (n_active > 0)

        def body(carry):
            i, _n = carry[0], carry[1]
            state = tuple(carry[2:2 + n_state])
            dstate = tuple(carry[2 + n_state:])
            new, dnew = jax.jvp(f, (state, scal), (dstate, dscal))
            n_active = jnp.sum(
                (new[_S_RESULT] == float(trace.ACTIVE)).astype(jnp.int32)
            ).astype(jnp.int32)
            return (i + 1, n_active) + new + dnew

        init = (jnp.int32(0), jnp.int32(rows * TILE_LANES)) + state0 \
            + dstate0
        final = jax.lax.while_loop(cond, body, init)
        _store_out(out_ref, 0, final[2:2 + n_state], track)
        _store_out(out_ref, _n_out(track), final[2 + n_state:], track)

    return kernel


def _make_kernel_jvp_multi(disk_enabled: bool, max_steps: int,
                           adaptive: bool, n_tan: int, rows: int,
                           track: bool = False):
    """Multi-tangent kernel: integrates (state, dstate_1..dstate_n)
    together — ONE primal integration shared by all n tangent
    recurrences (jax.jvp is applied per tangent and XLA CSEs the
    repeated primal).  This is the whole point versus n separate
    tangent-augmented calls: cost P + n*T instead of n*(P + T), and the
    tangent arithmetic T is much cheaper than the primal P on this
    latency-bound loop.
    """

    def kernel(*refs):
        scal_ref = refs[0]
        dscal_refs = refs[1:1 + n_tan]
        inp_ref = refs[1 + n_tan]
        dinp_refs = refs[2 + n_tan:2 + 2 * n_tan]
        out_ref = refs[-1]

        scal = tuple(scal_ref[k] for k in range(_N_SCAL_PLANES)) + (
            inp_ref[0, 5],
        )
        dscals = [
            tuple(dscal_refs[t][k] for k in range(_N_SCAL_PLANES))
            + (dinp_refs[t][0, 5],)
            for t in range(n_tan)
        ]
        state0 = _load_init(inp_ref, 0, scal[3], track)
        n_state = len(state0)
        dstates0 = []
        for t in range(n_tan):
            ds = _load_init(dinp_refs[t], 0, dscals[t][3], track)
            dzero = dinp_refs[t][0, 0] * 0.0
            # (dist, steps, result, min_az) tangents start at exact
            # zero (same fix-up as _make_kernel_jvp).
            dstates0.append(
                _zero_ctrl_tangents(ds, dzero, track)
            )

        def f(state, scal_in):
            # Same per-step tangent guard + trig-tangent slaving as
            # _make_kernel_jvp; applied independently to each tangent
            # direction by the per-t jvp.
            return sensitivity.tangent_guard(
                2, _step_update(state, scal_in, disk_enabled, adaptive,
                                track, slave=True)
            )

        def cond(carry):
            (i, n_active, *_rest) = carry
            return (i < max_steps) & (n_active > 0)

        def body(carry):
            i = carry[0]
            state = tuple(carry[2:2 + n_state])
            new = None
            dnews = ()
            for t in range(n_tan):
                dstate = tuple(
                    carry[2 + (1 + t) * n_state:2 + (2 + t) * n_state]
                )
                new, dnew = jax.jvp(f, (state, scal),
                                    (dstate, dscals[t]))
                dnews = dnews + dnew
            n_active = jnp.sum(
                (new[_S_RESULT] == float(trace.ACTIVE)).astype(jnp.int32)
            ).astype(jnp.int32)
            return (i + 1, n_active) + new + dnews

        init = (jnp.int32(0), jnp.int32(rows * TILE_LANES)) + state0
        for ds in dstates0:
            init = init + ds
        final = jax.lax.while_loop(cond, body, init)
        for t in range(1 + n_tan):
            _store_out(
                out_ref, _n_out(track) * t,
                final[2 + t * n_state:2 + (t + 1) * n_state],
                track,
            )

    return kernel


@functools.lru_cache(maxsize=None)
def _get_multi_core(disk_on: bool, max_steps: int, adaptive: bool,
                    n_tan: int, interpret: bool, rows: int,
                    track: bool = False):
    """Config-specialized multi-tangent pallas core.

    core(scal, dscals tuple, inp, dinps tuple) ->
    (out, douts tuple), each (grid, _n_out(track), rows, 128)."""

    def core(scal, dscals, inp, dinps):
        grid = inp.shape[0]
        p = _n_out(track)
        scal_spec = pl.BlockSpec(
            (_N_SCAL_PLANES, rows, TILE_LANES),
            lambda g: (0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        inp_spec = pl.BlockSpec(
            (1, _N_INP_PLANES, rows, TILE_LANES),
            lambda g: (g, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out = pl.pallas_call(
            _make_kernel_jvp_multi(disk_on, max_steps, adaptive, n_tan,
                                   rows, track),
            grid=(grid,),
            in_specs=[scal_spec] * (1 + n_tan) + [inp_spec] * (1 + n_tan),
            out_specs=pl.BlockSpec(
                (1, p * (1 + n_tan), rows, TILE_LANES),
                lambda g: (g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (grid, p * (1 + n_tan), rows, TILE_LANES),
                jnp.float32, vma=_out_vma(scal, inp),
            ),
            interpret=interpret,
        )(scal, *dscals, inp, *dinps)
        return out[:, :p], tuple(
            out[:, p * (1 + t):p * (2 + t)] for t in range(n_tan)
        )

    return core


def trace_rays_pallas_fwdgrad(origins, directions, scene: Scene,
                              tangents, interpret: bool = False,
                              order=None):
    """One kernel pass propagating several tangent directions.

    tangents: sequence of either Scene-tangent pytrees, or
    (dscene, dorigins, ddirections) triples when the rays themselves
    depend on the differentiated parameters (camera pose / fov).
    Returns (hit, [hit_tangent_per_direction]) — the building block of
    grad.fast_grad.scene_value_and_grad / render_value_and_grad, which
    turn these into d(loss)/d(params) for ~1.5x the cost of the plain
    forward instead of n_params * jvp-kernel calls.

    order: optional depth-sort permutation (see trace_rays_pallas);
    applied identically to primal rays and ray tangents.
    """
    adaptive = _check_integrator(scene)
    batch_shape = origins.shape[:-1]
    n = int(jnp.asarray(origins).reshape(-1, 3).shape[0])
    n_tan = len(tangents)
    rows = _rows_for(interpret, multi=True)

    def pre(s, o_, d_):
        return _prepare(o_, d_, s, rows)

    o32 = jnp.asarray(origins, jnp.float32).reshape(-1, 3)
    d32 = jnp.asarray(directions, jnp.float32).reshape(-1, 3)
    o0, d0 = o32, d32  # CALLER-order rays (margin is computed on these)
    inv_order = None
    if order is not None:
        o32, d32 = o32[order], d32[order]
        inv_order = jnp.argsort(order)
    scal, inp = pre(scene, o32, d32)
    dscals, dinps = [], []
    scene_tangents = []
    ray_tangents = []  # caller-order (ds, do, dd) per direction
    for tan in tangents:
        if isinstance(tan, tuple) and len(tan) == 3:
            ds, do, dd = tan
            do = jnp.asarray(do, jnp.float32).reshape(-1, 3)
            dd = jnp.asarray(dd, jnp.float32).reshape(-1, 3)
        else:
            ds, do, dd = tan, jnp.zeros_like(o0), jnp.zeros_like(d0)
        ray_tangents.append((ds, do, dd))
        if order is not None and do.shape[0] == n:
            do, dd = do[order], dd[order]
        scene_tangents.append(ds)
        _, (dscal, dinp) = jax.jvp(
            pre, (scene, o32, d32), (ds, do, dd)
        )
        dscals.append(dscal)
        dinps.append(dinp)

    track = trace.track_crossing(scene)
    core = _get_multi_core(
        bool(scene.disk_enabled and scene.config.show_disk),
        int(scene.config.max_steps), adaptive, n_tan, interpret, rows,
        track,
    )
    out, douts = core(scal, tuple(dscals), inp, tuple(dinps))

    if _needs_L(scene):
        def L_fn(s, o_, d_):
            # Caller-order conserved L, recomputed from the rays (see
            # trace_rays_pallas: cheaper than un-permuting a slice of
            # the kernel input planes, and CSEs with m_fn's init).
            return geodesic.init_null_rays_aug(
                o_, coords.normalize(d_), s.blackhole.mass,
                s.blackhole.a, s.blackhole.charge
            )[2]

        L = L_fn(scene, o0, d0)

        soft = float(scene.config.shadow_softness) > 0.0
        if soft:
            # Analytic capture margin + its per-direction tangents —
            # caller-order, differentiable in (scene, rays).  valid is
            # a primal-only predicate (closed over below).
            def m_fn(s, o_, d_):
                return trace.compute_capture_margin(o_, d_, s)[0]

            m_arr = m_fn(scene, o0, d0)
            m_valid = trace.compute_capture_margin(o0, d0, scene)[1]
        else:
            m_arr = jnp.zeros((n,), jnp.float32)
            m_valid = None

        def post(out_, s, L_, m_):
            margin = (m_, m_valid) if m_valid is not None else None
            return _postprocess(
                out_, n, batch_shape, s, inv_order, L_, margin
            )

        hit = post(out, scene, L, m_arr)
        dhits = []
        for dout, ds, rtan in zip(douts, scene_tangents, ray_tangents):
            # dL and dmargin ride the jvp so kerr-mode shading and the
            # analytic shadow boundary see their parameter tangents.
            if soft:
                _, dm = jax.jvp(m_fn, (scene, o0, d0), rtan)
            else:
                dm = jnp.zeros_like(m_arr)
            _, dL = jax.jvp(L_fn, (scene, o0, d0), rtan)
            _, dhit = jax.jvp(
                post, (out, scene, L, m_arr),
                (dout, ds, dL, dm)
            )
            dhits.append(dhit)
        return hit, dhits

    def post(out_, s):
        return _postprocess(out_, n, batch_shape, s, inv_order, None)

    hit = post(out, scene)
    dhits = []
    for dout, ds in zip(douts, scene_tangents):
        _, dhit = jax.jvp(post, (out, scene), (dout, ds))
        dhits.append(dhit)
    return hit, dhits


@functools.lru_cache(maxsize=None)
def _get_core(disk_on: bool, max_steps: int, adaptive: bool,
              interpret: bool, rows: int, track: bool = False):
    """Cached, config-specialized pallas core with a custom JVP.

    core(scal_planes (10,rows,128), inp_planes (grid,12,rows,128)) ->
    out (grid,_N_OUT_PLANES,rows,128); the grid size is read off inp's shape at
    trace time, so one cache entry serves every render resolution.
    Forward-mode differentiation runs the tangent-augmented kernel (one
    extra call per tangent direction); reverse mode is NOT defined here
    — use blackhole_tpu.grad for that.
    """

    p = _n_out(track)

    def _call_plain(scal, inp):
        grid = inp.shape[0]
        return pl.pallas_call(
            _make_kernel(disk_on, max_steps, adaptive, rows, track),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(
                    (_N_SCAL_PLANES, rows, TILE_LANES),
                    lambda g: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, _N_INP_PLANES, rows, TILE_LANES),
                    lambda g: (g, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, p, rows, TILE_LANES),
                lambda g: (g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (grid, p, rows, TILE_LANES), jnp.float32,
                vma=_out_vma(scal, inp),
            ),
            interpret=interpret,
        )(scal, inp)

    def _call_jvp(scal, dscal, inp, dinp):
        grid = inp.shape[0]
        out = pl.pallas_call(
            _make_kernel_jvp(disk_on, max_steps, adaptive, rows, track),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(
                    (_N_SCAL_PLANES, rows, TILE_LANES),
                    lambda g: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (_N_SCAL_PLANES, rows, TILE_LANES),
                    lambda g: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, _N_INP_PLANES, rows, TILE_LANES),
                    lambda g: (g, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, _N_INP_PLANES, rows, TILE_LANES),
                    lambda g: (g, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 2 * p, rows, TILE_LANES),
                lambda g: (g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (grid, 2 * p, rows, TILE_LANES), jnp.float32,
                vma=_out_vma(scal, inp),
            ),
            interpret=interpret,
        )(scal, dscal, inp, dinp)
        return out[:, :p], out[:, p:]

    @jax.custom_jvp
    def core(scal, inp):
        return _call_plain(scal, inp)

    @core.defjvp
    def core_jvp(primals, tangents):
        scal, inp = primals
        dscal, dinp = tangents  # materialized by defjvp (no symbolic zeros)
        return _call_jvp(scal, dscal, inp, dinp)

    return core


def _check_integrator(scene: Scene) -> bool:
    if scene.config.integrator not in (Integrator.RK4, Integrator.RKF45):
        raise ValueError(
            "pallas kernel supports the RK4 and RKF45 integrators only"
        )
    return scene.config.integrator == Integrator.RKF45


def _needs_L(scene: Scene) -> bool:
    """finalize consumes the per-ray conserved L: soft shadow boundary
    (sign only, stop-gradiented there) and/or exact Kerr disk
    kinematics (full value, differentiable; "auto" is the default)."""
    return (
        float(scene.config.shadow_softness) > 0.0
        or scene.config.disk_kinematics in ("auto", "kerr")
    )


# --- depth-sorted tiling -------------------------------------------------
#
# The kernel early-exits per TILE: a tile's while_loop runs max(steps of
# its rays) iterations.  In raster order, tiles straddling the shadow
# edge mix ~1000-step near-critical rays with ~100-step rays, so almost
# every tile near the hole pays the worst-case budget.  Passing `order`
# (a permutation grouping rays of similar integration depth — see
# image.predicted_depth_order for the prepass-based key) re-tiles the
# batch so total loop iterations drop toward sum(steps)/TILE; measured
# on the bench scene, the step-count oracle bounds the gain at 1.52x
# and the 128^2-prepass key realizes 1.39x (tools/measure_sort_gain2.py).
# Per-ray arithmetic is mask-based and independent of lane position, so
# ordered and raster traces are bitwise identical after un-permuting.
# The reference has no analog (its CPU loop early-exits per ray; its
# GPU kernel has no early exit at all, ray_tracer.comp:323-548).


def _prepare(origins, directions, scene: Scene, rows: int = TILE_ROWS):
    """Differentiable pre-kernel stage: flatten/pad rays, exact null
    init, pack the (grid, 12, rows, 128) input planes and the
    (10, rows, 128) scal planes.  Returns (scal, inp)."""
    tile = rows * TILE_LANES
    o = jnp.asarray(origins, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(directions, jnp.float32).reshape(-1, 3)
    n = o.shape[0]
    n_pad = -n % tile
    if n_pad:
        # Pad with the LAST ray: under depth-sorted ordering that is the
        # shallowest ray of the batch, so the padding lanes retire first
        # instead of dragging the final tile to the deepest ray's budget.
        o = jnp.concatenate([o, jnp.broadcast_to(o[-1:], (n_pad, 3))], 0)
        d = jnp.concatenate([d, jnp.broadcast_to(d[-1:], (n_pad, 3))], 0)
    n_total = n + n_pad
    grid = n_total // tile

    bh = scene.blackhole
    cfg = scene.config
    disk = scene.disk

    # Ray initialization (exact, autodiff-based) outside the kernel;
    # the trig-augmented state's sin/cos planes are computed here, once,
    # differentiably — the kernel loop never evaluates a transcendental.
    ld = coords.normalize(d)
    y, _, L, _ = geodesic.init_null_rays_aug(
        o, ld, bh.mass, bh.a, bh.charge
    )
    comps = jnp.stack(
        [
            y[:, 0], y[:, 1], y[:, 2], y[:, 3], y[:, 4], L,
            o[:, 0], o[:, 1], o[:, 2], ld[:, 0], ld[:, 1], ld[:, 2],
            y[:, geodesic.IST], y[:, geodesic.ICT],
            y[:, geodesic.ISP], y[:, geodesic.ICP],
        ],
        axis=0,
    ).astype(jnp.float32)  # (_N_INP_PLANES, n_total)
    inp = comps.reshape(_N_INP_PLANES, grid, rows, TILE_LANES).transpose(
        1, 0, 2, 3
    )  # (grid, _N_INP_PLANES, rows, 128)

    r_capture = HORIZON_CAPTURE_FACTOR * bh.r_plus
    from blackhole_tpu.metrics import derived as _derived

    scal = jnp.stack(
        [
            bh.mass, bh.a, bh.charge, cfg.time_step,
            cfg.max_ray_distance, r_capture,
            disk.inner_radius, disk.outer_radius,
            jnp.sin(disk.inclination), jnp.cos(disk.inclination),
            jnp.maximum(cfg.tolerance, 1e-12),
            _derived.kerr_photon_orbit_radius(
                bh.mass, jnp.abs(bh.spin), 1.0
            ),
        ]
    ).astype(jnp.float32)
    # Broadcast to (_N_SCAL_PLANES, rows, 128) VMEM planes (see _N_SCAL_PLANES note).
    scal = jnp.broadcast_to(
        scal[:, None, None], (_N_SCAL_PLANES, rows, TILE_LANES)
    )
    return scal, inp


def _postprocess(out, n: int, batch_shape, scene: Scene,
                 inv_order=None, L=None, margin=None) -> Hit:
    """Differentiable post-kernel stage: output planes -> shaded Hit.

    inv_order: optional (n,) int permutation restoring the caller's ray
    order when the kernel ran on a depth-sorted batch.
    L: optional (n,) conserved angular momenta in the CALLER's ray
    order — finalize uses sign(L) (stop-gradiented at the use site) for
    the soft shadow boundary's prograde/retrograde threshold and the
    full differentiable value for kerr disk kinematics; zeros
    otherwise.
    margin: optional (margin_len, valid) pair in the CALLER's ray order
    (trace.compute_capture_margin) for the analytic soft shadow
    boundary."""
    track = trace.track_crossing(scene)
    n_planes = _n_out(track)
    n_total = out.shape[0] * out.shape[2] * out.shape[3]
    flat = out.transpose(1, 0, 2, 3).reshape(n_planes, n_total)[:, :n]
    if inv_order is not None:
        flat = flat[:, inv_order]
    result = jax.lax.stop_gradient(flat[0]).astype(jnp.int32)
    result = jnp.where(
        result == trace.ACTIVE, RayResult.MAX_STEPS, result
    )
    # Rebuild the augmented state's position/trig slots from the output
    # planes (finalize's aug_to_cartesian reads r and the trig planes;
    # the other components are not consumed post-loop).
    zcol = flat[9] * 0.0
    y_fin = jnp.stack(
        [flat[9], zcol, zcol, zcol, zcol, zcol,
         flat[10], flat[11], flat[12], flat[13]],
        axis=-1,
    )
    carry = trace.TraceCarry(
        y=y_fin,
        h=jnp.zeros((n,), jnp.float32),
        L=jnp.zeros((n,), jnp.float32) if L is None else L,
        dist=flat[1],
        steps=jax.lax.stop_gradient(flat[2]).astype(jnp.int32),
        result=result,
        hit_pos=flat[3:6].T,
        last_dir=flat[6:9].T,
        min_r=flat[14],
        iter=jnp.zeros((), jnp.int32),
        min_az=flat[15] if track else None,
        gpos=flat[16:19].T if track else None,
        gdir=flat[19:22].T if track else None,
    )
    hit = trace.finalize(carry, scene, margin=margin)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(batch_shape + x.shape[1:]), hit
    )


@partial(jax.jit, static_argnames=("interpret",))
def trace_rays_pallas(origins, directions, scene: Scene,
                      interpret: bool = False, order=None) -> Hit:
    """Pallas-accelerated equivalent of trace.trace_rays (RK4 + RKF45).

    origins/directions: (..., 3) float32.  RK4 runs the fixed-step
    schedule; RKF45 runs the embedded adaptive pair with per-ray step
    state in the loop carry (leapfrog/Yoshida use the XLA while_loop
    path).  Forward-mode differentiable end-to-end (jax.jvp /
    jax.jacfwd) via the tangent-augmented kernel; for reverse mode use
    blackhole_tpu.grad.diff_trace.  For gradients w.r.t. several
    parameters at once, trace_rays_pallas_fwdgrad propagates all
    tangents in ONE kernel pass.

    order: optional (n,) permutation of the flattened rays (deepest
    first) for depth-sorted tiling — see image.predicted_depth_order.
    The returned Hit is always in the caller's ray order.
    """
    adaptive = _check_integrator(scene)
    batch_shape = origins.shape[:-1]
    n = int(jnp.asarray(origins).reshape(-1, 3).shape[0])
    rows = _rows_for(interpret)
    o = jnp.asarray(origins, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(directions, jnp.float32).reshape(-1, 3)
    o0, d0 = o, d  # caller order
    inv_order = None
    if order is not None:
        o, d = o[order], d[order]
        inv_order = jnp.argsort(order)
    scal, inp = _prepare(o, d, scene, rows)
    core = _get_core(
        bool(scene.disk_enabled and scene.config.show_disk),
        int(scene.config.max_steps), adaptive, interpret, rows,
        trace.track_crossing(scene),
    )
    out = core(scal, inp)
    L = None
    if _needs_L(scene):
        # Conserved L in the CALLER's order, recomputed directly from
        # the unpermuted rays: a fusable elementwise chain that XLA
        # CSEs with compute_capture_margin's init below.  (Slicing
        # plane 5 out of the kernel's (grid, 16, rows, 128) input and
        # un-permuting it measured ~4% of the whole forward render —
        # a strided 64 MB slice + a 1M gather for 4 MB of values.)
        bh = scene.blackhole
        _, _, L, _ = geodesic.init_null_rays_aug(
            o0, coords.normalize(d0), bh.mass, bh.a, bh.charge
        )
    margin = None
    if float(scene.config.shadow_softness) > 0.0:
        # Analytic capture margin in the CALLER's order (computed from
        # the unpermuted rays, outside the kernel).
        margin = trace.compute_capture_margin(o0, d0, scene)
    return _postprocess(out, n, batch_shape, scene, inv_order, L, margin)
