"""Derived black hole quantities: horizons, ISCO, ergosphere, frame
dragging, time dilation, effective potential, photon sphere, shadow.

TPU-native equivalent of /root/reference/src/spacetime.c:192-196, 242-366,
548-611.  All functions are differentiable w.r.t. (M, a) so they can sit
inside inverse-rendering losses.  Also implements `shadow_radius`, which
the reference declares (raytracer.h:286) but never defines.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from blackhole_tpu.constants import EPSILON


def time_dilation(r, M):
    """Schwarzschild gravitational time dilation 1/sqrt(1 - rs/r)
    (spacetime.c:192-196).  Clamped below at the horizon."""
    rs = 2.0 * M
    f = jnp.maximum(1.0 - rs / jnp.maximum(r, rs + EPSILON), EPSILON)
    return 1.0 / jnp.sqrt(f)


def kerr_circular_omega(r, M, a, sign=1.0):
    """Coordinate angular velocity of a circular equatorial geodesic
    orbit in Kerr: Omega = ± M^{1/2} / (r^{3/2} ± a M^{1/2})
    (Bardeen-Press-Teukolsky 1972).  sign=+1 prograde, -1 retrograde;
    a in length units (a = spin * M).  Reduces to the Keplerian
    sqrt(M/r^3) at a = 0 — the exact replacement for the flat-space
    v = sqrt(M/r) the reference uses (raytracer.c:244-294)."""
    sqM = jnp.sqrt(jnp.maximum(M, EPSILON))
    r32 = jnp.maximum(r, EPSILON) ** 1.5
    return sign * sqM / (r32 + sign * a * sqM)


def static_time_dilation_kerr(r, M, a, charge=0.0):
    """Equatorial static-observer time dilation 1/sqrt(-g_tt)
    = 1/sqrt(1 - (2Mr - Q^2)/r^2) — the exact Kerr-Newman analog of
    `time_dilation` (which is spin/charge-blind).  Clamped at the
    ergosphere (equatorially r = 2M), inside which static observers
    do not exist."""
    r = jnp.maximum(r, EPSILON)
    f = 1.0 - (2.0 * M * r - charge * charge) / (r * r)
    return 1.0 / jnp.sqrt(jnp.maximum(f, EPSILON))


def isco_radius(M, a_over_M, prograde=True):
    """Bardeen-Press-Teukolsky ISCO (spacetime.c:285-308, 548-556).

    a_over_M: dimensionless spin (sign ignored; `prograde` selects branch).
    Returns 6M at a=0.
    """
    chi = jnp.where(prograde, a_over_M, -a_over_M)
    one = jnp.ones_like(chi)
    z1 = 1.0 + jnp.cbrt(jnp.maximum(1.0 - chi * chi, 0.0)) * (
        jnp.cbrt(one + chi) + jnp.cbrt(one - chi)
    )
    z2 = jnp.sqrt(3.0 * chi * chi + z1 * z1)
    inner = jnp.maximum((3.0 - z1) * (3.0 + z1 + 2.0 * z2), 0.0)
    sign = jnp.where(chi >= 0.0, 1.0, -1.0)
    return M * (3.0 + z2 - sign * jnp.sqrt(inner))


def event_horizon(M, a_over_M, charge=0.0):
    """Outer horizon r+ = M + sqrt(M^2 - a^2 - Q^2) (spacetime.c:565-567)."""
    a = a_over_M * M
    return M + jnp.sqrt(jnp.maximum(M * M - a * a - charge * charge, 0.0))


def inner_horizon(M, a_over_M, charge=0.0):
    """Inner horizon r- = M - sqrt(M^2 - a^2 - Q^2)."""
    a = a_over_M * M
    return M - jnp.sqrt(jnp.maximum(M * M - a * a - charge * charge, 0.0))


def ergosphere_radius(theta, M, a_over_M):
    """r_ergo(theta) = M + sqrt(M^2 - a^2 cos^2 theta)
    (spacetime.c:314-326, 577-579)."""
    a = a_over_M * M
    ct = jnp.cos(theta)
    return M + jnp.sqrt(jnp.maximum(M * M - a * a * ct * ct, 0.0))


def frame_dragging_omega(r, theta, M, a_over_M):
    """Frame-dragging angular velocity omega = -g_tphi / g_phph
    = 2 M r a / (Sigma (r^2+a^2) + 2 M r a^2 sin^2)  (spacetime.c:590-611)."""
    a = a_over_M * M
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sigma = r * r + a * a * ct * ct
    denom = sigma * (r * r + a * a) + 2.0 * M * r * a * a * st * st
    return 2.0 * M * r * a / jnp.maximum(denom, EPSILON)


def effective_potential(r, l, M, a_over_M=0.0):
    """Effective potential for massive test particles
    (spacetime.c:242-278).  Schwarzschild branch:
        V_eff = (1 - rs/r)(1 + l^2/r^2).
    Kerr branch mirrors the reference's simplified equatorial form."""
    rs = 2.0 * M
    a = a_over_M * M
    # Branch-specific singularity guards, as in the reference: the
    # Schwarzschild form clamps at rs (spacetime.c:248-250), the Kerr
    # form at the outer horizon r+ (spacetime.c:261-264).
    r_s = jnp.maximum(r, rs + EPSILON)
    schw = (1.0 - rs / r_s) * (1.0 + (l * l) / (r_s * r_s))
    r_plus = M + jnp.sqrt(jnp.maximum(M * M - a * a, 0.0))
    r_k = jnp.maximum(r, r_plus + EPSILON)
    E = 1.0
    kerr = (E * E - 1.0) + (2.0 * M / r_k) * (
        l * l / (r_k * r_k) - 2.0 * M * a * l / (r_k * r_k * r_k)
    )
    return jnp.where(a_over_M == 0.0, schw, kerr)


def photon_sphere_radius(M, charge=0.0):
    """Photon sphere radius.

    Schwarzschild: r = 3M.  Reissner-Nordstrom (a = 0, charge Q):
    r_ph = (3M + sqrt(9 M^2 - 8 Q^2)) / 2 — the larger root of
    2 f(r) = r f'(r) with f = 1 - 2M/r + Q^2/r^2.
    """
    disc = jnp.sqrt(jnp.maximum(9.0 * M * M - 8.0 * charge * charge, 0.0))
    return 0.5 * (3.0 * M + disc)


def rn_critical_impact_parameter(M, charge=0.0):
    """Critical impact parameter of a Reissner-Nordstrom hole:
    b_crit = r_ph / sqrt(f(r_ph)), f = 1 - 2M/r + Q^2/r^2.  Reduces to
    sqrt(27) M at Q = 0 — the analytic capture/escape oracle for charged
    shadow tests (the charged analog of shadow_radius)."""
    r_ph = photon_sphere_radius(M, charge)
    f = 1.0 - 2.0 * M / r_ph + (charge * charge) / (r_ph * r_ph)
    return r_ph / jnp.sqrt(jnp.maximum(f, EPSILON))


def kerr_photon_orbit_radius(M, a_over_M=0.0, sign=1.0):
    """Equatorial circular photon-orbit radius (Bardeen 1972).

    r_ph = 2M (1 + cos(2/3 arccos(-sign * a/M))); sign=+1 prograde,
    -1 retrograde.  Reduces to 3M at a = 0.  Smooth in (M, a) — the
    threshold of the differentiable shadow boundary
    (render.trace.finalize, SimConfig.shadow_softness).
    """
    return 2.0 * M * (
        1.0
        + jnp.cos(
            2.0 / 3.0 * jnp.arccos(jnp.clip(-sign * a_over_M, -1.0, 1.0))
        )
    )


def shadow_radius(M, a_over_M=0.0):
    """Apparent shadow (critical impact parameter).

    Schwarzschild: b_crit = 3*sqrt(3) M = sqrt(27) M — the closed-form
    oracle used by the trace tests.  For Kerr, returns the mean of the
    prograde/retrograde critical equatorial impact parameters
    b = -(r^3 - 3 M r^2 + a^2 r + a^2 M)/(a (r - M)) evaluated at the
    prograde/retrograde photon-orbit radii.

    Implements what raytracer.h:286-288 declares but never defines.
    """
    a = a_over_M * M

    def photon_orbit_r(sign):
        return kerr_photon_orbit_radius(M, a_over_M, sign)

    def b_crit(rp, sign):
        # Impact parameter of the spherical photon orbit (equatorial).
        num = rp * rp * rp - 3.0 * M * rp * rp + a * a * rp + a * a * M
        den = a * (rp - M)
        schw_b = jnp.sqrt(27.0) * M
        return jnp.where(
            jnp.abs(a) < 1e-8,
            schw_b,
            jnp.abs(-num / jnp.where(jnp.abs(den) < EPSILON, EPSILON, den)),
        )

    r_pro = photon_orbit_r(+1.0)
    r_ret = photon_orbit_r(-1.0)
    return 0.5 * (b_crit(r_pro, +1.0) + b_crit(r_ret, -1.0))


def keplerian_orbital_velocity(r, M):
    """Circular-orbit speed v = sqrt(M/r) (blackhole_api.c:42-48)."""
    return jnp.sqrt(M / jnp.maximum(r, EPSILON))


def hawking_temperature(M):
    """T_H = 1/(8 pi M) in geometric units (particle_sim.c:444)."""
    return 1.0 / (8.0 * jnp.pi * M)


def kerr_radial_potential(r, L, Qc, M, a, charge=0.0):
    """Photon radial potential R(r) for E = 1 (Bardeen 1972):

        R(r) = (r^2 + a^2 - a L)^2 - Delta(r) [Qc + (L - a)^2],
        Delta = r^2 - 2 M r + a^2 + e^2.

    dr/dlambda squared = R / Sigma^2, so motion is allowed where
    R >= 0 and turning points are its roots.  Smooth in every argument.
    """
    delta = r * r - 2.0 * M * r + a * a + charge * charge
    P = r * r + a * a - a * L
    C = Qc + (L - a) * (L - a)
    return P * P - delta * C


def capture_margin_length(L, Qc, M, a, charge=0.0, iters=16):
    """Analytic capture/escape margin of a photon, as a signed LENGTH.

    The potential barrier's height decides capture: with R(r) the
    radial potential above, an infalling photon escapes iff R has a
    root above the horizon (it turns around at the largest such root —
    its periapsis), and is captured iff min R over (r_+, infinity) > 0.
    This finds the interior minimum r* of R by Newton on R'(r) = 0
    (seeded at the spin-signed circular photon-orbit radius, to which
    r* collapses at criticality) and converts the barrier clearance
    into a length:

        margin = sign(R(r*)) sqrt(2 |R(r*)| / R''(r*))

    For an escaping ray, |margin| equals its periapsis' distance above
    r* to leading order — i.e. exactly the (min_r - r_photon) measure
    the soft shadow boundary used through r3/r4, but computed in CLOSED
    FORM from the conserved (L, Qc): no dependence on whether the
    integrator's step budget resolved the periapsis.  (Measured at
    256^2/800 steps, budget-truncated min_r was the dominant source of
    spurious visibility flips: rays recorded min_r ~ 5M mid-approach,
    flipped bright<->dark under d(mass) though their trajectories were
    far from critical.  The margin is budget-independent by
    construction.)  positive => captured, negative => escapes.

    Valid for INGOING rays (initial p_r < 0) with C = Qc + (L-a)^2 > 0
    — callers select the old min_r measure otherwise (outgoing rays
    never flip capture, so the switch is gradient-inert).  Fully
    differentiable in (L, Qc, M, a, e) — Newton iterations are plain
    smooth arithmetic; the 1e-8 floor inside the sqrt bounds the
    (physically divergent) derivative at exact criticality.

    Root selection: R'(r) = 4 r^3 + p r + q with p = 4(a^2 - aL) - 2C,
    q = 2MC >= 0.  The barrier dip is the LARGEST real root (the
    up-quartic's critical points order min < max < min; the horizon-
    side local max also solves R' = 0 and must be avoided).  When
    p < 0 the largest root lies below sqrt(-p/4)... — seeding Newton at
    r_seed = sqrt(max(-p1, 0)) + 1 (p1 = p/4), where the cubic is
    positive and convex, gives monotone descent onto exactly that
    root; when the cubic has no positive root (p1 >= 0), the iterate
    pins at the horizon clamp, R there is P^2 >= 0, and the ray is
    classified captured — correct for an ingoing ray with no barrier.
    """
    C = Qc + (L - a) * (L - a)
    spin = a / jnp.maximum(M, EPSILON)
    r_lo = event_horizon(M, spin, charge / jnp.maximum(M, EPSILON)) * 1.01

    # Depressed cubic r^3 + p1 r + q1 for R'/4.
    p1 = (a * a - a * L) - 0.5 * C
    # 1e-12 floor: sqrt'(0) is inf and max's clamped-branch tangent is
    # 0, so an exact-zero radicand turns the jvp into 0 * inf = NaN.
    r = jnp.sqrt(jnp.maximum(-p1, 1e-12)) + 1.0  # >= largest root; convex

    for _ in range(iters):
        f = r * (r * r + p1) + 0.5 * M * C
        fp = 3.0 * r * r + p1
        r = r - f / jnp.where(jnp.abs(fp) < EPSILON, EPSILON, fp)
        r = jnp.maximum(r, r_lo)

    R_star = kerr_radial_potential(r, L, Qc, M, a, charge)
    d2 = jnp.maximum(12.0 * r * r + 4.0 * p1, EPSILON)
    return jnp.sign(R_star) * jnp.sqrt(
        2.0 * jnp.abs(R_star) / d2 + 1e-8
    )
