"""Tangent (forward-sensitivity) guard for chaotic geodesic integration.

Null geodesics near the photon shell have positive Lyapunov exponents:
forward-mode sensitivities grow like e^(lambda * steps), and for
near-critical rays they overflow float32 within the step budget (at
1024x1024, a=0.9, ~500 steps: 21 rays' tangents go non-finite and a
single finite "firefly" ray reaches |d color/d mass| ~ 2.5e9 — enough
to poison a mean-loss gradient over 1e6 rays on its own).

The reference engine clamps its *primal* derivatives to +-10 for the
same blow-up reason (raytracer.c:140-153).  Here the primal stays
exact; only the per-ray TANGENT vector is guarded, once per
integration step:

* magnitude above TANGENT_LIMIT  -> rescaled to TANGENT_LIMIT
  (direction preserved; identity below the limit),
* non-finite                     -> zeroed for good.

`tangent_guard` is a custom-JVP identity: free in primal-only
computations (the plain Pallas kernel, un-differentiated traces), and
active inside jax.jvp — both through the XLA while_loop driver
(trace.trace_rays) and inside the tangent-augmented Pallas kernels
(pallas_kernel._make_kernel_jvp*).  Tangent parity between the two
engines is exact for every ray the guard never rescales (the normal
case: factor == 1 below TANGENT_LIMIT); on the rare rescaled rays the
factor itself can differ slightly, because the XLA carry includes the
conserved L's tangent in the magnitude while the Pallas state keeps L
in the unguarded scal planes.  It is intentionally not
reverse-transposable: the
guarded drivers are forward-mode only (reverse mode lives in
grad.diff_trace, which has its own per-step cotangent guard).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Per-ray tangent magnitude cap.  Well-behaved rays' tangents stay
# below ~1e3 on the bench scene (99.9th pct of |d color/d mass| is 142);
# the cap only touches the chaotic tail, and is low enough that no
# single step's Jacobian (bounded by the momentum pinning at |p_r|<=1e7
# and squared-momentum terms in the RHS) can push a guarded tangent to
# float32 overflow before the next guard application.
TANGENT_LIMIT = 1.0e6


def _is_float0(leaf) -> bool:
    return getattr(leaf, "dtype", None) == jax.dtypes.float0


def _guard_tree(dx, ray_ndim: int):
    """Rescale a tangent pytree so each ray's magnitude <= TANGENT_LIMIT.

    ray_ndim: number of leading axes that index rays (shared by every
    float leaf); trailing axes are per-ray components and are reduced.
    float0 leaves (tangents of integer state) pass through untouched.
    """
    leaves = jax.tree_util.tree_leaves(dx)
    mags = []
    for leaf in leaves:
        if _is_float0(leaf):
            continue
        a = jnp.abs(leaf)
        extra = a.ndim - ray_ndim
        for _ in range(extra):
            a = jnp.max(a, axis=-1)
        mags.append(a)
    if not mags:
        return dx
    mag = mags[0]
    for m in mags[1:]:
        mag = jnp.maximum(mag, m)
    factor = TANGENT_LIMIT / jnp.maximum(mag, TANGENT_LIMIT)
    factor = jnp.where(jnp.isfinite(mag), factor, 0.0)

    def apply(leaf):
        if _is_float0(leaf):
            return leaf
        f = factor.reshape(factor.shape + (1,) * (leaf.ndim - ray_ndim))
        # Scrub before scaling: factor=0 alone leaves nan (nan*0=nan).
        return jnp.where(jnp.isfinite(leaf), leaf, 0.0) * f

    return jax.tree_util.tree_map(apply, dx)


@partial(jax.custom_jvp, nondiff_argnums=(0,))
def tangent_guard(ray_ndim: int, tree):
    """Identity on the primal; guards the tangent under jax.jvp."""
    return tree


@tangent_guard.defjvp
def _tangent_guard_jvp(ray_ndim, primals, tangents):
    (x,), (dx,) = primals, tangents
    return x, _guard_tree(dx, ray_ndim)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def cotangent_guard(ray_ndim: int, tree):
    """Reverse-mode analog of tangent_guard: identity on the primal,
    guards the per-ray COTANGENT flowing backward through it.

    The adjoint of a chaotic flow grows at the same Lyapunov rate as
    the forward sensitivity, so reverse-mode through the checkpointed
    scan driver (grad.diff_trace) overflows float32 for photon-shell-
    grazing rays exactly like jvp does.  Place once per integration
    step; reverse-only (jax.jvp through a custom_vjp is undefined —
    the forward drivers use tangent_guard instead)."""
    return tree


def _cotangent_fwd(ray_ndim, tree):
    return tree, None


def _cotangent_bwd(ray_ndim, _res, ct):
    return (_guard_tree(ct, ray_ndim),)


cotangent_guard.defvjp(_cotangent_fwd, _cotangent_bwd)
