"""Few-parameter gradients via forward mode through the Pallas kernel.

The headline differentiable-rendering workload (BASELINE config 5 / the
bench) needs d(loss)/d(params) for a handful of scalars — mass, spin,
disk radii, camera pose components.  Reverse mode must checkpoint and
re-integrate the geodesic scan with no early exit
(blackhole_tpu.grad.diff_trace); forward mode instead propagates one
tangent per parameter *inside* the fused Pallas kernel
(render.pallas_kernel._make_kernel_jvp): full per-tile early exit, no
rematerialization, ~2-3x the plain forward kernel per direction.  For
k <= ~10 parameters this is the fast path by one to two orders of
magnitude; for many-parameter problems use diff_trace/bucketed.

The reference C engine has no differentiability at all (SURVEY.md §2
parallelism table, last row); this module is part of the new capability
that motivates the TPU build.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

# Default per-component winsorization of color tangents.  Near-critical
# (photon-shell-grazing) rays are chaotic: their pathwise tangents are
# finite (integrate.sensitivity caps them) but orders of magnitude
# beyond the smooth population and carry no usable signal — the
# underlying map is discontinuous at that scale, so they enter an
# aggregate loss as heavy-tailed noise (measured: they flip the SIGN of
# d(MSE)/d(mass) at 256^2).  15 was chosen by decomposition against
# per-pixel finite differences at 256^2/800 steps/soft 0.3 (r5,
# tools/grad_decompose.py, with the analytic capture-margin boundary):
# the genuine tangent population ends at |d| ~ 21-27 (its q0.999) and
# AD/FD of d(MSE)/d(mass) reads 0.98/1.03 on the two sides of the
# optimum at clip 15 (0.90/0.93 at 10, 1.02/1.07 at 30 — beyond that
# the chaos tail inflates the estimate).  Pass tangent_clip=None for
# the raw estimator.
TANGENT_CLIP = 15.0


def _clip_hit_tangent(dhit, clip):
    if clip is None:
        return dhit
    return dataclasses.replace(
        dhit, color=jnp.clip(dhit.color, -clip, clip)
    )


@functools.partial(jax.custom_jvp, nondiff_argnums=(1,))
def clip_color_tangent(hit, clip=TANGENT_CLIP):
    """Identity on the primal Hit; winsorizes the COLOR tangent under
    jax.jvp (same TANGENT_CLIP estimator scene_value_and_grad /
    render_value_and_grad apply).  Insert between the trace and the
    loss when differentiating with value_and_grad_fwd so the
    one-jvp-per-parameter path computes the same clipped estimator as
    the multi-tangent paths.  clip=None is the raw estimator."""
    return hit


@clip_color_tangent.defjvp
def _clip_color_tangent_jvp(clip, primals, tangents):
    (hit,), (dhit,) = primals, tangents
    return hit, _clip_hit_tangent(dhit, clip)


def _flatten_scalars(params):
    """Flatten a pytree into a list of scalar components.

    Returns (values, rebuild) where values is a list of () arrays and
    rebuild(list) -> pytree.  Array leaves are split per component so
    every tangent direction is a single scalar.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = [jnp.shape(l) for l in leaves]
    sizes = [int(jnp.size(l)) for l in leaves]
    values = []
    for leaf, size in zip(leaves, sizes):
        flat = jnp.reshape(jnp.asarray(leaf), (-1,))
        values.extend(flat[i] for i in range(size))

    def rebuild(vals):
        out = []
        k = 0
        for shape, size, leaf in zip(shapes, sizes, leaves):
            dtype = jnp.asarray(leaf).dtype
            out.append(
                jnp.reshape(
                    jnp.stack([jnp.asarray(v, dtype) for v in
                               vals[k:k + size]]), shape
                )
            )
            k += size
        return jax.tree_util.tree_unflatten(treedef, out)

    return values, rebuild


def value_and_grad_fwd(fun):
    """Forward-mode value_and_grad for functions of few scalars.

    fun(params, *args) -> scalar loss, params a pytree of scalars/small
    arrays.  Returns g(params, *args) -> (loss, grads) computed with one
    jax.jvp per scalar component of params — each jvp runs the
    tangent-augmented Pallas kernel when fun renders through
    trace_rays_pallas / image.trace_rays_fast.

    Unlike jax.jacfwd this never vmaps over tangents (the Pallas kernel
    is specialized to a single tangent set), and unlike
    jax.value_and_grad it never transposes the integrator.

    Estimator note: because fun is opaque (params -> scalar), this path
    cannot winsorize the rendered color tangents itself the way
    scene_value_and_grad / render_value_and_grad do (TANGENT_CLIP).
    For the same clipped estimator, apply `clip_color_tangent` to the
    Hit inside fun, between the trace and the loss; without it this
    computes the RAW estimator, which keeps the heavy-tailed firefly
    tangents the clip exists to remove.
    """

    def value_and_grad(params, *args):
        values, rebuild = _flatten_scalars(params)
        n = len(values)

        def f_flat(vals):
            return fun(rebuild(vals), *args)

        loss = None
        grads = []
        for i in range(n):
            tangent = [
                jnp.ones_like(v) if j == i else jnp.zeros_like(v)
                for j, v in enumerate(values)
            ]
            loss, dv = jax.jvp(f_flat, (values,), (tangent,))
            grads.append(dv)
        return loss, rebuild(grads)

    return value_and_grad


def render_value_and_grad(loss_of_hit, setup_fn, interpret: bool = False,
                          tangent_clip=TANGENT_CLIP):
    """Forward-mode value_and_grad when the RAYS also depend on params.

    setup_fn(params) -> (scene, origins, dirs): ray generation is part
    of the differentiated graph, so camera-pose/fov gradients flow —
    all through ONE multi-tangent kernel pass.  Returns
    g(params) -> (loss, grads).
    """
    from blackhole_tpu.render import pallas_kernel

    def value_and_grad(params, order=None):
        values, rebuild = _flatten_scalars(params)

        def build(vals):
            return setup_fn(rebuild(vals))

        scene, origins, dirs = build(values)
        tangents = []
        for i in range(len(values)):
            basis = [
                jnp.ones_like(v) if j == i else jnp.zeros_like(v)
                for j, v in enumerate(values)
            ]
            _, (dscene, do, dd) = jax.jvp(build, (values,), (basis,))
            tangents.append((dscene, do, dd))

        hit, dhits = pallas_kernel.trace_rays_pallas_fwdgrad(
            origins, dirs, scene, tangents, interpret=interpret,
            order=order,
        )
        loss = None
        grads = []
        for dhit in dhits:
            dhit = _clip_hit_tangent(dhit, tangent_clip)
            loss, dl = jax.jvp(loss_of_hit, (hit,), (dhit,))
            grads.append(dl)
        return loss, rebuild(grads)

    return value_and_grad


def scene_value_and_grad(loss_of_hit, scene_fn, interpret: bool = False,
                         tangent_clip=TANGENT_CLIP):
    """Forward-mode value_and_grad through ONE multi-tangent kernel pass.

    scene_fn(params) -> Scene; loss_of_hit(hit) -> scalar.  Returns
    g(params, origins, dirs) -> (loss, grads).  Where value_and_grad_fwd
    runs one tangent-augmented kernel per parameter (cost n*(P+T)),
    this propagates all n tangents together inside
    pallas_kernel.trace_rays_pallas_fwdgrad (cost P + n*T) — the fast
    path for the bench's (mass, spin) gradient and inverse-rendering
    workloads.
    """
    from blackhole_tpu.render import pallas_kernel

    def value_and_grad(params, origins, dirs, order=None):
        values, rebuild = _flatten_scalars(params)

        def build(vals):
            return scene_fn(rebuild(vals))

        scene = build(values)
        tangents = []
        for i in range(len(values)):
            basis = [
                jnp.ones_like(v) if j == i else jnp.zeros_like(v)
                for j, v in enumerate(values)
            ]
            _, dscene = jax.jvp(build, (values,), (basis,))
            tangents.append(dscene)

        hit, dhits = pallas_kernel.trace_rays_pallas_fwdgrad(
            origins, dirs, scene, tangents, interpret=interpret,
            order=order,
        )
        loss = None
        grads = []
        for dhit in dhits:
            dhit = _clip_hit_tangent(dhit, tangent_clip)
            loss, dl = jax.jvp(loss_of_hit, (hit,), (dhit,))
            grads.append(dl)
        return loss, rebuild(grads)

    return value_and_grad
