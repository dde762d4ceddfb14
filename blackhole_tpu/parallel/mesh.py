"""Device-mesh parallelism: rays sharded across chips, gradients psum-reduced.

The reference has no distribution at all — its batch tracer is a
sequential host loop with an unused `num_threads` parameter
(/root/reference/src/raytracer.c:782-807) and OpenMP is advertised but
never wired (README.md:55,123).  Here distribution is first-class
(SURVEY.md §2 parallelism table):

* A 1-D `Mesh` over the "rays" axis — the data-parallel analog.  Rays
  are embarrassingly parallel, so image rows are sharded across devices
  with NO communication in the forward pass; the only collective is a
  `psum` of scene-parameter gradients in the backward pass (scene params
  are replicated, so shard_map requires the reduction explicitly —
  exactly a DP gradient all-reduce riding ICI).
* Multi-host: `initialize_distributed` wires jax.distributed so the same
  mesh spans pod slices; shardings are identical, XLA routes the psum
  over ICI/DCN.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from blackhole_tpu.geom.types import Camera, Scene
from blackhole_tpu.grad import diff_trace, inverse
from blackhole_tpu.render import camera as cam
from blackhole_tpu.render import trace

RAY_AXIS = "rays"


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (no-op on a single process without args)."""
    if coordinator is not None:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the ray axis using the first n (default all) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def _check_divisible(height: int, n: int):
    if height % n != 0:
        raise ValueError(
            f"image height {height} must be divisible by mesh size {n}"
        )


@partial(jax.jit, static_argnames=("width", "height", "mesh", "spp",
                                   "engine", "depth_sort"))
def render_image_sharded(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    mesh: Mesh,
    spp: int = 1,
    engine: str = "xla",
    depth_sort: bool = False,
):
    """Forward render with rows sharded over the mesh.

    Each device traces height/n rows independently (zero communication);
    the result is a fully-addressable (H, W, 3) array laid out row-sharded.
    engine: "xla" (default — runs everywhere incl. the virtual CPU test
    mesh) or "pallas"/"auto" to run the fused kernel per shard on real
    multi-chip TPU slices ("pallas_interpret" covers the same plumbing
    on the CPU test mesh).
    depth_sort (pallas engines only): each shard runs a strided prepass
    over ITS rays (image.predicted_depth_order_rays) and re-tiles them
    by predicted integration depth — the per-chip analog of the
    single-chip depth-sorted tiling, with zero cross-shard
    communication.
    """
    n = mesh.shape[RAY_AXIS]
    _check_divisible(height, n)

    acc = None
    for s in range(spp):
        ox, oy = cam.jitter_offsets(jnp.int32(s), spp)
        origins, dirs = cam.generate_rays(camera, width, height, ox, oy)
        o = jax.lax.with_sharding_constraint(
            origins, NamedSharding(mesh, P(RAY_AXIS, None, None))
        )
        d = jax.lax.with_sharding_constraint(
            dirs, NamedSharding(mesh, P(RAY_AXIS, None, None))
        )

        def local_trace(o_blk, d_blk):
            from blackhole_tpu.render import image as image_mod

            o_flat = o_blk.reshape(-1, 3)
            d_flat = d_blk.reshape(-1, 3)
            order = None
            if depth_sort and engine in ("pallas", "pallas_interpret"):
                order = image_mod.predicted_depth_order_rays(
                    o_flat, d_flat, scene,
                    interpret=engine == "pallas_interpret",
                )
            hit = image_mod.trace_rays_fast(
                o_flat, d_flat, scene, engine, order=order,
            )
            return hit.color.reshape(o_blk.shape[0], width, 3)

        # Varying-manual-axes checking is ON for the XLA engine (the
        # shard_map default): trace.init_carry derives every per-ray
        # carry plane from the ray state itself, so the while_loop
        # carry is uniformly varying and needs no vma escape hatch.
        # The pallas engines must turn it off: pallas_call re-traces
        # the KERNEL BODY under vma typing, where kernel-internal
        # constants (step coefficients, result codes) are unvarying
        # against varying ref loads — an integration gap JAX's own
        # error message resolves by prescribing check_vma=False.
        # Correctness of that path is pinned by
        # test_parallel.test_sharded_pallas_matches_single_xla.
        frame = jax.shard_map(
            local_trace,
            mesh=mesh,
            in_specs=(P(RAY_AXIS, None, None), P(RAY_AXIS, None, None)),
            out_specs=P(RAY_AXIS, None, None),
            check_vma=engine == "xla",
        )(o, d)
        acc = frame if acc is None else acc + frame
    return acc / spp


@partial(jax.jit, static_argnames=("width", "height", "mesh"))
def loss_and_grad_sharded(
    params: dict,
    target,
    template_scene: Scene,
    template_camera: Camera,
    width: int,
    height: int,
    mesh: Mesh,
):
    """Distributed value_and_grad of the inverse-rendering loss.

    Rays (image rows) are sharded; every device differentiates its own
    row block w.r.t. the *replicated* parameter pytree, then loss and
    grads are psum-reduced across the mesh — the canonical DP pattern.
    """
    n = mesh.shape[RAY_AXIS]
    _check_divisible(height, n)
    rows = jnp.arange(height)

    def local_loss(params_rep, rows_blk, t_blk):
        # Unpack + generate rays INSIDE the shard so gradients w.r.t.
        # camera pose/fov flow through ray generation on every device.
        s, c = inverse.unpack_params(
            params_rep, template_scene, template_camera
        )
        origins, dirs = cam.generate_rays_for_rows(
            c, width, height, rows_blk
        )
        hit = diff_trace.trace_rays_diff(
            origins.reshape(-1, 3), dirs.reshape(-1, 3), s
        )
        img = hit.color.reshape(t_blk.shape)
        # Sum of squared error over the local block; normalized globally.
        return 0.5 * jnp.sum((img - t_blk) ** 2)

    def local_value_and_grad(params_rep, rows_blk, t_blk):
        loss, grads = jax.value_and_grad(local_loss)(
            params_rep, rows_blk, t_blk
        )
        denom = jnp.asarray(target.size, loss.dtype)
        loss = jax.lax.psum(loss, RAY_AXIS) / denom
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, RAY_AXIS) / denom, grads
        )
        return loss, grads

    return jax.shard_map(
        local_value_and_grad,
        mesh=mesh,
        in_specs=(
            P(),  # params replicated
            P(RAY_AXIS),
            P(RAY_AXIS, None, None),
        ),
        out_specs=(P(), P()),
        # Off for THIS call only (the forward path runs with vma
        # checking on): under value_and_grad, jax.jvp materializes the
        # symbolic-zero TANGENT carry of the checkpointed scan as plain
        # unvarying zero splats, while the loop body produces varying
        # tangents — a mismatch created inside AD that callers cannot
        # retype (trace.init_carry already derives every primal plane
        # from varying ray state).  JAX's own error message for this
        # case prescribes check_vma=False as the workaround
        # (jax-ml/jax "Scan carry input and output got mismatched
        # varying manual axes").  Correctness of this path is pinned by
        # test_parallel.test_sharded_grad_matches_single_device.
        check_vma=False,
    )(params, rows, target)


def make_train_step_sharded(optimizer, width: int, height: int, mesh: Mesh):
    """Jitted distributed train step: sharded fwd+bwd, psum grads,
    replicated optimizer update (params stay replicated)."""

    @jax.jit
    def step(params, opt_state, target, template_scene, template_camera):
        loss, grads = loss_and_grad_sharded(
            params, target, template_scene, template_camera,
            width, height, mesh,
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
