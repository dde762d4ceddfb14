"""Image rendering: supersampling, chunked tracing, temporal accumulation.

TPU-native equivalent of the reference's per-pixel sampling loop
(/root/reference/src/raytracer.c:1044-1167) and the visualizer's temporal
accumulation buffer (/root/reference/src/visualization/renderer.cpp:1691-1877).

The image is traced in row-chunks: each chunk runs its own bounded
while_loop, so spatially-coherent chunks whose rays all terminate early
(far from the shadow edge) stop integrating early — the lockstep-batch
analog of the CPU code's per-ray early exit.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from blackhole_tpu.geom.types import Camera, Integrator, Scene
from blackhole_tpu.render import camera as cam
from blackhole_tpu.render import trace


def predicted_depth_order(scene: Scene, camera: Camera, width: int,
                          height: int, block: int = 8,
                          interpret: bool = False):
    """Depth-sort permutation for the (width x height) pixel rays.

    Renders a (width/block x height/block) prepass through the same
    kernel, takes each pixel's integration step count, widens it with a
    3x3 max filter (so sharp features — the photon ring — cannot hide
    between prepass samples), nearest-upsamples to full resolution, and
    returns argsort(deepest first).  Feeding this permutation to
    trace_rays_pallas / trace_rays_pallas_fwdgrad re-tiles the image so
    each Pallas tile holds rays of similar integration depth, letting
    the per-tile early exit retire shallow tiles hundreds of steps
    sooner: measured 1.39x fewer total loop iterations on the bench
    scene (oracle bound 1.52x, tools/measure_sort_gain2.py), at a
    prepass cost of 1/block^2 of the render.

    The permutation only regroups rays (per-ray math is mask-based and
    lane-independent), so the rendered image is bitwise identical.
    """
    from blackhole_tpu.render import pallas_kernel

    lw = max(width // block, 1)
    lh = max(height // block, 1)
    o, d = cam.generate_rays(camera, lw, lh)
    hit = pallas_kernel.trace_rays_pallas(
        o.reshape(-1, 3), d.reshape(-1, 3), scene, interpret=interpret
    )
    s = hit.steps.reshape(lh, lw).astype(jnp.float32)
    p = jnp.pad(s, 1, mode="edge")
    s3 = s
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s3 = jnp.maximum(s3, p[1 + dy:1 + dy + lh, 1 + dx:1 + dx + lw])
    pred = jnp.repeat(jnp.repeat(s3, block, axis=0), block, axis=1)
    pred = pred[:height, :width]
    if pred.shape != (height, width):  # width/height not multiples of block
        pred = jnp.pad(
            pred,
            ((0, height - pred.shape[0]), (0, width - pred.shape[1])),
            mode="edge",
        )
    return jnp.argsort(-jax.lax.stop_gradient(pred).reshape(-1))


def predicted_depth_order_rays(origins, directions, scene: Scene,
                               stride: int = 64,
                               interpret: bool = False):
    """Depth-sort permutation for an ARBITRARY flat ray batch.

    The image-structured variant (predicted_depth_order) runs a low-res
    prepass and widens with a 2-D max filter; inside shard_map a device
    only sees its flat block of rays, so this variant subsamples every
    `stride`-th ray (row-major blocks stay spatially coherent), traces
    them through the kernel, widens the step counts with a 1-D
    neighborhood max (so sharp features cannot hide between samples),
    and nearest-assigns the prediction back.  Cost: 1/stride of the
    render.  Like the image variant, the permutation only regroups
    rays — traces are bitwise identical after un-permuting.
    """
    from blackhole_tpu.render import pallas_kernel

    o = jnp.asarray(origins).reshape(-1, 3)
    d = jnp.asarray(directions).reshape(-1, 3)
    n = o.shape[0]
    hit = pallas_kernel.trace_rays_pallas(
        o[::stride], d[::stride], scene, interpret=interpret
    )
    s = hit.steps.astype(jnp.float32)
    s = jnp.maximum(s, jnp.maximum(jnp.roll(s, 1), jnp.roll(s, -1)))
    pred = jnp.repeat(s, stride)[:n]
    return jnp.argsort(-jax.lax.stop_gradient(pred))


def trace_rays_fast(origins, directions, scene: Scene, engine: str = "auto",
                    order=None):
    """Forward ray tracing through the fastest available engine.

    engine: "pallas" (fused TPU kernel), "pallas_interpret" (the same
    kernel in interpret mode — CPU-testable, used to exercise the
    kernel under virtual shard_map meshes), "xla" (while_loop path), or
    "auto" — pallas on a TPU backend with the RK4/RKF45 integrators
    (measured ~6x the XLA path on v5e), XLA otherwise.  All engines
    produce the same Hit records (tested to result-code equality).
    Forward-only: the differentiable path is blackhole_tpu.grad.

    Integrator recommendation (PERF.md / CONVERGENCE.md): for
    differentiable rendering and throughput-bound workloads prefer
    SimConfig integrator="rkf45" with tolerance 1e-6 — image-quality
    parity with the RK4 1000-step schedule at ~10x fewer steps,
    measured 2.4x the RK4 fwd+bwd rays/s at 1024^2 (4.7M vs 1.95M,
    v5e).  RK4 remains the default for reference-schedule parity.

    order: optional depth-sort permutation (predicted_depth_order) used
    by the pallas engine; the XLA path ignores it (its single
    while_loop has no tile granularity to exploit).
    """
    if engine == "auto":
        engine = (
            "pallas"
            if (
                jax.default_backend() == "tpu"
                and scene.config.integrator
                in (Integrator.RK4, Integrator.RKF45)
            )
            else "xla"
        )
    if engine in ("pallas", "pallas_interpret"):
        from blackhole_tpu.render import pallas_kernel

        try:
            return pallas_kernel.trace_rays_pallas(
                origins, directions, scene, order=order,
                interpret=engine == "pallas_interpret",
            )
        except Exception:  # noqa: BLE001 — lowering/compile failure
            # Graceful engine fallback, the analog of the reference's
            # GPU -> CPU raytrace fallback when compute shaders are
            # unavailable (renderer.cpp:1880-1887, 2086-2092).  Any
            # Mosaic lowering regression degrades to the XLA path
            # instead of killing the render.  BH_NO_FALLBACK=1 re-raises
            # instead — tests that claim to cover the pallas engine set
            # it so a silent fallback cannot fake coverage.
            if os.environ.get("BH_NO_FALLBACK") == "1":
                raise
            from blackhole_tpu.utils import logging as bh_logging

            bh_logging.get_logger("render").warning(
                "pallas kernel unavailable; falling back to XLA path"
            )
            return trace.trace_rays(origins, directions, scene)
    return trace.trace_rays(origins, directions, scene)


@partial(jax.jit, static_argnames=("width", "height", "spp", "jitter",
                                   "chunks", "engine", "depth_sort"))
def render_image(
    scene: Scene,
    camera: Camera,
    width: int = 256,
    height: int = 256,
    spp: int = 1,
    jitter: str = "halton",
    chunks: int = 1,
    engine: str = "auto",
    depth_sort: bool | None = None,
):
    """Render an RGB image (H, W, 3) in [0, 1].

    spp: samples per pixel, accumulated with Halton sub-pixel jitter
    (raytracer.c:1096-1165).  chunks: split the pixel batch into this many
    sequentially-traced chunks (early-exit granularity; XLA engine only —
    the pallas kernel early-exits per 1024-ray tile internally).
    depth_sort: feed the pallas engine a prepass depth permutation
    (predicted_depth_order); None = auto (on for TPU pallas renders of
    >= 256x256).  One prepass serves every spp sample.
    """
    n_pix = width * height
    assert n_pix % chunks == 0, "chunks must divide width*height"

    resolved = engine
    if resolved == "auto":
        resolved = (
            "pallas"
            if (
                jax.default_backend() == "tpu"
                and scene.config.integrator
                in (Integrator.RK4, Integrator.RKF45)
            )
            else "xla"
        )
    if depth_sort is None:
        depth_sort = resolved == "pallas" and n_pix >= 65536
    order = (
        predicted_depth_order(scene, camera, width, height)
        if depth_sort and resolved == "pallas"
        else None
    )

    def trace_flat(origins, dirs):
        if chunks == 1 or engine != "xla":
            return trace_rays_fast(origins, dirs, scene, engine,
                                   order=order)
        o = origins.reshape(chunks, n_pix // chunks, 3)
        d = dirs.reshape(chunks, n_pix // chunks, 3)
        hit = jax.lax.map(
            lambda od: trace.trace_rays(od[0], od[1], scene), (o, d)
        )
        return jax.tree_util.tree_map(
            lambda x: x.reshape((n_pix,) + x.shape[2:]), hit
        )

    acc = jnp.zeros((height, width, 3))
    for s in range(spp):
        ox, oy = cam.jitter_offsets(jnp.int32(s), spp, method=jitter)
        origins, dirs = cam.generate_rays(camera, width, height, ox, oy)
        hit = trace_flat(origins.reshape(-1, 3), dirs.reshape(-1, 3))
        acc = acc + hit.color.reshape(height, width, 3)
    return acc / spp


@partial(jax.jit, static_argnames=("width", "height"))
def render_hits(scene: Scene, camera: Camera, width: int, height: int):
    """Render and return the full Hit record grid (H, W) — the analog of
    filling a RayTraceHit per pixel."""
    origins, dirs = cam.generate_rays(camera, width, height)
    return trace.trace_rays(origins, dirs, scene)


def temporal_accumulate(history, frame, frame_index, blend_factor=0.1,
                        max_frames=32):
    """Exponential temporal accumulation (renderer.cpp:1691-1877).

    history: running average (H, W, 3); frame: new frame; frame_index:
    int frames accumulated so far.  Early frames blend fast (alpha 1.0 on
    the first frame, 0.5 on the second), then settle to `blend_factor`,
    and accumulation saturates at `max_frames` — matching the reference's
    adaptive-alpha schedule (renderer.cpp:39-48).

    Returns (new_history, new_frame_index).
    """
    alpha = jnp.where(
        frame_index == 0,
        1.0,
        jnp.where(frame_index == 1, 0.5, blend_factor),
    )
    alpha = jnp.where(frame_index >= max_frames, blend_factor, alpha)
    out = history * (1.0 - alpha) + frame * alpha
    return out, jnp.minimum(frame_index + 1, max_frames)


def render_accumulated(scene: Scene, camera: Camera, width, height,
                       n_frames=8, blend_factor=0.1, max_frames=32):
    """Progressive multi-frame accumulation as a pure scan: each frame
    uses the next Halton jitter index (renderer.cpp progressive loop)."""

    def frame_fn(carry, s):
        history, idx = carry
        ox, oy = cam.jitter_offsets(s, n_frames)
        origins, dirs = cam.generate_rays(camera, width, height, ox, oy)
        hit = trace.trace_rays(
            origins.reshape(-1, 3), dirs.reshape(-1, 3), scene
        )
        frame = hit.color.reshape(height, width, 3)
        history, idx = temporal_accumulate(
            history, frame, idx, blend_factor, max_frames
        )
        return (history, idx), None

    init = (jnp.zeros((height, width, 3)), jnp.int32(0))
    (out, _), _ = jax.lax.scan(
        frame_fn, init, jnp.arange(n_frames, dtype=jnp.int32)
    )
    return out
