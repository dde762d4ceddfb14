"""Differentiable geodesic tracing — reverse-mode through the integrator.

The forward renderer (blackhole_tpu.render.trace) drives the masked step
function with `lax.while_loop`, which XLA cannot reverse-differentiate.
This module re-drives the *same* step function with a two-level
checkpointed `lax.scan` (sqrt-schedule rematerialization): the outer scan
stores one carry per segment, the inner scan recomputes its steps during
the backward pass.  Memory is O(sqrt(max_steps)) carries instead of
O(max_steps) — the "checkpointed re-integration" strategy called for by
the design blueprint (SURVEY.md §7 hard-part 2); the reference C engine
has no differentiability at all (this capability is new).

Gradient flow notes:
* Hit events (horizon / disk / escape) are discrete in *which* branch is
  taken but the hit position, shading inputs, and colors are smooth
  functions of scene parameters within a branch, so d(pixels)/d(M, a,
  disk, camera) is well-defined almost everywhere — exactly the regime
  inverse rendering needs.
* All masking uses jnp.where over finite operands (frozen lanes hold
  their last valid state), so no NaNs enter the cotangent stream.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from blackhole_tpu.geom.types import Camera, Scene
from blackhole_tpu.integrate import sensitivity
from blackhole_tpu.render import camera as cam
from blackhole_tpu.render import trace


def trace_rays_diff(origins, directions, scene: Scene, segments: int = 0):
    """Differentiable equivalent of trace.trace_rays.

    Runs exactly ceil(max_steps / inner) * inner masked steps (no early
    exit — reverse-mode needs the full unrolled schedule anyway).
    segments: outer checkpoint count; 0 -> ceil(sqrt(max_steps)).
    """
    batch_shape = origins.shape[:-1]
    o = origins.reshape(-1, 3)
    d = directions.reshape(-1, 3)
    step_fn, adaptive = trace.make_step_fn(scene)
    carry0 = trace.init_carry(o, d, scene)
    max_steps = scene.config.max_steps
    n_seg = segments or max(1, int(round(math.sqrt(max_steps))))
    inner = max_steps // n_seg
    remainder = max_steps - n_seg * inner  # exact parity with while_loop

    def inner_body(c, _):
        # Per-step cotangent guard (integrate.sensitivity): identity
        # forward; during the backward sweep it rescales each ray's
        # cotangent to TANGENT_LIMIT and zeroes non-finite ones — the
        # reverse-mode twin of the tangent guard in trace.trace_rays /
        # the Pallas jvp kernels.
        c = sensitivity.cotangent_guard(1, c)
        return trace.trace_step(c, scene, step_fn, adaptive), None

    @jax.checkpoint
    def segment(c, _):
        c, _ = jax.lax.scan(inner_body, c, None, length=inner)
        return c, None

    carry = carry0
    if inner > 0:
        carry, _ = jax.lax.scan(segment, carry, None, length=n_seg)
    if remainder > 0:
        tail = jax.checkpoint(
            lambda c: jax.lax.scan(inner_body, c, None, length=remainder)[0]
        )
        carry = tail(carry)
    margin = (
        trace.compute_capture_margin(o, d, scene)
        if float(scene.config.shadow_softness) > 0.0 else None
    )
    hit = trace.finalize(carry, scene, margin=margin)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(batch_shape + x.shape[1:]), hit
    )


@partial(jax.jit, static_argnames=("width", "height", "segments"))
def render_image_diff(
    scene: Scene,
    camera: Camera,
    width: int = 64,
    height: int = 64,
    segments: int = 0,
):
    """Differentiable render: RGB (H, W, 3) as a smooth function of
    (scene, camera) pytree leaves.  Single-sample (jitter-free) so the
    pixel map itself is deterministic."""
    origins, dirs = cam.generate_rays(camera, width, height)
    hit = trace_rays_diff(
        origins.reshape(-1, 3), dirs.reshape(-1, 3), scene, segments
    )
    return hit.color.reshape(height, width, 3)
