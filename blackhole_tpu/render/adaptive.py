"""Edge-contrast adaptive supersampling.

TPU-native equivalent of the reference's edge detector
(/root/reference/src/raytracer.c:940-994 `calculate_edge_factor`) and
the edge buffer that drives its temporal accumulation
(/root/reference/src/visualization/renderer.cpp:1802-1853) — but wired
into the render itself, which the reference never does (its detector is
defined and unused in-engine, SURVEY.md C12).

Strategy (static shapes throughout, XLA/TPU-friendly):
1. base pass: uniform base_spp render,
2. edge map: per-pixel max |mean-channel color difference| against the
   8 neighbors, proportional below `edge_threshold` and saturated at 1
   above it (identical semantics to calculate_edge_factor, with the
   image border clamped to 1.0),
3. refinement pass: the top `edge_fraction` of pixels by edge factor
   (a static-count jnp.top_k) each receive `extra_spp` additional
   Halton-jittered samples, traced as one batch and scatter-averaged
   into the image.

Total rays = n_pix * (base_spp + edge_fraction * extra_spp): the same
quality where the image is smooth, sharply lower variance along the
photon ring / disk edges where the variance actually lives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from blackhole_tpu.geom.types import Camera, Scene
from blackhole_tpu.render import camera as cam
from blackhole_tpu.render import image as image_mod


def edge_factor(image, edge_threshold: float = 0.1):
    """Per-pixel edge factor in [0, 1] (raytracer.c:940-994).

    image: (H, W, 3).  For each interior pixel: the max over the 8
    neighbors of the channel-averaged absolute color difference,
    divided by edge_threshold and clamped at 1.  The 2-pixel image
    border returns 1.0, as in the reference.
    """
    h, w = image.shape[:2]
    max_diff = jnp.zeros(image.shape[:2], image.dtype)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            shifted = jnp.roll(image, (-dy, -dx), axis=(0, 1))
            diff = jnp.mean(jnp.abs(image - shifted), axis=-1)
            max_diff = jnp.maximum(max_diff, diff)
    factor = jnp.minimum(max_diff / edge_threshold, 1.0)
    # Border frame (x <= 1, x >= w-2, y <= 1, y >= h-2) -> 1.0.
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    border = (xs <= 1) | (xs >= w - 2) | (ys <= 1) | (ys >= h - 2)
    return jnp.where(border, 1.0, factor)


@partial(jax.jit, static_argnames=(
    "width", "height", "base_spp", "extra_spp", "edge_fraction",
    "engine",
))
def render_adaptive(
    scene: Scene,
    camera: Camera,
    width: int = 256,
    height: int = 256,
    base_spp: int = 1,
    extra_spp: int = 4,
    edge_fraction: float = 0.125,
    edge_threshold: float = 0.1,
    engine: str = "auto",
):
    """Two-pass edge-adaptive render; returns (image, edge_map).

    Ray budget: width*height*(base_spp + edge_fraction*extra_spp).
    """
    n_pix = width * height
    k = max(1, int(round(edge_fraction * n_pix)))

    base = image_mod.render_image(
        scene, camera, width, height, spp=base_spp, engine=engine
    )
    edges = edge_factor(base, edge_threshold)

    # Static-count selection of the highest-contrast pixels.
    _, flat_idx = jax.lax.top_k(edges.reshape(-1), k)
    pix_y = flat_idx // width
    pix_x = flat_idx % width

    acc = base.reshape(-1, 3)[flat_idx] * base_spp
    for s in range(extra_spp):
        # Continue the Halton sequence where the base pass stopped so
        # refinement samples never repeat base-sample positions.
        ox, oy = cam.jitter_offsets(
            jnp.int32(base_spp + s), base_spp + extra_spp
        )
        o, d = cam.generate_rays_for_pixels(
            camera, width, height, pix_x, pix_y, ox, oy
        )
        hit = image_mod.trace_rays_fast(o, d, scene, engine)
        acc = acc + hit.color
    refined = acc / (base_spp + extra_spp)

    img = base.reshape(-1, 3).at[flat_idx].set(refined).reshape(
        height, width, 3
    )
    return img, edges
