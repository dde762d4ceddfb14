"""Animation and progressive rendering.

Replaces the reference visualizer's frame loop capabilities
(/root/reference/src/visualization/renderer.cpp) without OpenGL:

* progressive quality ladder (renderer.cpp:1289-1319: 1/32 -> 1/2
  resolution with rising step budgets) as successive renders,
* orbit-camera animation (renderer.h:385-400 orbit-style camera) to
  numbered PNG frames,
* temporal accumulation across frames reuses render.image.
"""

from __future__ import annotations

import dataclasses
import math
import os

import jax.numpy as jnp
import numpy as np

from blackhole_tpu.geom.types import Camera, Scene
from blackhole_tpu.render import image as image_mod
from blackhole_tpu.viz import io as viz_io

# The reference's quality tiers: (resolution divisor, max steps)
# renderer.cpp:1289-1319.
QUALITY_LADDER = ((32, 20), (16, 30), (8, 40), (4, 50), (2, 50))


def render_progressive(scene: Scene, camera: Camera, width: int,
                       height: int, ladder=QUALITY_LADDER):
    """Yield (divisor, image) pairs of increasing quality — each tier a
    full render at reduced resolution and step budget, upsampled to the
    target size (nearest neighbor, like the reference's texture scaling)."""
    for divisor, steps in ladder:
        w, h = max(8, width // divisor), max(8, height // divisor)
        steps = max(steps, 20)
        # Coarsen the integration step so the reduced budget still covers
        # the same path length (dt_tier * steps ~ dt * max_steps): the
        # low tiers trade accuracy for latency, like the reference's
        # 20-50-step previews (renderer.cpp:1289-1319).
        dt_scale = max(1.0, scene.config.max_steps / steps)
        cfg = dataclasses.replace(
            scene.config,
            max_steps=steps,
            time_step=scene.config.time_step * dt_scale,
        )
        tier_scene = dataclasses.replace(scene, config=cfg)
        img = image_mod.render_image(tier_scene, camera, width=w, height=h)
        up = jnp.repeat(
            jnp.repeat(img, height // h, axis=0), width // w, axis=1
        )
        yield divisor, up[:height, :width]


def orbit_camera(distance: float, elevation_deg: float, azimuth_deg: float,
                 fov_deg: float = 40.0, dtype=jnp.float32) -> Camera:
    """Orbit-style camera aimed at the origin (renderer.h:385-400)."""
    el = math.radians(elevation_deg)
    az = math.radians(azimuth_deg)
    pos = (
        distance * math.cos(el) * math.sin(az),
        -distance * math.cos(el) * math.cos(az),
        distance * math.sin(el),
    )
    return Camera.create(
        position=pos,
        direction=tuple(-p for p in pos),
        up=(0.0, 0.0, 1.0),
        fov_deg=fov_deg,
        dtype=dtype,
    )


def render_orbit_animation(
    scene: Scene,
    out_dir: str,
    n_frames: int = 24,
    width: int = 256,
    height: int = 256,
    distance: float = 35.0,
    elevation_deg: float = 18.0,
    fov_deg: float = 22.0,
    spp: int = 1,
    use_native_io: bool = True,
):
    """Render an azimuthal orbit sweep to out_dir/frame_%04d.png.

    Frames are handed to the native async writer (native/frameio.cpp)
    when it is available, so the device renders frame k+1 while the
    encoder thread writes frame k — the producer/consumer overlap the
    reference implements with its physics/render thread double buffer
    (renderer.cpp:863-1006).  Returns the list of file paths."""
    from blackhole_tpu.viz import native_io

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    writer = (
        native_io.AsyncFrameWriter(width, height)
        if use_native_io and native_io.available()
        else None
    )
    try:
        for k in range(n_frames):
            az = 360.0 * k / n_frames
            cam = orbit_camera(distance, elevation_deg, az, fov_deg)
            img = image_mod.render_image(
                scene, cam, width=width, height=height, spp=spp
            )
            path = os.path.join(out_dir, f"frame_{k:04d}.png")
            if writer is not None:
                writer.submit(np.asarray(img), path)
            else:
                viz_io.write_image(path, np.asarray(img))
            paths.append(path)
    finally:
        if writer is not None:
            writer.close()
    return paths
