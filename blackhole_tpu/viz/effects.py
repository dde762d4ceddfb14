"""Screen-space visual effects — the visualizer's procedural layer as pure
JAX image ops.

TPU-native equivalent of the reference desktop renderer's non-physical
eye candy (/root/reference/src/visualization/renderer.cpp):

* procedural starfield (renderer.cpp:1349-1378, hash-based)
* screen-space black hole overlay: shadow disc, lensing glow, photon
  ring, Einstein ring arcs, spiral-arm disk with Doppler tint
  (renderer.cpp:1491-1689 `drawBlackHoleOverlay`)
* fragment-shader post effects: radial lensing warp + shimmer
  (renderer.cpp:73-216, the GLSL `blackHole` fragment shader)

These are *compositing* effects for interactive/preview use; the
physically-correct path is blackhole_tpu.render.  All functions map
(H, W, 3) float images in [0,1] to the same, jit/vmap-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from blackhole_tpu.constants import TWO_PI


def _grid(height, width):
    """Pixel-centered NDC grids (y up), aspect-corrected x."""
    ys = (jnp.arange(height) + 0.5) / height * 2.0 - 1.0
    xs = (jnp.arange(width) + 0.5) / width * 2.0 - 1.0
    x, y = jnp.meshgrid(xs * (width / height), -ys)
    return x, y


def _hash01(ix, iy, seed):
    """Integer hash -> [0,1) float, replacing the reference's rand()
    starfield with a reproducible counter-based hash."""
    h = ix * jnp.uint32(374761393) + iy * jnp.uint32(668265263)
    h = (h ^ (h >> 13)) * jnp.uint32(1274126177) + jnp.uint32(seed)
    h = h ^ (h >> 16)
    return (h & jnp.uint32(0xFFFFFF)).astype(jnp.float32) / float(0xFFFFFF)


def starfield(height: int, width: int, density: float = 0.002,
              seed: int = 0):
    """Procedural star background (renderer.cpp:1349-1378): sparse white
    points with hashed brightness, on black."""
    iy = jax.lax.broadcasted_iota(jnp.uint32, (height, width), 0)
    ix = jax.lax.broadcasted_iota(jnp.uint32, (height, width), 1)
    r1 = _hash01(ix, iy, seed)
    r2 = _hash01(ix, iy, seed + 1)
    star = (r1 < density).astype(jnp.float32)
    brightness = 0.4 + 0.6 * r2
    mono = star * brightness
    return jnp.stack([mono, mono, mono], axis=-1)


def starfield_envmap(height: int = 512, width: int = 1024,
                     density: float = 0.0015, seed: int = 0):
    """Equirect starfield panorama for Scene.env_map: sparse stars with
    hashed brightness and a slight blue-white temperature spread, plus a
    faint band along the equator (a toy galactic plane).  Feed to
    Scene(env_map=...) so escaped rays sample a TRUE gravitationally
    lensed background — the physically-correct upgrade of the
    reference's screen-space starfield + warp (renderer.cpp:1349-1378,
    :1491-1689)."""
    iy = jax.lax.broadcasted_iota(jnp.uint32, (height, width), 0)
    ix = jax.lax.broadcasted_iota(jnp.uint32, (height, width), 1)
    r1 = _hash01(ix, iy, seed)
    r2 = _hash01(ix, iy, seed + 1)
    r3 = _hash01(ix, iy, seed + 2)
    star = (r1 < density).astype(jnp.float32)
    brightness = (0.3 + 0.7 * r2) * star
    # Temperature tint: hot stars slightly blue, cool slightly warm.
    tint_b = 0.85 + 0.3 * r3
    tint_r = 1.15 - 0.3 * r3
    rgb = jnp.stack(
        [brightness * tint_r, brightness, brightness * tint_b], axis=-1
    )
    # Faint diffuse band around the equator (v = height/2).
    v = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    band = 0.06 * jnp.exp(-(((v - 0.5) / 0.08) ** 2))
    rgb = rgb + band[:, None, None] * jnp.array([0.5, 0.55, 0.7])
    return jnp.clip(rgb, 0.0, 1.0)


def lensing_warp(image, center=(0.0, 0.0), strength: float = 0.15,
                 radius: float = 0.35):
    """Screen-space gravitational-lensing distortion: pixels near the
    center are pulled radially inward (the GLSL fragment shader's warp,
    renderer.cpp:100-160).  Bilinear resample of the warped coordinates."""
    h, w = image.shape[:2]
    x, y = _grid(h, w)
    dx = x - center[0]
    dy = y - center[1]
    r = jnp.sqrt(dx * dx + dy * dy) + 1e-6
    # Deflection falls off as 1/r outside `radius`, saturates inside.
    defl = strength * radius / jnp.maximum(r, radius * 0.5)
    scale = 1.0 + defl
    sx = center[0] + dx * scale
    sy = center[1] + dy * scale
    # Back to pixel coordinates.
    px = (sx / (w / h) + 1.0) * 0.5 * w - 0.5
    py = (1.0 - (sy + 1.0) * 0.5) * h - 0.5

    px0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, w - 1)
    py0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, h - 1)
    px1 = jnp.clip(px0 + 1, 0, w - 1)
    py1 = jnp.clip(py0 + 1, 0, h - 1)
    fx = jnp.clip(px - px0, 0.0, 1.0)[..., None]
    fy = jnp.clip(py - py0, 0.0, 1.0)[..., None]
    c00 = image[py0, px0]
    c01 = image[py0, px1]
    c10 = image[py1, px0]
    c11 = image[py1, px1]
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def blackhole_overlay(
    height: int,
    width: int,
    shadow_radius: float = 0.18,
    spin: float = 0.0,
    disk: bool = True,
    time: float = 0.0,
):
    """Procedural 2-D black hole sprite (drawBlackHoleOverlay,
    renderer.cpp:1491-1689): shadow disc + photon ring + lensing glow +
    spiral-arm disk with left/right Doppler tint + frame-drag asymmetry.

    Returns (rgb, alpha): composite with  out = rgb + (1-alpha) * bg.
    """
    x, y = _grid(height, width)
    # Frame dragging skews the apparent shadow center (renderer.cpp uses
    # a spin-scaled offset).
    cx = 0.04 * spin
    dx, dy = x - cx, y
    r = jnp.sqrt(dx * dx + dy * dy)
    ang = jnp.arctan2(dy, dx)

    shadow = jnp.clip((shadow_radius - r) / (0.02 * shadow_radius + 1e-6),
                      0.0, 1.0)

    ring_r = 1.3 * shadow_radius
    photon_ring = jnp.exp(-((r - ring_r) / (0.015 + 0.01 * spin)) ** 2)
    glow = 0.35 * jnp.exp(-((r - shadow_radius) / 0.25) ** 2) * (
        r > shadow_radius
    )

    rgb = jnp.zeros((height, width, 3))
    # Glow: warm orange; photon ring: bright white-yellow.
    rgb = rgb + glow[..., None] * jnp.array([1.0, 0.55, 0.2])
    rgb = rgb + photon_ring[..., None] * jnp.array([1.0, 0.95, 0.8])

    if disk:
        # Spiral-arm accretion disk seen at a tilt: squash y by 0.35.
        er = jnp.sqrt(dx * dx + (dy / 0.35) ** 2)
        in_disk = (er > 1.45 * shadow_radius) & (er < 3.6 * shadow_radius)
        spiral = 0.5 + 0.5 * jnp.sin(
            6.0 * ang + 14.0 * er + 2.0 * time
        )
        radial_fade = jnp.clip(
            1.0 - (er - 1.45 * shadow_radius) / (2.2 * shadow_radius),
            0.0, 1.0,
        )
        intensity = in_disk * (0.35 + 0.65 * spiral) * radial_fade
        # Doppler tint: approaching (left for prograde) side brighter/bluer.
        doppler = 1.0 + (0.45 + 0.4 * spin) * jnp.sin(ang)
        col = jnp.stack(
            [
                intensity * 1.0 * doppler,
                intensity * 0.6 * doppler,
                intensity * (0.3 + 0.25 * jnp.clip(doppler - 1.0, 0, 1)),
            ],
            axis=-1,
        )
        rgb = rgb + jnp.clip(col, 0.0, 2.0)

    alpha = jnp.clip(
        shadow + photon_ring + glow + (rgb.max(axis=-1) > 0.02), 0.0, 1.0
    )
    rgb = rgb * (1.0 - shadow[..., None])  # shadow is pure black
    return jnp.clip(rgb, 0.0, 1.0), alpha


def composite_preview(height: int, width: int, shadow_radius=0.18,
                      spin=0.0, time=0.0, seed=0):
    """Full procedural preview frame: starfield background, lensing warp,
    overlay composite — the reference's interactive fallback pipeline
    (updateRayTraceTexture -> drawBlackHoleOverlay)."""
    bg = starfield(height, width, seed=seed)
    bg = lensing_warp(bg, strength=0.25, radius=2.0 * shadow_radius)
    rgb, alpha = blackhole_overlay(
        height, width, shadow_radius, spin, time=time
    )
    return jnp.clip(rgb + (1.0 - alpha[..., None]) * bg, 0.0, 1.0)


def particle_overlay(image, positions, temperatures, active, camera,
                     brightness: float = 0.8):
    """Splat particle point-sprites onto a rendered frame.

    The analog of the reference's particle rendering path — the physics
    thread hands particle arrays to GL point sprites
    (renderer.cpp:1105-1226, fed by bh_get_particle_data).  As there,
    particles are projected with the flat-space pinhole camera (no
    lensing) and drawn additively; color is the blackbody palette of the
    particle temperature (white when temperature is 0).

    image: (H, W, 3); positions (N, 3); temperatures (N,);
    active (N,) bool.  Returns the composited (H, W, 3) image.
    """
    from blackhole_tpu.constants import PI
    from blackhole_tpu.render import camera as cam_mod
    from blackhole_tpu.render import shading

    h, w = image.shape[:2]
    forward, right, up = cam_mod.camera_basis(camera)
    rel = positions - camera.position
    z = rel @ forward
    x = rel @ right
    y = rel @ up

    fov_rad = camera.fov_deg * (PI / 180.0)
    plane_h = 2.0 * jnp.tan(0.5 * fov_rad)
    plane_w = plane_h * (w / h)
    zs = jnp.maximum(z, 1e-3)
    ndc_x = (x / zs) / (0.5 * plane_w)
    ndc_y = (y / zs) / (0.5 * plane_h)
    px = ((ndc_x + 1.0) * 0.5 * w).astype(jnp.int32)
    py = ((1.0 - ndc_y) * 0.5 * h).astype(jnp.int32)

    visible = (
        active & (z > 0.1)
        & (px >= 0) & (px < w) & (py >= 0) & (py < h)
    )
    px = jnp.clip(px, 0, w - 1)
    py = jnp.clip(py, 0, h - 1)

    white = jnp.ones((3,), image.dtype)
    rgb = jnp.where(
        (temperatures > 0.0)[:, None],
        shading.temperature_to_rgb(jnp.maximum(temperatures, 1.0)),
        white,
    )
    # Fade with distance like GL point attenuation.
    fade = brightness / (1.0 + 0.001 * zs * zs)
    splat = (rgb * fade[:, None]) * visible[:, None]
    out = image.at[py, px].add(splat.astype(image.dtype))
    return jnp.clip(out, 0.0, 1.0)
