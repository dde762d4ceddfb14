"""Pinhole camera ray generation with sub-pixel jitter.

TPU-native equivalent of /root/reference/src/raytracer.c:852-1039
(`halton_sequence`, `generate_jittered_position`,
`calculate_ray_direction`).  Rays for the whole image are produced as one
batched array op (the reference loops per pixel per sample).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from blackhole_tpu.constants import PI
from blackhole_tpu.geom import coords
from blackhole_tpu.geom.types import Camera, Jitter


def halton(index, base):
    """Radical-inverse Halton sequence (raytracer.c:852-863).

    index: int array (...,); base: python int prime.  Vectorized via a
    fixed-depth digit expansion (32 digits covers any int32 index).
    """
    index = jnp.asarray(index, jnp.int32)
    result = jnp.zeros(index.shape, jnp.float32)
    f = jnp.ones(index.shape, jnp.float32)
    i = index

    def body(_, carry):
        result, f, i = carry
        f = f / base
        result = result + f * (i % base).astype(jnp.float32)
        i = i // base
        return result, f, i

    # 32 iterations always reduce an int32 index to 0 for base >= 2.
    result, _, _ = jax.lax.fori_loop(0, 32, body, (result, f, i))
    return result


def jitter_offsets(sample_idx, samples_per_pixel, method=Jitter.HALTON,
                   strength=1.0, key=None):
    """Sub-pixel offsets in [0,1)^2 for one sample index
    (raytracer.c:868-932).  Returns (offset_x, offset_y) scalars/arrays.
    """
    if method == Jitter.NONE or samples_per_pixel <= 1:
        ox = jnp.float32(0.5)
        oy = jnp.float32(0.5)
    elif method == Jitter.REGULAR_GRID:
        grid = max(int(samples_per_pixel**0.5), 1)
        x = sample_idx % grid
        y = sample_idx // grid
        ox = (x + 0.5) / grid
        oy = (y + 0.5) / grid
    elif method == Jitter.RANDOM:
        if key is None:
            key = jax.random.PRNGKey(0)
        ox, oy = jax.random.uniform(key, (2,))
    else:  # HALTON and BLUE_NOISE (reference falls back to Halton too).
        ox = halton(sample_idx, 2)
        oy = halton(sample_idx, 3)
    # Jitter strength scales offsets about the pixel center
    # (raytracer.c:927-932).
    ox = 0.5 + (ox - 0.5) * strength
    oy = 0.5 + (oy - 0.5) * strength
    return ox, oy


def camera_basis(camera: Camera):
    """Orthonormal (forward, right, up) basis (raytracer.c:1016-1023)."""
    forward = coords.normalize(camera.direction)
    right = coords.normalize(jnp.cross(forward, camera.up))
    up = jnp.cross(right, forward)
    return forward, right, up


def generate_rays_for_rows(camera: Camera, width: int, height: int, rows,
                           offset_x=0.5, offset_y=0.5):
    """Primary rays for the given image rows (int array (R,)).

    Returns (origins, directions), each (R, W, 3).  Used by the sharded
    renderer so each device generates its own row block *inside* the
    shard — keeping camera-pose gradients flowing through ray generation
    on-device rather than materializing all rays on the host.
    """
    forward, right, up = camera_basis(camera)
    aspect = width / height
    fov_rad = camera.fov_deg * (PI / 180.0)
    plane_h = 2.0 * jnp.tan(0.5 * fov_rad)
    plane_w = plane_h * aspect

    px = jnp.arange(width, dtype=jnp.float32)
    py = jnp.asarray(rows, jnp.float32)
    ndc_x = (2.0 * (px[None, :] + offset_x) / width - 1.0) * plane_w
    ndc_y = (1.0 - 2.0 * (py[:, None] + offset_y) / height) * plane_h

    d = (
        forward[None, None, :]
        + ndc_x[..., None] * right[None, None, :]
        + ndc_y[..., None] * up[None, None, :]
    )
    directions = coords.normalize(d)
    origins = jnp.broadcast_to(camera.position, directions.shape)
    return origins, directions


def generate_rays_for_pixels(camera: Camera, width: int, height: int,
                             pix_x, pix_y, offset_x=0.5, offset_y=0.5):
    """Primary rays for an arbitrary pixel subset.

    pix_x/pix_y: int arrays (N,); offsets scalar or (N,).  Returns
    (origins, directions) of shape (N, 3).  Used by the adaptive sampler
    to shoot extra rays only at high-contrast pixels."""
    forward, right, up = camera_basis(camera)
    aspect = width / height
    fov_rad = camera.fov_deg * (PI / 180.0)
    plane_h = 2.0 * jnp.tan(0.5 * fov_rad)
    plane_w = plane_h * aspect

    px = jnp.asarray(pix_x, jnp.float32)
    py = jnp.asarray(pix_y, jnp.float32)
    ndc_x = (2.0 * (px + offset_x) / width - 1.0) * plane_w
    ndc_y = (1.0 - 2.0 * (py + offset_y) / height) * plane_h
    d = (
        forward[None, :]
        + ndc_x[..., None] * right[None, :]
        + ndc_y[..., None] * up[None, :]
    )
    directions = coords.normalize(d)
    origins = jnp.broadcast_to(camera.position, directions.shape)
    return origins, directions


def generate_rays(camera: Camera, width: int, height: int,
                  offset_x=0.5, offset_y=0.5):
    """Primary rays for a width x height image.

    Returns (origins, directions), each (H, W, 3).  NDC mapping matches
    raytracer.c:1026-1038: y flipped so row 0 is the top of the image,
    plane_height = 2 tan(fov/2), plane_width = aspect * plane_height.
    """
    return generate_rays_for_rows(
        camera, width, height, jnp.arange(height), offset_x, offset_y
    )
