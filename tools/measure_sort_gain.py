"""Estimate the throughput gain from sorting rays into step-homogeneous
Pallas tiles.

The fused kernel early-exits per TILE (rows x 128 rays): a tile's
while_loop runs max(steps of its rays) iterations.  With raster-order
pixels, tiles straddling the shadow edge mix 1000-step rays with
100-step rays.  This script renders the bench scene forward-only,
reads back per-ray step counts, and compares

    cost(order) = sum over tiles of max(steps in tile)

for (a) raster order, (b) rays sorted by the analytic impact parameter
b_perp = |o x d_hat| (the proposed cheap key), (c) rays sorted by true
step count (oracle).  (c)/(a) bounds the achievable speedup; (b) close
to (c) means the cheap key suffices.
"""

import numpy as np
import jax
import jax.numpy as jnp

from blackhole_tpu.geom.types import BlackHole, Camera, Disk, Scene, SimConfig
from blackhole_tpu.render import camera as cam
from blackhole_tpu.render import pallas_kernel

W = H = 1024
MAX_STEPS = 1000

scene = Scene(
    blackhole=BlackHole.create(1.0, 0.9),
    disk=Disk.create(6.0, 20.0, 1.0, 1.0),
    config=SimConfig.create(
        time_step=0.1, max_ray_distance=150.0, max_steps=MAX_STEPS
    ),
    disk_enabled=True,
)
camera = Camera.create(
    position=(0.0, -35.0, 12.0),
    direction=(0.0, 35.0, -12.0),
    up=(0.0, 0.0, 1.0),
    fov_deg=22.0,
)

origins, dirs = cam.generate_rays(camera, W, H)
o = np.asarray(origins.reshape(-1, 3))
d = np.asarray(dirs.reshape(-1, 3))

hit = pallas_kernel.trace_rays_pallas(
    jnp.asarray(o), jnp.asarray(d), scene
)
steps = np.asarray(jax.device_get(hit.steps)).reshape(-1)
print("steps: mean %.1f  p50 %d  p90 %d  max %d" % (
    steps.mean(), np.percentile(steps, 50), np.percentile(steps, 90),
    steps.max()))

dn = d / np.linalg.norm(d, axis=1, keepdims=True)
b_perp = np.linalg.norm(np.cross(o, dn), axis=1)

TILE = pallas_kernel.TILE_ROWS * pallas_kernel.TILE_LANES


def tile_cost(s, tile=TILE):
    n = len(s)
    pad = (-n) % tile
    if pad:
        s = np.concatenate([s, np.zeros(pad, s.dtype)])
    return s.reshape(-1, tile).max(axis=1).sum()


c_raster = tile_cost(steps)
c_bperp = tile_cost(steps[np.argsort(b_perp)])
c_oracle = tile_cost(np.sort(steps))
print("tile=%d  raster %d  b_perp-sorted %d (%.2fx)  oracle %d (%.2fx)"
      % (TILE, c_raster, c_bperp, c_raster / c_bperp,
         c_oracle, c_raster / c_oracle))
# Also try other tile sizes to see if sorting unlocks bigger tiles.
for rows in (8, 16, 32, 64):
    t = rows * 128
    print("rows=%2d: raster %8d  b_perp %8d (%.2fx)  oracle %8d (%.2fx)"
          % (rows, tile_cost(steps, t),
             tile_cost(steps[np.argsort(b_perp)], t),
             tile_cost(steps, t) / tile_cost(steps[np.argsort(b_perp)], t),
             tile_cost(np.sort(steps), t),
             tile_cost(steps, t) / tile_cost(np.sort(steps), t)))
