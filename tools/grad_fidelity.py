"""Gradient fidelity: pathwise d(MSE)/d(mass) vs central finite differences.

The BASELINE.md correctness row demands pixel-parameter gradients that
track a finite-difference reference.  Pathwise AD through the geodesic
integrator misses *visibility* terms (capture/escape flips, disk
enter/exit flips); the soft-boundary stack (SimConfig.shadow_softness:
min_r shadow survival + annulus edge window + crossing opacity) restores
them.  This tool measures how much of the FD gradient the estimator now
captures at the PERF.md experiment scale (256^2, Kerr a=0.9, oblique
camera, target at m=1.0, eval on both sides of the optimum).

Run on TPU (fast) or CPU (slow, use GF_SIZE=64):
    python tools/grad_fidelity.py
Env: GF_SIZE (256), GF_SOFT (0.3), GF_STEPS (800), GF_ENGINE (auto),
     GF_CLIP (fast_grad.TANGENT_CLIP)

History (AD/FD of d loss/d mass at m=1.03, failing direction, 256^2):
  hard edge raw:          WRONG SIGN
  + guard + clip:         right sign, tiny
  + soft boundaries r3:   0.73
  + crossing opacity r4:  0.70 (the 48^2 0.95 did not hold at scale)
  + analytic margin r5:   0.98 / 1.03 (m=1.03 / m=0.98, clip 15) —
    see PERF.md r5 section and tools/grad_decompose.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

if os.environ.get("GF_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GF_PLATFORM"])
# No persistent compilation cache: on the axon-relayed TPU a cache HIT
# deserializes at 125-488 s per multi-MB executable while a cold compile
# is ~5 s remote (measured r5) — the cache made this tool ~19 min/run.

from blackhole_tpu.geom.types import (  # noqa: E402
    BlackHole, Camera, Disk, Scene, SimConfig,
)
from blackhole_tpu.render import camera as cam  # noqa: E402
from blackhole_tpu.render import image as image_mod  # noqa: E402

SIZE = int(os.environ.get("GF_SIZE", "256"))
SOFT = float(os.environ.get("GF_SOFT", "0.3"))
STEPS = int(os.environ.get("GF_STEPS", "800"))
ENGINE = os.environ.get("GF_ENGINE", "auto")
CLIP = float(os.environ.get("GF_CLIP", "0")) or None


def make_scene(mass, soft=SOFT):
    return Scene(
        blackhole=BlackHole.create(mass, 0.9),
        disk=Disk.create(6.0, 20.0),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=150.0, max_steps=STEPS,
            shadow_softness=soft,
        ),
        disk_enabled=True,
    )


def main():
    camera = Camera.create(
        position=(0.0, -35.0, 12.0), direction=(0.0, 35.0, -12.0),
        up=(0.0, 0.0, 1.0), fov_deg=22.0,
    )
    o, d = cam.generate_rays(camera, SIZE, SIZE)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)

    from blackhole_tpu.grad import fast_grad

    @jax.jit
    def render(mass):
        s = make_scene(mass)
        hit = image_mod.trace_rays_fast(o, d, s, ENGINE)
        # Same TANGENT_CLIP winsorized estimator as grad.fast_grad
        # (identity on the primal, so FD evaluations are untouched).
        if CLIP is None:
            return fast_grad.clip_color_tangent(hit).color
        return fast_grad.clip_color_tangent(hit, clip=CLIP).color

    target = jax.block_until_ready(render(jnp.float32(1.0)))

    def loss(mass):
        img = render(mass)
        return 0.5 * jnp.mean((img - target) ** 2)

    out = {"size": SIZE, "soft": SOFT, "steps": STEPS, "clip": CLIP,
           "platform": jax.devices()[0].platform}
    for m0, eps in ((1.03, 3e-3), (0.98, 3e-3)):
        m0 = jnp.float32(m0)
        _, dv = jax.jvp(loss, (m0,), (jnp.float32(1.0),))
        fd = (float(loss(m0 + eps)) - float(loss(m0 - eps))) / (2 * eps)
        dv = float(dv)
        out[f"m{float(m0):.2f}"] = {
            "ad": round(dv, 6), "fd": round(fd, 6),
            "ratio": round(dv / fd, 4) if fd != 0 else None,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
