"""Decompose the pathwise gradient estimator against finite differences.

The r4 plateau (VERDICT r4 weak #1): AD/FD of d(MSE)/d(mass) at
256^2/800 steps/soft 0.3 reads ~0.70 on the m=1.03 side.  The suspects
are the TANGENT_CLIP winsorization bias and the chaotic photon-shell
tangent tail (PERF.md).  Instead of one opaque AD number per estimator
variant (one slow TPU jvp each), this tool extracts the RAW per-pixel
color tangent image ONCE per side and then evaluates every estimator as
numpy post-processing:

    d(MSE)/dm = mean over pixels of (img - target) . T(dimg)

for T in {identity, fixed clip c, per-image quantile clip, smooth
min_r-window suppression x clip, ...} — because every estimator in
grad.fast_grad acts on the color tangent AFTER the trace, with the
primal untouched.

Run on TPU:  python tools/grad_decompose.py
Env: GD_SIZE (256), GD_SOFT (0.3), GD_STEPS (800), GD_EVALS
     ("1.03,0.98"), GD_EPS (3e-3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("GD_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GD_PLATFORM"])

from blackhole_tpu.geom.types import (  # noqa: E402
    BlackHole, Camera, Disk, Scene, SimConfig,
)
from blackhole_tpu.metrics import derived  # noqa: E402
from blackhole_tpu.render import camera as cam  # noqa: E402
from blackhole_tpu.render import image as image_mod  # noqa: E402

SIZE = int(os.environ.get("GD_SIZE", "256"))
SOFT = float(os.environ.get("GD_SOFT", "0.3"))
STEPS = int(os.environ.get("GD_STEPS", "800"))
EVALS = [float(x) for x in os.environ.get("GD_EVALS", "1.03,0.98").split(",")]
EPS = float(os.environ.get("GD_EPS", "3e-3"))
SPIN = 0.9


def make_scene(mass):
    return Scene(
        blackhole=BlackHole.create(mass, SPIN),
        disk=Disk.create(6.0, 20.0),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=150.0, max_steps=STEPS,
            shadow_softness=SOFT,
        ),
        disk_enabled=True,
    )


def main():
    t0 = time.perf_counter()
    camera = Camera.create(
        position=(0.0, -35.0, 12.0), direction=(0.0, 35.0, -12.0),
        up=(0.0, 0.0, 1.0), fov_deg=22.0,
    )
    o, d = cam.generate_rays(camera, SIZE, SIZE)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)

    @jax.jit
    def render_raw(mass):
        """(color, min_r) with NO estimator transform."""
        hit = image_mod.trace_rays_fast(o, d, make_scene(mass), "auto")
        return hit.color, hit.min_r

    def color_and_tangent(mass):
        (c, mr), (dc, _dmr) = jax.jvp(
            render_raw, (jnp.float32(mass),), (jnp.float32(1.0),)
        )
        return np.asarray(c), np.asarray(mr), np.asarray(dc)

    target, _, _ = color_and_tangent(1.0)
    print(f"# target rendered +{time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)

    out = {"size": SIZE, "soft": SOFT, "steps": STEPS, "eps": EPS,
           "platform": jax.devices()[0].platform}
    n = target.size

    dump = os.environ.get("GD_DUMP")
    for m0 in EVALS:
        color, min_r, dcol = color_and_tangent(m0)
        resid = color - target  # (N, 3)

        # FD reference (identity estimator on the primal).
        cp = np.asarray(render_raw(jnp.float32(m0 + EPS))[0])
        cm = np.asarray(render_raw(jnp.float32(m0 - EPS))[0])
        lp = 0.5 * float(np.mean((cp - target) ** 2))
        lm = 0.5 * float(np.mean((cm - target) ** 2))
        fd = (lp - lm) / (2 * EPS)
        if dump:
            np.savez(
                f"{dump}_m{m0:.2f}.npz", color=color, target=target,
                dcol=dcol, min_r=min_r, cp=cp, cm=cm,
                fdcol=(cp - cm) / (2 * EPS),
            )

        def ad(T):
            return float(np.sum(resid * T) / n)

        a = np.abs(dcol)
        r_ph_pro = float(derived.kerr_photon_orbit_radius(
            jnp.float32(m0), jnp.float32(SPIN), 1.0))
        r_ph_ret = float(derived.kerr_photon_orbit_radius(
            jnp.float32(m0), jnp.float32(SPIN), -1.0))
        # distance of each ray's periapsis to the NEAREST photon orbit
        dist_ph = np.minimum(np.abs(min_r - r_ph_pro),
                             np.abs(min_r - r_ph_ret))

        res = {
            "fd": round(fd, 6),
            "tangent_abs_q": {str(q): float(np.quantile(a, q))
                              for q in (0.9, 0.99, 0.999, 0.9999, 1.0)},
        }

        def rec(name, T):
            v = ad(T)
            res[name] = {"ad": round(v, 6),
                         "ratio": round(v / fd, 4) if fd else None}

        rec("raw", dcol)
        for c in (3.0, 10.0, 30.0, 100.0, 300.0):
            rec(f"clip{c:g}", np.clip(dcol, -c, c))
        # Per-image quantile clips (scale-aware winsorization).
        for q, k in ((0.999, 1.0), (0.999, 3.0), (0.9999, 1.0)):
            c = float(np.quantile(a, q)) * k
            rec(f"qclip_{q}x{k:g}", np.clip(dcol, -c, c))
        # Smooth photon-shell suppression: damp the tangent of rays
        # whose periapsis sits within `w` of a photon orbit (their
        # pathwise tangents are chaotic noise; the soft shadow factor
        # carries that boundary's true gradient), then clip.
        for w in (0.1, 0.3, 0.6):
            sup = 1.0 / (1.0 + np.exp(-(dist_ph / w - 2.0)))
            for c in (10.0, 100.0):
                rec(f"sup{w:g}_clip{c:g}",
                    np.clip(dcol * sup[:, None], -c, c))
        # Diagnostics: who carries the AD mass?  contribution of rays
        # near the shell vs far, under clip10.
        t10 = np.clip(dcol, -10.0, 10.0)
        near = dist_ph < 0.5
        res["clip10_near_shell_share"] = round(
            float(np.sum(resid[near] * t10[near]) / n), 6)
        res["n_near_shell"] = int(near.sum())
        out[f"m{m0:.2f}"] = res
        print(f"# m={m0} done +{time.perf_counter() - t0:.0f}s",
              file=sys.stderr, flush=True)

    out["elapsed_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
