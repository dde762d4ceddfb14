"""Render a charged, spinning black hole against a lensed starfield.

Two round-3 capabilities in one image: the Kerr-Newman metric family
(Delta = r^2 - 2Mr + a^2 + Q^2; the reference only uses charge in its
horizon formula, spacetime.c:331-366) and true gravitationally-lensed
environment-map backgrounds (escaped rays sample an equirect panorama
along their final deflected direction — stars smear into tangential
arcs around the photon ring, where the reference fakes lensing with a
screen-space warp, renderer.cpp:1491-1689).

    PYTHONPATH=. python examples/lensed_starfield.py --size 512 \
        --spin 0.6 --charge 0.5
"""

import argparse

import numpy as np

from blackhole_tpu.geom.types import BlackHole, Camera, Disk, Scene, SimConfig
from blackhole_tpu.render import image
from blackhole_tpu.viz import effects
from blackhole_tpu.viz import io as viz_io


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spin", type=float, default=0.6)
    ap.add_argument("--charge", type=float, default=0.5)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--density", type=float, default=0.004)
    ap.add_argument("--no-disk", action="store_true")
    ap.add_argument("--out", default="lensed_starfield.png")
    args = ap.parse_args()

    if (args.spin**2 + args.charge**2) > 1.0:
        raise SystemExit("need spin^2 + charge^2 <= 1 (sub-extremal)")

    env = effects.starfield_envmap(512, 1024, density=args.density, seed=7)
    scene = Scene(
        blackhole=BlackHole.create(1.0, args.spin, args.charge),
        disk=Disk.create(6.0, 20.0),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=200.0, max_steps=args.steps
        ),
        disk_enabled=not args.no_disk,
        env_map=env,
    )
    camera = Camera.create(
        position=(0.0, -35.0, 12.0),
        direction=(0.0, 35.0, -12.0),
        up=(0.0, 0.0, 1.0),
        fov_deg=22.0,
    )
    img = image.render_image(
        scene, camera, width=args.size, height=args.size
    )
    viz_io.write_image(args.out, np.asarray(img))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
