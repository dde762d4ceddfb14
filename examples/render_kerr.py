"""Render a Kerr a=0.9 accretion-disk image and write a PNG.

Runs on any backend; on TPU the fused Pallas kernel is selected
automatically (render.image.trace_rays_fast).

    PYTHONPATH=. python examples/render_kerr.py --size 512 --spin 0.9
"""

import argparse

import numpy as np

from blackhole_tpu.geom.types import BlackHole, Camera, Disk, Scene, SimConfig
from blackhole_tpu.render import image
from blackhole_tpu.viz import io as viz_io


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spin", type=float, default=0.9)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--out", default="kerr.png")
    args = ap.parse_args()

    scene = Scene(
        blackhole=BlackHole.create(1.0, args.spin),
        disk=Disk.create(6.0, 20.0),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=150.0, max_steps=args.steps
        ),
        disk_enabled=True,
    )
    camera = Camera.create(
        position=(0.0, -35.0, 12.0),
        direction=(0.0, 35.0, -12.0),
        up=(0.0, 0.0, 1.0),
        fov_deg=22.0,
    )
    img = image.render_image(
        scene, camera, width=args.size, height=args.size, spp=args.spp
    )
    viz_io.write_image(args.out, np.asarray(img))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
