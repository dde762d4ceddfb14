"""Inverse rendering: recover (mass, spin) from a target image.

Demonstrates both gradient engines:
  --method forward   one multi-tangent Pallas kernel pass per step
                     (the fast path for few parameters; TPU)
  --method reverse   checkpointed-scan reverse mode (any backend,
                     arbitrary parameter counts)

    PYTHONPATH=. python examples/inverse_fit.py --method reverse
"""

import argparse
import dataclasses

from blackhole_tpu.geom.types import BlackHole, Camera, Disk, Scene, SimConfig
from blackhole_tpu.grad import diff_trace, inverse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", choices=("forward", "reverse"),
                    default="reverse")
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--fit-steps", type=int, default=60)
    args = ap.parse_args()

    scene = Scene(
        blackhole=BlackHole.create(1.0, 0.8),
        disk=Disk.create(6.0, 20.0),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=80.0, max_steps=args.steps
        ),
        disk_enabled=True,
    )
    camera = Camera.create(
        position=(0.0, -30.0, 8.0),
        direction=(0.0, 30.0, -8.0),
        up=(0.0, 0.0, 1.0),
        fov_deg=25.0,
    )
    target = diff_trace.render_image_diff(scene, camera, args.size,
                                          args.size)
    bad = dataclasses.replace(
        scene, blackhole=BlackHole.create(1.2, 0.6)
    )
    fit = inverse.fit_forward if args.method == "forward" else inverse.fit
    fitted, _, losses = fit(
        target, bad, camera, args.size, args.size,
        steps=args.fit_steps, learning_rate=3e-2,
        optimize=("log_mass", "spin_raw"),
    )
    print(
        f"start mass=1.200 spin=0.600 -> fitted "
        f"mass={float(fitted.blackhole.mass):.4f} "
        f"spin={float(fitted.blackhole.spin):.4f} "
        f"(loss {losses[0]:.3e} -> {losses[-1]:.3e}; true 1.0 / 0.8)"
    )


if __name__ == "__main__":
    main()
