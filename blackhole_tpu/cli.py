"""CLI demo / smoke-test driver — parity with the reference test program.

Reproduces /root/reference/src/main.c: version print, the 5 canonical
test rays (main.c:61-126), the circular-orbit velocity/period table
(main.c:131-167), and a time-dilation table (implemented properly; the
reference's test_time_dilation at main.c:172-188 is an empty allocation
stub).  Adds `render` and `bench` subcommands the C engine lacks.

Run: python -m blackhole_tpu.cli [tests|render|help]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from blackhole_tpu import api
from blackhole_tpu.geom.types import RayResult

RESULT_NAMES = {
    RayResult.HORIZON: "Hit event horizon",
    RayResult.DISK: "Hit accretion disk",
    RayResult.BACKGROUND: "Reached background",
    RayResult.MAX_DISTANCE: "Reached maximum distance",
    RayResult.MAX_STEPS: "Reached maximum steps",
    RayResult.ERROR: "Error during ray tracing",
}

# The 5 canonical rays (main.c:69-107): direct hit, graze, far miss,
# toward disk, from the side.
TEST_RAYS = [
    ((0.0, 0.0, 30.0), (0.0, 0.0, -1.0)),
    ((0.0, 0.0, 30.0), (0.2, 0.0, -1.0)),
    ((0.0, 0.0, 30.0), (0.5, 0.0, -1.0)),
    ((0.0, 0.0, 30.0), (0.3, 0.0, -1.0)),
    ((30.0, 0.0, 0.0), (-1.0, 0.0, 0.1)),
]


def print_ray_result(hit):
    print(f"Ray result: {RESULT_NAMES.get(int(hit.result), 'Unknown')}")
    p = np.asarray(hit.position)
    print(f"  Hit position: ({p[0]:.3f}, {p[1]:.3f}, {p[2]:.3f})")
    print(f"  Distance traveled: {float(hit.distance):.3f}")
    print(f"  Steps: {int(hit.steps)}")
    print(f"  Time dilation: {float(hit.time_dilation):.3f}")
    if int(hit.result) in (RayResult.BACKGROUND, RayResult.MAX_DISTANCE):
        s = np.asarray(hit.sky_direction)
        print(f"  Sky direction: ({s[0]:.3f}, {s[1]:.3f}, {s[2]:.3f})")
    print()


def test_ray_tracing(context):
    print("Testing ray tracing...")
    origins = np.array([r[0] for r in TEST_RAYS])
    dirs = np.array([r[1] for r in TEST_RAYS])
    hits = api.bh_trace_rays_batch(context, origins, dirs)
    for i in range(len(TEST_RAYS)):
        print(f"Ray {i + 1}:")
        o, d = TEST_RAYS[i]
        print(f"  Origin: ({o[0]:.3f}, {o[1]:.3f}, {o[2]:.3f})")
        print(f"  Direction: ({d[0]:.3f}, {d[1]:.3f}, {d[2]:.3f})")
        print_ray_result(hits[i])


def test_particle_orbits(context):
    print("Testing particle orbit calculation...")
    print()
    print("Calculating velocity for circular orbits at various radii:")
    print("-" * 54)
    print("Radius (M)   |   Orbital Velocity (c)   |   Period (M)")
    print("-" * 54)
    for r in (20.0, 30.0, 40.0, 50.0, 60.0):
        v = api.bh_calculate_orbital_velocity(context, r)
        period = 2.0 * np.pi * r / v
        print(f"{r:10.2f}   |   {v:20.6f}   |   {period:10.2f}")


def test_time_dilation(context):
    print("Testing time dilation...")
    print()
    print("Time dilation ratio vs observer at r=1000 M:")
    print("-" * 44)
    far = (1000.0, 0.0, 0.0)
    for r in (3.0, 5.0, 10.0, 30.0, 100.0):
        ratio = api.bh_calculate_time_dilation(context, (r, 0.0, 0.0), far)
        print(f"  r = {r:7.1f} M : dtau_far/dtau = {ratio:.6f}")


def run_tests():
    print("Black Hole Physics Engine - Test Program")
    print("-" * 40)
    print()
    major, minor, patch = api.bh_get_version()
    print(f"API Version: {major}.{minor}.{patch}")
    print()
    context = api.bh_initialize()
    # main.c:208-229 configuration.
    assert api.bh_configure_black_hole(context, 1.0, 0.0, 0.0) == 0
    assert api.bh_configure_accretion_disk(context, 6.0, 20.0, 1.0, 1.0) == 0
    assert api.bh_configure_simulation(context, 0.1, 100.0, 1000, 1e-6) == 0

    test_ray_tracing(context)
    print()
    test_particle_orbits(context)
    print()
    test_time_dilation(context)
    print()
    api.bh_shutdown(context)
    print("Tests completed.")


def run_render(args):
    import jax.numpy as jnp

    from blackhole_tpu.geom.types import Camera
    from blackhole_tpu.render import image as image_mod
    from blackhole_tpu.viz import io as viz_io

    context = api.bh_initialize()
    rc = api.bh_configure_black_hole(context, 1.0, args.spin, args.charge)
    if rc != api.BHError.SUCCESS:
        raise SystemExit(
            f"invalid black hole: spin={args.spin} charge={args.charge} "
            "(need (spin*M)^2 + Q^2 <= M^2)"
        )
    api.bh_configure_accretion_disk(context, 6.0, 20.0, 1.0, 1.0)
    api.bh_configure_simulation(context, 0.1, 150.0, args.steps, 1e-6)
    camera = Camera.create(
        position=(0.0, -35.0, 12.0),
        direction=(0.0, 35.0, -12.0),
        up=(0.0, 0.0, 1.0),
        fov_deg=22.0,
    )
    scene = context.scene()
    if args.starfield:
        import dataclasses

        from blackhole_tpu.viz import effects

        scene = dataclasses.replace(
            scene, env_map=effects.starfield_envmap(512, 1024, seed=7)
        )
    img = image_mod.render_image(
        scene, camera, width=args.width, height=args.height,
        spp=args.spp,
    )
    viz_io.write_image(args.out, np.asarray(img))
    print(f"wrote {args.out} ({args.width}x{args.height}, spp={args.spp})")


def run_fit(args):
    """Inverse-rendering demo: render a target at the true parameters,
    perturb, recover by gradient descent (the capability the reference
    C engine lacks entirely)."""
    import dataclasses

    from blackhole_tpu.geom.types import (
        BlackHole, Camera, Disk, Scene, SimConfig,
    )
    from blackhole_tpu.grad import diff_trace, inverse

    scene = Scene(
        blackhole=BlackHole.create(args.mass, args.spin),
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
    print(f"target: mass={args.mass} spin={args.spin}")
    target = diff_trace.render_image_diff(
        scene, camera, args.size, args.size
    )
    bad = dataclasses.replace(
        scene,
        blackhole=BlackHole.create(
            args.mass * 1.2, min(0.95, args.spin + 0.2)
        ),
    )
    print(
        f"start:  mass={float(bad.blackhole.mass):.4f} "
        f"spin={float(bad.blackhole.spin):.4f}"
    )

    def cb(i, params, loss):
        if (i + 1) % 10 == 0:
            import jax.numpy as jnp

            m = float(jnp.exp(params["log_mass"]))
            s = float(inverse.MAX_SPIN * jnp.tanh(params["spin_raw"]))
            print(
                f"  step {i + 1:4d}: loss={float(loss):.3e} "
                f"mass={m:.4f} spin={s:.4f}"
            )

    fitted, _, losses = inverse.fit(
        target, bad, camera, args.size, args.size,
        steps=args.fit_steps, learning_rate=args.lr,
        optimize=("log_mass", "spin_raw"), callback=cb,
    )
    print(
        f"fitted: mass={float(fitted.blackhole.mass):.4f} "
        f"spin={float(fitted.blackhole.spin):.4f} "
        f"(loss {losses[0]:.3e} -> {losses[-1]:.3e})"
    )


def run_view(args):
    """Interactive refining viewer (renderer.cpp:269-861 equivalent)."""
    from blackhole_tpu.viz import viewer

    state = viewer.ViewerState(
        mass=args.mass, spin=args.spin, fov=args.fov,
        distance=args.dist, steps=args.steps,
    )
    stats = viewer.run(
        state, width=args.width, height=args.height,
        max_frames=args.frames,
        commands=args.script.split(";") if args.script else None,
        draw=not args.headless,
    )
    if args.headless:
        print(
            f"viewer: {stats['frames']} frames, {stats['resets']} resets, "
            f"tiers {stats['tiers'][:6]}..., "
            f"median fps {sorted(stats['fps'])[len(stats['fps']) // 2]:.2f}"
        )


def run_serve(args):
    """Browser frontend (the GL/ImGui window analog, viz.server)."""
    from blackhole_tpu.viz import server, viewer

    state = viewer.ViewerState(
        mass=args.mass, spin=args.spin, fov=args.fov,
        distance=args.dist, steps=args.steps,
    )
    server.serve(
        host=args.host, port=args.port, state=state,
        width=args.width, height=args.height,
    )


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="blackhole_tpu", description=__doc__
    )
    sub = parser.add_subparsers(dest="cmd")
    sub.add_parser("tests", help="run the main.c-equivalent demo tables")
    pv = sub.add_parser(
        "view", help="interactive refining terminal viewer"
    )
    pv.add_argument("--width", type=int, default=128)
    pv.add_argument("--height", type=int, default=72)
    pv.add_argument("--mass", type=float, default=1.0)
    pv.add_argument("--spin", type=float, default=0.5)
    pv.add_argument("--fov", type=float, default=22.0)
    pv.add_argument("--dist", type=float, default=35.0)
    pv.add_argument("--steps", type=int, default=400)
    pv.add_argument("--frames", type=int, default=None,
                    help="stop after N frames (default: run until quit)")
    pv.add_argument("--script", type=str, default=None,
                    help="';'-separated commands consumed one per frame")
    pv.add_argument("--headless", action="store_true",
                    help="no terminal drawing; print stats at the end")
    pr = sub.add_parser("render", help="render an image")
    pr.add_argument("--width", type=int, default=256)
    pr.add_argument("--height", type=int, default=256)
    pr.add_argument("--spp", type=int, default=1)
    pr.add_argument("--spin", type=float, default=0.0)
    pr.add_argument("--charge", type=float, default=0.0,
                    help="Kerr-Newman charge Q (geometric units)")
    pr.add_argument("--steps", type=int, default=1000)
    pr.add_argument("--starfield", action="store_true",
                    help="lensed starfield env map instead of the "
                         "gradient sky")
    pr.add_argument("--out", type=str, default="render.png")
    ps = sub.add_parser(
        "serve",
        help="interactive browser viewer (progressive PNG streaming + "
             "parameter controls; the desktop-GL-window analog)",
    )
    ps.add_argument("--host", type=str, default="127.0.0.1")
    ps.add_argument("--port", type=int, default=8000)
    ps.add_argument("--width", type=int, default=480)
    ps.add_argument("--height", type=int, default=270)
    ps.add_argument("--mass", type=float, default=1.0)
    ps.add_argument("--spin", type=float, default=0.5)
    ps.add_argument("--fov", type=float, default=22.0)
    ps.add_argument("--dist", type=float, default=35.0)
    ps.add_argument("--steps", type=int, default=400)
    pf = sub.add_parser(
        "fit", help="inverse rendering: recover mass/spin from an image"
    )
    pf.add_argument("--mass", type=float, default=1.0)
    pf.add_argument("--spin", type=float, default=0.5)
    pf.add_argument("--size", type=int, default=32)
    pf.add_argument("--steps", type=int, default=300)
    pf.add_argument("--fit-steps", type=int, default=60)
    pf.add_argument("--lr", type=float, default=3e-2)
    args = parser.parse_args(argv)
    if args.cmd in (None, "tests"):
        run_tests()
    elif args.cmd == "render":
        run_render(args)
    elif args.cmd == "fit":
        run_fit(args)
    elif args.cmd == "view":
        run_view(args)
    elif args.cmd == "serve":
        run_serve(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
