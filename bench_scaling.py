"""Scaling-efficiency harness: sharded rays/s vs mesh size.

Measures forward and forward+backward throughput of the sharded render
path (blackhole_tpu.parallel.mesh) at mesh sizes 1/2/4/... and reports
efficiency vs the 1-device run — the measurement BASELINE.md's scaling
row requires (rays/s at 1 chip / 1 host / N hosts, >=85% efficiency on
2 shards).  The reference has nothing to compare against here: its
batch tracer is a sequential host loop (raytracer.c:795-804).

Two efficiency columns, because the test environment matters:

* wall  — wall-clock rays/s per device vs 1 device.  The number that
  matters on real multi-chip hardware, where each mesh element is its
  own chip.
* cpu   — rays per *CPU-second* vs 1 device (process CPU time).  On a
  virtual CPU mesh (``--xla_force_host_platform_device_count=N``) all
  "devices" share the host's cores, so wall-clock parallel speedup is
  physically capped by the core count (2 on this container) and the
  wall column under-reads badly at mesh >= cores.  CPU-seconds instead
  measure the *total work* the sharded program does per ray — padding,
  collective overhead, per-partition fixed costs — which is exactly
  the sharding property one can validate without a pod.

Emits one JSON line per mesh size plus a summary line; --json writes
the full record to a file (committed as SCALING.json).

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_scaling.py --sizes 1,2,4,8 --width 256 --height 256
On a real multi-chip TPU the same command (without the env) shards over
the chips and the wall column is the headline.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def measure(width, height, steps, sizes, repeats, fwdbwd, platform=None):
    import jax

    if platform:
        # The container's sitecustomize pins jax_platforms to the remote
        # TPU; the env var is ignored, only the config call works.
        jax.config.update("jax_platforms", platform)

    import dataclasses

    import jax.numpy as jnp

    from blackhole_tpu.geom.types import (
        BlackHole, Camera, Disk, Scene, SimConfig,
    )
    from blackhole_tpu.grad import inverse
    from blackhole_tpu.parallel import mesh as pmesh

    def make_scene(k: int):
        # Perturb mass in the last decimals per repeat so a caching
        # remote backend cannot replay a previous result.
        return Scene(
            blackhole=BlackHole.create(1.0 + 1e-6 * k, 0.9),
            disk=Disk.create(6.0, 20.0, 1.0, 1.0),
            config=SimConfig.create(
                time_step=0.1, max_ray_distance=60.0, max_steps=steps
            ),
            disk_enabled=True,
        )

    camera = Camera.create(
        position=(0.0, -35.0, 12.0),
        direction=(0.0, 35.0, -12.0),
        up=(0.0, 0.0, 1.0),
        fov_deg=22.0,
    )
    n_rays = width * height
    records = []

    def clocked(fn):
        fn(0)  # compile + warmup
        best_wall, best_cpu = float("inf"), float("inf")
        for k in range(repeats):
            t0w, t0c = time.perf_counter(), time.process_time()
            fn(k + 1)
            best_wall = min(best_wall, time.perf_counter() - t0w)
            best_cpu = min(best_cpu, time.process_time() - t0c)
        return best_wall, best_cpu

    for nd in sizes:
        if nd > len(jax.devices()):
            continue
        mesh = pmesh.make_mesh(nd)

        def run_fwd(k):
            img = pmesh.render_image_sharded(
                make_scene(k), camera, width, height, mesh
            )
            jax.block_until_ready(img)

        wall_f, cpu_f = clocked(run_fwd)
        rec = {
            "mesh": nd,
            "fwd_rays_per_s_wall": round(n_rays / wall_f, 1),
            "fwd_rays_per_cpu_s": round(n_rays / cpu_f, 1),
        }

        if fwdbwd:
            scene0 = make_scene(0)
            target = pmesh.render_image_sharded(
                scene0, camera, width, height, mesh
            )

            def run_vg(k):
                params = inverse.pack_params(make_scene(-k), camera)
                loss, grads = pmesh.loss_and_grad_sharded(
                    params, target, scene0, camera, width, height, mesh
                )
                jax.block_until_ready((loss, grads))

            wall_g, cpu_g = clocked(run_vg)
            rec["fwdbwd_rays_per_s_wall"] = round(n_rays / wall_g, 1)
            rec["fwdbwd_rays_per_cpu_s"] = round(n_rays / cpu_g, 1)

        records.append(rec)
        print(json.dumps(rec), flush=True)

    base = records[0]
    for rec in records:
        n = rec["mesh"] / records[0]["mesh"]
        rec["eff_fwd_wall"] = round(
            rec["fwd_rays_per_s_wall"] / (n * base["fwd_rays_per_s_wall"]), 3
        )
        rec["eff_fwd_cpu"] = round(
            rec["fwd_rays_per_cpu_s"] / base["fwd_rays_per_cpu_s"], 3
        )
        if fwdbwd:
            rec["eff_fwdbwd_wall"] = round(
                rec["fwdbwd_rays_per_s_wall"]
                / (n * base["fwdbwd_rays_per_s_wall"]), 3
            )
            rec["eff_fwdbwd_cpu"] = round(
                rec["fwdbwd_rays_per_cpu_s"] / base["fwdbwd_rays_per_cpu_s"],
                3,
            )

    import jax as _jax

    return {
        "platform": _jax.devices()[0].platform,
        "n_devices": len(_jax.devices()),
        "physical_cores": os.cpu_count(),
        "width": width,
        "height": height,
        "max_steps": steps,
        "records": records,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--json", default=None, help="write full record here")
    ap.add_argument("--no-fwdbwd", action="store_true")
    ap.add_argument(
        "--platform", default=None,
        help="force a jax platform (e.g. cpu for the virtual mesh)",
    )
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    out = measure(
        args.width, args.height, args.steps, sizes, args.repeats,
        fwdbwd=not args.no_fwdbwd, platform=args.platform,
    )
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
