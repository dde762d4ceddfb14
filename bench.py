"""Headline benchmark: rays/s/chip, forward+backward, 1024x1024 Kerr render.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (BASELINE.json config 4/primary metric): Kerr a=0.9, accretion
disk 6..20M, all relativistic effects, 1024x1024 pinhole render,
1000-step integration budget, float32; forward+backward = value_and_grad
of a scalar image loss w.r.t. (mass, spin) through the checkpointed
geodesic integrator.

vs_baseline: the reference C engine (unmodified, built -O2 from
/root/reference/src, its real physics path: Schwarzschild geodesics,
1000-step budget; every reference ray exhausts the full budget — see
tools/ref_parity.py) measured single-thread forward-only on this
container's host CPU by tools/ref_parity.py, which records the number
in tools/ref_baseline.json (its batch API is sequential —
raytracer.c:795-804 — and OpenMP is advertised but not wired).
vs_baseline = our fwd+bwd rays/s per chip divided by that forward-only
number.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

# Fallback when tools/ref_baseline.json is absent (value from the last
# recorded tools/ref_parity.py run on this container class).
C_REFERENCE_RAYS_PER_S = 4117.1


def _c_baseline():
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tools", "ref_baseline.json",
    )
    try:
        with open(path) as f:
            return float(json.load(f)["c_rays_per_s_fwd_single_thread"])
    except (OSError, KeyError, ValueError):
        return C_REFERENCE_RAYS_PER_S

WIDTH = HEIGHT = int(os.environ.get("BENCH_SIZE", "1024"))
MAX_STEPS = int(os.environ.get("BENCH_STEPS", "1000"))
CHUNKS = int(os.environ.get("BENCH_CHUNKS", "16"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))


def main():
    import jax
    import jax.numpy as jnp

    from blackhole_tpu.geom.types import (
        BlackHole, Camera, Disk, Scene, SimConfig,
    )
    from blackhole_tpu.grad import diff_trace
    from blackhole_tpu.render import camera as cam
    from blackhole_tpu.render import trace

    platform = jax.devices()[0].platform

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
    n_rays = WIDTH * HEIGHT
    origins, dirs = cam.generate_rays(camera, WIDTH, HEIGHT)
    o = origins.reshape(CHUNKS, n_rays // CHUNKS, 3)
    d = dirs.reshape(CHUNKS, n_rays // CHUNKS, 3)

    # --- forward-only: fastest engine (fused Pallas kernel on TPU) ---
    from blackhole_tpu.render import image as image_mod

    # Depth-sorted tiling (image.predicted_depth_order): a 128x128
    # prepass orders rays so each Pallas tile holds similar integration
    # depths; prepass + argsort run INSIDE the timed region.
    # BENCH_SORT=0 falls back to raster tiling.
    use_sort = (
        os.environ.get("BENCH_SORT", "1") != "0" and platform == "tpu"
    )

    def _order(s, w=WIDTH, h=HEIGHT):
        if not use_sort:
            return None
        return image_mod.predicted_depth_order(s, camera, w, h)

    @jax.jit
    def fwd(mass, o, d):
        s = dataclasses.replace(
            scene, blackhole=dataclasses.replace(scene.blackhole, mass=mass)
        )
        hit = image_mod.trace_rays_fast(
            o.reshape(-1, 3), d.reshape(-1, 3), s, order=_order(s)
        )
        return hit.color

    # --- forward+backward w.r.t. (mass, spin) ---
    # Default (BENCH_GRAD=fwd): forward-mode through the tangent-
    # augmented Pallas kernel — one jvp per parameter, full per-tile
    # early exit, no rematerialization (blackhole_tpu.grad.fast_grad).
    # BENCH_GRAD=bucketed selects the reverse-mode step-bucketed
    # checkpointed-scan path (the many-parameter engine).
    def scene_fn(params):
        return dataclasses.replace(
            scene,
            blackhole=dataclasses.replace(
                scene.blackhole, mass=params["mass"], spin=params["spin"]
            ),
        )

    grad_mode = os.environ.get("BENCH_GRAD", "fwd")
    if grad_mode == "fwd":
        # Both tangents ((d/dmass, d/dspin)) ride ONE multi-tangent
        # kernel pass (grad.fast_grad.scene_value_and_grad).
        from blackhole_tpu.grad import fast_grad

        def loss_of_hit(hit):
            return jnp.sum(hit.color) / (3.0 * n_rays)

        _svg = fast_grad.scene_value_and_grad(loss_of_hit, scene_fn)

        @jax.jit
        def _vg(params, o_flat, d_flat):
            return _svg(params, o_flat, d_flat,
                        order=_order(scene_fn(params)))

        def fwdbwd(mass, spin, o, d):
            return _vg(
                {"mass": mass, "spin": spin},
                o.reshape(-1, 3), d.reshape(-1, 3),
            )
    elif grad_mode == "fwd1":
        # One tangent-augmented kernel call per parameter.
        from blackhole_tpu.grad import fast_grad

        def loss(params, o_all, d_all):
            hit = image_mod.trace_rays_fast(
                o_all.reshape(-1, 3), d_all.reshape(-1, 3),
                scene_fn(params),
            )
            return jnp.sum(hit.color) / (3.0 * n_rays)

        _vg1 = jax.jit(fast_grad.value_and_grad_fwd(loss))

        def fwdbwd(mass, spin, o, d):
            return _vg1({"mass": mass, "spin": spin}, o, d)
    else:
        from blackhole_tpu.grad import bucketed

        def loss_fn(colors, idx):
            return jnp.sum(colors) / (3.0 * n_rays)

        _bucket_cache = {}

        def fwdbwd(mass, spin, o, d):
            params = {"mass": mass, "spin": spin}
            return bucketed.grad_over_chunks(
                scene_fn, params, o.reshape(-1, 3), d.reshape(-1, 3),
                loss_fn, chunks=CHUNKS, cache=_bucket_cache,
            )

    def timeit(fn, *args):
        """Each repeat perturbs mass in the last ulp-ish digit so a
        caching remote backend cannot replay a previous result."""
        out = fn(jnp.float32(1.0), *args)  # compile + warmup
        jax.block_until_ready(out)
        best = float("inf")
        for k in range(REPEATS):
            m = jnp.float32(1.0 + 1e-6 * (k + 1))
            t0 = time.perf_counter()
            out = fn(m, *args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t_fwd = timeit(fwd, o, d)
    spin = jnp.float32(0.9)
    t_fwdbwd = timeit(lambda m, o, d: fwdbwd(m, spin, o, d), o, d)

    # Gradient health: the timed fwd+bwd's gradients must be finite
    # (regression: before the per-step tangent guard, 21/1M rays' NaN
    # tangents poisoned d/d(mass, spin) at exactly this workload).
    import math

    _, grads = fwdbwd(jnp.float32(1.0), spin, o, d)
    grad_vals = [float(g) for g in jax.tree_util.tree_leaves(grads)]
    grad_finite = all(math.isfinite(v) for v in grad_vals)

    # BASELINE config 3: 512x512 RKF45 adaptive forward (the in-kernel
    # embedded-pair path with per-ray step state).  BENCH_RKF45=0 skips.
    rays_rkf45 = None
    if os.environ.get("BENCH_RKF45", "1") != "0":
        scene_ad = dataclasses.replace(
            scene,
            config=SimConfig.create(
                time_step=0.1, max_ray_distance=150.0,
                max_steps=MAX_STEPS, integrator="rkf45",
                tolerance=1e-6,
            ),
        )
        o5, d5 = cam.generate_rays(camera, 512, 512)
        o5, d5 = o5.reshape(-1, 3), d5.reshape(-1, 3)

        @jax.jit
        def fwd_ad(mass, o_, d_):
            s = dataclasses.replace(
                scene_ad,
                blackhole=dataclasses.replace(
                    scene_ad.blackhole, mass=mass
                ),
            )
            return image_mod.trace_rays_fast(
                o_, d_, s, order=_order(s, 512, 512)
            ).color

        t_ad = timeit(fwd_ad, o5, d5)
        rays_rkf45 = 512 * 512 / t_ad

    # Adaptive fwd+bwd at the headline size: the disk-aware clamped
    # RKF45 kernel at tol 1e-6 is image-quality-equivalent to the
    # RK4-1000 schedule (CONVERGENCE.md) at ~10x fewer steps, so this
    # is the fast path for differentiable rendering at quality parity.
    rays_rkf45_fwdbwd = None
    if grad_mode == "fwd" and os.environ.get("BENCH_RKF45", "1") != "0":
        from blackhole_tpu.grad import fast_grad as _fg

        scene_ad_g = dataclasses.replace(
            scene,
            config=SimConfig.create(
                time_step=0.1, max_ray_distance=150.0,
                max_steps=MAX_STEPS, integrator="rkf45", tolerance=1e-6,
            ),
        )

        def scene_fn_ad(params):
            return dataclasses.replace(
                scene_ad_g,
                blackhole=dataclasses.replace(
                    scene_ad_g.blackhole,
                    mass=params["mass"], spin=params["spin"],
                ),
            )

        _svg_ad = _fg.scene_value_and_grad(
            lambda hit: jnp.sum(hit.color) / (3.0 * n_rays), scene_fn_ad
        )

        @jax.jit
        def _vg_ad(params, o_flat, d_flat):
            return _svg_ad(params, o_flat, d_flat,
                           order=_order(scene_fn_ad(params)))

        def fwdbwd_ad(mass, o, d):
            return _vg_ad({"mass": mass, "spin": spin},
                          o.reshape(-1, 3), d.reshape(-1, 3))

        t_ad_g = timeit(fwdbwd_ad, o, d)
        rays_rkf45_fwdbwd = n_rays / t_ad_g

    # Compiled-kernel parity record (tools/tpu_parity.py): every bench
    # run doubles as evidence that the compiled Mosaic kernels agree
    # with the XLA path on this backend.
    parity = "skipped"
    if platform == "tpu" and os.environ.get("BENCH_SKIP_PARITY") != "1":
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tools")
        )
        try:
            import tpu_parity

            parity = "ok" if tpu_parity.run_parity_checks()["ok"] else \
                "failed"
        except AssertionError as e:  # record, don't hide, a violation
            parity = f"failed: {e}"

    rays_fwd = n_rays / t_fwd
    rays_fwdbwd = n_rays / t_fwdbwd
    print(
        json.dumps(
            {
                "metric": "rays_per_s_fwdbwd_kerr_a0.9_"
                          f"{WIDTH}x{HEIGHT}_{MAX_STEPS}steps",
                "value": round(rays_fwdbwd, 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(rays_fwdbwd / _c_baseline(), 2),
                "rays_per_s_fwd": round(rays_fwd, 1),
                "rays_per_s_fwd_rkf45_512": (
                    round(rays_rkf45, 1) if rays_rkf45 else None
                ),
                "rays_per_s_fwdbwd_rkf45": (
                    round(rays_rkf45_fwdbwd, 1)
                    if rays_rkf45_fwdbwd else None
                ),
                "grad_mode": grad_mode,
                "grad_finite": grad_finite,
                "grad_dmass_dspin": [round(v, 6) for v in grad_vals],
                "compiled_parity": parity,
                "platform": platform,
                "n_devices": len(jax.devices()),
            }
        )
    )


if __name__ == "__main__":
    main()
