"""Deployment export: serialize the renderer as a portable StableHLO
artifact (jax.export).

The reference's deployment story is the Emscripten/WASM target that
ships its 18-symbol C API to the web (/root/reference/Makefile:41-47,
`-s EXPORTED_FUNCTIONS=...bh_initialize,bh_trace_ray,...`).  The
TPU-native analog is not a WASM blob but a **serialized compiled
computation**: `jax.export` lowers the jitted render/trace function to
versioned StableHLO bytes that any JAX runtime (CPU server, TPU pod,
or the XLA runtime embedded in a non-Python host) can deserialize and
execute WITHOUT this package's Python source — the same
"engine-behind-a-stable-ABI" property the WASM export list provides,
with the compiled artifact carrying the physics instead of C objects.

Artifacts are resolution- and config-specialized (static shapes are
what make the TPU fast path possible); export one artifact per
deployment configuration, or use symbolic shapes (jax.export
shape polymorphism) for the batch axis where a server must accept
variable ray counts — `export_trace(..., poly_batch=True)` does this.

Scene parameters stay RUNTIME inputs: mass/spin/charge/disk/camera are
arguments of the exported computation, so one artifact serves every
parameter setting (the analog of bh_configure_* against a fixed
binary).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export

from blackhole_tpu.geom.types import Camera, Scene
from blackhole_tpu.render import camera as cam_mod
from blackhole_tpu.render import trace


def _scene_args(scene: Scene):
    """The traced (runtime-tunable) leaves of a Scene as a flat tuple;
    static config stays baked into the artifact."""
    bh, disk, cfg = scene.blackhole, scene.disk, scene.config
    return (
        bh.mass, bh.spin, bh.charge,
        disk.inner_radius, disk.outer_radius,
        disk.temperature_scale, disk.density_scale,
        disk.inclination,
        cfg.time_step, cfg.max_ray_distance, cfg.tolerance,
    )


def _rebuild_scene(template: Scene, args):
    import dataclasses

    (mass, spin, charge, r_in, r_out, t_scale, d_scale, incl,
     dt, max_dist, tol) = args
    return dataclasses.replace(
        template,
        blackhole=dataclasses.replace(
            template.blackhole, mass=mass, spin=spin, charge=charge
        ),
        disk=dataclasses.replace(
            template.disk, inner_radius=r_in, outer_radius=r_out,
            temperature_scale=t_scale, density_scale=d_scale,
            inclination=incl,
        ),
        config=dataclasses.replace(
            template.config, time_step=dt, max_ray_distance=max_dist,
            tolerance=tol,
        ),
    )


def export_trace(scene: Scene, n_rays: int | None = None,
                 poly_batch: bool = False,
                 platforms: tuple[str, ...] | None = None) -> bytes:
    """Export the batched ray tracer as serialized StableHLO.

    The exported callable has signature
        (scene_args..., origins (N, 3), directions (N, 3)) -> color (N, 3)
    with scene_args the 11 runtime scene scalars (_scene_args order).
    poly_batch=True exports with a symbolic N (any ray count at call
    time); otherwise n_rays is required and baked in.

    platforms: lowering platforms baked into the artifact (default:
    the current backend).  Pass ("cpu", "tpu") for an artifact that
    runs on both.
    """
    template = scene

    def fn(*args):
        scene_args, o, d = args[:-2], args[-2], args[-1]
        s = _rebuild_scene(template, scene_args)
        return trace.trace_rays(o, d, s).color

    f32 = jnp.float32
    scalar = jax.ShapeDtypeStruct((), f32)
    if poly_batch:
        (n,) = jax_export.symbolic_shape("n")
        ray_shape = jax.ShapeDtypeStruct((n, 3), f32)
    else:
        if n_rays is None:
            raise ValueError("n_rays required unless poly_batch=True")
        ray_shape = jax.ShapeDtypeStruct((n_rays, 3), f32)
    args = tuple(scalar for _ in _scene_args(scene)) + (
        ray_shape, ray_shape,
    )
    exp = jax_export.export(
        jax.jit(fn),
        platforms=list(platforms) if platforms else None,
    )(*args)
    return bytes(exp.serialize())


def export_render(scene: Scene, camera: Camera, width: int,
                  height: int,
                  platforms: tuple[str, ...] | None = None) -> bytes:
    """Export a full fixed-resolution render:
    (scene_args..., cam_pos (3,), cam_dir (3,), cam_up (3,), fov ())
    -> (H, W, 3) image."""
    template = scene

    def fn(*args):
        scene_args = args[:-4]
        pos, dirn, up, fov = args[-4:]
        s = _rebuild_scene(template, scene_args)
        c = Camera(position=pos, direction=dirn, up=up, fov_deg=fov)
        o, d = cam_mod.generate_rays(c, width, height)
        hit = trace.trace_rays(o.reshape(-1, 3), d.reshape(-1, 3), s)
        return hit.color.reshape(height, width, 3)

    f32 = jnp.float32
    scalar = jax.ShapeDtypeStruct((), f32)
    vec3 = jax.ShapeDtypeStruct((3,), f32)
    args = tuple(scalar for _ in _scene_args(scene)) + (
        vec3, vec3, vec3, scalar,
    )
    exp = jax_export.export(
        jax.jit(fn),
        platforms=list(platforms) if platforms else None,
    )(*args)
    return bytes(exp.serialize())


def load(blob: bytes):
    """Deserialize an exported artifact; returns an object whose
    `.call(*args)` executes the computation on the current backend."""
    return jax_export.deserialize(bytearray(blob))


def call_trace(exported, scene: Scene, origins, directions):
    """Convenience: invoke an export_trace artifact with a Scene."""
    return exported.call(*_scene_args(scene), origins, directions)


def call_render(exported, scene: Scene, camera: Camera):
    """Convenience: invoke an export_render artifact."""
    return exported.call(
        *_scene_args(scene), camera.position, camera.direction,
        camera.up, camera.fov_deg,
    )
