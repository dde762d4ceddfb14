"""Inverse rendering: recover scene parameters from a target image.

The new capability that justifies the TPU build (BASELINE.json config 5;
the reference C engine is forward-only): gradient-descend (mass, spin,
disk radii, temperature scale, camera pose) against a rendered target
using reverse-mode AD through the checkpointed geodesic integrator.

Parameterization: physical parameters are optimized in an unconstrained
space (log for positive quantities, scaled-tanh for spin) so optimizer
steps can never leave the physical manifold (spin in [0, 1), positive
radii/mass).
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from blackhole_tpu.geom.types import BlackHole, Camera, Disk, Scene, SimConfig
from blackhole_tpu.grad import diff_trace

MAX_SPIN = 0.998  # Thorne limit; keeps Delta bounded away from 0.


def _charge_budget(spin):
    """Max Q/M compatible with sub-extremality at this spin:
    spin^2 + (Q/M)^2 <= MAX_SPIN^2 (so Delta stays bounded from 0)."""
    return jnp.sqrt(jnp.maximum(MAX_SPIN**2 - spin * spin, 1e-12))


def pack_params(scene: Scene, camera: Camera) -> dict:
    """Scene/camera -> unconstrained optimization pytree."""
    bh, disk = scene.blackhole, scene.disk
    spin = jnp.clip(bh.spin, 0.0, 0.999 * MAX_SPIN)
    q_frac = bh.charge / jnp.maximum(bh.mass, 1e-12)
    return {
        "log_mass": jnp.log(bh.mass),
        "spin_raw": jnp.arctanh(jnp.clip(bh.spin / MAX_SPIN, 0.0, 0.999)),
        # charge_raw parameterizes Q = M * budget(spin) * tanh(raw):
        # optimizer steps can never leave the sub-extremal manifold
        # even while spin moves.  The metric depends on Q^2 only, so the
        # sign of the fitted charge is a gauge; |Q| is the observable.
        "charge_raw": jnp.arctanh(
            jnp.clip(q_frac / _charge_budget(spin), 0.0, 0.999)
        ),
        "log_disk_inner": jnp.log(disk.inner_radius),
        "log_disk_width": jnp.log(disk.outer_radius - disk.inner_radius),
        "log_temp_scale": jnp.log(disk.temperature_scale),
        "cam_position": camera.position,
        "log_fov": jnp.log(camera.fov_deg),
    }


def unpack_params(params: dict, template_scene: Scene,
                  template_camera: Camera) -> tuple[Scene, Camera]:
    """Unconstrained pytree -> (Scene, Camera), other fields from templates."""
    mass = jnp.exp(params["log_mass"])
    spin = MAX_SPIN * jnp.tanh(params["spin_raw"])
    charge = mass * _charge_budget(spin) * jnp.tanh(
        params.get("charge_raw", jnp.zeros_like(spin))
    )
    inner = jnp.exp(params["log_disk_inner"])
    outer = inner + jnp.exp(params["log_disk_width"])
    bh = dataclasses.replace(
        template_scene.blackhole, mass=mass, spin=spin, charge=charge
    )
    disk = dataclasses.replace(
        template_scene.disk,
        inner_radius=inner,
        outer_radius=outer,
        temperature_scale=jnp.exp(params["log_temp_scale"]),
    )
    scene = dataclasses.replace(template_scene, blackhole=bh, disk=disk)
    camera = dataclasses.replace(
        template_camera,
        position=params["cam_position"],
        fov_deg=jnp.exp(params["log_fov"]),
    )
    return scene, camera


@partial(jax.jit, static_argnames=("width", "height"))
def image_loss(params: dict, target, template_scene: Scene,
               template_camera: Camera, width: int, height: int):
    """0.5 * mean squared pixel error of the differentiable render."""
    scene, camera = unpack_params(params, template_scene, template_camera)
    img = diff_trace.render_image_diff(scene, camera, width, height)
    return 0.5 * jnp.mean((img - target) ** 2)


def make_train_step(optimizer: optax.GradientTransformation, width: int,
                    height: int):
    """Returns jitted step(params, opt_state, target, tmpl_scene,
    tmpl_cam, mask=None) -> (params, opt_state, loss).

    mask: optional pytree of TRACED 0/1 scalars multiplied into the
    gradients — the freeze mechanism fit() uses.  Because it is traced
    (and fit() injects the learning rate into the optimizer state),
    every fit of the same image/step shapes shares ONE compiled train
    step no matter which parameters are optimized or at what rate —
    the previous static optax.masked chain recompiled the whole
    reverse-mode render per (optimize, lr) combination (~40-60 s each
    on the 2-core CPU test host)."""

    @partial(jax.jit, static_argnames=())
    def step(params, opt_state, target, template_scene, template_camera,
             mask=None):
        loss, grads = jax.value_and_grad(image_loss)(
            params, target, template_scene, template_camera, width, height
        )
        if mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, m: g * m, grads, mask
            )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def fit_forward(
    target,
    init_scene: Scene,
    init_camera: Camera,
    width: int,
    height: int,
    steps: int = 100,
    learning_rate: float = 3e-2,
    optimize: tuple = ("log_mass", "spin_raw"),
    callback=None,
    interpret: bool = False,
):
    """Forward-mode inverse rendering through the fused Pallas kernel.

    Each optimization step is ONE multi-tangent kernel pass
    (grad.fast_grad.render_value_and_grad): ray generation is inside
    the differentiated graph, so camera-pose/fov parameters work, and
    only the selected parameters carry tangents.  For the few-parameter
    fits of BASELINE config 5 this replaces the checkpointed
    reverse-mode scan at a fraction of the cost (no rematerialization,
    full per-tile early exit).  Returns (scene, camera, losses).

    For throughput, configure integrator="rkf45" (tolerance 1e-6) on
    init_scene.config: quality parity with the RK4 1000-step schedule
    at ~10x fewer steps, 2.4x the fwd+bwd rays/s at 1024^2 (PERF.md).

    For fits at image scale (>= ~128^2), set shadow_softness > 0 on
    init_scene.config (and render the target with the same config):
    hard-edge pathwise gradients miss visibility terms — the shadow and
    disk boundaries sweeping across pixels — which DOMINATE the FD
    gradient at scale (measured wrong-signed d/d(mass) at 256^2).  The
    soft boundary (trace.finalize) restores them; per-ray color
    tangents are winsorized by default (fast_grad.TANGENT_CLIP).
    """
    import jax

    from blackhole_tpu.grad import fast_grad
    from blackhole_tpu.render import camera as cam

    params_all = pack_params(init_scene, init_camera)
    opt_params = {k: params_all[k] for k in optimize}
    frozen = {k: v for k, v in params_all.items() if k not in optimize}

    def setup_fn(p):
        scene, camera = unpack_params(
            {**frozen, **p}, init_scene, init_camera
        )
        origins, dirs = cam.generate_rays(camera, width, height)
        return scene, origins.reshape(-1, 3), dirs.reshape(-1, 3)

    target = jnp.asarray(target)

    def loss_of_hit(hit):
        img = hit.color.reshape(target.shape)
        return 0.5 * jnp.mean((img - target) ** 2)

    vg = jax.jit(fast_grad.render_value_and_grad(
        loss_of_hit, setup_fn, interpret=interpret
    ))
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(opt_params)
    losses = []
    for i in range(steps):
        loss, grads = vg(opt_params)
        updates, opt_state = optimizer.update(grads, opt_state, opt_params)
        opt_params = optax.apply_updates(opt_params, updates)
        losses.append(float(loss))
        if callback is not None:
            callback(i, {**frozen, **opt_params}, loss)
    scene, camera = unpack_params(
        {**frozen, **opt_params}, init_scene, init_camera
    )
    return scene, camera, losses


@functools.lru_cache(maxsize=None)
def _fit_step(width: int, height: int):
    """Memoized (optimizer, jitted step) for fit(): the learning rate
    lives in the optimizer STATE (inject_hyperparams), so one compiled
    step serves every fit at these image dimensions."""
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-2)
    return optimizer, make_train_step(optimizer, width, height)


def fit(
    target,
    init_scene: Scene,
    init_camera: Camera,
    width: int,
    height: int,
    steps: int = 100,
    learning_rate: float = 3e-2,
    optimize: tuple = ("log_mass", "spin_raw"),
    callback=None,
):
    """Optimize the selected parameters against `target` (H, W, 3).

    Non-selected parameters are frozen with a zero mask.  Returns
    (scene, camera, losses).  For few-parameter fits on TPU prefer
    fit_forward (one multi-tangent kernel pass per step)."""
    params = pack_params(init_scene, init_camera)
    # Traced 0/1 gradient mask + injected learning rate: frozen
    # parameters see exactly-zero gradients (adam's moments stay zero,
    # so their updates are exactly zero), and the compiled step is
    # shared across every (optimize, learning_rate) combination — the
    # (optimizer, jitted step) pair is memoized per (width, height), so
    # e.g. the four fit convergence tests compile ONE train step
    # instead of four (~40-60 s each on the 2-core CPU test host).
    mask = {
        k: jnp.asarray(float(k in optimize), jnp.asarray(v).dtype)
        for k, v in params.items()
    }
    optimizer, step_fn = _fit_step(width, height)
    opt_state = optimizer.init(params)
    # inject_hyperparams: the rate is optimizer STATE, set per fit.
    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        learning_rate, jnp.asarray(params["log_mass"]).dtype
    )
    losses = []
    for i in range(steps):
        params, opt_state, loss = step_fn(
            params, opt_state, target, init_scene, init_camera, mask
        )
        losses.append(float(loss))
        if callback is not None:
            callback(i, params, loss)
    scene, camera = unpack_params(params, init_scene, init_camera)
    return scene, camera, losses
