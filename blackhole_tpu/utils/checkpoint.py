"""Checkpoint/resume for inverse-rendering optimization state.

The reference engine has no checkpointing (SURVEY.md §5 — only imgui.ini
window layout).  Here the differentiable-rendering loop is long-running
production work, so (params, opt_state, step, losses) checkpoint through
orbax with atomic directory swaps and resume-by-latest.
"""

from __future__ import annotations

import os

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover - orbax is baked into the image
    _HAVE_ORBAX = False


def _manager(directory: str, max_to_keep: int = 3):
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep, create=True
    )
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save(directory: str, step: int, state: dict, max_to_keep: int = 3
         ) -> None:
    """Save a pytree `state` at `step` (atomic, keeps newest N)."""
    if not _HAVE_ORBAX:
        raise RuntimeError("orbax-checkpoint unavailable")
    with _manager(directory, max_to_keep) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def restore(directory: str, step: int | None = None, template=None):
    """Restore state at `step` (default: latest).  Returns (step, state);
    (None, None) when the directory holds no checkpoints."""
    if not _HAVE_ORBAX:
        raise RuntimeError("orbax-checkpoint unavailable")
    with _manager(directory) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            return None, None
        if template is not None:
            state = mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        else:
            state = mgr.restore(step)
        return step, state


def fit_with_checkpointing(
    target,
    init_scene,
    init_camera,
    width: int,
    height: int,
    directory: str,
    steps: int = 100,
    save_every: int = 20,
    learning_rate: float = 3e-2,
    optimize: tuple = ("log_mass", "spin_raw"),
):
    """inverse.fit with periodic checkpointing and resume-on-restart.

    If `directory` already holds a checkpoint, optimization continues
    from it (elastic-recovery semantics the reference lacks)."""
    import optax

    from blackhole_tpu.grad import inverse

    params = inverse.pack_params(init_scene, init_camera)
    mask = {k: (k in optimize) for k in params}
    optimizer = optax.chain(
        optax.masked(optax.adam(learning_rate), mask),
        optax.masked(
            optax.set_to_zero(), {k: not v for k, v in mask.items()}
        ),
    )
    opt_state = optimizer.init(params)
    start = 0
    template = {"params": params, "opt_state": opt_state}
    ck_step, ck = restore(directory, template=template)
    if ck is not None:
        params, opt_state = ck["params"], ck["opt_state"]
        start = ck_step + 1

    step_fn = inverse.make_train_step(optimizer, width, height)
    losses = []
    for i in range(start, steps):
        params, opt_state, loss = step_fn(
            params, opt_state, target, init_scene, init_camera
        )
        losses.append(float(loss))
        if (i + 1) % save_every == 0 or i == steps - 1:
            save(
                directory, i,
                {"params": jax.device_get(params),
                 "opt_state": jax.device_get(opt_state)},
            )
    scene, camera = inverse.unpack_params(params, init_scene, init_camera)
    return scene, camera, losses
