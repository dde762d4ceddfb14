"""Sharded rendering + distributed inverse-rendering step over a mesh.

On a multi-chip TPU slice this shards image rows over the chips with a
psum gradient all-reduce; to try it anywhere, use the virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        PYTHONPATH=. python examples/distributed_render.py

Multi-host: call parallel.mesh.initialize_distributed(coordinator, ...)
first on every process; the same code then spans hosts.
"""

import jax
import optax

from blackhole_tpu.geom.types import BlackHole, Camera, Disk, Scene, SimConfig
from blackhole_tpu.grad import inverse
from blackhole_tpu.parallel import mesh as pmesh


def main():
    n = len(jax.devices())
    print(f"devices: {n} x {jax.devices()[0].platform}")
    mesh = pmesh.make_mesh()

    scene = Scene(
        blackhole=BlackHole.create(1.0, 0.9),
        disk=Disk.create(6.0, 20.0),
        config=SimConfig.create(
            time_step=0.1, max_ray_distance=80.0, max_steps=256
        ),
        disk_enabled=True,
    )
    camera = Camera.create(
        position=(0.0, -35.0, 12.0),
        direction=(0.0, 35.0, -12.0),
        up=(0.0, 0.0, 1.0),
        fov_deg=22.0,
    )
    height = 64 - (64 % n) or n
    target = pmesh.render_image_sharded(scene, camera, 64, height, mesh)
    print(f"sharded render: {target.shape}, sharding "
          f"{target.sharding.spec}")

    params = inverse.pack_params(scene, camera)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    step = pmesh.make_train_step_sharded(optimizer, 64, height, mesh)
    params, opt_state, loss = step(params, opt_state, target, scene,
                                   camera)
    print(f"one distributed fwd+bwd step: loss={float(loss):.3e}")


if __name__ == "__main__":
    main()
