"""Worker for the multi-process distributed test.

Launched as: python distributed_worker.py <pid> <nproc> <coord_addr> <out>

Each process contributes 4 virtual CPU devices; the 8-device global mesh
renders a sharded Cornell frame and takes scene-parameter gradients. Every
process writes (loss, grad_norm) — all must agree.
"""

import os
import sys


def main():
    pid, nproc, coord, out = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # drop any ambient TPU-tunnel pinning
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from gpu_bidirectional_raytracer_tpu.parallel import distributed

    distributed.initialize_cluster(coord, nproc, pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gpu_bidirectional_raytracer_tpu.core.types import Camera, IntegratorConfig
    from gpu_bidirectional_raytracer_tpu.diff import gradients as G
    from gpu_bidirectional_raytracer_tpu.integrators.direct import (
        static_light_indices,
    )
    from gpu_bidirectional_raytracer_tpu.parallel import mesh as pmesh
    from gpu_bidirectional_raytracer_tpu.scene import builtin

    mesh = pmesh.make_mesh()
    w, h = 16, 16
    scene = builtin.cornell_box()
    cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                      builtin.DEFAULT_CAMERA_TARGET, w, h)
    li = static_light_indices(scene)
    key = jax.random.key(0)

    @jax.jit
    def run(scene):
        target = jax.lax.with_sharding_constraint(
            jnp.zeros((h, w, 3), jnp.float32),
            NamedSharding(mesh, P("rays")))
        return G.render_loss_grad(scene, cam, key, target,
                                  IntegratorConfig.cpu_golden(), w, h, li, 1)

    loss, grads = run(scene)
    gnorm = jnp.sqrt(sum(jnp.sum(g * g) for g in
                         (grads.p, grads.rad, grads.c, grads.e)))
    with open(out, "w") as f:
        f.write(f"{float(loss):.9g} {float(gnorm):.9g}\n")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
