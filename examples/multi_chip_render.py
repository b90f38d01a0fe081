#!/usr/bin/env python
"""Multi-chip rendering example: shard the frame over every device.

On a TPU pod slice this scales the render across chips with no code
changes; on CPU, simulate with
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multi_chip_render.py
(the image is bitwise identical to the single-device render — randomness
is counter-addressed, not layout-addressed).
"""

import jax
import numpy as np

from gpu_bidirectional_raytracer_tpu import IntegratorConfig, Renderer
from gpu_bidirectional_raytracer_tpu.parallel import mesh as pmesh
from gpu_bidirectional_raytracer_tpu.render import film
from gpu_bidirectional_raytracer_tpu.scene import builtin


def main():
    mesh = pmesh.make_mesh()
    print(f"{mesh.size} device(s):", jax.devices())

    scene = builtin.cornell_box()
    height = pmesh.pad_height_to(mesh, 384)
    r = Renderer(scene, builtin.DEFAULT_CAMERA_ORIG,
                 builtin.DEFAULT_CAMERA_TARGET, 512, height,
                 cfg=IntegratorConfig())
    r.state = pmesh.shard_state(r.state, mesh)
    img = r.render(16)
    print("sharding of colors:", r.state.colors.sharding)
    film.write_png(np.asarray(img), "multi_chip.png")
    print("wrote multi_chip.png")


if __name__ == "__main__":
    main()
