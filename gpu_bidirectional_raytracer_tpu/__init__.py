"""TPU-native differentiable bidirectional path tracer.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
sim186/gpu_bidirectional_raytracer (a smallpt-derived CUDA VPL renderer):

- Sphere scenes parsed from ``.scn`` files (reference: ``display_func.c:112-175``)
- Eye-path tracing with next-event estimation (reference: ``device.cu:544-791``)
- Bidirectional VPL light pass + gather (reference: ``device.cu:222-542``)
- Progressive per-pixel accumulation (reference: ``device.cu:774-788``)
- Differentiable rendering w.r.t. scene parameters (upgrade of the
  interactive sphere-edit loop, ``display_func.c:278-437``)
- SPMD scale-out over a TPU mesh (new; the reference is single-GPU)

Design stance (TPU-first, not a port): structure-of-arrays ray batches,
masked lane updates instead of thread divergence, counter-based threefry
RNG instead of the Mersenne-Twister pool, intersection math formulated as
matmuls that ride the MXU, and `lax.fori_loop` bounce loops that XLA can
fuse.
"""

__version__ = "0.1.0"

from gpu_bidirectional_raytracer_tpu.core.types import (
    Camera,
    IntegratorConfig,
    Rays,
    RenderState,
    Scene,
    VplBuffer,
    DIFF,
    SPEC,
    REFR,
    LITE,
)
from gpu_bidirectional_raytracer_tpu.scene.parser import (
    load_scene,
    parse_scene,
    write_scene,
)
from gpu_bidirectional_raytracer_tpu.scene.builtin import cornell_box, test_scene
from gpu_bidirectional_raytracer_tpu.render.progressive import (
    Renderer,
    init_state,
    render_image,
)

__all__ = [
    "Camera",
    "IntegratorConfig",
    "Rays",
    "RenderState",
    "Scene",
    "VplBuffer",
    "DIFF",
    "SPEC",
    "REFR",
    "LITE",
    "load_scene",
    "parse_scene",
    "write_scene",
    "cornell_box",
    "test_scene",
    "Renderer",
    "init_state",
    "render_image",
]
