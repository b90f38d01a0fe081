"""Built-in scenes.

Re-derivations of the compiled-in scenes (``scene.h:6-34``): the Cornell
box built from the classic smallpt giant-wall-sphere trick (WALL_RAD = 1e4)
and the small ground+spheres test scene, plus the default camera the
reference uses when launched with no arguments (``smallpt_cpu.c:404-405``).
"""

from __future__ import annotations

import numpy as np

from gpu_bidirectional_raytracer_tpu.core.types import DIFF, LITE, REFR, SPEC, Scene

WALL_RAD = 1e4

# Default no-argument camera (smallpt_cpu.c:404-405).
DEFAULT_CAMERA_ORIG = np.array([50.0, 44.0, 176.0], dtype=np.float32)
DEFAULT_CAMERA_TARGET = np.array([50.0, 44.0 - 0.042612, 175.0], dtype=np.float32)


def cornell_box() -> Scene:
    """The built-in CornellSpheres scene (``scene.h:7-18``).

    Six giant wall spheres, a mirror ball, a glass ball, and a refractive
    emitter near the ceiling. Note the reference marks the light REFR, not
    LITE — emitter status is determined by nonzero emission, not material.
    """
    w = WALL_RAD
    return Scene.from_lists([
        (w, (w + 1.0, 40.8, 81.6), (0, 0, 0), (0.75, 0.25, 0.25), DIFF),     # left
        (w, (-w + 99.0, 40.8, 81.6), (0, 0, 0), (0.25, 0.25, 0.75), DIFF),   # right
        (w, (50.0, 40.8, w), (0, 0, 0), (0.75, 0.75, 0.75), DIFF),           # back
        (w, (50.0, 40.8, -w + 270.0), (0, 0, 0), (0, 0, 0), DIFF),           # front
        (w, (50.0, w, 81.6), (0, 0, 0), (0.75, 0.75, 0.75), DIFF),           # bottom
        (w, (50.0, -w + 81.6, 81.6), (0, 0, 0), (0.75, 0.75, 0.75), DIFF),   # top
        (16.5, (27.0, 16.5, 47.0), (0, 0, 0), (0.9, 0.9, 0.9), SPEC),        # mirror
        (16.5, (73.0, 16.5, 78.0), (0, 0, 0), (0.9, 0.9, 0.9), REFR),        # glass
        (7.0, (50.0, 81.6 - 15.0, 81.6), (12, 12, 12), (0, 0, 0), REFR),     # light
    ])


def test_scene() -> Scene:
    """The ``SCENE_TEST`` ground-plane scene (``scene.h:27-33``)."""
    return Scene.from_lists([
        (1000.0, (0, -1000.0, 0), (0, 0, 0), (0.75, 0.75, 0.75), DIFF),
        (15.0, (10.0, 15.0, 0.0), (0, 0, 0), (0.75, 0, 0), DIFF),
        (20.0, (-40.0, 20.0, 0.0), (0, 0, 0), (0, 0, 0.75), DIFF),
        (10.0, (-5.0, 10.0, 20.0), (0, 0, 0), (0, 0.75, 0), DIFF),
        (10.0, (-30.0, 100.0, 20.0), (12, 12, 12), (0, 0, 0), DIFF),
    ])
