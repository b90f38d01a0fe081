"""Scene-suite regression: every shipped scene renders finite, and the
progressive estimator converges (the role the reference's 24 ``.scn``
fixtures + sample images played, automated)."""

import glob
import os

import numpy as np
import pytest

from gpu_bidirectional_raytracer_tpu import IntegratorConfig, Renderer
from gpu_bidirectional_raytracer_tpu.scene.parser import load_scene

SCENES = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), "..", "assets", "scenes", "*.scn")))


@pytest.mark.parametrize("path", SCENES, ids=[os.path.basename(p)[:-4]
                                              for p in SCENES])
def test_scene_renders_finite(path):
    orig, target, scene = load_scene(path)
    # complex.scn has 783 spheres — keep the frame tiny.
    w, h = (12, 9) if scene.num_spheres > 100 else (20, 15)
    r = Renderer(scene, orig, target, w, h, cfg=IntegratorConfig())
    img = r.render(2)
    assert np.isfinite(img).all(), "non-finite radiance"
    assert img.min() >= 0.0, "negative radiance"
    has_light = bool(np.asarray(scene.is_light()).any())
    # hall_of_mirrors.scn uses normalized (~0.1-unit) coordinates; the
    # reference's projective camera (ray origin displaced ~10 units along
    # the unnormalized direction, device.cu:596-597) starts every ray
    # beyond the entire scene, so it is black under the reference's own
    # camera model — preserved as spec.
    if has_light and "hall_of_mirrors" not in path:
        assert img.max() > 0.0, "emissive scene rendered black"


def test_progressive_convergence():
    """The running mean must stabilize as samples accumulate (Cauchy)."""
    path = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "scenes", "simple.scn")
    orig, target, scene = load_scene(path)
    r = Renderer(scene, orig, target, 24, 18,
                 cfg=IntegratorConfig.cpu_golden())
    deltas = []
    prev = None
    for i in range(24):
        r.step()
        cur = np.asarray(r.state.colors)
        if prev is not None and i % 8 == 7:
            deltas.append(np.abs(cur - prev).mean())
        if i % 8 == 7:
            prev = cur.copy()
    # successive 8-sample deltas shrink
    assert deltas[-1] < deltas[0], deltas
