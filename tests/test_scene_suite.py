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


def test_hall_of_mirrors_live_under_camera_scale():
    """hall_of_mirrors.scn promoted to a LIVE fixture (VERDICT r4 #9):
    under the opt-in world scale (cli --camera-scale) its normalized
    ~0.1-unit coordinates clear the reference camera's ~10-unit ray
    origin displacement and the scene must render non-black with real
    integrator output (mirror room: most pixels lit). Scale 1 stays
    spec-correct black (asserted above)."""
    from gpu_bidirectional_raytracer_tpu.scene.parser import scale_world

    path = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "scenes", "hall_of_mirrors.scn")
    orig, target, scene = load_scene(path)
    o, t, s = scale_world(orig, target, scene, 100.0)
    r = Renderer(s, o, t, 32, 24, cfg=IntegratorConfig.gpu())
    img = np.asarray(r.render(4))
    assert np.isfinite(img).all()
    assert img.max() > 0.5, "scaled hall_of_mirrors rendered black"
    assert (img > 0).mean() > 0.4, "too few lit pixels"


def test_camera_scale_cli_flag(tmp_path):
    """The render CLI exposes --camera-scale and produces a non-black
    frame for hall_of_mirrors at scale 100."""
    from gpu_bidirectional_raytracer_tpu import cli
    from gpu_bidirectional_raytracer_tpu.render import film

    path = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "scenes", "hall_of_mirrors.scn")
    out = str(tmp_path / "hall.ppm")
    rc = cli.main(["render", path, "--width", "24", "--height", "18",
                   "--spp", "2", "--mode", "gpu", "--camera-scale", "100",
                   "--out", out])
    assert rc == 0
    img = film.read_ppm(out)
    assert img.max() > 0


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
