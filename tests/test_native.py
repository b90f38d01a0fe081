"""Native C++ IO: parity with the pure-Python parser/writer."""

import glob
import os

import numpy as np
import pytest

from gpu_bidirectional_raytracer_tpu import native
from gpu_bidirectional_raytracer_tpu.render import film
from gpu_bidirectional_raytracer_tpu.scene.parser import (
    load_scene,
    parse_scene,
)

SCENES = os.path.join(os.path.dirname(__file__), "..", "assets", "scenes")

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="g++ toolchain unavailable")


@needs_native
class TestNativeScn:
    def test_matches_python_parser_on_all_scenes(self):
        for path in sorted(glob.glob(os.path.join(SCENES, "*.scn"))):
            with open(path) as f:
                text = f.read()
            po, pt, pscene = parse_scene(text)
            cam, flat = native.scn_parse(text)
            np.testing.assert_allclose(cam[:3], po)
            np.testing.assert_allclose(cam[3:], pt)
            np.testing.assert_allclose(flat[:, 0], np.asarray(pscene.rad))
            np.testing.assert_allclose(flat[:, 1:4], np.asarray(pscene.p))
            np.testing.assert_allclose(flat[:, 4:7], np.asarray(pscene.e))
            np.testing.assert_allclose(flat[:, 7:10], np.asarray(pscene.c))
            np.testing.assert_array_equal(flat[:, 10].astype(int),
                                          np.asarray(pscene.refl))

    def test_load_scene_native_equals_python(self):
        p = os.path.join(SCENES, "cornell.scn")
        o1, t1, s1 = load_scene(p, prefer_native=True)
        o2, t2, s2 = load_scene(p, prefer_native=False)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))
        np.testing.assert_allclose(np.asarray(s1.p), np.asarray(s2.p))

    def test_malformed_raises(self):
        with pytest.raises(ValueError):
            native.scn_parse("camera 1 2 3 4 5 6\nsize 1\nsphere 1 2\n")
        with pytest.raises(ValueError):
            native.scn_parse("nonsense\n")


@needs_native
class TestNativePpm:
    def test_p3_matches_python_writer(self, tmp_path):
        img = np.random.default_rng(3).uniform(0, 1, (5, 7, 3)).astype(np.float32)
        a, b = tmp_path / "native.ppm", tmp_path / "python.ppm"
        film.write_ppm(img, a, prefer_native=True)
        film.write_ppm(img, b, prefer_native=False)
        na, nb = film.read_ppm(a), film.read_ppm(b)
        np.testing.assert_array_equal(na, nb)

    def test_p6_roundtrip_size(self, tmp_path):
        img = (np.random.default_rng(4).uniform(0, 255, (16, 16, 3))
               .astype(np.uint8))
        path = tmp_path / "bin.ppm"
        assert native.ppm_write(path, img, binary=True)
        assert os.path.getsize(path) < 16 * 16 * 3 + 64
