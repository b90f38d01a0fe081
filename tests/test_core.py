"""Unit tests: vector math, scene parsing, RNG, camera basis."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpu_bidirectional_raytracer_tpu import rng
from gpu_bidirectional_raytracer_tpu.core import vecmath as vm
from gpu_bidirectional_raytracer_tpu.core.types import Camera, Scene, DIFF, REFR
from gpu_bidirectional_raytracer_tpu.scene import builtin
from gpu_bidirectional_raytracer_tpu.scene.parser import (
    SceneParseError,
    dumps_scene,
    parse_scene,
)


class TestVecmath:
    def test_dot_norm_cross(self, rng_np):
        a = rng_np.standard_normal((32, 3)).astype(np.float32)
        b = rng_np.standard_normal((32, 3)).astype(np.float32)
        np.testing.assert_allclose(vm.dot(a, b), np.sum(a * b, -1), rtol=1e-5)
        n = np.asarray(vm.norm(a))
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(vm.cross(a, b), np.cross(a, b), rtol=1e-5)

    def test_reflect_preserves_length_and_flips(self):
        d = np.asarray(vm.norm(jnp.array([[1.0, -1.0, 0.2]])))
        n = np.array([[0.0, 1.0, 0.0]], dtype=np.float32)
        r = np.asarray(vm.reflect(jnp.asarray(d), jnp.asarray(n)))
        np.testing.assert_allclose(np.linalg.norm(r), 1.0, rtol=1e-6)
        np.testing.assert_allclose(r[0, 1], -d[0, 1], rtol=1e-6)

    def test_gamma_to_byte_matches_toInt(self):
        # toInt(x) = (int)(pow(clamp(x,0,1), 1/2.2) * 255 + .5)  (vec.h:34)
        xs = np.linspace(-0.2, 1.2, 101).astype(np.float32)
        ours = np.asarray(vm.gamma_to_byte(jnp.asarray(xs)))
        ref = (np.power(np.clip(xs, 0, 1), 1 / 2.2) * 255 + 0.5).astype(np.int32)
        np.testing.assert_array_equal(ours, ref.astype(np.uint8))

    def test_orthonormal_basis(self, rng_np):
        w = np.asarray(vm.norm(jnp.asarray(
            rng_np.standard_normal((64, 3)).astype(np.float32))))
        u, v = vm.orthonormal_basis(jnp.asarray(w))
        u, v = np.asarray(u), np.asarray(v)
        np.testing.assert_allclose(np.sum(u * w, -1), 0, atol=1e-5)
        np.testing.assert_allclose(np.sum(u * v, -1), 0, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1, rtol=1e-4)


class TestSceneParser:
    def test_roundtrip_builtin(self):
        scene = builtin.cornell_box()
        text = dumps_scene(builtin.DEFAULT_CAMERA_ORIG,
                           builtin.DEFAULT_CAMERA_TARGET, scene)
        orig, target, back = parse_scene(text)
        np.testing.assert_allclose(orig, builtin.DEFAULT_CAMERA_ORIG)
        np.testing.assert_allclose(back.rad, scene.rad)
        np.testing.assert_allclose(back.p, scene.p)
        np.testing.assert_array_equal(back.refl, scene.refl)

    def test_parse_all_shipped_scenes(self):
        import glob
        import os

        paths = sorted(glob.glob(os.path.join(
            os.path.dirname(__file__), "..", "assets", "scenes", "*.scn")))
        assert len(paths) >= 24
        for path in paths:
            with open(path) as f:
                orig, target, scene = parse_scene(f.read())
            assert scene.num_spheres >= 1
            assert np.all(np.isin(np.asarray(scene.refl), [0, 1, 2, 3]))

    def test_malformed_inputs(self):
        with pytest.raises(SceneParseError):
            parse_scene("size 1\n")  # missing camera
        with pytest.raises(SceneParseError):
            parse_scene("camera 0 0 0 1 1 1\nsize 1\nsphere 1 0 0 0 0 0 0 1 1 1 7\n")
        with pytest.raises(SceneParseError):
            parse_scene("camera 0 0 0 1 1 1\nsize 2\nsphere 1 0 0 0 0 0 0 1 1 1 0\n")

    def test_cornell_light_is_emitter_not_lite(self):
        scene = builtin.cornell_box()
        lights = np.asarray(scene.is_light())
        assert lights.sum() == 1 and lights[8]
        assert int(scene.refl[8]) == REFR  # scene.h:16 marks the light REFR


class TestRng:
    def test_uniforms_deterministic_and_distinct(self):
        key = jax.random.key(0)
        a = rng.uniforms(key, 3, 2, rng.DIFF_UV, (128,))
        b = rng.uniforms(key, 3, 2, rng.DIFF_UV, (128,))
        c = rng.uniforms(key, 3, 2, rng.REFR_RR, (128,))
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(np.asarray(a), np.asarray(c))
        assert np.all((np.asarray(a) >= 0) & (np.asarray(a) < 1))

    def test_mwc_matches_reference_formula(self):
        # First draw from seeds (1, 2), computed by hand from simplernd.h:11-25.
        val, s0, s1 = rng.mwc_random(1, 2)
        assert s0 == 36969 and s1 == 36000
        ires = ((s0 << 16) + s1) & 0xFFFFFFFF
        bits = np.uint32((ires & 0x007FFFFF) | 0x40000000)
        expect = (float(np.frombuffer(bits.tobytes(), np.float32)[0]) - 2.0) / 2.0
        assert val == expect
        seq = rng.mwc_sequence(1, 2, 10)
        assert np.all((seq >= 0) & (seq < 1))

    def test_pool_fill(self):
        pool = rng.fill_pool(jax.random.key(7), 4096)
        assert pool.shape == (4096,)
        # Mean of U[0,1) over 4096 draws.
        assert abs(float(pool.mean()) - 0.5) < 0.02


class TestCamera:
    def test_basis_matches_reference_formula(self):
        # UpdateCamera (display_func.c:177-190) with width=641, height=481.
        w, h = 641, 481
        cam = Camera.make([50, 45, 205.6], [50, 44.957388, 204.6], w, h)
        fov = np.pi / 180.0 * 45.0
        d = np.array([0, 44.957388 - 45, 204.6 - 205.6])
        d = d / np.linalg.norm(d)
        np.testing.assert_allclose(cam.dir, d, rtol=1e-4, atol=1e-5)
        x = np.cross(d, [0, 1, 0])
        x = x / np.linalg.norm(x) * (w * fov / h)
        np.testing.assert_allclose(cam.x, x, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(cam.y)), fov,
                                   rtol=1e-5)


class TestMix32Contract:
    """The mix32 bitstream is FROZEN: these vectors were computed once
    (round 4) and pin the contract — any drift in the hash constants,
    key-derivation chain, or uniform conversion is a breaking change to
    replay stability and must fail here. The same vectors are checked
    ON DEVICE by tools/tpu_replay_check.py (u32 arithmetic is bit-exact
    on every XLA backend, so CPU==TPU is by construction — the tool
    proves the construction holds on real hardware)."""

    SEED_VECTORS = {
        0: (1197142749, 149646298),
        1: (2076871732, 3744768917),
        42: (1467968187, 1538299671),
        123456789: (4146660287, 1851957059),
    }
    FOLD_42_7 = (2816824906, 1087184347)
    STREAM_42_3_2_DIFF = (1088192210, 372474305)
    BITS_8 = (548861987, 1529853855, 2658193586, 2202051641,
              4195756677, 650042591, 1373203663, 3478316495)
    UNIFORM_8 = (0.127791882, 0.356196761, 0.618908882, 0.512705088,
                 0.976900697, 0.151349783, 0.319723845, 0.809858561)

    def test_seed_vectors(self):
        for seed, expect in self.SEED_VECTORS.items():
            kd = np.asarray(jax.random.key_data(rng.make_key(seed)))
            assert tuple(int(x) for x in kd) == expect, seed

    def test_fold_in_and_stream_key(self):
        k = rng.make_key(42)
        kf = jax.random.fold_in(k, jnp.uint32(7))
        assert tuple(
            int(x) for x in np.asarray(jax.random.key_data(kf))
        ) == self.FOLD_42_7
        ks = rng.stream_key(k, 3, 2, rng.DIFF_UV)
        assert tuple(
            int(x) for x in np.asarray(jax.random.key_data(ks))
        ) == self.STREAM_42_3_2_DIFF

    def test_bits_match_independent_numpy_model(self):
        ks = rng.stream_key(rng.make_key(42), 3, 2, rng.DIFF_UV)
        bits = np.asarray(jax.random.bits(ks, (8,), jnp.uint32))
        assert tuple(int(b) for b in bits) == self.BITS_8
        k0, k1 = (int(x) for x in np.asarray(jax.random.key_data(ks)))
        model = rng.mix32_reference(k0, k1, np.arange(8))
        assert np.array_equal(bits, model)

    def test_uniform_conversion_frozen(self):
        ks = rng.stream_key(rng.make_key(42), 3, 2, rng.DIFF_UV)
        u = np.asarray(jax.random.uniform(ks, (8,)))
        np.testing.assert_allclose(u, self.UNIFORM_8, rtol=0, atol=2e-9)
        # and the documented top-23-bit mapping from the bit stream
        expect = (np.asarray(self.BITS_8, np.uint32) >> np.uint32(9)
                  ).astype(np.float32) * np.float32(2.0 ** -23)
        assert np.array_equal(u, expect)

    def test_window_and_gather_invariance(self):
        """The lane-window / lane-gather replay contract (rng.py) holds
        under mix32 exactly as under threefry: values are a pure
        function of the global counter, never the lane position."""
        k = rng.make_key(5)
        full = rng.site_uniforms(k, 3, 1, rng.LIGHT_UV, 2, 64)
        win = rng.site_uniforms(k, 3, 1, rng.LIGHT_UV, 2, 16,
                                lane_offset=8, lane_total=64)
        assert np.array_equal(np.asarray(full[:, 8:24]), np.asarray(win))
        ids = jnp.array([5, 3, 60], jnp.int32)
        g = rng.site_uniforms(k, 3, 1, rng.LIGHT_UV, 2, 3,
                              lane_ids=ids, lane_total=64)
        assert np.array_equal(np.asarray(full[:, np.array([5, 3, 60])]),
                              np.asarray(g))

    def test_statistics_sane(self):
        u = np.asarray(rng.site_uniforms(rng.make_key(3), 0, 0,
                                         rng.DIFF_UV, 4, 1 << 16))
        assert abs(u.mean() - 0.5) < 2e-3
        assert abs(u.var() - 1.0 / 12.0) < 1e-3
        # distinct sites decorrelate
        a, b = u[0], u[1]
        assert abs(np.corrcoef(a, b)[0, 1]) < 0.02

    def test_wide_bit_draws_fail_loudly(self):
        """bit_width > 32 (x64 mode) must raise, not silently return a
        degenerate stream from an undefined out-of-range u32 shift
        (ADVICE r4)."""
        import pytest

        with pytest.raises(NotImplementedError, match="32-bit"):
            rng._mix32_random_bits(
                jax.random.key_data(rng.make_key(0)), 64, (4,))

    def test_distinct_sites_distinct_draws(self):
        k = rng.make_key(0)
        a = rng.site_uniforms(k, 0, 0, rng.DIFF_UV, 2, 32)
        b = rng.site_uniforms(k, 0, 1, rng.DIFF_UV, 2, 32)
        c = rng.site_uniforms(k, 1, 0, rng.DIFF_UV, 2, 32)
        d = rng.site_uniforms(k, 0, 0, rng.REFR_RR, 2, 32)
        for x, y in ((a, b), (a, c), (a, d), (b, c)):
            assert not np.allclose(np.asarray(x), np.asarray(y))
