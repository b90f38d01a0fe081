"""End-to-end render pipeline tests: progressive state, scheduler, film IO,
renderer driver, and interactive-equivalent edits."""

import os

import numpy as np

import jax.numpy as jnp

from gpu_bidirectional_raytracer_tpu import Renderer, IntegratorConfig
from gpu_bidirectional_raytracer_tpu.render import film
from gpu_bidirectional_raytracer_tpu.render.progressive import init_state
from gpu_bidirectional_raytracer_tpu.scene import builtin
from gpu_bidirectional_raytracer_tpu.scene.parser import load_scene

SCENES = os.path.join(os.path.dirname(__file__), "..", "assets", "scenes")


def _simple_renderer(w=32, h=24, cfg=None, **kw):
    orig, target, scene = load_scene(os.path.join(SCENES, "simple.scn"))
    return Renderer(scene, orig, target, w, h, cfg=cfg, **kw)


class TestProgressive:
    def test_progressive_mean_accumulates(self):
        r = _simple_renderer()
        s1 = r.step()
        img1 = np.asarray(s1.colors)
        s4 = r.step(), r.step(), r.step()
        img4 = np.asarray(r.state.colors)
        assert int(r.state.counter[0, 0]) == 4
        assert int(r.state.sample) == 4
        # Different samples → different jitter → means differ but are close.
        assert not np.array_equal(img1, img4)
        assert img4.max() > 0.01
        assert np.isfinite(img4).all()

    def test_progressive_mean_is_mean_of_samples(self):
        # Two independent 1-sample renders vs one 2-sample progressive run.
        r = _simple_renderer()
        radiances = []
        for _ in range(2):
            prev = np.asarray(r.state.colors)
            k = np.asarray(r.state.counter[0, 0])
            r.step()
            cur = np.asarray(r.state.colors)
            radiances.append(cur * (k + 1) - prev * k)
        mean = (radiances[0] + radiances[1]) / 2
        np.testing.assert_allclose(np.asarray(r.state.colors), mean,
                                   rtol=1e-4, atol=1e-5)

    def test_vpl_window_slides_on_reference_cadence(self):
        scene = builtin.cornell_box()
        cfg = IntegratorConfig()  # max_iter=3 → refresh every 2 passes
        r = Renderer(scene, builtin.DEFAULT_CAMERA_ORIG,
                     builtin.DEFAULT_CAMERA_TARGET, 16, 12, cfg=cfg)
        assert int(r.state.vlp_index) == 0
        r.step()
        assert int(r.state.vlp_index) == 0    # first refresh keeps window 0
        r.step()
        r.step()                              # sample 2 → due → slide
        assert int(r.state.vlp_index) == cfg.max_vlp
        assert bool(np.asarray(r.state.vpls.valid).any())

    def test_direct_only_darker_or_equal(self):
        # Direct lighting is a lower bound on full path tracing in mean.
        r_full = _simple_renderer(cfg=IntegratorConfig.cpu_golden())
        r_dir = _simple_renderer(cfg=IntegratorConfig.cpu_golden())
        full = r_full.render(8)
        direct = r_dir.render(8, direct_only=True)
        assert direct.mean() <= full.mean() + 1e-3


class TestFilm:
    def test_ppm_roundtrip(self, tmp_path):
        img = np.random.default_rng(0).uniform(0, 1.2, (6, 8, 3)).astype(np.float32)
        path = tmp_path / "out.ppm"
        film.write_ppm(img, path)
        back = film.read_ppm(path)
        np.testing.assert_array_equal(back, film.to_bytes(img))

    def test_snapshot_name_matches_reference_format(self):
        # smallpt_cpu.c:245: "max%d_secondi%.3f_exe%d.ppm"
        assert film.snapshot_name(1, 12.3456, 42) == "max1_secondi12.346_exe42.ppm"


class TestRendererDriver:
    def test_edit_sphere_resets_accumulation(self):
        r = _simple_renderer(16, 12)
        r.render(2)
        assert int(r.state.sample) == 2
        p_before = np.asarray(r.scene.p[1]).copy()
        r.edit_sphere(1, [5.0, 0.0, 0.0])
        assert int(r.state.sample) == 0
        np.testing.assert_allclose(np.asarray(r.scene.p[1]),
                                   p_before + [5, 0, 0])

    def test_move_camera_resets(self):
        r = _simple_renderer(16, 12)
        r.render(1)
        orig = np.asarray(r.camera.orig).copy()
        r.move_camera("dir", 10.0)
        assert int(r.state.sample) == 0
        assert not np.allclose(np.asarray(r.camera.orig), orig)

    def test_reference_dims_flag(self):
        r = _simple_renderer(16, 12, reference_dims=True)
        assert (r.width, r.height) == (17, 13)

    def test_auto_backend_routing(self, monkeypatch):
        """On TPU, auto picks pallas for both kernel regimes (megakernel
        <=64 spheres, per-depth bounce kernel 65..1024 — render_pass routes
        by count) and XLA above the bounce kernel's unroll budget; on CPU,
        always XLA. Validated on real v5e: complex.scn via auto renders
        finite through ops/pallas_bounce."""
        import jax

        from gpu_bidirectional_raytracer_tpu.core.types import Scene
        from gpu_bidirectional_raytracer_tpu.render import progressive

        def scene_with(n):
            base = builtin.cornell_box()
            reps = (n + int(base.num_spheres) - 1) // int(base.num_spheres)
            return Scene(
                rad=jnp.tile(base.rad, reps)[:n],
                p=jnp.tile(base.p, (reps, 1))[:n],
                e=jnp.tile(base.e, (reps, 1))[:n],
                c=jnp.tile(base.c, (reps, 1))[:n],
                refl=jnp.tile(base.refl, reps)[:n])

        def make(n):
            return Renderer(scene_with(n), [50, 45, 200], [50, 45, 0],
                            8, 8, backend="auto")

        assert make(9).backend == "xla"  # CPU: never pallas
        monkeypatch.setattr(progressive.jax, "default_backend",
                            lambda: "tpu")
        assert make(9).backend == "pallas"
        assert make(783).backend == "pallas"
        assert make(1500).backend == "xla"

    def test_state_is_checkpointable_pytree(self):
        import jax

        state = init_state(8, 8, IntegratorConfig())
        leaves = jax.tree.leaves(state)
        assert all(hasattr(l, "shape") for l in leaves)
        flat, treedef = jax.tree.flatten(state)
        restored = jax.tree.unflatten(treedef, flat)
        assert int(restored.sample) == 0


class TestTiledRendering:
    def test_tiled_matches_untiled_bitwise(self):
        # Bands draw windows of the GLOBAL per-frame tape (rng.site_uniforms
        # lane_offset), so tiling is a pure memory-layout choice: bitwise
        # the same image as the monolithic render.
        full = _simple_renderer(32, 24)
        tiled = _simple_renderer(32, 24, tile_rows=10)  # 10+10+4 bands
        a = full.render(6)
        b = tiled.render(6)
        assert np.isfinite(b).all()
        np.testing.assert_array_equal(a, b)
        assert int(tiled.state.sample) == 6

    def test_tiled_matches_untiled_bitwise_with_vpls(self):
        # The VPL buffer is traced once per frame from the same key/sample,
        # so the bidirectional estimator is tiling-invariant too.
        scene = builtin.cornell_box()
        cfg = IntegratorConfig()
        full = Renderer(scene, builtin.DEFAULT_CAMERA_ORIG,
                        builtin.DEFAULT_CAMERA_TARGET, 16, 12, cfg=cfg)
        tiled = Renderer(scene, builtin.DEFAULT_CAMERA_ORIG,
                         builtin.DEFAULT_CAMERA_TARGET, 16, 12, cfg=cfg,
                         tile_rows=5)
        a = full.render(4)
        b = tiled.render(4)
        np.testing.assert_array_equal(a, b)

    def test_tiled_vpl_schedule_still_slides(self):
        from gpu_bidirectional_raytracer_tpu.scene import builtin as bi

        scene = bi.cornell_box()
        r = Renderer(scene, bi.DEFAULT_CAMERA_ORIG, bi.DEFAULT_CAMERA_TARGET,
                     16, 12, cfg=IntegratorConfig(), tile_rows=5)
        for _ in range(3):
            r.step()
        assert int(r.state.vlp_index) == r.cfg.max_vlp
        assert bool(np.asarray(r.state.vpls.valid).any())


class TestChunkedRendering:
    def test_chunked_matches_stepped_bitwise(self):
        # render_chunk's loop body IS the stepped pass body, so fusing k
        # passes into one program must reproduce the stepped render
        # exactly (bidirectional estimator incl. the VPL schedule cond).
        scene = builtin.cornell_box()
        stepped = Renderer(scene, builtin.DEFAULT_CAMERA_ORIG,
                           builtin.DEFAULT_CAMERA_TARGET, 16, 12,
                           cfg=IntegratorConfig())
        chunked = Renderer(scene, builtin.DEFAULT_CAMERA_ORIG,
                           builtin.DEFAULT_CAMERA_TARGET, 16, 12,
                           cfg=IntegratorConfig())
        a = stepped.render(5)
        b = chunked.render(5, chunk=5)
        np.testing.assert_array_equal(a, b)
        assert int(chunked.state.sample) == 5
        assert int(chunked.state.vlp_index) == int(stepped.state.vlp_index)

    def test_chunk_boundary_invariance(self):
        # 2+3 chunked == 5 stepped; one compile serves both chunk sizes
        # (dynamic trip count).
        r1 = _simple_renderer(16, 12)
        r2 = _simple_renderer(16, 12)
        a = r1.render(5)
        r2.step_n(2)
        r2.step_n(3)
        b = np.asarray(r2.state.colors)
        np.testing.assert_array_equal(a, b)

    def test_chunked_tiled(self):
        full = _simple_renderer(32, 24)
        tiled = _simple_renderer(32, 24, tile_rows=10)
        a = full.render(4)
        b = tiled.render(4, chunk=4)
        np.testing.assert_array_equal(a, b)


class TestFastRng:
    """Serving-mode tape (``rng_impl='rbg'``): XLA's RngBitGenerator
    replaces threefry (measured ~140x cheaper tape on v5e — about half
    the megakernel pass). Same estimator, same site addressing; NOT
    bitwise-replayable across backends (documented in init_state)."""

    def test_deterministic_and_distinct_from_threefry(self):
        a = _simple_renderer(24, 18, rng_impl="rbg")
        b = _simple_renderer(24, 18, rng_impl="rbg")
        t = _simple_renderer(24, 18)
        ia = a.render(3, chunk=3)
        ib = b.render(3)  # chunked == stepped holds for rbg too
        it = t.render(3)
        assert np.isfinite(ia).all()
        np.testing.assert_array_equal(ia, ib)
        assert not np.array_equal(ia, it)

    def test_statistically_consistent_with_threefry(self):
        # Both tapes estimate the same integral: image means agree within
        # MC noise at modest spp. use_vpl=False keeps pixels independent
        # (shared light subpaths correlate the whole image per pass, which
        # would need far more samples for a tight mean bound).
        cfg = IntegratorConfig(use_vpl=False)
        a = _simple_renderer(24, 18, cfg=cfg, rng_impl="rbg").render(
            96, chunk=16)
        t = _simple_renderer(24, 18, cfg=cfg).render(96, chunk=16)
        # measured: rel gap 12% @ 24spp -> 4.4% @ 96spp (432-pixel frame;
        # converging MC noise, no bias)
        assert abs(a.mean() - t.mean()) < 0.12 * max(t.mean(), 1e-6)


class TestSampleCap:
    def test_accumulation_freezes_at_cap(self):
        # device.cu:607 — pixels stop accumulating at max_samples.
        r = _simple_renderer(16, 12, cfg=IntegratorConfig(max_samples=3,
                                                          use_vpl=False))
        r.render(5)
        assert int(np.asarray(r.state.counter).max()) == 3
        frozen = np.asarray(r.state.colors).copy()
        r.step()
        np.testing.assert_array_equal(np.asarray(r.state.colors), frozen)


class TestStratification:
    def test_stratified_covers_subpixel_grid(self):
        import jax
        from gpu_bidirectional_raytracer_tpu import camera as cam_mod

        u = jnp.full((16,), 0.5)
        seen = set()
        for s in range(4):
            ju, jv = cam_mod.stratify_jitter(u, u, jnp.int32(s), 2)
            seen.add((float(ju[0]) // 0.5, float(jv[0]) // 0.5))
        assert len(seen) == 4  # all 4 strata of the 2x2 grid visited

    def test_stratified_render_finite_and_differs(self):
        base = _simple_renderer(16, 12, cfg=IntegratorConfig(use_vpl=False))
        strat = _simple_renderer(16, 12, cfg=IntegratorConfig(use_vpl=False,
                                                              stratify=2))
        a = base.render(4)
        b = strat.render(4)
        assert np.isfinite(b).all()
        assert not np.array_equal(a, b)
        # median-based agreement: at this tiny scale the mean is dominated
        # by whichever samples happen to hit the emitter directly
        assert abs(np.median(a) - np.median(b)) < 0.05


class TestReviewRegression:
    """Regression tests for the round-1 self-review findings."""

    def test_tiled_honors_direct_only(self):
        # Tiled direct-only must match untiled direct-only statistically
        # and be darker-or-equal vs full GI (finding: flag was dropped).
        cfg = IntegratorConfig.cpu_golden()
        full = _simple_renderer(24, 18, cfg=cfg, tile_rows=6)
        direct = _simple_renderer(24, 18, cfg=cfg, tile_rows=6)
        a = full.render(4)
        b = direct.render(4, direct_only=True)
        assert b.mean() <= a.mean() + 1e-3

    def test_reset_preserves_seed(self):
        r7a = _simple_renderer(12, 9, seed=7)
        img_a = r7a.render(2)
        r7b = _simple_renderer(12, 9, seed=7)
        r7b.render(1)
        r7b.reset()           # must restart with seed 7, not 0
        img_b = r7b.render(2)
        np.testing.assert_array_equal(img_a, img_b)

    def test_parser_rejects_fractional_fields(self):
        from gpu_bidirectional_raytracer_tpu.scene.parser import (
            SceneParseError, parse_scene)
        import pytest

        with pytest.raises(SceneParseError, match="integer"):
            parse_scene("camera 0 0 0 1 1 1\nsize 1\n"
                        "sphere 1 0 0 0 0 0 0 1 1 1 2.9\n")
        with pytest.raises(SceneParseError, match="non-numeric"):
            parse_scene("camera 0 0 x 1 1 1\nsize 1\n"
                        "sphere 1 0 0 0 0 0 0 1 1 1 0\n")


def test_default_rng_impl_is_mix32():
    """The default render tape is the frozen mix32 contract (rng.py) —
    a silent flip back to threefry would halve the sustained pass
    (artifacts/RNG_TAPE.json) and change every default-seed render."""
    from gpu_bidirectional_raytracer_tpu.core.types import IntegratorConfig
    from gpu_bidirectional_raytracer_tpu.render.progressive import init_state

    st = init_state(8, 8, IntegratorConfig())
    assert "mx32" in str(st.key.dtype), st.key.dtype
