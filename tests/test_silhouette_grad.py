"""Primary-hit silhouette gradients: the straight-through coverage
estimator (``IntegratorConfig.sil_grad_tau`` +
``diff.gradients._silhouette_carrier``).

After ``vis_grad_tau`` (cast shadows), the remaining zero-gradient
structure in the detached-path estimator is the argmin hit id itself:
a sphere's VISIBLE silhouette sweeping across pixels carries no
gradient, so position/radius fitting against silhouette-dominated
targets drifts or diverges (the detached position gradient has the
wrong sign on the scene below). These tests pin:

1. the primal image is unchanged (the carrier is exactly zero);
2. silhouette-dominated derivatives approach finite differences where
   the detached estimator is badly wrong or sign-flipped;
3. the carrier composes with the pallas adjoint backend (it is applied
   OUTSIDE the tracer);
4. a sphere-position fit against a silhouette-dominated target
   converges where the detached estimator pushes the wrong way.

Scene: a floating diffuse sphere against empty sky (nothing behind it,
no shadow receiver), lit from behind the camera — the image derivative
w.r.t. the sphere's position/radius is dominated by its silhouette.
A fixed random pixel weighting breaks the left-edge/right-edge
cancellation so FD comparisons are sharp.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpu_bidirectional_raytracer_tpu.core.types import (
    Camera,
    IntegratorConfig,
    Scene,
)
from gpu_bidirectional_raytracer_tpu.diff import gradients as G
from gpu_bidirectional_raytracer_tpu.integrators.direct import static_light_indices

W, H = 64, 48


def _floating_sphere_scene():
    return Scene(
        rad=jnp.array([10.0, 5.0]),
        p=jnp.array([[0.0, 0.0, 0.0], [30.0, 40.0, 80.0]]),
        e=jnp.array([[0.0, 0.0, 0.0], [20.0, 20.0, 20.0]]),
        c=jnp.array([[0.6, 0.6, 0.2], [0.0, 0.0, 0.0]]),
        refl=jnp.array([0, 0], jnp.int32),
    )


@pytest.fixture(scope="module")
def setup():
    scene = _floating_sphere_scene()
    cam = Camera.make(jnp.array([0.0, 0.0, 60.0]),
                      jnp.array([0.0, 0.0, 0.0]), W, H)
    li = static_light_indices(scene)
    key = jax.random.key(0)
    wts = jax.random.uniform(jax.random.key(7), (H, W, 3))
    return scene, cam, li, key, wts


def _grads(setup, tau, param, idx, eps, spp=8, use_vpl=False):
    scene, cam, li, key, wts = setup
    base = (IntegratorConfig() if use_vpl else IntegratorConfig.cpu_golden())
    cfg = dataclasses.replace(base, sil_grad_tau=tau)

    def render_fn(sc):
        return G.render_radiance(sc, cam, key, cfg, W, H, li, spp)

    auto = jax.grad(lambda sc: jnp.sum(wts * render_fn(sc)),
                    allow_int=True)(scene)
    fd = float((np.asarray(wts)
                * G.pixel_grad_fd(scene, render_fn, param, idx, eps)).sum())
    return float(np.asarray(getattr(auto, param))[idx]), fd


class TestPrimalInvariance:
    def test_image_unchanged(self, setup):
        scene, cam, li, key, _ = setup
        cfg = IntegratorConfig.cpu_golden()
        cfg_t = dataclasses.replace(cfg, sil_grad_tau=2.0)
        a = np.asarray(G.render_radiance(scene, cam, key, cfg, W, H, li, 2))
        b = np.asarray(G.render_radiance(scene, cam, key, cfg_t, W, H, li, 2))
        # The carrier is exactly 0.0; the extra subgraph shares nothing
        # with the primal accumulation on this path.
        np.testing.assert_array_equal(a, b)

    def test_image_unchanged_bidirectional(self, setup):
        scene, cam, li, key, _ = setup
        cfg = IntegratorConfig()  # use_vpl=True
        cfg_t = dataclasses.replace(cfg, sil_grad_tau=2.0)
        a = np.asarray(G.render_radiance(scene, cam, key, cfg, W, H, li, 2))
        b = np.asarray(G.render_radiance(scene, cam, key, cfg_t, W, H, li, 2))
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


class TestSilhouetteFdAgreement:
    def test_radius_matches_fd(self, setup):
        # Growing the sphere grows its visible disc: the coverage term is
        # ~1/3 of the FD derivative here and the detached estimator misses
        # all of it.
        got_det, fd = _grads(setup, 0.0, "rad", (0,), 0.5)
        got_sil, _ = _grads(setup, 1.0, "rad", (0,), 0.5)
        assert abs(got_det - fd) / abs(fd) > 0.3, (got_det, fd)
        assert abs(got_sil - fd) / abs(fd) < 0.25, (got_sil, fd)

    def test_position_sign(self, setup):
        # Lateral/vertical motion: which pixels the disc covers is the
        # WHOLE derivative (uniform sky behind). The detached estimator
        # has the wrong sign on both axes; the coverage carrier agrees
        # with FD.
        for axis in (0, 1):
            got_det, fd = _grads(setup, 0.0, "p", (0, axis), 1.0)
            got_sil, _ = _grads(setup, 2.0, "p", (0, axis), 1.0)
            assert np.sign(got_det) != np.sign(fd), (axis, got_det, fd)
            assert np.sign(got_sil) == np.sign(fd), (axis, got_sil, fd)

    def test_composes_with_pallas_backend(self, setup):
        # The carrier is applied outside the tracer: the pallas custom-vjp
        # backend must carry the same silhouette gradient as the XLA path
        # (same tape, same estimator; interpret-mode pallas on CPU).
        scene, cam, li, key, _ = setup
        cfg = dataclasses.replace(IntegratorConfig(), sil_grad_tau=2.0,
                                  max_depth=2)

        def g(backend):
            return jax.grad(
                lambda sc: jnp.sum(G.render_radiance(
                    sc, cam, key, cfg, 16, 12, li, 1, backend)),
                allow_int=True)(scene)

        gx = g("xla")
        gp = g("pallas")
        np.testing.assert_allclose(np.asarray(gp.p), np.asarray(gx.p),
                                   rtol=2e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gp.rad), np.asarray(gx.rad),
                                   rtol=2e-3, atol=1e-5)


class TestMirrorSilhouette:
    """Secondary (mirror-seen) silhouettes: the carrier's specular leg.

    A diffuse sphere sits BEHIND the camera — never directly visible —
    and appears only as a reflection in a mirror. Its image derivative
    w.r.t. its own position/radius includes the motion of its reflected
    silhouette, which the detached estimator (and the bounce-0 carrier
    alone) cannot see.

    Scene-design constraint (measured, see the round-2 debug history): a
    small CONVEX mirror minifies — a sphere reflected in a rad-12 mirror
    covered 1 pixel at 64x48, so FD saw no coverage term at all and the
    detached estimator was accidentally "right". The fixture therefore
    uses a near-flat mirror (rad-1000 sphere, surface through the
    origin), which reflects the hidden sphere at ~1:1 scale across
    dozens of pixels. Two placements are pinned, both FD-verified here:

    - ``radius``: sphere rad 20 at (10,8,100) — the detached radius
      gradient has the WRONG SIGN (-22.9 vs FD +43.0); the specular-leg
      carrier (tau=2) restores sign and lands within 20%.
    - ``position``: sphere rad 25 at (15,10,120) — detached x-gradient
      err 0.10 vs FD; the carrier (tau=1) halves it.
    """

    def _build(self, which):
        from gpu_bidirectional_raytracer_tpu.core.types import SPEC

        sp, sr = (((10.0, 8.0, 100.0), 20.0) if which == "radius"
                  else ((15.0, 10.0, 120.0), 25.0))
        scene = Scene(
            rad=jnp.array([1000.0, sr, 5.0]),
            p=jnp.array([[0.0, 0.0, -1000.0],  # near-flat mirror at z~0
                         list(sp),             # seen only in the mirror
                         [0.0, 30.0, 80.0]]),  # light, behind camera
            e=jnp.array([[0.0, 0.0, 0.0],
                         [0.0, 0.0, 0.0],
                         [30.0, 30.0, 30.0]]),
            c=jnp.array([[0.9, 0.9, 0.9],
                         [0.7, 0.4, 0.2],
                         [0.0, 0.0, 0.0]]),
            refl=jnp.array([SPEC, 0, 0], jnp.int32),
        )
        cam = Camera.make(jnp.array([0.0, 0.0, 60.0]),
                          jnp.array([0.0, 0.0, 0.0]), W, H)
        li = static_light_indices(scene)
        key = jax.random.key(0)
        wts = jax.random.uniform(jax.random.key(7), (H, W, 3))
        return scene, cam, li, key, wts

    @pytest.fixture(scope="class")
    def msetup(self):
        return self._build("radius")

    def _mgrads(self, msetup, tau, param, idx, eps, spp=8):
        scene, cam, li, key, wts = msetup
        cfg = dataclasses.replace(IntegratorConfig.cpu_golden(),
                                  sil_grad_tau=tau)

        def render_fn(sc):
            return G.render_radiance(sc, cam, key, cfg, W, H, li, spp)

        auto = jax.grad(lambda sc: jnp.sum(wts * render_fn(sc)),
                        allow_int=True)(scene)
        fd = float((np.asarray(wts)
                    * G.pixel_grad_fd(scene, render_fn, param, idx,
                                      eps)).sum())
        return float(np.asarray(getattr(auto, param))[idx]), fd

    def test_seen_sphere_not_directly_visible(self, msetup):
        # The construction's premise: remove the mirror and the seen
        # sphere contributes nothing to the image.
        scene, cam, li, key, _ = msetup
        cfg = IntegratorConfig.cpu_golden()
        no_mirror = scene.replace(rad=scene.rad.at[0].set(1e-3))
        img = np.asarray(G.render_radiance(no_mirror, cam, key, cfg,
                                           W, H, li, 2))
        moved = no_mirror.replace(p=no_mirror.p.at[1, 0].add(5.0))
        img2 = np.asarray(G.render_radiance(moved, cam, key, cfg,
                                            W, H, li, 2))
        np.testing.assert_array_equal(img, img2)

    def test_primal_unchanged(self, msetup):
        scene, cam, li, key, _ = msetup
        cfg = IntegratorConfig.cpu_golden()
        cfg_t = dataclasses.replace(cfg, sil_grad_tau=2.0)
        a = np.asarray(G.render_radiance(scene, cam, key, cfg, W, H, li, 2))
        b = np.asarray(G.render_radiance(scene, cam, key, cfg_t,
                                         W, H, li, 2))
        np.testing.assert_array_equal(a, b)

    def test_mirror_silhouette_matches_fd(self, msetup):
        # The reflected-disc coverage term dominates the radius
        # derivative here: the detached estimator's sign is WRONG
        # (measured -22.9 vs FD +43.0); the specular-leg carrier must
        # restore the sign and land close.
        got_det, fd = self._mgrads(msetup, 0.0, "rad", (1,), 1.0)
        got_sil, _ = self._mgrads(msetup, 2.0, "rad", (1,), 1.0)
        err_det = abs(got_det - fd) / abs(fd)
        err_sil = abs(got_sil - fd) / abs(fd)
        assert np.sign(got_det) != np.sign(fd), (got_det, fd)
        assert np.sign(got_sil) == np.sign(fd), (got_sil, fd)
        assert err_det > 1.0, (got_det, fd)
        assert err_sil < 0.3, (got_sil, fd)

    def test_mirror_position_gradient_improves(self):
        # Lateral motion of the hidden sphere = its reflection sweeping
        # across mirror pixels; the specular leg must agree with FD in
        # sign and reduce the detached error.
        psetup = self._build("position")
        got_det, fd = self._mgrads(psetup, 0.0, "p", (1, 0), 2.0)
        got_sil, _ = self._mgrads(psetup, 1.0, "p", (1, 0), 2.0)
        assert np.sign(got_sil) == np.sign(fd), (got_sil, fd)
        assert abs(got_sil - fd) < abs(got_det - fd), (got_det, got_sil, fd)
        assert abs(got_sil - fd) / abs(fd) < 0.35, (got_sil, fd)


class TestTwoMirrorSilhouette:
    """Mirror-CHAIN silhouettes (``cfg.sil_spec_depth``): a sphere seen
    only through TWO mirrors (periscope) carries coverage gradient at
    ``sil_spec_depth=2`` and none at ``1`` (round-2 scope).

    Geometry (probed; the first cut at B-plane z=160 / target z=100 left
    a 5-pixel reflected disc and FD in the noise): near-flat mirror A
    (rad-1000, surface through z=0) fills the view; near-flat mirror B
    (surface through z=100) sits just behind the camera (z=60). One
    bounce off A shows the virtual camera at (0,0,-60) looking +z
    (vertical half-extent ~0.525*d); two bounces show the virtual
    camera at (0,0,260) looking -z. The target (rad 28 at (0,80,32))
    is OUTSIDE the one-bounce cone, INSIDE the two-bounce cone, clear
    of mirror A's sag, and subtends ~7 deg from the second virtual
    camera — a 41-pixel reflected disc (probed: visible ONLY via
    A -> B). Its light (0,120,90) clears both mirror surfaces on the
    shadow segment and is outside every virtual cone.
    """

    @pytest.fixture(scope="class")
    def psetup(self):
        from gpu_bidirectional_raytracer_tpu.core.types import SPEC

        scene = Scene(
            rad=jnp.array([1000.0, 1000.0, 28.0, 6.0]),
            p=jnp.array([[0.0, 0.0, -1000.0],   # mirror A, plane z~0
                         [0.0, 0.0, 1100.0],    # mirror B, plane z~100
                         [0.0, 80.0, 32.0],     # target: only via A->B
                         [0.0, 120.0, 90.0]]),  # light above the target
            e=jnp.array([[0.0, 0.0, 0.0],
                         [0.0, 0.0, 0.0],
                         [0.0, 0.0, 0.0],
                         [40.0, 40.0, 40.0]]),
            c=jnp.array([[0.9, 0.9, 0.9],
                         [0.9, 0.9, 0.9],
                         [0.7, 0.4, 0.2],
                         [0.0, 0.0, 0.0]]),
            refl=jnp.array([SPEC, SPEC, 0, 0], jnp.int32),
        )
        cam = Camera.make(jnp.array([0.0, 0.0, 60.0]),
                          jnp.array([0.0, 0.0, 0.0]), W, H)
        li = static_light_indices(scene)
        key = jax.random.key(0)
        wts = jax.random.uniform(jax.random.key(7), (H, W, 3))
        return scene, cam, li, key, wts

    def _pgrads(self, psetup, tau, param, idx, eps, spec_depth=2, spp=8):
        scene, cam, li, key, wts = psetup
        cfg = dataclasses.replace(IntegratorConfig.cpu_golden(),
                                  sil_grad_tau=tau,
                                  sil_spec_depth=spec_depth)

        def render_fn(sc):
            return G.render_radiance(sc, cam, key, cfg, W, H, li, spp)

        auto = jax.grad(lambda sc: jnp.sum(wts * render_fn(sc)),
                        allow_int=True)(scene)
        fd = float((np.asarray(wts)
                    * G.pixel_grad_fd(scene, render_fn, param, idx,
                                      eps)).sum())
        return float(np.asarray(getattr(auto, param))[idx]), fd

    def test_seen_only_through_two_mirrors(self, psetup):
        # Premise: shrink mirror B and the target leaves the image.
        scene, cam, li, key, _ = psetup
        cfg = IntegratorConfig.cpu_golden()
        no_b = scene.replace(rad=scene.rad.at[1].set(1e-3))
        img = np.asarray(G.render_radiance(no_b, cam, key, cfg,
                                           W, H, li, 2))
        moved = no_b.replace(p=no_b.p.at[2, 1].add(5.0))
        img2 = np.asarray(G.render_radiance(moved, cam, key, cfg,
                                            W, H, li, 2))
        np.testing.assert_array_equal(img, img2)

    def test_chain_radius_matches_fd(self, psetup):
        # Depth-1 carrier (round-2 scope) misses the twice-reflected
        # disc's coverage flux (probed: 8.3 vs FD 25.5 — the residue is
        # detached shading); the depth-2 leg restores it (29.1, 14% err).
        got_d1, fd = self._pgrads(psetup, 2.0, "rad", (2,), 1.0,
                                  spec_depth=1)
        got_d2, _ = self._pgrads(psetup, 2.0, "rad", (2,), 1.0,
                                 spec_depth=2)
        assert abs(got_d1 - fd) / abs(fd) > 0.5, (got_d1, fd)
        assert np.sign(got_d2) == np.sign(fd), (got_d2, fd)
        assert abs(got_d2 - fd) / abs(fd) < 0.35, (got_d2, fd)


class TestRefrSilhouette:
    """REFR (glass) primary silhouettes: the carrier fires on the argmin
    hit whatever its material, so a glass sphere's visible rim carries
    coverage gradient too (VERDICT r2 #7).

    Scene design (measured, round-3 probes): a DARK-tinted glass sphere
    (albedo 0.05 — still the full Fresnel/RR REFR branch) in front of a
    bright diffuse wall disc, empty sky elsewhere. The tint kills the
    lens confound (through-glass transmission of the moving background —
    a DEEPER silhouette structure the carrier intentionally does not
    model), so FD is dominated by the rim coverage term: the detached
    radius gradient misses nearly all of FD and the detached lateral
    gradient has the WRONG SIGN; the carrier (tau=1; at tau=2 the band
    outgrows the Fresnel rim structure and washes out) restores both.
    """

    @pytest.fixture(scope="class")
    def gsetup(self):
        from gpu_bidirectional_raytracer_tpu.core.types import REFR

        scene = Scene(
            rad=jnp.array([10.0, 25.0, 6.0]),
            p=jnp.array([[0.0, 0.0, 0.0],       # dark glass sphere
                         [0.0, 0.0, -40.0],     # bright wall disc behind
                         [0.0, 45.0, 55.0]]),   # light above-front
            e=jnp.array([[0.0, 0.0, 0.0],
                         [0.0, 0.0, 0.0],
                         [30.0, 30.0, 30.0]]),
            c=jnp.array([[0.05, 0.05, 0.05],
                         [0.8, 0.6, 0.3],
                         [0.0, 0.0, 0.0]]),
            refl=jnp.array([REFR, 0, 0], jnp.int32),
        )
        cam = Camera.make(jnp.array([0.0, 0.0, 60.0]),
                          jnp.array([0.0, 0.0, 0.0]), W, H)
        li = static_light_indices(scene)
        key = jax.random.key(0)
        wts = jax.random.uniform(jax.random.key(7), (H, W, 3))
        return scene, cam, li, key, wts

    def _ggrads(self, gsetup, tau, param, idx, eps, spp=12):
        scene, cam, li, key, wts = gsetup
        cfg = dataclasses.replace(IntegratorConfig.cpu_golden(),
                                  sil_grad_tau=tau)

        def render_fn(sc):
            return G.render_radiance(sc, cam, key, cfg, W, H, li, spp)

        auto = jax.grad(lambda sc: jnp.sum(wts * render_fn(sc)),
                        allow_int=True)(scene)
        fd = float((np.asarray(wts)
                    * G.pixel_grad_fd(scene, render_fn, param, idx,
                                      eps)).sum())
        return float(np.asarray(getattr(auto, param))[idx]), fd

    def test_glass_radius_matches_fd(self, gsetup):
        got_det, fd = self._ggrads(gsetup, 0.0, "rad", (0,), 0.5)
        got_sil, _ = self._ggrads(gsetup, 1.0, "rad", (0,), 0.5)
        # detached sees only the (tiny) transmitted/Fresnel shading terms
        assert abs(got_det - fd) / abs(fd) > 0.5, (got_det, fd)
        assert np.sign(got_sil) == np.sign(fd), (got_sil, fd)
        assert abs(got_sil - fd) / abs(fd) < 0.3, (got_sil, fd)

    def test_glass_position_sign(self, gsetup):
        got_det, fd = self._ggrads(gsetup, 0.0, "p", (0, 0), 1.0)
        got_sil, _ = self._ggrads(gsetup, 1.0, "p", (0, 0), 1.0)
        assert np.sign(got_det) != np.sign(fd), (got_det, fd)
        assert np.sign(got_sil) == np.sign(fd), (got_sil, fd)
        assert abs(got_sil - fd) < abs(got_det - fd), (got_det, got_sil,
                                                       fd)


class TestRefrRim:
    """Dark-glass REFR rim LATERAL gradient, measured right (VERDICT r4
    #2). The round-4 'carrier 62% under FD at tau=1, collapses at
    tau>=1.5' was a MEASUREMENT ARTIFACT: under uniform random pixel
    weights the ball's lateral coverage motion cancels (cover one rim
    side, uncover the other against a wide wall), so the true expected
    gradient is ~0 and single-tape FD estimates are pure subpixel
    aliasing noise (measured spread -5.6..+7.8 over 16 tapes, mean
    -0.02; one tape even flips sign between spp 12 and 48). Under
    x-RAMP weights — which give lateral motion a decisively nonzero
    expectation — 16-tape means (this round, CPU): detached -0.02,
    carrier tau=1 -8.92 +- 0.93, tau=1.5 -8.00 +- 0.79, FD -10.78 +-
    0.90: the carrier holds 83% of FD at tau=1 (17% err, within the
    lens-test bar) and 74% at tau=1.5 — no collapse. This test pins
    that protocol at 8 fixed tapes."""

    N_TAPES = 8

    @pytest.fixture(scope="class")
    def rsetup(self):
        from gpu_bidirectional_raytracer_tpu.core.types import REFR

        scene = Scene(
            rad=jnp.array([10.0, 25.0, 6.0]),
            p=jnp.array([[0.0, 0.0, 0.0],       # dark glass sphere
                         [0.0, 0.0, -40.0],     # bright wall disc
                         [0.0, 45.0, 55.0]]),   # light
            e=jnp.array([[0.0, 0.0, 0.0],
                         [0.0, 0.0, 0.0],
                         [30.0, 30.0, 30.0]]),
            c=jnp.array([[0.05, 0.05, 0.05],
                         [0.8, 0.6, 0.3],
                         [0.0, 0.0, 0.0]]),
            refl=jnp.array([REFR, 0, 0], jnp.int32),
        )
        cam = Camera.make(jnp.array([0.0, 0.0, 60.0]),
                          jnp.array([0.0, 0.0, 0.0]), W, H)
        li = static_light_indices(scene)
        xr = (jnp.arange(W, dtype=jnp.float32) / W)[None, :, None]
        wts = jnp.broadcast_to(xr, (H, W, 3))
        return scene, cam, li, wts

    def _means(self, rsetup, tau, spp=12):
        scene, cam, li, wts = rsetup
        cfg = dataclasses.replace(IntegratorConfig.cpu_golden(),
                                  sil_grad_tau=tau)
        wts_np = np.asarray(wts)
        cs, fs = [], []
        for seed in range(self.N_TAPES):
            key = jax.random.key(seed)

            def render_fn(sc, key=key):
                return G.render_radiance(sc, cam, key, cfg, W, H, li, spp)

            auto = jax.grad(lambda sc: jnp.sum(wts * render_fn(sc)),
                            allow_int=True)(scene)
            cs.append(float(np.asarray(auto.p)[0, 0]))
            fs.append(float((wts_np * G.pixel_grad_fd(
                scene, render_fn, "p", (0, 0), 1.0)).sum()))
        return float(np.mean(cs)), float(np.mean(fs))

    def test_lateral_within_25pct_at_tau1(self, rsetup):
        got, fd = self._means(rsetup, 1.0)
        assert np.sign(got) == np.sign(fd), (got, fd)
        assert abs(got - fd) / abs(fd) <= 0.25, (got, fd)

    def test_no_collapse_at_tau15(self, rsetup):
        got, fd = self._means(rsetup, 1.5)
        assert np.sign(got) == np.sign(fd), (got, fd)
        # >= half the flux survives the wider band (round 4 reported
        # collapse to ~0 under the broken protocol)
        assert abs(got) >= 0.5 * abs(fd), (got, fd)
        assert abs(got - fd) / abs(fd) <= 0.35, (got, fd)

    def test_detached_misses_the_flux(self, rsetup):
        got, fd = self._means(rsetup, 0.0)
        assert abs(got) < 0.2 * abs(fd), (got, fd)


class TestSilhouetteRecovery:
    def test_position_recovery_converges(self, setup):
        # Fit the sphere's position back from a 4-unit x offset. The
        # detached estimator pushes the WRONG way on this scene (see
        # test_position_sign); the coverage carrier converges.
        scene, cam, li, key, _ = setup
        cfg0 = IntegratorConfig.cpu_golden()
        target = G.render_radiance(scene, cam, key, cfg0, W, H, li, 4)
        wrong = scene.replace(p=scene.p.at[0, 0].add(4.0))
        cfg = dataclasses.replace(cfg0, sil_grad_tau=2.0)
        inv = G.InverseRenderer(scene=wrong, cam=cam, target=target,
                                cfg=cfg, width=W, height=H, lr=0.3, spp=4,
                                optimize=("p",), resample=False, loss="l2")
        e0 = abs(float(inv.scene.p[0, 0] - scene.p[0, 0]))
        for _ in range(40):
            inv.step()
        e1 = abs(float(inv.scene.p[0, 0] - scene.p[0, 0]))
        assert e0 == pytest.approx(4.0)
        assert e1 < 1.0, (e0, e1)


class TestLensSilhouette:
    """THROUGH-GLASS (lens) silhouettes (VERDICT r3 #3): the carrier's
    chain walk refracts through REFR hits on the deterministic
    transmission branch, so a sphere seen only THROUGH a clear glass
    ball carries coverage gradient.

    Scene (round-4 probes): clear glass sphere (rad 10) in front of a
    diffuse ball (rad 6 at z=-30, i.e. BEYOND the solid-ball focal
    length 1.5R=15 — a real inverted image), lit from above-behind so
    the shadow segment clears the glass. Measured at spp=12: lateral
    (y) position FD -36.8 vs detached -49.2 (33% off) vs depth-2
    carrier at tau=2 -35.3 (4% err); radius FD -9.9 vs detached -24.9.
    The depth-1 walk cannot reach through both interfaces (a glass
    sphere costs TWO legs), so sil_spec_depth=1 equals the detached
    answer — the premise that the new REFR legs carry the improvement.
    """

    @pytest.fixture(scope="class")
    def lsetup(self):
        from gpu_bidirectional_raytracer_tpu.core.types import REFR

        scene = Scene(
            rad=jnp.array([10.0, 6.0, 5.0]),
            p=jnp.array([[0.0, 0.0, 0.0],       # clear glass lens
                         [0.0, 0.0, -30.0],     # diffuse ball behind it
                         [0.0, 50.0, -20.0]]),  # light above-behind
            e=jnp.array([[0.0, 0.0, 0.0],
                         [0.0, 0.0, 0.0],
                         [30.0, 30.0, 30.0]]),
            c=jnp.array([[0.95, 0.95, 0.95],
                         [0.7, 0.4, 0.2],
                         [0.0, 0.0, 0.0]]),
            refl=jnp.array([REFR, 0, 0], jnp.int32),
        )
        cam = Camera.make(jnp.array([0.0, 0.0, 60.0]),
                          jnp.array([0.0, 0.0, 0.0]), W, H)
        li = static_light_indices(scene)
        key = jax.random.key(0)
        wts = jax.random.uniform(jax.random.key(7), (H, W, 3))
        return scene, cam, li, key, wts

    def _lgrads(self, lsetup, tau, param, idx, eps, spec_depth=2, spp=12):
        scene, cam, li, key, wts = lsetup
        cfg = dataclasses.replace(IntegratorConfig.cpu_golden(),
                                  sil_grad_tau=tau,
                                  sil_spec_depth=spec_depth)

        def render_fn(sc):
            return G.render_radiance(sc, cam, key, cfg, W, H, li, spp)

        auto = jax.grad(lambda sc: jnp.sum(wts * render_fn(sc)),
                        allow_int=True)(scene)
        fd = float((np.asarray(wts)
                    * G.pixel_grad_fd(scene, render_fn, param, idx,
                                      eps)).sum())
        return float(np.asarray(getattr(auto, param))[idx]), fd

    def test_ball_seen_only_through_lens(self, lsetup):
        # Premise: every primary ray toward the ball crosses the glass
        # first (the ball's cone from the camera is inside the lens').
        from gpu_bidirectional_raytracer_tpu import camera as cam_mod
        from gpu_bidirectional_raytracer_tpu.integrators import (
            intersect as isect,
        )

        scene, cam, li, key, _ = lsetup
        px, py = cam_mod.pixel_grid(W, H)
        uv = jnp.full((2, W * H), 0.5)
        rays = cam_mod.primary_rays(cam, W, H, uv[0], uv[1], px, py)
        _, _, hid = isect.intersect(scene, rays.o, rays.d)
        assert not bool(np.any(np.asarray(hid) == 1)), \
            "ball directly visible — not a lens scene"

    def test_lens_lateral_matches_fd(self, lsetup):
        got_det, fd = self._lgrads(lsetup, 0.0, "p", (1, 1), 1.0)
        got_d1, _ = self._lgrads(lsetup, 2.0, "p", (1, 1), 1.0,
                                 spec_depth=1)
        got_d2, _ = self._lgrads(lsetup, 2.0, "p", (1, 1), 1.0,
                                 spec_depth=2)
        assert abs(got_det - fd) / abs(fd) > 0.25, (got_det, fd)
        # depth-1 can't reach through both interfaces: no improvement
        assert abs(got_d1 - fd) / abs(fd) > 0.25, (got_d1, fd)
        assert np.sign(got_d2) == np.sign(fd), (got_d2, fd)
        assert abs(got_d2 - fd) / abs(fd) < 0.25, (got_d2, fd)

    def test_lens_radius_improves(self, lsetup):
        got_det, fd = self._lgrads(lsetup, 0.0, "rad", (1,), 0.5)
        got_d2, _ = self._lgrads(lsetup, 2.0, "rad", (1,), 0.5,
                                 spec_depth=2)
        assert abs(got_d2 - fd) < abs(got_det - fd), (got_det, got_d2, fd)

    def test_lens_position_fit_converges(self, lsetup):
        # Fit the ball's x back from a 3-unit offset THROUGH the lens.
        # The carrier descends to ~1 unit by ~step 60 then drifts on its
        # own bias floor (probed trajectories); the detached estimator
        # never descends. Fixed tape => deterministic on CPU.
        scene, cam, li, key, _ = lsetup
        cfg0 = IntegratorConfig.cpu_golden()
        target = G.render_radiance(scene, cam, key, cfg0, W, H, li, 4)
        wrong = scene.replace(p=scene.p.at[1, 0].add(3.0))
        cfg = dataclasses.replace(cfg0, sil_grad_tau=3.0, sil_spec_depth=2)

        def fit(use_cfg):
            inv = G.InverseRenderer(scene=wrong, cam=cam, target=target,
                                    cfg=use_cfg, width=W, height=H,
                                    lr=0.1, spp=4, optimize=("p",),
                                    resample=False, loss="l2")
            for _ in range(60):
                inv.step()
            return float(np.abs(np.asarray(
                inv.scene.p[1] - scene.p[1])).max())

        err_carrier = fit(cfg)
        err_detached = fit(cfg0)
        assert err_carrier < 2.0, err_carrier          # from 3.0
        assert err_carrier < err_detached, (err_carrier, err_detached)

    def test_lens_fit_annealed_lands_under_half_unit(self, lsetup):
        """Tau annealing (VERDICT r4 #6): the fixed-tau fit descends to
        ~1-1.8 units and then drifts on the carrier's sigmoid-band bias
        floor; shrinking tau 3.0 -> 0.15 over 150 steps (8 stages)
        tightens the equilibrium with the band. Measured this round:
        0.164 final / 0.156 best (vs 1.81 fixed-tau). Gate at 0.5 —
        3x margin."""
        scene, cam, li, key, _ = lsetup
        cfg0 = IntegratorConfig.cpu_golden()
        target = G.render_radiance(scene, cam, key, cfg0, W, H, li, 4)
        wrong = scene.replace(p=scene.p.at[1, 0].add(3.0))
        cfg = dataclasses.replace(cfg0, sil_grad_tau=3.0, sil_spec_depth=2)
        inv = G.InverseRenderer(scene=wrong, cam=cam, target=target,
                                cfg=cfg, width=W, height=H,
                                lr=0.1, spp=4, optimize=("p",),
                                resample=False, loss="l2",
                                tau_anneal=0.05, anneal_steps=150,
                                anneal_stages=8)
        for _ in range(240):
            inv.step()
        err = float(np.abs(np.asarray(inv.scene.p[1] - scene.p[1])).max())
        assert err < 0.5, err


class TestMirrorMotionSilhouette:
    """The chain walk's geometry is DIFFERENTIABLE through the stopped
    hit ids (round 4): moving the MIRROR moves the reflected image, and
    the terminal-hit coverage sweep now carries d(det)/d(mirror params)
    — previously zero (the walk was fully stopped). Probed: mirror-z
    FD +200.0 vs detached +33.4 vs carrier +164.1 (18% err)."""

    @pytest.fixture(scope="class")
    def msetup(self):
        from gpu_bidirectional_raytracer_tpu.core.types import SPEC

        scene = Scene(
            rad=jnp.array([1000.0, 14.0, 6.0]),
            p=jnp.array([[0.0, 0.0, -1000.0],   # near-flat mirror z~0
                         [0.0, 30.0, 80.0],     # target behind the camera
                         [0.0, 60.0, 60.0]]),   # light
            e=jnp.array([[0.0, 0.0, 0.0],
                         [0.0, 0.0, 0.0],
                         [30.0, 30.0, 30.0]]),
            c=jnp.array([[0.9, 0.9, 0.9],
                         [0.7, 0.4, 0.2],
                         [0.0, 0.0, 0.0]]),
            refl=jnp.array([SPEC, 0, 0], jnp.int32),
        )
        cam = Camera.make(jnp.array([0.0, 0.0, 60.0]),
                          jnp.array([0.0, 0.0, 0.0]), W, H)
        li = static_light_indices(scene)
        key = jax.random.key(0)
        wts = jax.random.uniform(jax.random.key(7), (H, W, 3))
        return scene, cam, li, key, wts

    def test_mirror_z_motion_matches_fd(self, msetup):
        scene, cam, li, key, wts = msetup

        def grads(tau):
            cfg = dataclasses.replace(IntegratorConfig.cpu_golden(),
                                      sil_grad_tau=tau, sil_spec_depth=2)

            def render_fn(sc):
                return G.render_radiance(sc, cam, key, cfg, W, H, li, 8)

            auto = jax.grad(lambda sc: jnp.sum(wts * render_fn(sc)),
                            allow_int=True)(scene)
            fd = float((np.asarray(wts)
                        * G.pixel_grad_fd(scene, render_fn, "p", (0, 2),
                                          2.0)).sum())
            return float(np.asarray(auto.p)[0, 2]), fd

        got_det, fd = grads(0.0)
        got_sil, _ = grads(1.5)
        # detached misses most of the reflected-image sweep
        assert abs(got_det - fd) / abs(fd) > 0.5, (got_det, fd)
        assert np.sign(got_sil) == np.sign(fd), (got_sil, fd)
        assert abs(got_sil - fd) / abs(fd) < 0.3, (got_sil, fd)


class TestGlassReflectedImage:
    """The Fresnel-REFLECTED image off glass (VERDICT r4 #7): the chain
    walk spawns a reflected branch at the primary glass hit (weight
    stop(Re)), so a sphere seen only MIRRORED in a glass ball carries a
    sign-correct coverage term. Measured (12-tape means, ramp weights,
    artifacts/REFR_REFLECT_BIAS.json): the term is real (-0.051 on the
    large-image scene, pulling toward FD -0.30 from the detached +0.26)
    but bounded by Re x convex-mirror minification — the rest of the
    FD-vs-detached residual is RR-population / two-interface structure
    outside the carrier family (documented bias). This test pins the
    premise and the mechanism's direction on fixed tapes."""

    @pytest.fixture(scope="class")
    def gsetup2(self):
        from gpu_bidirectional_raytracer_tpu.core.types import REFR

        scene = Scene(
            rad=jnp.array([20.0, 12.0, 40.0, 8.0]),
            p=jnp.array([[0.0, 0.0, 0.0],        # big clear glass ball
                         [28.0, 0.0, 55.0],      # red ball off-frustum
                         [0.0, 0.0, -70.0],      # grey wall
                         [0.0, 60.0, 60.0]]),    # light
            e=jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0],
                         [0.0, 0.0, 0.0], [40.0, 40.0, 40.0]]),
            c=jnp.array([[0.95, 0.95, 0.95], [0.9, 0.12, 0.08],
                         [0.45, 0.45, 0.45], [0.0, 0.0, 0.0]]),
            refl=jnp.array([REFR, 0, 0, 0], jnp.int32))
        cam = Camera.make(jnp.array([0.0, 0.0, 70.0]),
                          jnp.array([0.0, 0.0, 0.0]), W, H)
        return scene, cam, static_light_indices(scene)

    def test_object_hidden_from_camera(self, gsetup2):
        from gpu_bidirectional_raytracer_tpu import camera as cam_mod
        from gpu_bidirectional_raytracer_tpu.integrators import (
            intersect as isect,
        )

        scene, cam, li = gsetup2
        px, py = cam_mod.pixel_grid(W, H)
        uv = jnp.full((2, W * H), 0.5)
        rays = cam_mod.primary_rays(cam, W, H, uv[0], uv[1], px, py)
        _, _, hid = isect.intersect(scene, rays.o, rays.d)
        assert not bool(np.any(np.asarray(hid) == 1))

    def test_reflected_walk_pulls_toward_fd(self, gsetup2):
        scene, cam, li = gsetup2
        xr = (jnp.arange(W, dtype=jnp.float32) / W)[None, :, None]
        wts = jnp.broadcast_to(xr, (H, W, 3))

        def mean_grad(tau):
            vals = []
            for seed in range(6):
                key = jax.random.key(seed)
                cfg = dataclasses.replace(IntegratorConfig.cpu_golden(),
                                          sil_grad_tau=tau,
                                          sil_spec_depth=2)
                auto = jax.grad(
                    lambda sc: jnp.sum(wts * G.render_radiance(
                        sc, cam, key, cfg, W, H, li, 12)),
                    allow_int=True)(scene)
                vals.append(float(np.asarray(auto.p)[1, 0]))
            return float(np.mean(vals))

        got0 = mean_grad(0.0)
        got2 = mean_grad(2.0)
        # FD is negative here (artifact); the reflected-branch coverage
        # term must pull the carrier toward it by a pinned margin.
        assert got2 < got0 - 0.02, (got0, got2)
