"""Light-trace-to-film splatting (`light_tracer.splat_to_film` +
`render.progressive.light_splat_pass`): the living counterpart of the
reference's dead ``SamplePixels`` path (geomfunc.h:216-299)."""

import numpy as np

import jax
import jax.numpy as jnp

from gpu_bidirectional_raytracer_tpu import camera as cam_mod
from gpu_bidirectional_raytracer_tpu.core.types import (
    Camera,
    IntegratorConfig,
    VplBuffer,
)
from gpu_bidirectional_raytracer_tpu.integrators import light_tracer
from gpu_bidirectional_raytracer_tpu.integrators.direct import static_light_indices
from gpu_bidirectional_raytracer_tpu.render.progressive import (
    Renderer,
    light_splat_pass,
    init_state,
)
from gpu_bidirectional_raytracer_tpu.scene import builtin


def _vpls_at(points, rads=None, cfg=None):
    cfg = cfg or IntegratorConfig()
    k = len(points)
    pad = cfg.light_points - k
    hp = jnp.concatenate([jnp.asarray(points, jnp.float32),
                          jnp.zeros((pad, 3), jnp.float32)])[None]
    rad = (jnp.asarray(rads, jnp.float32) if rads is not None
           else jnp.ones((k, 3), jnp.float32))
    rad = jnp.concatenate([rad, jnp.zeros((pad, 3), jnp.float32)])[None]
    nl = jnp.zeros_like(hp)
    valid = jnp.concatenate([jnp.ones((k,), bool),
                             jnp.zeros((pad,), bool)])[None]
    return VplBuffer(hp=hp, rad=rad, nl=nl, valid=valid)


class TestProjectionInvertsCamera:
    def test_splat_lands_on_source_pixel(self):
        # A point along pixel (x, y)'s primary ray must splat back onto
        # pixel (x, y) — the film mapping is the exact inverse of
        # primary_rays (unlike the reference's 1.048/0.785 fudges, which
        # do not invert its own camera).
        scene = builtin.cornell_box()
        w, h = 16, 12
        cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                          builtin.DEFAULT_CAMERA_TARGET, w, h)
        px, py = cam_mod.pixel_grid(w, h)
        half = jnp.full((w * h,), 0.5, jnp.float32)
        rays = cam_mod.primary_rays(cam, w, h, half, half, px, py)
        points = rays.o + 37.0 * rays.d            # inside the box
        cfg = IntegratorConfig()
        vpls = _vpls_at(np.asarray(points), cfg=cfg)
        # empty scene (no occluders) isolates the projection
        empty = builtin.cornell_box().replace(
            rad=jnp.zeros_like(scene.rad))
        colors, count = light_tracer.splat_to_film(empty, cam, cfg, vpls,
                                                   w, h)
        got = np.asarray(count).reshape(-1)
        # every pixel receives exactly its own vertex
        np.testing.assert_array_equal(got, np.ones((w * h,), np.int32))

    def test_behind_camera_rejected(self):
        scene = builtin.cornell_box()
        w, h = 16, 12
        cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                          builtin.DEFAULT_CAMERA_TARGET, w, h)
        behind = np.asarray(cam.orig)[None, :] - np.array([[0.0, 0.0, 50.0]])
        # camera looks toward -z from +z in the default setup; a point
        # farther along +z than the origin projects with tz <= 0
        look = np.asarray(cam.dir)
        behind = np.asarray(cam.orig)[None, :] - 50.0 * look[None, :]
        cfg = IntegratorConfig()
        vpls = _vpls_at(behind, cfg=cfg)
        _, count = light_tracer.splat_to_film(scene, cam, cfg, vpls, w, h)
        assert int(np.asarray(count).sum()) == 0


class TestEyeVisibility:
    def test_occluded_vertex_does_not_splat(self):
        scene = builtin.cornell_box()
        w, h = 16, 12
        cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                          builtin.DEFAULT_CAMERA_TARGET, w, h)
        cfg = IntegratorConfig()
        # visible: a point on the open floor mid-box (clear line of
        # sight from the camera at (50,44,176)); occluded: a point
        # directly BEHIND the mirror sphere (center (27,16.5,47), r=16.5)
        # along the camera->center axis — the sphere blocks the segment.
        visible = np.array([[50.0, 0.5, 100.0]])
        occluded = np.array([[23.3, 12.1, 26.3]])
        vis_count = int(np.asarray(light_tracer.splat_to_film(
            scene, cam, cfg, _vpls_at(visible, cfg=cfg), w, h)[1]).sum())
        occ_count = int(np.asarray(light_tracer.splat_to_film(
            scene, cam, cfg, _vpls_at(occluded, cfg=cfg), w, h)[1]).sum())
        assert vis_count == 1
        assert occ_count == 0


class TestLightSplatPass:
    def test_progressive_light_render_accumulates(self):
        scene = builtin.cornell_box()
        w, h = 24, 18
        cam = Camera.make(builtin.DEFAULT_CAMERA_ORIG,
                          builtin.DEFAULT_CAMERA_TARGET, w, h)
        cfg = IntegratorConfig()
        li = static_light_indices(scene)
        state = init_state(w, h, cfg)
        for _ in range(4):
            state = light_splat_pass(scene, cam, state, cfg, w, h, li)
        colors = np.asarray(state.colors)
        counter = np.asarray(state.counter)
        assert np.isfinite(colors).all()
        assert counter.sum() > 0
        assert colors.max() > 0
        # splat counts vary per pixel; the mean must stay a mean (bounded
        # by the largest single contribution)
        assert colors.max() <= np.pi * 12.0 + 1e-3  # pi * max emission

    def test_renderer_step_light(self):
        scene = builtin.cornell_box()
        r = Renderer(scene, builtin.DEFAULT_CAMERA_ORIG,
                     builtin.DEFAULT_CAMERA_TARGET, 16, 12,
                     cfg=IntegratorConfig(), backend="xla")
        st = r.step_light()
        assert int(np.asarray(st.sample)) == 1
        assert np.isfinite(np.asarray(st.colors)).all()
