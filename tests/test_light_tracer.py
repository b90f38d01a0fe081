"""Light pass: VPL deposits match the scalar golden mirror, and the
bidirectional estimator stays consistent with direct-only rendering."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpu_bidirectional_raytracer_tpu.core.types import IntegratorConfig
from gpu_bidirectional_raytracer_tpu.integrators import golden, light_tracer
from gpu_bidirectional_raytracer_tpu.integrators.direct import static_light_indices
from gpu_bidirectional_raytracer_tpu.scene import builtin


class TestLightTracerGoldenParity:
    @pytest.mark.parametrize("vpl_depth", [1, 3])
    def test_vpl_deposits_match_golden(self, vpl_depth):
        scene = builtin.cornell_box()
        cfg = IntegratorConfig(vpl_depth=vpl_depth, light_points=256)
        key = jax.random.key(5)
        li = static_light_indices(scene)
        vpls = light_tracer.trace_light_paths(scene, cfg, li, key,
                                              jnp.int32(0))
        scene_np = golden.scene_to_np(scene)
        tape = golden.make_light_tape(key, 0, cfg, cfg.light_points)

        v_hp = np.asarray(vpls.hp)
        v_rad = np.asarray(vpls.rad)
        v_nl = np.asarray(vpls.nl)
        v_valid = np.asarray(vpls.valid)

        mismatch = 0
        for lane in range(cfg.light_points):
            slots = golden.radiance_light_tracing(scene_np, cfg, li, tape,
                                                  lane)
            for d in range(vpl_depth):
                if slots[d] is None:
                    if v_valid[d, lane]:
                        mismatch += 1
                    continue
                if not v_valid[d, lane]:
                    mismatch += 1
                    continue
                ok = (np.allclose(v_hp[d, lane], slots[d]["hp"],
                                  rtol=1e-3, atol=1e-2)
                      and np.allclose(v_rad[d, lane], slots[d]["rad"],
                                      rtol=1e-3, atol=1e-3)
                      and np.allclose(v_nl[d, lane], slots[d]["nl"],
                                      rtol=1e-3, atol=1e-3))
                if not ok:
                    mismatch += 1
        # float32-vs-64 knife edges may flip a few lanes' walks
        frac = mismatch / (cfg.light_points * vpl_depth)
        assert frac <= 0.02, f"{frac:.3%} VPL slots disagree"

    def test_deposits_lie_on_geometry(self):
        scene = builtin.cornell_box()
        cfg = IntegratorConfig(light_points=512)
        li = static_light_indices(scene)
        vpls = light_tracer.trace_light_paths(scene, cfg, li,
                                              jax.random.key(2), jnp.int32(0))
        hp = np.asarray(vpls.hp[0])
        valid = np.asarray(vpls.valid[0])
        assert valid.mean() > 0.5, "most lanes should deposit"
        p = np.asarray(scene.p)
        rad = np.asarray(scene.rad)
        # each valid surface VPL lies within 1e-1 of SOME sphere surface
        dist = np.abs(np.linalg.norm(
            hp[valid][:, None, :] - p[None], axis=-1) - rad[None])
        assert (dist.min(axis=1) < 0.1).mean() > 0.95

    def test_round_robin_multi_light(self):
        # Two-light scene: lanes alternate lights.
        scene = builtin.cornell_box()
        e = scene.e.at[0].set(jnp.array([5.0, 5.0, 5.0]))  # left wall emits
        scene2 = scene.replace(e=e)
        li = static_light_indices(scene2)
        assert len(li) == 2
        cfg = IntegratorConfig(light_points=64)
        rays, lane_light, le = light_tracer.emit_light_rays(
            scene2, cfg, li, jax.random.key(0), jnp.int32(0))
        ll = np.asarray(lane_light)
        assert set(ll[::2]) == {li[0]} and set(ll[1::2]) == {li[1]}
