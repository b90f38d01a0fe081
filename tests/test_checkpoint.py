"""Checkpoint/resume: the RenderState pytree round-trips through orbax and
resumed rendering continues bit-identically (counter-addressed RNG)."""

import numpy as np

from gpu_bidirectional_raytracer_tpu import IntegratorConfig, Renderer
from gpu_bidirectional_raytracer_tpu.render.progressive import init_state
from gpu_bidirectional_raytracer_tpu.scene import builtin
from gpu_bidirectional_raytracer_tpu.utils import checkpoint as ckpt


def _renderer():
    return Renderer(builtin.test_scene(), [20, 80, 300], [0, 15, 0], 16, 12,
                    cfg=IntegratorConfig.cpu_golden())


def test_roundtrip_and_bitwise_resume(tmp_path):
    d = str(tmp_path / "ck")

    r1 = _renderer()
    r1.render(3)
    colors_at_3 = np.asarray(r1.state.colors).copy()
    ckpt.save(d, r1.state)
    r1.render(2)  # continue to 5 in-process

    r2 = _renderer()
    restored = ckpt.restore(d, init_state(16, 12, r2.cfg))
    assert restored is not None
    assert int(restored.sample) == 3
    np.testing.assert_array_equal(np.asarray(restored.colors), colors_at_3)
    r2.state = restored
    r2.render(2)  # resume to 5

    np.testing.assert_array_equal(np.asarray(r2.state.colors),
                                  np.asarray(r1.state.colors))
    assert int(r2.state.sample) == 5


def test_restore_missing_returns_none(tmp_path):
    assert ckpt.restore(str(tmp_path / "nope"), None) is None


def test_cross_impl_resume_is_rejected_clearly(tmp_path, capsys):
    """--resume under a different --fast-rng setting than the checkpoint
    was written with must fail with a CLEAR error, not silently continue
    on the checkpoint's RNG / an opaque orbax mismatch (ADVICE r3)."""
    import os

    from gpu_bidirectional_raytracer_tpu import cli

    scn = os.path.join(os.path.dirname(__file__), "..", "assets",
                       "scenes", "simple.scn")
    ckdir = str(tmp_path / "ck")
    out = str(tmp_path / "a.ppm")
    rc = cli.main(["render", scn, "--width", "16", "--height", "12",
                   "--spp", "2", "--mode", "cpu", "--checkpoint", ckdir,
                   "--out", out])
    assert rc == 0
    rc = cli.main(["render", scn, "--width", "16", "--height", "12",
                   "--spp", "4", "--mode", "cpu", "--checkpoint", ckdir,
                   "--resume", "--fast-rng", "--out", out])
    assert rc == 2
    err = capsys.readouterr().err
    assert "different --rng/--fast-rng setting" in err
    # The hint names the flag matching the STORED impl (mix32 default).
    assert "without --rng/--fast-rng" in err


def test_mix32_registry_hook_active():
    """mix32 must resolve by name in jax's PRNG registry — that is what
    makes mix32 checkpoints restorable (wrap_key_data(impl="mx32")). A
    jax upgrade that moves the registry must fail HERE, loudly, instead
    of surfacing later as an opaque user-facing restore error (ADVICE
    r4)."""
    from gpu_bidirectional_raytracer_tpu import rng

    assert rng.mix32_is_registered()


def test_threefry_checkpoint_hint_names_rng_flag(tmp_path, capsys):
    """A pre-round-4 (threefry) checkpoint resumed under today's mix32
    default must point at `--rng threefry`, not at --fast-rng (ADVICE
    r4: with three impls the common mismatch is the impl default
    change, which only the dtype check catches)."""
    import os

    from gpu_bidirectional_raytracer_tpu import cli

    scn = os.path.join(os.path.dirname(__file__), "..", "assets",
                       "scenes", "simple.scn")
    ckdir = str(tmp_path / "ck")
    out = str(tmp_path / "a.ppm")
    rc = cli.main(["render", scn, "--width", "16", "--height", "12",
                   "--spp", "2", "--mode", "cpu", "--rng", "threefry",
                   "--checkpoint", ckdir, "--out", out])
    assert rc == 0
    rc = cli.main(["render", scn, "--width", "16", "--height", "12",
                   "--spp", "4", "--mode", "cpu", "--checkpoint", ckdir,
                   "--resume", "--out", out])
    assert rc == 2
    err = capsys.readouterr().err
    assert "--rng threefry" in err
