"""Checkpoint/resume tests: orbax TrainState roundtrip, iteration-dir
convention, capture/restore."""

import jax.numpy as jnp
import numpy as np

from gsattack.io.checkpoint import (
    capture,
    latest_step_dir,
    load_scene_iteration,
    restore,
    restore_checkpoint,
    save_checkpoint,
    save_scene_iteration,
)
from gsattack.train import TrainConfig, Trainer
from tests.conftest import make_toy_camera, make_toy_scene


def _trainer():
    t = Trainer(make_toy_scene(n=16), TrainConfig(densify_from_iter=10_000))
    return t


def test_orbax_roundtrip(tmp_path):
    t = _trainer()
    cam = make_toy_camera(width=32, height=32)
    gt = jnp.zeros((32, 32, 3))
    t.train_step(cam, gt)
    p = save_checkpoint(str(tmp_path / "ckpt"), t.state, step=1)
    t2 = _trainer()
    restored = restore_checkpoint(p, t2.state)
    np.testing.assert_allclose(
        np.asarray(restored.scene.xyz), np.asarray(t.state.scene.xyz)
    )
    assert int(restored.step) == 1
    assert latest_step_dir(str(tmp_path / "ckpt")).endswith("step_1")


def test_scene_iteration_convention(tmp_path):
    sc = make_toy_scene(n=8)
    save_scene_iteration(sc, str(tmp_path), 7000)
    save_scene_iteration(sc, str(tmp_path), 30000)
    loaded, it = load_scene_iteration(str(tmp_path), -1)
    assert it == 30000
    np.testing.assert_allclose(
        np.asarray(loaded.xyz), np.asarray(sc.xyz), atol=1e-6
    )


def test_capture_restore():
    t = _trainer()
    cam = make_toy_camera(width=32, height=32)
    t.train_step(cam, jnp.zeros((32, 32, 3)))
    snap = capture(t.state)
    t.train_step(cam, jnp.ones((32, 32, 3)))
    assert not np.allclose(
        np.asarray(t.state.scene.f_dc), np.asarray(snap["scene"].f_dc)
    )
    t.state = restore(t.state, snap)
    np.testing.assert_allclose(
        np.asarray(t.state.scene.f_dc), np.asarray(snap["scene"].f_dc)
    )
    assert int(t.state.step) == 1


def test_trainer_fit_checkpoints_and_resumes(tmp_path):
    from gsattack.io.checkpoint import latest_step_dir, restore_checkpoint
    from gsattack.render import render

    target = make_toy_scene(n=24, seed=20)
    cams = [make_toy_camera(width=24, height=24)]
    import jax.numpy as jnp
    import numpy as np

    gts = [np.asarray(render(target, cams[0], jnp.zeros(3))["render"])]
    cfg = TrainConfig(densify_from_iter=10_000, sh_increase_interval=10_000,
                      opacity_reset_interval=10_000)
    t = Trainer(make_toy_scene(n=24, seed=21), cfg)
    t.fit(cams, gts, iterations=6, checkpoint_dir=str(tmp_path / "ck"),
          checkpoint_every=3)
    latest = latest_step_dir(str(tmp_path / "ck"))
    assert latest.endswith("step_6")
    # resume: fresh trainer restores state and continues from step 6
    t2 = Trainer(make_toy_scene(n=24, seed=21), cfg)
    t2.state = restore_checkpoint(latest, t2.state)
    assert int(t2.state.step) == 6
    t2.fit(cams, gts, iterations=8)
    assert int(t2.state.step) == 8
