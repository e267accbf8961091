"""reg3d consistency-loss tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gsattack.train.reg3d import reg3d_loss
from tests.conftest import make_toy_scene


def test_reg3d_zero_when_uniform_features():
    sc = make_toy_scene(n=64)
    sc = sc.replace(obj_dc=jnp.ones_like(sc.obj_dc))
    w = jnp.asarray(np.random.default_rng(0).normal(size=(4, 16)).astype(np.float32))
    b = jnp.zeros(4)
    loss = reg3d_loss(sc, w, b, jax.random.PRNGKey(0), sample_size=32)
    assert abs(float(loss)) < 1e-5  # identical distributions -> zero KL


def test_reg3d_positive_when_neighbors_disagree():
    sc = make_toy_scene(n=64)
    rng = np.random.default_rng(1)
    obj = rng.normal(size=(64, 1, 16)).astype(np.float32) * 3
    sc = sc.replace(obj_dc=jnp.asarray(obj))
    w = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    b = jnp.zeros(4)
    loss = reg3d_loss(sc, w, b, jax.random.PRNGKey(0), sample_size=32)
    assert float(loss) > 0


def test_trainer_reg3d_wiring_converges_neighbor_features():
    """With use_reg3d on, the trainer's step pulls neighboring splats'
    grouping distributions together (VERDICT item 5: the reg3d knobs are
    live, not dead config)."""
    from gsattack.render import render
    from gsattack.train import TrainConfig, Trainer
    from tests.conftest import make_toy_camera

    rng = np.random.default_rng(3)
    target = make_toy_scene(n=48, seed=4)
    cam = make_toy_camera(width=32, height=32)
    gt = jnp.asarray(np.asarray(render(target, cam, jnp.zeros(3))["render"]))

    init = make_toy_scene(n=48, seed=5)
    init = init.replace(
        obj_dc=jnp.asarray(rng.normal(size=(48, 1, 16)).astype(np.float32) * 3)
    )
    w = rng.normal(size=(4, 16)).astype(np.float32)
    b = np.zeros(4, np.float32)
    cfg = TrainConfig(
        densify_from_iter=10_000, sh_increase_interval=10_000,
        opacity_reset_interval=10_000,
        use_reg3d=True, reg3d_interval=1, reg3d_sample_size=32,
        reg3d_lambda_val=10.0, feature_lr=2.5e-2,
    )
    trainer = Trainer(init, cfg, classifier=(w, b))
    wq, bq = jnp.asarray(w), jnp.asarray(b)

    def kl_now():
        return float(
            reg3d_loss(
                trainer.state.scene, wq, bq, jax.random.PRNGKey(99),
                sample_size=48,
            )
        )

    before = kl_now()
    for _ in range(50):
        trainer.train_step(cam, gt)
    after = kl_now()
    assert after < 0.7 * before, (before, after)


def test_reg3d_differentiable():
    sc = make_toy_scene(n=32)
    w = jnp.asarray(np.random.default_rng(2).normal(size=(4, 16)).astype(np.float32))
    b = jnp.zeros(4)

    def f(obj):
        return reg3d_loss(
            sc.replace(obj_dc=obj), w, b, jax.random.PRNGKey(1), sample_size=16
        )

    g = jax.grad(f)(sc.obj_dc)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
