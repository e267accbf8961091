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
