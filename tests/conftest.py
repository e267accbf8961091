"""Test harness: run on a virtual 8-device CPU mesh (SURVEY.md §4).

Env vars must be set before jax is imported anywhere.
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS=axon (one real TPU chip via
# a tunnel with slow remote compiles); tests must be fast + deterministic.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and overrides the
# platform list programmatically, so the env var alone is not enough.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def make_toy_scene(n=64, seed=0, max_sh_degree=3, spread=0.5, center=(0.0, 0.0, 3.0)):
    """A small random cloud in front of the default camera."""
    from gsattack.core import scene_from_points

    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)) * spread + np.asarray(center)
    cols = rng.uniform(0.05, 0.95, size=(n, 3))
    sc = scene_from_points(pts, cols, max_sh_degree=max_sh_degree)
    # Give the toy scene some variety in scale/rotation/opacity.
    k = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(k, 3)
    sc = sc.replace(
        log_scale=sc.log_scale + jax.random.normal(k1, sc.log_scale.shape) * 0.3,
        quat=sc.quat + jax.random.normal(k2, sc.quat.shape) * 0.2,
        opacity_logit=sc.opacity_logit + jax.random.normal(k3, sc.opacity_logit.shape),
        f_rest=jnp.asarray(
            rng.normal(size=sc.f_rest.shape).astype(np.float32) * 0.05
        ),
    )
    return sc


def make_toy_camera(width=64, height=64, fov=1.0, z=0.0):
    """Camera at origin looking down +z (world R=I, T=0 -> view=I)."""
    from gsattack.core import make_camera

    R = np.eye(3)
    T = np.array([0.0, 0.0, z])
    return make_camera(R, T, fov, fov, width, height)


@pytest.fixture
def toy_scene():
    return make_toy_scene()


@pytest.fixture
def toy_camera():
    return make_toy_camera()
