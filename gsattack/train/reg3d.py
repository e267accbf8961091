"""Gaussian-Grouping 3D object-feature regularizer.

The reference carries the knobs for this loss in its config
(`configs/config.yaml:37-41`: reg3d_interval / reg3d_k / reg3d_lambda_val /
reg3d_max_points / reg3d_sample_size) — the implementation lives in the
non-vendored gaussian-splatting submodule. Semantics (Gaussian Grouping,
Ye et al. 2023): sampled points' classifier distributions are pulled toward
their k nearest neighbors' — a KL consistency loss that makes spatially
close splats share object identity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.scene import GaussianScene


@functools.partial(jax.jit, static_argnames=("k", "sample_size", "max_points"))
def reg3d_loss(
    scene: GaussianScene,
    classifier_w: jnp.ndarray,  # (C, 16)
    classifier_b: jnp.ndarray,  # (C,)
    key: jax.Array,
    k: int = 5,
    sample_size: int = 1000,
    max_points: int = 300_000,
    lambda_val: float = 2.0,
) -> jnp.ndarray:
    """KL(p_neighbor || p_point) averaged over sampled points x k neighbors."""
    n = min(scene.num_points, max_points)
    xyz = scene.xyz[:n]
    logits = scene.obj_dc[:n, 0, :] @ classifier_w.T + classifier_b  # (n, C)
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)

    m = min(sample_size, n)
    idx = jax.random.choice(key, n, (m,), replace=False)
    q = xyz[idx]  # (m, 3)
    d2 = (
        jnp.sum(q * q, -1, keepdims=True)
        - 2.0 * q @ xyz.T
        + jnp.sum(xyz * xyz, -1)[None, :]
    )
    # k+1 nearest (first is self), like the grouping loss
    kk = min(k + 1, n)
    _, nbr = jax.lax.top_k(-d2, kk)
    nbr = nbr[:, 1:]  # (m, k)
    p_self = p[idx][:, None, :]  # (m, 1, C)
    logp_self = logp[idx][:, None, :]
    p_nbr = p[nbr]  # (m, k, C)
    logp_nbr = jnp.log(jnp.maximum(p_nbr, 1e-12))
    kl = jnp.sum(p_nbr * (logp_nbr - logp_self), axis=-1)  # (m, k)
    return lambda_val * kl.mean()
