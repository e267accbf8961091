"""K-nearest-neighbor mean squared distance for scale initialization.

TPU-native replacement for the reference's `simple_knn._C.distCUDA2`
(`scene/gaussian_model.py:17,144`): mean squared distance from each point to
its 3 nearest neighbors. We compute exact chunked pairwise distances with a
top-k — O(N^2) FLOPs but they run on the MXU as one big matmul per chunk,
and this is a one-shot initialization, not a hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def mean_knn_dist2(points: jnp.ndarray, k: int = 3, chunk: int = 4096) -> jnp.ndarray:
    """(N, 3) -> (N,) mean squared distance to the k nearest neighbors."""
    n = points.shape[0]
    sq = jnp.sum(points * points, axis=-1)  # (N,)
    n_pad = ((n + chunk - 1) // chunk) * chunk
    pts_pad = jnp.pad(points, ((0, n_pad - n), (0, 0)))
    sq_pad = jnp.pad(sq, (0, n_pad - n))

    def one_chunk(c_pts, c_sq, c_valid):
        # d2[i, j] = |c_i|^2 - 2 c_i . p_j + |p_j|^2  (MXU matmul for the cross term)
        cross = c_pts @ points.T  # (chunk, N)
        d2 = c_sq[:, None] - 2.0 * cross + sq[None, :]
        d2 = jnp.maximum(d2, 0.0)
        # Exclude self-distance: it is ~0; drop the single smallest by taking k+1.
        kk = min(k + 1, n)
        neg_topk = jax.lax.top_k(-d2, kk)[0]  # (chunk, kk) of -d2, ascending d2
        knn = -neg_topk[:, 1:]  # drop self
        if knn.shape[1] == 0:
            knn = jnp.zeros((knn.shape[0], 1), d2.dtype)
        return jnp.where(c_valid[:, None], knn, 0.0).mean(axis=-1)

    chunks = n_pad // chunk
    pts_c = pts_pad.reshape(chunks, chunk, 3)
    sq_c = sq_pad.reshape(chunks, chunk)
    idx = jnp.arange(n_pad).reshape(chunks, chunk)
    out = jax.lax.map(lambda args: one_chunk(args[0], args[1], args[2] < n), (pts_c, sq_c, idx))
    return out.reshape(n_pad)[:n]
