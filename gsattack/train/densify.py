"""Adaptive density control with static capacity — jit-safe densify/prune.

Re-design of the reference's dynamic `torch.cat`-based density control
(`scene/gaussian_model.py:652-712`) for XLA's static-shape world: the scene
has a fixed capacity with an `alive` mask; clone/split children are
scattered into dead slots via a cumsum slot allocator, pruning just clears
`alive`. Capacity growth (host-side `grow_capacity`) happens outside jit.

Semantics preserved:
  * stats: accumulate ||d mean2d|| over visible points + visit counts
    (`add_densification_stats`, :710-712), track max screen radii
  * clone: grad >= thresh and max scale <= percent_dense * extent (:678-692)
  * split: grad >= thresh and max scale > percent_dense * extent; N=2
    children sampled from N(0, scale) rotated into world, child scale =
    scale / (0.8 N); parent pruned (:652-676)
  * prune: opacity < min_opacity, or (when screen-size limiting is on)
    radii2D > max_screen_size or world scale > 0.1 * extent (:694-708)
  * opacity reset: logit(min(opacity, 0.01)) (:413-416)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.scene import GaussianScene
from ..core.transforms import inverse_sigmoid, quat_to_rotmat


class DensifyStats(NamedTuple):
    xyz_gradient_accum: jnp.ndarray  # (C,)
    denom: jnp.ndarray  # (C,)
    max_radii2d: jnp.ndarray  # (C,)

    @staticmethod
    def zeros(capacity: int) -> "DensifyStats":
        return DensifyStats(
            jnp.zeros(capacity), jnp.zeros(capacity), jnp.zeros(capacity)
        )


def add_densification_stats(
    stats: DensifyStats,
    mean2d_grad: jnp.ndarray,  # (C, 2) d loss / d screen-space mean
    radii: jnp.ndarray,  # (C,) int
) -> DensifyStats:
    visible = radii > 0
    gnorm = jnp.linalg.norm(mean2d_grad, axis=-1)
    return DensifyStats(
        stats.xyz_gradient_accum + jnp.where(visible, gnorm, 0.0),
        stats.denom + visible.astype(jnp.float32),
        jnp.maximum(stats.max_radii2d, radii.astype(jnp.float32)),
    )


def _scatter_children(params, alive, want, child):
    """Place one child per `want`-masked slot into free (dead) slots.

    Children that do not fit (no free slot) are dropped. Collision-free:
    dropped children target a sacrificial padding row that is sliced away.
    Returns (params, alive, num_dropped).
    """
    c = alive.shape[0]
    free = ~alive
    free_rank = jnp.cumsum(free) - 1
    # rank -> slot index lookup (size c+1; rank c never queried for placed).
    rank_to_slot = jnp.full((c + 1,), c, jnp.int32).at[
        jnp.where(free, free_rank, c)
    ].set(jnp.arange(c, dtype=jnp.int32))
    num_free = free.sum()
    child_rank = jnp.cumsum(want) - 1
    placed = want & (child_rank < num_free)
    # Dropped/unwanted children write to the padding row c.
    dest = jnp.where(placed, rank_to_slot[jnp.clip(child_rank, 0, c)], c)

    new_params = {}
    for name, cur in params.items():
        pad = jnp.zeros((1,) + cur.shape[1:], cur.dtype)
        cur_pad = jnp.concatenate([cur, pad], axis=0)
        new_params[name] = cur_pad.at[dest].set(child[name])[:c]
    alive_pad = jnp.concatenate([alive, jnp.zeros(1, bool)])
    alive = alive_pad.at[dest].set(placed)[:c]
    dropped = (want & ~placed).sum()
    return new_params, alive, dropped


def _row_mask(mask, arr):
    """Broadcast a (C,) bool mask over the trailing dims of arr (C, ...)."""
    return mask.reshape((-1,) + (1,) * (arr.ndim - 1))


@functools.partial(jax.jit, static_argnames=("use_screen_limit",))
def densify_and_prune(
    scene: GaussianScene,
    stats: DensifyStats,
    key: jax.Array,
    moments=None,
    max_grad: float = 2e-4,
    min_opacity: float = 0.005,
    extent: float = 1.0,
    percent_dense: float = 0.01,
    max_screen_size: float = 20.0,
    use_screen_limit: bool = False,
) -> tuple[GaussianScene, DensifyStats, jnp.ndarray, object]:
    """One densification pass. Returns (scene, reset stats, num_dropped,
    moments).

    `moments` (optional) is a sequence of per-param trees (e.g. Adam's
    (mu, nu)) routed through the SAME slot allocator as the params:
    surviving points keep their moments, pruned slots and newly placed
    children get zeros — the reference's `_prune_optimizer` /
    `cat_tensors_to_optimizer` behavior (`scene/gaussian_model.py:573-650`),
    vs. wiping every moment each densification."""
    c = scene.num_points
    grads = stats.xyz_gradient_accum / jnp.maximum(stats.denom, 1.0)
    grads = jnp.nan_to_num(grads)
    scaling = scene.scaling
    max_scale = scaling.max(axis=-1)
    hot = (grads >= max_grad) & scene.alive
    clone_mask = hot & (max_scale <= percent_dense * extent)
    split_mask = hot & (max_scale > percent_dense * extent)

    # Prune first: frees slots for the children. Split parents are replaced.
    opacity = jax.nn.sigmoid(scene.opacity_logit[:, 0])
    prune = opacity < min_opacity
    if use_screen_limit:
        prune = prune | (stats.max_radii2d > max_screen_size) | (
            max_scale > 0.1 * extent
        )
    prune = (prune | split_mask) & scene.alive
    alive = scene.alive & ~prune

    snapshot = scene.params()
    params = dict(snapshot)
    dropped = jnp.zeros((), jnp.int32)

    # Fold the moment trees into the scattered dict under prefixed keys so
    # one allocator pass moves params and moments consistently. Pruned
    # slots' moments are zeroed (freed slots start clean) and child slots
    # get zero moments.
    moment_keys = []
    if moments is not None:
        for mi, tree in enumerate(moments):
            for k, v in tree.items():
                mk = f"__m{mi}.{k}"
                params[mk] = jnp.where(_row_mask(prune, v), 0.0, v)
                moment_keys.append(mk)

    def with_zero_moments(child):
        child = dict(child)
        for mk in moment_keys:
            child[mk] = jnp.zeros_like(params[mk])
        return child

    # Clone wave: exact copies of the (pre-update) parent attributes.
    params, alive, d0 = _scatter_children(
        params, alive, clone_mask, with_zero_moments(snapshot)
    )
    dropped = dropped + d0

    # Split waves: N=2 children resampled around the parent.
    n_split = 2
    rot = quat_to_rotmat(snapshot["quat"])  # (C, 3, 3)
    for i in range(n_split):
        noise = jax.random.normal(jax.random.fold_in(key, i), (c, 3)) * scaling
        child = dict(snapshot)
        child["xyz"] = jnp.einsum("nij,nj->ni", rot, noise) + snapshot["xyz"]
        child["log_scale"] = jnp.log(scaling / (0.8 * n_split))
        params, alive, di = _scatter_children(
            params, alive, split_mask, with_zero_moments(child)
        )
        dropped = dropped + di

    new_moments = None
    if moments is not None:
        new_moments = tuple(
            {k: params.pop(f"__m{mi}.{k}") for k in tree}
            for mi, tree in enumerate(moments)
        )
    out = scene.with_params(params).replace(alive=alive)
    return out, DensifyStats.zeros(c), dropped, new_moments


def reset_opacity(scene: GaussianScene) -> GaussianScene:
    """`reset_opacity` (`scene/gaussian_model.py:413-416`)."""
    new = inverse_sigmoid(
        jnp.minimum(jax.nn.sigmoid(scene.opacity_logit), 0.01)
    )
    return scene.replace(opacity_logit=new)


def grow_capacity(
    scene: GaussianScene,
    stats: DensifyStats,
    factor: float = 1.5,
    moments=None,
    round_to: int = 1,
):
    """Host-side capacity growth when free slots run out (outside jit).
    `moments` trees (if given) are zero-padded to the new capacity so
    surviving points keep their optimizer state. `round_to` rounds the
    new capacity up to a multiple (even splats-axis shards under a
    mesh)."""
    new_cap = int(scene.num_points * factor)
    new_cap = ((new_cap + round_to - 1) // round_to) * round_to
    padded = scene.pad_to(new_cap)
    c = new_cap
    n = scene.num_points
    grown = DensifyStats(
        jnp.zeros(c).at[:n].set(stats.xyz_gradient_accum),
        jnp.zeros(c).at[:n].set(stats.denom),
        jnp.zeros(c).at[:n].set(stats.max_radii2d),
    )
    if moments is None:
        return padded, grown
    grown_moments = tuple(
        {
            k: jnp.zeros((c,) + v.shape[1:], v.dtype).at[:n].set(v)
            for k, v in tree.items()
        }
        for tree in moments
    )
    return padded, grown, grown_moments
