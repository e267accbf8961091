"""Sharding specifications for the gsattack pytrees.

The natural parallel axes of this workload (SURVEY.md §2.4):
  * **splats**: every per-point array (xyz, SH, scales, ...) shards its
    leading N dimension — projection/SH/covariance and their backward are
    elementwise over N, so this axis needs no communication until the tile
    gather, and the attribute-gradient psum rides the same axis.
  * **views**: multi-camera PGD batches shard their leading B dimension —
    pure data parallelism; the loss mean turns into one psum.
Image tensors shard H over splats-axis devices when tile-parallel blending
is enabled (the blend loop is tile-local).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.camera import Camera
from ..core.scene import GaussianScene
from .mesh import SPLATS_AXIS, VIEWS_AXIS


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def scene_spec(scene: GaussianScene, axis: str = SPLATS_AXIS):
    """PartitionSpec pytree for a GaussianScene: shard every per-point
    leading dim over `axis`."""
    def leaf_spec(x):
        return P(axis) if hasattr(x, "ndim") and x.ndim >= 1 else P()

    return jax.tree_util.tree_map(leaf_spec, scene)


def camera_batch_spec(cams: Camera, axis: str = VIEWS_AXIS):
    """PartitionSpec pytree for a stacked Camera batch (leading view dim)."""
    return jax.tree_util.tree_map(lambda _: P(axis), cams)


def image_batch_spec(axis_views: str = VIEWS_AXIS):
    """(B, H, W, C) images: batch over views."""
    return P(axis_views)


def shard_scene(scene: GaussianScene, mesh: Mesh, axis: str = SPLATS_AXIS):
    spec = scene_spec(scene, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), scene, spec
    )


def shard_camera_batch(cams: Camera, mesh: Mesh, axis: str = VIEWS_AXIS):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(axis))), cams
    )


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
