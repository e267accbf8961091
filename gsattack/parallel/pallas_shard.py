"""Pallas fast path × device mesh — shard_map composition.

r1 left the two best paths uncomposed: the pallas kernels were single-chip
and the (views, splats) mesh only ran the XLA blend (VERDICT r2 item 2).
This module runs the batched pallas render under `shard_map`:

  * scene params shard over the **splats** axis (and are replicated across
    the views axis);
  * each device projects its local splat shard for its local camera shard
    (projection is elementwise over points — zero communication);
  * the projected per-gaussian quantities (mean2d/conic/opacity/depth/
    radius/colors — ~27 floats/splat vs 59+ raw SH params) are
    `all_gather`ed along splats over ICI;
  * binning, packing and the batched (views, tiles)-grid pallas blend run
    locally per views-shard.

Backward: the all_gather transposes to a reduce-scatter routing per-
gaussian gradients back to their splat shard, and shard_map's transpose
psums the cross-view contributions for the views-replicated scene input —
the XLA-collective analogue of the NCCL all-reduce the reference never had
(SURVEY.md §2.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.camera import Camera
from ..core.scene import GaussianScene
from ..ops.project import project
from ..ops.raster import rasterize_views
from .mesh import SPLATS_AXIS, VIEWS_AXIS
from .shardings import camera_batch_spec, scene_spec

from jax import shard_map


def render_views_sharded(
    scene: GaussianScene,
    cams: Camera,  # stacked camera batch (leading V dim, V % mesh.views == 0)
    bg: jnp.ndarray,
    mesh: Mesh,
    pairs_per_gaussian: int = 32,
    max_chunks: int = 16,
    pairs_budget: int = 0,
    interpret: bool = False,
    backend: str = "pallas",
) -> jnp.ndarray:
    """Sharded multi-view render -> (V, H, W, 3), differentiable w.r.t.
    the (splats-sharded) scene. `interpret=True` runs the kernels in
    interpret mode (CPU-mesh tests); `backend="xla"` swaps in the XLA
    blend under the same sharding layout."""
    width, height = cams.width, cams.height

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(scene_spec(scene), camera_batch_spec(cams), P()),
        out_specs=P(VIEWS_AXIS),
        check_vma=False,
    )
    def f(scene_shard, cams_shard, bg_):
        proj_local = jax.vmap(lambda c: project(scene_shard, c))(cams_shard)
        proj_full = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(
                x, SPLATS_AXIS, axis=1, tiled=True
            ),
            proj_local,
        )
        out = rasterize_views(
            proj_full,
            width,
            height,
            bg_,
            pairs_per_gaussian=pairs_per_gaussian,
            max_chunks=max_chunks,
            backend=backend,
            interpret=interpret,
            pairs_budget=pairs_budget,
        )
        return out["render"]

    return f(scene, cams, bg)
