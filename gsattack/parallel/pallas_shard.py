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
    rect_candidates: int = 0,
    compact_budget: int = 0,
) -> jnp.ndarray:
    """Sharded multi-view render -> (V, H, W, 3), differentiable w.r.t.
    the (splats-sharded) scene. `interpret=True` runs the kernels in
    interpret mode (CPU-mesh tests); `backend="xla"` swaps in the XLA
    blend under the same sharding layout."""
    width, height = cams.width, cams.height
    from ..ops.raster import TILE

    # Tile-parallel blending: when the tile rows divide evenly over the
    # splats axis, each device rasterizes only its horizontal band of
    # tiles (EWA splatting in pixel space is translation-invariant, so a
    # band render is just a mean2d shift + short image) and `out_specs`
    # concatenates the bands along H. This puts bin/pack/sort/blend on
    # BOTH mesh axes — without it the raster stages are replicated across
    # splats and only projection + grad reduction scale on that axis.
    # Fwd adds zero communication; the bwd path is unchanged (the shift
    # is grad-transparent and the all_gather transpose already
    # reduce-scatters per-gaussian grads to their shard).
    n_splats = mesh.shape[SPLATS_AXIS]
    tiles_y = height // TILE
    tile_parallel = (
        height % TILE == 0 and tiles_y % n_splats == 0 and n_splats > 1
    )
    out_spec = P(VIEWS_AXIS, SPLATS_AXIS) if tile_parallel else P(VIEWS_AXIS)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(scene_spec(scene), camera_batch_spec(cams), P()),
        out_specs=out_spec,
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
        band_h = height
        if tile_parallel:
            band_h = height // n_splats
            y0 = (jax.lax.axis_index(SPLATS_AXIS) * band_h).astype(
                proj_full.mean2d.dtype
            )
            proj_full = proj_full._replace(
                mean2d=proj_full.mean2d - jnp.stack(
                    [jnp.zeros_like(y0), y0]
                )
            )
        out = rasterize_views(
            proj_full,
            width,
            band_h,
            bg_,
            pairs_per_gaussian=pairs_per_gaussian,
            max_chunks=max_chunks,
            backend=backend,
            interpret=interpret,
            pairs_budget=pairs_budget,
            rect_candidates=rect_candidates,
            compact_budget=compact_budget,
        )
        return out["render"]

    return f(scene, cams, bg)
