"""High-level render API — the counterpart of the reference's
`gaussian_renderer.render()` (`gaussian_renderer/__init__.py:18-103`),
re-shaped as a pure function over a `GaussianScene` pytree.

Differences from the reference, by design (SURVEY.md §7):
  * pure function — no mutable model, no retained grads; to harvest
    screen-space mean gradients (densification stats,
    `scene/gaussian_model.py:710-712`) pass a zero `mean2d_offset` array and
    differentiate w.r.t. it (the JAX analogue of the reference's
    `screenspace_points` trick at `gaussian_renderer/__init__.py:26-30`).
  * images are (H, W, C) channel-last (TPU-native layout); use
    `to_chw` for reference-layout interop.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..core.camera import Camera
from ..core.scene import GaussianScene
from ..ops.project import project
from ..ops.raster import rasterize
from .oracle import render_oracle

__all__ = ["render", "render_oracle", "to_chw"]


def render(
    scene: GaussianScene,
    camera: Camera,
    bg: jnp.ndarray,
    scaling_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
    mean2d_offset: Optional[jnp.ndarray] = None,
    pairs_per_gaussian: int = 32,
    chunk: int = 64,
    max_chunks: int = 16,
    backend: str = "xla",
    interpret: bool = False,
    pairs_budget: int = 0,
    with_objects: bool = True,
    rect_candidates: int = 0,
    compact_budget: int = 0,
    tier_split: int = 0,
    heavy_budget: int = 0,
) -> dict:
    """Render one camera view. Returns the reference's output schema
    (`render`, `render_object`, `radii`, `visibility_filter`) plus
    `final_transmittance` and `num_culled_pairs`."""
    proj = project(scene, camera, scaling_modifier, override_color)
    if mean2d_offset is not None:
        proj = proj._replace(mean2d=proj.mean2d + mean2d_offset)
    out = rasterize(
        proj,
        camera.width,
        camera.height,
        bg,
        pairs_per_gaussian=pairs_per_gaussian,
        chunk=chunk,
        max_chunks=max_chunks,
        backend=backend,
        interpret=interpret,
        pairs_budget=pairs_budget,
        with_objects=with_objects,
        rect_candidates=rect_candidates,
        compact_budget=compact_budget,
        tier_split=tier_split,
        heavy_budget=heavy_budget,
    )
    out["radii"] = proj.radius
    out["visibility_filter"] = proj.radius > 0
    return out


def to_chw(image_hwc: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> (C, H, W) reference-layout interop."""
    return jnp.transpose(image_hwc, (2, 0, 1))
