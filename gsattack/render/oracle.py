"""Oracle renderer: slow, exact, per-pixel front-to-back alpha compositing.

This is the correctness anchor for the production tile renderer and the
Pallas kernels (SURVEY.md §7 stage 2): a direct jnp transcription of the
published Inria rasterizer blend semantics (the CUDA kernel behind
`gaussian_renderer/__init__.py:86-95`), differentiable end-to-end via JAX AD:

  for each Gaussian in globally depth-sorted order (sequential lax.scan):
    power = -0.5 (A dx^2 + C dy^2) - B dx dy
    alpha = min(0.99, opacity * exp(power));  skip if power > 0 or alpha < 1/255
    test_T = T (1 - alpha);  if test_T < 1e-4: pixel done (no blend)
    C += color * alpha * T;  T = test_T
  out = C + T_final * bg

With `tile_aligned_cull=True` a Gaussian touches only pixels whose 16x16
tile overlaps its 3-sigma rect, reproducing the tile-granular truncation of
the real rasterizer bit-for-bit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..core.scene import GaussianScene
from ..ops.project import ProjectedGaussians, project

TILE = 16
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def blend_oracle(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    bg: jnp.ndarray,
    tile_aligned_cull: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sequential exact blend. Returns (image (H, W, 3+C_obj), T_final (H, W))."""
    n = proj.mean2d.shape[0]
    order = jnp.argsort(proj.depth)
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    opacity = proj.opacity[order]
    radius = proj.radius[order]
    channels = jnp.concatenate([proj.color, proj.obj], axis=-1)[order]
    n_ch = channels.shape[-1]

    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    tile_row = jnp.arange(height)[:, None] // TILE  # (H,1)
    tile_col = jnp.arange(width)[None, :] // TILE  # (1,W)

    def step(carry, g):
        accum, T, done = carry
        m2d, con, op, rad, col = g
        dx = xs - m2d[0]
        dy = ys - m2d[1]
        power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
        # Clamp before exp: power > 0 is masked below, and an overflowed exp
        # would otherwise poison the VJP (inf * 0 = NaN).
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(jnp.minimum(power, 0.0)))
        use = (power <= 0.0) & (alpha >= ALPHA_MIN) & (rad > 0)
        if tile_aligned_cull:
            # Inria getRect: tile range touched by the radius bbox.
            rmin_x = jnp.clip((m2d[0] - rad) / TILE, 0, tiles_x).astype(jnp.int32)
            rmax_x = jnp.clip((m2d[0] + rad + TILE - 1) / TILE, 0, tiles_x).astype(
                jnp.int32
            )
            rmin_y = jnp.clip((m2d[1] - rad) / TILE, 0, tiles_y).astype(jnp.int32)
            rmax_y = jnp.clip((m2d[1] + rad + TILE - 1) / TILE, 0, tiles_y).astype(
                jnp.int32
            )
            in_rect = (
                (tile_col >= rmin_x)
                & (tile_col < rmax_x)
                & (tile_row >= rmin_y)
                & (tile_row < rmax_y)
            )
            use = use & in_rect
        alpha = jnp.where(use, alpha, 0.0)
        test_T = T * (1.0 - alpha)
        crosses = use & (test_T < T_EPS) & ~done
        blend = use & ~done & ~crosses
        w = jnp.where(blend, alpha * T, 0.0)
        accum = accum + w[..., None] * col[None, None, :]
        T = jnp.where(blend, test_T, T)
        done = done | crosses
        return (accum, T, done), None

    init = (
        jnp.zeros((height, width, n_ch), jnp.float32),
        jnp.ones((height, width), jnp.float32),
        jnp.zeros((height, width), bool),
    )
    (accum, T, _), _ = jax.lax.scan(
        step, init, (mean2d, conic, opacity, radius, channels)
    )
    bg_full = jnp.concatenate([bg, jnp.zeros(n_ch - bg.shape[0], bg.dtype)])
    image = accum + T[..., None] * bg_full[None, None, :]
    return image, T


def render_oracle(
    scene: GaussianScene,
    camera: Camera,
    bg: jnp.ndarray,
    scaling_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
    tile_aligned_cull: bool = True,
) -> dict:
    """Full oracle render -> same output dict schema as the production path
    (reference contract: `gaussian_renderer/__init__.py:99-103`)."""
    proj = project(scene, camera, scaling_modifier, override_color)
    image, T = blend_oracle(
        proj, camera.width, camera.height, bg, tile_aligned_cull=tile_aligned_cull
    )
    return {
        "render": image[..., :3],
        "render_object": image[..., 3:],
        "radii": proj.radius,
        "visibility_filter": proj.radius > 0,
        "final_transmittance": T,
    }
