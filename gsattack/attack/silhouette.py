"""Silhouette ground-truth bounding boxes, computed on-device.

The reference derives per-view GT boxes by rendering on a black background,
converting to grayscale with PIL, thresholding at 20/255 and calling
`PIL.Image.getbbox()` (`attack.py:433-461`, `utils/render.py:189-218`) — a
host round-trip through PNG files in the hot loop. Here the same semantics
run as a jitted reduction on the rendered array: ITU-R 601-2 luma (what
PIL `convert('L')` computes), byte threshold > 20, min/max of the mask with
getbbox's exclusive right/bottom convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BW_THRESH = 20


@jax.jit
def silhouette_bbox(image_hwc: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) float [0,1] -> (4,) int32 bbox (left, upper, right, lower),
    right/lower exclusive, PIL getbbox convention. Returns zeros when empty."""
    img255 = jnp.clip(image_hwc, 0.0, 1.0) * 255.0
    # PIL convert('L') rounds to bytes first, then L = (299 R + 587 G + 114 B) / 1000.
    rgb = jnp.round(img255)
    luma = (299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2]) // 1000
    mask = luma > BW_THRESH
    any_at_all = jnp.any(mask)
    h, w = mask.shape
    rows = jnp.any(mask, axis=1)
    cols = jnp.any(mask, axis=0)
    ridx = jnp.arange(h)
    cidx = jnp.arange(w)
    top = jnp.min(jnp.where(rows, ridx, h))
    bottom = jnp.max(jnp.where(rows, ridx, -1)) + 1
    left = jnp.min(jnp.where(cols, cidx, w))
    right = jnp.max(jnp.where(cols, cidx, -1)) + 1
    box = jnp.stack([left, top, right, bottom]).astype(jnp.int32)
    return jnp.where(any_at_all, box, jnp.zeros(4, jnp.int32))


silhouette_bboxes = jax.jit(jax.vmap(silhouette_bbox))
