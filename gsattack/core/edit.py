"""Scene editing ops: combine splats, grouped-object masks, inpaint, recolor.

Functional re-implementations of the reference's editing surface:
  * `combine_scene_plys` — `GaussianModel.combine_splats`
    (`scene/gaussian_model.py:469-556`): merge PLYs, keep per-source masks,
    zero the grouping features of loaded splats, pad/truncate mismatched SH
    rest bands.
  * `object_selection_mask` — the classifier + convex-hull mask of the
    grouped attack path (`attack.py:302-315`,
    `scratch/edit_object_removal.py:71-92`).
  * `inpaint_scene` — `inpaint_setup` (`scene/gaussian_model.py:264-367`):
    re-initialize removed-region points from the k-NN mean of remaining
    features.
  * recolor tools — `scratch/edit_gs_color.py` (single / random /
    grayscale / sepia; higher SH bands zeroed).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import sh as shlib
from .scene import GaussianScene


def combine_scene_plys(
    ply_paths: Sequence[str], max_sh_degree: int = 3
) -> tuple[GaussianScene, list[np.ndarray]]:
    """Merge multiple scene PLYs into one scene + per-source boolean masks.

    Mirrors `combine_splats`: object features of loaded splats are zeroed,
    `f_rest` bands are padded/truncated to the target degree, and
    `masks[i]` is True on the rows contributed by `ply_paths[i]`.
    """
    from ..io.ply import load_scene_ply

    parts = []
    for p in ply_paths:
        sc = load_scene_ply(p, max_sh_degree=max_sh_degree)
        sc = sc.replace(obj_dc=jnp.zeros_like(sc.obj_dc))
        parts.append(sc)
    if not parts:
        raise ValueError("No valid .ply files were loaded.")
    combined = parts[0]
    for sc in parts[1:]:
        combined = combined.concat(sc)
    total = combined.num_points
    masks = []
    offset = 0
    for sc in parts:
        m = np.zeros(total, dtype=bool)
        m[offset : offset + sc.num_points] = True
        masks.append(m)
        offset += sc.num_points
    return combined, masks


def classifier_logits(obj_dc: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray):
    """Per-point logits of the Gaussian-Grouping 1x1-conv classifier
    (Conv2d(16, num_classes, 1) applied to `objects_dc`, `attack.py:302-304`).

    obj_dc: (N, 1, 16); weight: (C, 16); bias: (C,) -> (N, C).
    """
    return obj_dc[:, 0, :] @ weight.T + bias


def object_selection_mask(
    scene: GaussianScene,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    selected_obj_ids: Sequence[int],
    threshold: float = 0.5,
    use_convex_hull: bool = True,
    outlier_factor: float = 1.0,
) -> np.ndarray:
    """softmax(classifier(obj_dc))[selected] > thresh, unioned with the
    convex hull of the selected points (`edit_object_removal.py:71-92`)."""
    logits = classifier_logits(scene.obj_dc, weight, bias)
    prob = jax.nn.softmax(logits, axis=-1)
    sel = jnp.asarray(list(selected_obj_ids))
    mask = jnp.any(prob[:, sel] > threshold, axis=-1)
    mask_np = np.asarray(mask)
    if use_convex_hull and mask_np.any():
        from ..ops.hull import points_inside_convex_hull

        hull = points_inside_convex_hull(
            np.asarray(scene.xyz), mask_np, outlier_factor=outlier_factor
        )
        mask_np = mask_np | hull
    return mask_np


def inpaint_scene(
    scene: GaussianScene, remove_mask: np.ndarray, k: int = 5
) -> GaussianScene:
    """Remove the masked points and append replacements initialized from the
    mean of each removed point's k nearest remaining neighbors
    (`inpaint_setup`, `scene/gaussian_model.py:264-367`). Host-side."""
    from scipy.spatial import KDTree

    remove_mask = np.asarray(remove_mask, dtype=bool)
    keep = scene.replace(alive=scene.alive & jnp.asarray(~remove_mask)).compact()
    removed_xyz = np.asarray(scene.xyz)[remove_mask]
    if removed_xyz.shape[0] == 0:
        return keep
    kdtree = KDTree(np.asarray(keep.xyz))
    k_eff = min(k, keep.num_points)
    _, idx = kdtree.query(removed_xyz, k=k_eff)
    idx = np.atleast_2d(idx)
    if idx.ndim == 1:
        idx = idx[:, None]

    def knn_mean(arr):
        a = np.asarray(arr)
        return jnp.asarray(a[idx].mean(axis=1))

    new = GaussianScene(
        xyz=knn_mean(keep.xyz),
        f_dc=knn_mean(keep.f_dc),
        f_rest=knn_mean(keep.f_rest),
        log_scale=knn_mean(keep.log_scale),
        quat=knn_mean(keep.quat),
        opacity_logit=knn_mean(keep.opacity_logit),
        obj_dc=knn_mean(keep.obj_dc),
        alive=jnp.ones(removed_xyz.shape[0], dtype=bool),
        active_sh_degree=keep.active_sh_degree,
        max_sh_degree=keep.max_sh_degree,
    )
    return keep.concat(new)


# ---- recolor tools (scratch/edit_gs_color.py) -----------------------------


def _set_dc(scene: GaussianScene, f_dc: jnp.ndarray) -> GaussianScene:
    """Overwrite DC color and zero all higher SH bands
    (`edit_gs_color.py:10-33`)."""
    return scene.replace(f_dc=f_dc, f_rest=jnp.zeros_like(scene.f_rest))


def recolor_single(scene: GaussianScene, rgb: Sequence[float]) -> GaussianScene:
    sh = shlib.rgb_to_sh(jnp.asarray(rgb, jnp.float32))
    return _set_dc(scene, jnp.tile(sh[None, None, :], (scene.num_points, 1, 1)))


def recolor_random(
    scene: GaussianScene, key: Optional[jax.Array] = None
) -> GaussianScene:
    key = jax.random.PRNGKey(0) if key is None else key
    rgb = jax.random.uniform(key, (scene.num_points, 1, 3))
    return _set_dc(scene, shlib.rgb_to_sh(rgb))


def recolor_grayscale(scene: GaussianScene) -> GaussianScene:
    """Luminosity projection applied to the raw DC coefficients then
    re-encoded — the reference's (quirky) exact math
    (`edit_gs_color.py:36-71`)."""
    dc = scene.f_dc[:, 0, :]
    gray = 0.2989 * dc[:, 0] + 0.5870 * dc[:, 1] + 0.1140 * dc[:, 2]
    rgb = jnp.stack([gray] * 3, axis=-1)[:, None, :]
    return _set_dc(scene, shlib.rgb_to_sh(rgb))


def recolor_sepia(scene: GaussianScene) -> GaussianScene:
    dc = scene.f_dc[:, 0, :]
    m = jnp.array(
        [[0.393, 0.769, 0.189], [0.349, 0.686, 0.168], [0.272, 0.534, 0.131]],
        jnp.float32,
    )
    sepia = jnp.clip(dc @ m.T, 0.0, 1.0)[:, None, :]
    return _set_dc(scene, shlib.rgb_to_sh(sepia))
