"""Gaussian-Grouping scene evaluation — the reference's root `render.py`
rebuilt: PCA visualization of the 16-channel object-feature renders,
id -> RGB colormaps, per-split render/GT/object dumps and a side-by-side
comparison video (`render.py:26-166`).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from ..core.scene import GaussianScene
from ..render import render


def feature_to_rgb(features_chw: np.ndarray) -> np.ndarray:
    """(C, H, W) object features -> PCA(3) uint8 RGB (`render.py:26-45`)."""
    from sklearn.decomposition import PCA

    c, h, w = features_chw.shape
    flat = features_chw.reshape(c, -1).T
    pca = PCA(n_components=3)
    rgb = pca.fit_transform(flat)
    rgb = (rgb - rgb.min()) / max(rgb.max() - rgb.min(), 1e-9)
    return (rgb.reshape(h, w, 3) * 255).astype(np.uint8)


def id2rgb(idx: np.ndarray, max_num_obj: int = 256) -> np.ndarray:
    """Deterministic id -> color map (`render.py:47-65` semantics: a fixed
    pseudo-random palette indexed by object id)."""
    rng = np.random.default_rng(42)
    palette = rng.integers(0, 255, size=(max_num_obj, 3), dtype=np.uint8)
    palette[0] = 0
    return palette[np.clip(idx, 0, max_num_obj - 1)]


def visualize_obj(objects_map: np.ndarray) -> np.ndarray:
    """(H, W) int object-id map -> (H, W, 3) uint8 (`render.py:67-73`)."""
    return id2rgb(objects_map)


def classify_pixels(
    obj_render_hwc: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray
) -> np.ndarray:
    """(H, W, 16) rendered object features -> (H, W) argmax class map via
    the 1x1-conv classifier (`render.py:130-141`)."""
    logits = jnp.einsum("hwc,kc->hwk", obj_render_hwc, weight) + bias
    return np.asarray(jnp.argmax(logits, axis=-1))


def render_grouping_set(
    scene: GaussianScene,
    cameras: Sequence[Camera],
    out_dir: str,
    classifier: Optional[tuple[jnp.ndarray, jnp.ndarray]] = None,
    gt_images: Optional[Sequence[np.ndarray]] = None,
    make_video: bool = True,
    bg: Optional[jnp.ndarray] = None,
) -> dict:
    """Render a camera split with RGB, PCA object features, and predicted
    object maps; optionally write the hstacked comparison video
    (`render.py:113-166`)."""
    from PIL import Image

    bg = jnp.zeros(3) if bg is None else bg
    dirs = {
        k: os.path.join(out_dir, k)
        for k in ("renders", "objects_feature16", "objects_pred", "gt", "concat")
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    frames = []
    for i, cam in enumerate(cameras):
        out = render(scene, cam, bg)
        rgb = (np.clip(np.asarray(out["render"]), 0, 1) * 255).astype(np.uint8)
        obj = np.asarray(out["render_object"])  # (H, W, 16)
        pca_rgb = feature_to_rgb(obj.transpose(2, 0, 1))
        Image.fromarray(rgb).save(os.path.join(dirs["renders"], f"{i:05d}.png"))
        Image.fromarray(pca_rgb).save(
            os.path.join(dirs["objects_feature16"], f"{i:05d}.png")
        )
        row = [rgb, pca_rgb]
        if classifier is not None:
            w, b = classifier
            pred = classify_pixels(jnp.asarray(obj), w, b)
            pred_rgb = visualize_obj(pred)
            Image.fromarray(pred_rgb).save(
                os.path.join(dirs["objects_pred"], f"{i:05d}.png")
            )
            row.append(pred_rgb)
        if gt_images is not None and i < len(gt_images):
            gt = (np.clip(np.asarray(gt_images[i]), 0, 1) * 255).astype(np.uint8)
            Image.fromarray(gt).save(os.path.join(dirs["gt"], f"{i:05d}.png"))
            row.insert(0, gt)
        frames.append(np.hstack(row))

    video_path = None
    if make_video and frames:
        try:
            import cv2

            video_path = os.path.join(out_dir, "concat.mp4")
            h, w = frames[0].shape[:2]
            vw = cv2.VideoWriter(
                video_path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h)
            )
            for fr in frames:
                vw.write(fr[..., ::-1])  # RGB -> BGR
            vw.release()
        except Exception:
            video_path = None
    return {"dirs": dirs, "video": video_path, "num_frames": len(frames)}
