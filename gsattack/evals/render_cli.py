"""Adversarial-render evaluation pipeline — the reference's
`utils/render.py` CLI rebuilt as a callable (`run_render_eval`) + CLI.

Per camera: render the (attacked + frozen overlay) scene, run the frozen
detector in eval mode with `result_dict=True`, append COCO detections, and
emit one structured JSON log line with the reference's exact record schema
(`utils/render.py:280-290`):
  {"cam", "pred_class", "pred_category_id", "confidence", "bbox",
   "gt_bbox", "iou"}
On completion, write `detections_coco.json` (`:293-298`). Output dirs are
timestamped `renders/%Y/%m/%d/%H/%M` (`:184-187`).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from datetime import datetime
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.camera import CameraExtrinsics
from ..core.scene import GaussianScene
from ..models.base import Detector
from ..render import render
from ..attack.silhouette import silhouette_bbox


@dataclasses.dataclass
class RenderEvalConfig:
    target: Optional[int] = None
    untarget: Optional[int] = None
    is_targeted: bool = True
    attack_conf_thresh: float = 0.25
    white_background: bool = False
    renders_dir: str = "renders"
    preds_dir: str = "preds"
    save_images: bool = True
    pairs_per_gaussian: int = 32
    max_chunks: int = 16


def timestamped_dir(base: str, now: Optional[datetime] = None) -> str:
    now = now or datetime.now()
    return os.path.join(base, now.strftime("%Y/%m/%d/%H/%M"))


def run_render_eval(
    scene: GaussianScene,
    cameras: Sequence[CameraExtrinsics],
    detector: Detector,
    cfg: RenderEvalConfig,
    frozen_scene: Optional[GaussianScene] = None,
    logger: Optional[logging.Logger] = None,
) -> dict:
    """Returns {"records": [...], "coco": [...], "dirs": {...}}."""
    log = logger or logging.getLogger("render")
    detector.load_model()
    bg = jnp.ones(3) if cfg.white_background else jnp.zeros(3)
    black = jnp.zeros(3)
    now = datetime.now()
    render_dir = timestamped_dir(cfg.renders_dir, now)
    preds_dir = timestamped_dir(cfg.preds_dir, now)
    if cfg.save_images:
        os.makedirs(render_dir, exist_ok=True)
        os.makedirs(preds_dir, exist_ok=True)

    eval_scene = scene.concat(frozen_scene) if frozen_scene is not None else scene

    records, coco_results = [], []
    for it, ext in enumerate(cameras):
        cam = ext.build()
        # GT silhouette bbox from the *target-only* scene on black bg
        # (utils/render.py:189-218).
        benign = render(
            scene, cam, black,
            pairs_per_gaussian=cfg.pairs_per_gaussian, max_chunks=cfg.max_chunks,
        )["render"]
        bbox = np.asarray(silhouette_bbox(benign))
        combined = render(
            eval_scene, cam, bg,
            pairs_per_gaussian=cfg.pairs_per_gaussian, max_chunks=cfg.max_chunks,
        )["render"]
        if cfg.save_images:
            from PIL import Image

            Image.fromarray(
                (np.clip(np.asarray(combined), 0, 1) * 255).astype(np.uint8)
            ).save(os.path.join(render_dir, f"render_{it}.png"))

        success, result = detector.predict_and_save(
            image=combined,
            path=(
                os.path.join(preds_dir, f"render_c{it}.png")
                if cfg.save_images
                else None
            ),
            target=cfg.target,
            untarget=cfg.untarget,
            is_targeted=cfg.is_targeted,
            threshold=cfg.attack_conf_thresh,
            gt_bbox=bbox,
            result_dict=True,
            image_id=it,
        )
        if isinstance(result.get("detections"), list):
            coco_results.extend(result["detections"])
        closest = result["closest_class_name"] or "None"
        conf = result["closest_confidence"]
        structured = {
            "cam": it,
            "pred_class": closest,
            "pred_category_id": result.get("closest_category_id"),
            "confidence": f"{conf:.4f}" if isinstance(conf, (int, float)) else "None",
            "bbox": result.get("closest_bbox"),
            "gt_bbox": result.get("gt_bbox"),
            "iou": result.get("best_iou"),
        }
        log.info(json.dumps(structured))
        records.append({**structured, "success": bool(success)})

    coco_path = None
    if cfg.save_images:
        coco_path = os.path.join(render_dir, "detections_coco.json")
        with open(coco_path, "w") as f:
            json.dump(coco_results, f)
    return {
        "records": records,
        "coco": coco_results,
        "dirs": {"renders": render_dir, "preds": preds_dir, "coco_json": coco_path},
    }
