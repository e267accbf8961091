"""Frozen object-detector scoring heads: protocol, success logic, NMS, IoU.

JAX re-design of the reference's detector plugin contract
(`detectors/base_detector.py:22-99`): a `Detector` exposes a differentiable
training-style loss for the attack (`infer` in the reference) and an
eval-mode `predict`, plus the shared targeted/untargeted success criteria
used by every reference detector's `predict_and_save`
(`detectors/yolov3_detector.py:161-179`, `detectron2_detector.py:145-190`).

Images are (H, W, 3) float [0, 1] channel-last throughout.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

# Standard 80-class COCO list (reference hardcodes the same list,
# `detectors/yolov3_detector.py:245-270`).
COCO_CLASSES = [
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella", "handbag",
    "tie", "suitcase", "frisbee", "skis", "snowboard", "sports ball", "kite",
    "baseball bat", "baseball glove", "skateboard", "surfboard",
    "tennis racket", "bottle", "wine glass", "cup", "fork", "knife", "spoon",
    "bowl", "banana", "apple", "sandwich", "orange", "broccoli", "carrot",
    "hot dog", "pizza", "donut", "cake", "chair", "couch", "potted plant",
    "bed", "dining table", "toilet", "tv", "laptop", "mouse", "remote",
    "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear",
    "hair drier", "toothbrush",
]


@dataclasses.dataclass
class Detections:
    """Eval-mode detector output (post NMS), host-side numpy."""

    boxes: np.ndarray  # (M, 4) xyxy pixels
    scores: np.ndarray  # (M,)
    classes: np.ndarray  # (M,) int

    def __len__(self):
        return len(self.scores)


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(M, 4) x (N, 4) xyxy -> (M, N) IoU."""
    a = np.asarray(a, np.float32).reshape(-1, 4)
    b = np.asarray(b, np.float32).reshape(-1, 4)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def nms(
    boxes: np.ndarray, scores: np.ndarray, iou_thres: float = 0.45
) -> np.ndarray:
    """Greedy per-class-agnostic NMS -> kept indices (host-side eval path;
    the reference defers to ultralytics `non_max_suppression`)."""
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        ious = box_iou(boxes[i : i + 1], boxes[order[1:]])[0]
        order = order[1:][ious <= iou_thres]
    return np.array(keep, dtype=np.int64)


def evaluate_success(
    dets: Detections,
    gt_bbox: Optional[Sequence[float]],
    target: Optional[int],
    untarget: Optional[int],
    is_targeted: bool,
) -> tuple[bool, dict]:
    """The reference's shared attack-success rule
    (`detectors/yolov3_detector.py:161-179, 185-231`):

    With a GT box: the prediction with best IoU against it decides —
    `target_pred_exists` iff best_iou > 0.5 and its class == target;
    `untarget_pred_not_exists` iff NOT (best_iou > 0.5 and class == untarget).
    Without a GT box: class-membership over all predictions.
    Success: targeted -> target exists (and untarget absent if specified);
    untargeted -> untarget absent.
    """
    best_class = None
    best_iou = None
    best_idx = None
    closest_confidence = None
    if len(dets) > 0:
        if gt_bbox is not None:
            ious = box_iou(dets.boxes, np.asarray(gt_bbox).reshape(1, 4))[:, 0]
            best_idx = int(np.argmax(ious))
            best_iou = float(ious[best_idx])
            if best_iou > 0.5:
                best_class = int(dets.classes[best_idx])
                closest_confidence = float(dets.scores[best_idx])
            target_pred_exists = best_iou > 0.5 and best_class == target
            untarget_pred_not_exists = not (best_iou > 0.5 and best_class == untarget)
        else:
            classes = dets.classes.tolist()
            target_pred_exists = target in classes
            untarget_pred_not_exists = all(c != untarget for c in classes)
    else:
        target_pred_exists = False
        untarget_pred_not_exists = True

    meets = (
        is_targeted
        and target_pred_exists
        and (untarget is None or untarget_pred_not_exists)
    ) or ((not is_targeted) and untarget_pred_not_exists)
    info = {
        "target_pred_exists": bool(target_pred_exists),
        "untarget_pred_not_exists": bool(untarget_pred_not_exists),
        "best_iou": best_iou,
        "closest_class": best_class,
        "closest_confidence": closest_confidence,
        "closest_idx": best_idx,
    }
    return bool(meets), info


def detections_to_coco(dets: Detections, image_id: int = -1) -> list[dict]:
    """COCO-format detection dicts (xywh, rounded to 0.1 px) as the
    reference emits (`detectors/yolov3_detector.py:195-224`)."""
    out = []
    for i in range(len(dets)):
        x1, y1, x2, y2 = (float(v) for v in dets.boxes[i])
        out.append(
            {
                "image_id": image_id,
                "category_id": int(dets.classes[i]),
                "bbox": [
                    round(x1, 1),
                    round(y1, 1),
                    round(x2 - x1, 1),
                    round(y2 - y1, 1),
                ],
                "score": float(dets.scores[i]),
            }
        )
    return out


class Detector:
    """Detector plugin protocol (reference `BaseDetector` ABC)."""

    name: str = "base"

    def load_model(self) -> None:
        """Build/load weights. Idempotent."""
        raise NotImplementedError

    def loss(
        self,
        images: jnp.ndarray,  # (B, H, W, 3) in [0, 1]
        target: int,
        bboxes: np.ndarray,  # (B, 4) xyxy GT boxes in pixels
    ) -> jnp.ndarray:
        """Differentiable scalar training-style loss (reference `infer`)."""
        raise NotImplementedError

    def predict(self, image: jnp.ndarray, threshold: float = 0.5) -> Detections:
        """Eval-mode detection (post NMS)."""
        raise NotImplementedError

    def resolve_label_index(self, name):
        """Class name -> index (or index -> name when given an int)."""
        if isinstance(name, (int, np.integer)):
            return (
                self.class_names[int(name)]
                if 0 <= int(name) < len(self.class_names)
                else "unknown"
            )
        return self.class_names.index(name)

    @property
    def class_names(self) -> list[str]:
        return COCO_CLASSES

    # ---- shared predict_and_save (reference per-detector copies) ----------

    def predict_and_save(
        self,
        image: jnp.ndarray,
        path: Optional[str] = None,
        target: Optional[int] = None,
        untarget: Optional[int] = None,
        is_targeted: bool = True,
        threshold: float = 0.5,
        gt_bbox: Optional[Sequence[float]] = None,
        result_dict: bool = False,
        image_id: Optional[int] = None,
    ):
        dets = self.predict(image, threshold=threshold)
        success, info = evaluate_success(dets, gt_bbox, target, untarget, is_targeted)
        if path:
            save_detection_image(image, dets, path, self.class_names)
        if result_dict:
            best_idx = info["closest_idx"]
            coco = detections_to_coco(dets, image_id if image_id is not None else -1)
            gt_fmt = None
            if gt_bbox is not None:
                x1, y1, x2, y2 = (float(v) for v in gt_bbox)
                gt_fmt = [round(x1, 1), round(y1, 1), round(x2 - x1, 1), round(y2 - y1, 1)]
            result = {
                "detections": coco,
                "closest_class": info["closest_class"],
                "closest_class_name": (
                    self.resolve_label_index(info["closest_class"])
                    if info["closest_class"] is not None
                    else None
                ),
                "closest_category_id": info["closest_class"],
                "closest_confidence": info["closest_confidence"],
                "closest_bbox": (
                    coco[best_idx]["bbox"]
                    if (gt_bbox is not None and best_idx is not None and coco)
                    else None
                ),
                "gt_bbox": gt_fmt,
                "best_iou": info["best_iou"],
                "untarget_pred_not_exists": info["untarget_pred_not_exists"],
                "target_pred_exists": info["target_pred_exists"],
            }
            return success, result
        return success


def save_detection_image(
    image: jnp.ndarray, dets: Detections, path: str, class_names: list[str]
) -> None:
    """Draw boxes + labels and save (the visual-artifact channel the
    reference writes per iteration, `attack.py:535-554`)."""
    import os

    from PIL import Image, ImageDraw

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = (np.clip(np.asarray(image), 0, 1) * 255).astype(np.uint8)
    im = Image.fromarray(arr)
    draw = ImageDraw.Draw(im)
    for i in range(len(dets)):
        box = [int(v) for v in dets.boxes[i]]
        cls = int(dets.classes[i])
        name = class_names[cls] if 0 <= cls < len(class_names) else str(cls)
        draw.rectangle(box, outline="red", width=3)
        draw.text((box[0], max(box[1] - 12, 0)), f"{name}, {dets.scores[i]:.2f}", fill="white")
    im.save(path)
