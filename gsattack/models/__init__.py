"""Detector zoo: frozen JAX-callable scoring heads.

Factory mirrors the reference's `detectors/factory.py:9-24` detector-name
switch; heads are implemented natively in JAX (the reference wraps external
torch packages).
"""

from .base import (
    COCO_CLASSES,
    Detections,
    Detector,
    box_iou,
    detections_to_coco,
    evaluate_success,
    nms,
)
from .toy import ToyDetector

_REGISTRY = {}


def register_detector(name):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


_REGISTRY["toy"] = ToyDetector


def load_detector(name: str, **kwargs) -> Detector:
    """Detector factory (`detectors/factory.py`). Known names:
    toy, yolov3, yolov5, yolov8, yolov11, detectron2, detr."""
    if name in _REGISTRY:
        return _REGISTRY[name](**kwargs)
    if name in ("yolov3", "yolov5", "yolov8", "yolov11"):
        from .yolo import YoloDetector

        return YoloDetector(variant=name, **kwargs)
    if name == "detectron2":
        from .frcnn import FasterRCNNDetector

        return FasterRCNNDetector(**kwargs)
    if name == "detr":
        from .detr import DetrDetector

        return DetrDetector(**kwargs)
    raise ValueError(f"Unknown detector: {name}")


__all__ = [
    "COCO_CLASSES",
    "Detections",
    "Detector",
    "ToyDetector",
    "box_iou",
    "detections_to_coco",
    "evaluate_success",
    "nms",
    "load_detector",
    "register_detector",
]
