"""Toy grid detector — a tiny deterministic conv net used as the fast
differentiable stand-in for the heavyweight detector zoo in tests and
smoke benchmarks (the reference has no test detector at all; SURVEY.md §4
calls for one).

Architecture: 3 strided convs -> per-cell objectness + class logits over a
coarse grid. `loss` follows the same shape as the YOLO training losses the
attack differentiates through (`detectors/yolov3_detector.py:27-93`):
cells inside the GT box are positives assigned the target class; the loss
is BCE objectness + CE classification on positives — fully differentiable
w.r.t. the input image. `predict` emits one box per confident cell.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from .base import COCO_CLASSES, Detections, Detector, nms

STRIDE = 8


def _conv(x, w, b, stride):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + b


def _forward(params, images):
    x = images
    for i, stride in enumerate((2, 2, 2)):
        x = _conv(x, params[f"w{i}"], params[f"b{i}"], stride)
        x = jax.nn.relu(x)
    head = _conv(x, params["wh"], params["bh"], 1)  # (B, H/8, W/8, 1+C)
    return head


class ToyDetector(Detector):
    name = "toy"

    def __init__(self, num_classes: int = 80, seed: int = 0, channels: int = 16):
        self.num_classes = num_classes
        self.seed = seed
        self.channels = channels
        self.params = None

    @property
    def class_names(self):
        return COCO_CLASSES[: self.num_classes]

    def load_model(self) -> None:
        if self.params is not None:
            return
        key = jax.random.PRNGKey(self.seed)
        ks = jax.random.split(key, 8)
        c = self.channels
        shapes = [(3, 3, 3, c), (3, 3, c, c), (3, 3, c, c)]
        params = {}
        for i, shp in enumerate(shapes):
            params[f"w{i}"] = jax.random.normal(ks[i], shp) * (
                1.0 / np.sqrt(np.prod(shp[:3]))
            )
            params[f"b{i}"] = jnp.zeros(shp[-1])
        params["wh"] = jax.random.normal(ks[6], (1, 1, c, 1 + self.num_classes)) * 0.3
        params["bh"] = jnp.zeros(1 + self.num_classes)
        self.params = params

    def _cell_targets(self, hw_cells, bbox):
        """Boolean (Hc, Wc) positives: cells whose center lies in the box."""
        hc, wc = hw_cells
        cy = (jnp.arange(hc) + 0.5) * STRIDE
        cx = (jnp.arange(wc) + 0.5) * STRIDE
        x1, y1, x2, y2 = bbox[0], bbox[1], bbox[2], bbox[3]
        inside_y = (cy >= y1) & (cy < y2)
        inside_x = (cx >= x1) & (cx < x2)
        return inside_y[:, None] & inside_x[None, :]

    def loss(self, images, target, bboxes):
        self.load_model()
        return self._loss_jit(self.params, images, int(target), jnp.asarray(bboxes))

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _loss_jit(self, params, images, target, bboxes):
        head = _forward(params, images)  # (B, Hc, Wc, 1+C)
        obj_logit = head[..., 0]
        cls_logit = head[..., 1:]
        bboxes = bboxes.reshape(-1, 4).astype(jnp.float32)

        def one(head_obj, head_cls, bbox):
            pos = self._cell_targets(head_obj.shape, bbox).astype(jnp.float32)
            obj_bce = jnp.mean(
                jnp.maximum(head_obj, 0)
                - head_obj * pos
                + jnp.log1p(jnp.exp(-jnp.abs(head_obj)))
            )
            logp = jax.nn.log_softmax(head_cls, axis=-1)
            ce = -(logp[..., target] * pos).sum() / jnp.maximum(pos.sum(), 1.0)
            return obj_bce + ce

        losses = jax.vmap(one)(obj_logit, cls_logit, bboxes)
        return losses.mean()

    def predict(self, image, threshold: float = 0.5) -> Detections:
        """One merged box per confident class: the bounding box over that
        class's confident cells (coarse but IoU-meaningful against
        silhouette GT boxes)."""
        self.load_model()
        head = _forward(self.params, jnp.asarray(image)[None])
        obj = jax.nn.sigmoid(head[0, ..., 0])
        cls_prob = jax.nn.softmax(head[0, ..., 1:], axis=-1)
        score_map = np.asarray(obj[..., None] * cls_prob)
        best_cls = np.argmax(score_map, axis=-1)
        best_score = np.max(score_map, axis=-1)
        confident = best_score > threshold
        boxes, scores, classes = [], [], []
        for c in np.unique(best_cls[confident]):
            ys, xs = np.nonzero(confident & (best_cls == c))
            boxes.append(
                [
                    xs.min() * STRIDE,
                    ys.min() * STRIDE,
                    (xs.max() + 1) * STRIDE,
                    (ys.max() + 1) * STRIDE,
                ]
            )
            scores.append(float(best_score[ys, xs].max()))
            classes.append(int(c))
        if not boxes:
            return Detections(
                np.zeros((0, 4), np.float32), np.zeros(0, np.float32), np.zeros(0, np.int64)
            )
        boxes = np.asarray(boxes, np.float32)
        scores = np.asarray(scores, np.float32)
        classes = np.asarray(classes, np.int64)
        keep = nms(boxes, scores)
        return Detections(boxes[keep], scores[keep], classes[keep])
