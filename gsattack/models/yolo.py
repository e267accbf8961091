"""YOLO detector family (v3u/v5u/v8/v11) — native flax, weight-loadable.

The reference wraps ultralytics' torch models as frozen scoring heads and
differentiates its *training* loss w.r.t. the rendered image
(`detectors/yolov8_detector.py:94-156`, `yolov3_detector.py:27-93` — the
reference's v3/v5 paths also use ultralytics' unified v8-style loss with
box/cls/dfl gains 7.5/0.5/1.5, `yolov3_detector.py:20-25`). Here the whole
stack is JAX-native:

  * architecture: per-variant faithful graphs (models/yolo_blocks.py) —
    darknet53+YOLOv3 head (v3u), C3 CSP + PAN (v5u), C2f (v8),
    C3k2/C2PSA (v11) — transcribed from the ultralytics model yamls with
    the same scaling rules, matching `yolov8_detector.py:22-39`'s
    yaml-built DetectionModel per variant
  * loss: the v8 detection loss — Task-Aligned Assigner (topk=10,
    alpha=0.5, beta=6), BCE classification to aligned soft targets, CIoU
    box loss and distribution-focal loss on the fg anchors, gains
    box=7.5 cls=0.5 dfl=1.5
  * eval: sigmoid scores + DFL expectation decode + class-agnostic NMS
  * preprocessing: differentiable letterbox to 640 (bilinear resize + gray
    pad), matching `yolov3_detector.py:45-61`
  * weights: `weights=` path to a flat ultralytics state_dict archive;
    conversion is mechanical key renaming (convert_yolo.py) proven by
    torch-executed activation parity (tests/test_yolo_parity.py)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .base import COCO_CLASSES, Detections, Detector, nms
from .yolo_blocks import REG_MAX, STRIDES, YoloGraph, resolve_variant

# ---------------------------------------------------------------------------
# anchors / decode / losses
# ---------------------------------------------------------------------------


def make_anchors(hw_list: Sequence[tuple[int, int]], strides=STRIDES):
    """Cell-center anchor points (in pixels) + per-anchor stride."""
    pts, strs = [], []
    for (h, w), s in zip(hw_list, strides):
        ys = (jnp.arange(h) + 0.5) * s
        xs = (jnp.arange(w) + 0.5) * s
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        pts.append(jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1))
        strs.append(jnp.full(h * w, s, jnp.float32))
    return jnp.concatenate(pts), jnp.concatenate(strs)


def dfl_expectation(box_logits: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, REG_MAX) logits -> (..., 4) expected distances (bins)."""
    p = jax.nn.softmax(box_logits, axis=-1)
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    return jnp.sum(p * bins, axis=-1)


def decode_boxes(box_logits, anchors, strides_arr):
    """DFL logits (A, 4*R) + anchors (A, 2) -> xyxy boxes in pixels."""
    d = dfl_expectation(box_logits.reshape(-1, 4, REG_MAX)) * strides_arr[:, None]
    lt = anchors - d[:, :2]
    rb = anchors + d[:, 2:]
    return jnp.concatenate([lt, rb], axis=-1)


def ciou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Complete IoU between aligned box arrays (..., 4) xyxy."""
    x1 = jnp.maximum(box1[..., 0], box2[..., 0])
    y1 = jnp.maximum(box1[..., 1], box2[..., 1])
    x2 = jnp.minimum(box1[..., 2], box2[..., 2])
    y2 = jnp.minimum(box1[..., 3], box2[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    w1 = box1[..., 2] - box1[..., 0]
    h1 = box1[..., 3] - box1[..., 1]
    w2 = box2[..., 2] - box2[..., 0]
    h2 = box2[..., 3] - box2[..., 1]
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    cw = jnp.maximum(box1[..., 2], box2[..., 2]) - jnp.minimum(box1[..., 0], box2[..., 0])
    ch = jnp.maximum(box1[..., 3], box2[..., 3]) - jnp.minimum(box1[..., 1], box2[..., 1])
    c2 = cw * cw + ch * ch + eps
    rho2 = (
        (box2[..., 0] + box2[..., 2] - box1[..., 0] - box1[..., 2]) ** 2
        + (box2[..., 1] + box2[..., 3] - box1[..., 1] - box1[..., 3]) ** 2
    ) / 4.0
    v = (4 / np.pi**2) * (
        jnp.arctan(w2 / jnp.maximum(h2, eps)) - jnp.arctan(w1 / jnp.maximum(h1, eps))
    ) ** 2
    alpha = v / jnp.maximum(1 - iou + v, eps)
    alpha = jax.lax.stop_gradient(alpha)
    return iou - rho2 / c2 - alpha * v


def pairwise_iou_xyxy(a, b, eps=1e-7):
    """(M,4) x (N,4) -> (M,N)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, eps)


def task_aligned_assign(
    cls_scores,  # (A, nc) sigmoid scores
    pred_boxes,  # (A, 4) decoded xyxy
    anchors,  # (A, 2)
    gt_boxes,  # (M, 4) xyxy (padded)
    gt_labels,  # (M,) int
    gt_valid,  # (M,) bool
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
):
    """Ultralytics TaskAlignedAssigner semantics, vectorized over padded GTs.

    Returns (fg_mask (A,), target_labels (A,), target_boxes (A,4),
    target_scores (A, nc) soft targets)."""
    a = anchors.shape[0]
    m = gt_boxes.shape[0]
    # candidates: anchor center strictly inside the gt box
    inside = (
        (anchors[None, :, 0] > gt_boxes[:, None, 0])
        & (anchors[None, :, 0] < gt_boxes[:, None, 2])
        & (anchors[None, :, 1] > gt_boxes[:, None, 1])
        & (anchors[None, :, 1] < gt_boxes[:, None, 3])
    ) & gt_valid[:, None]  # (M, A)
    ious = pairwise_iou_xyxy(gt_boxes, pred_boxes)  # (M, A)
    cls_for_gt = jnp.take_along_axis(
        cls_scores.T, jnp.clip(gt_labels, 0, cls_scores.shape[1] - 1)[:, None], axis=0
    )  # (M, A)
    metric = (cls_for_gt**alpha) * (jnp.clip(ious, 0) ** beta)
    metric = jnp.where(inside, metric, 0.0)
    # top-k anchors per gt
    k = min(topk, a)
    thresh = jax.lax.top_k(metric, k)[0][:, -1:]  # (M, 1) kth largest
    is_topk = (metric >= jnp.maximum(thresh, 1e-12)) & (metric > 0)
    # resolve anchors claimed by multiple gts: keep the gt with max metric
    claimed = jnp.where(is_topk, metric, -1.0)  # (M, A)
    best_gt = jnp.argmax(claimed, axis=0)  # (A,)
    fg = jnp.max(is_topk, axis=0)  # (A,)
    tl = gt_labels[best_gt]
    tb = gt_boxes[best_gt]
    t_metric = jnp.max(jnp.where(is_topk, metric, 0.0), axis=0)  # (A,)
    t_iou = ious[best_gt, jnp.arange(a)]
    # normalize: score = metric / max_metric_per_gt * max_iou_per_gt
    per_gt_max_metric = jnp.max(metric, axis=1)  # (M,)
    per_gt_max_iou = jnp.max(jnp.where(is_topk, ious, 0.0), axis=1)
    norm = (
        t_metric
        * per_gt_max_iou[best_gt]
        / jnp.maximum(per_gt_max_metric[best_gt], 1e-9)
    )
    scores = jnp.zeros((a, cls_scores.shape[1]))
    scores = scores.at[jnp.arange(a), jnp.clip(tl, 0, cls_scores.shape[1] - 1)].set(
        jnp.where(fg, norm, 0.0)
    )
    return fg, tl, tb, scores


def v8_detection_loss(
    head_outs,  # list of (B, H, W, 4R+nc)
    gt_boxes,  # (B, M, 4) xyxy pixels
    gt_labels,  # (B, M)
    gt_valid,  # (B, M)
    nc: int,
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
):
    """The unified v8-style training loss the reference differentiates
    through (gains from `yolov3_detector.py:23`)."""
    hw = [(o.shape[1], o.shape[2]) for o in head_outs]
    anchors, strides_arr = make_anchors(hw)
    flat = jnp.concatenate(
        [o.reshape(o.shape[0], -1, o.shape[-1]) for o in head_outs], axis=1
    )  # (B, A, 4R+nc)
    box_logits = flat[..., : 4 * REG_MAX]
    cls_logits = flat[..., 4 * REG_MAX :]

    def one(bl, cl, gb, gl, gv):
        scores = jax.nn.sigmoid(cl)
        pboxes = decode_boxes(bl, anchors, strides_arr)
        fg, tl, tb, tscores = task_aligned_assign(
            jax.lax.stop_gradient(scores),
            jax.lax.stop_gradient(pboxes),
            anchors,
            gb,
            gl,
            gv,
        )
        tss = jnp.maximum(tscores.sum(), 1.0)
        # BCE cls to soft targets
        bce = jnp.maximum(cl, 0) - cl * tscores + jnp.log1p(jnp.exp(-jnp.abs(cl)))
        loss_cls = bce.sum() / tss
        # CIoU box loss on fg, weighted by target score
        weight = tscores.sum(-1)
        c = ciou(pboxes, tb)
        loss_box = jnp.sum(jnp.where(fg, (1.0 - c) * weight, 0.0)) / tss
        # DFL to the two adjacent bins of the target ltrb distances
        t_ltrb = jnp.concatenate(
            [
                (anchors - tb[:, :2]) / strides_arr[:, None],
                (tb[:, 2:] - anchors) / strides_arr[:, None],
            ],
            axis=-1,
        )
        t_ltrb = jnp.clip(t_ltrb, 0, REG_MAX - 1 - 0.01)
        tl_low = jnp.floor(t_ltrb)
        wl = tl_low + 1.0 - t_ltrb
        wr = 1.0 - wl
        logp = jax.nn.log_softmax(bl.reshape(-1, 4, REG_MAX), axis=-1)
        il = tl_low.astype(jnp.int32).reshape(-1, 4, 1)
        lp_l = jnp.take_along_axis(logp, il, axis=-1)[..., 0]
        lp_r = jnp.take_along_axis(
            logp, jnp.clip(il + 1, 0, REG_MAX - 1), axis=-1
        )[..., 0]
        dfl = -(wl.reshape(-1, 4) * lp_l + wr.reshape(-1, 4) * lp_r)
        dfl = dfl.mean(-1).reshape(-1)
        loss_dfl = jnp.sum(jnp.where(fg, dfl * weight, 0.0)) / tss
        return loss_box * box_gain + loss_cls * cls_gain + loss_dfl * dfl_gain

    losses = jax.vmap(one)(box_logits, cls_logits, gt_boxes, gt_labels, gt_valid)
    return losses.sum()


def letterbox(images: jnp.ndarray, size: int = 640, pad_value: float = 114 / 255):
    """Differentiable letterbox (`yolov3_detector.py:45-61`): aspect-
    preserving bilinear resize + centered gray padding. Returns (images,
    scale, (pad_x, pad_y))."""
    b, h, w, c = images.shape
    scale = min(size / h, size / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = jax.image.resize(images, (b, nh, nw, c), "bilinear")
    pad_y, pad_x = (size - nh) // 2, (size - nw) // 2
    out = jnp.full((b, size, size, c), pad_value, images.dtype)
    out = jax.lax.dynamic_update_slice(out, resized, (0, pad_y, pad_x, 0))
    return out, scale, (pad_x, pad_y)


# ---------------------------------------------------------------------------
# Detector plugin
# ---------------------------------------------------------------------------


class YoloDetector(Detector):
    """Frozen YOLO scoring head (factory names yolov3/yolov5/yolov8/yolov11,
    `detectors/factory.py:9-24`)."""

    def __init__(
        self,
        variant: str = "yolov8",
        num_classes: int = 80,
        imgsz: int = 640,
        seed: int = 0,
        weights: Optional[str] = None,
    ):
        family, key = resolve_variant(variant)
        self.name = variant
        self.family = family
        self.variant = key
        self.nc = num_classes
        self.imgsz = imgsz
        self.seed = seed
        self.weights_path = weights
        self.params = None
        self.model = YoloGraph(family=family, scale=key, nc=num_classes)

    @property
    def class_names(self):
        return COCO_CLASSES[: self.nc]

    def load_model(self) -> None:
        if self.params is not None:
            return
        dummy = jnp.zeros((1, self.imgsz, self.imgsz, 3))
        variables = self.model.init(jax.random.PRNGKey(self.seed), dummy)
        self.params = self._bias_init(variables)
        if self.weights_path:
            from .convert_yolo import load_converted_npz

            self.params = load_converted_npz(self.weights_path, self.params)
        self._fwd = jax.jit(lambda p, x: self.model.apply(p, x))

    def _bias_init(self, variables):
        """ultralytics Detect.bias_init: box-branch final bias = 1.0, cls
        branch = log(5/nc/(640/stride)^2) so a fresh head emits calibrated
        priors (and usable attack gradients) instead of flat noise."""
        params = dict(variables["params"])
        detect_name = max(
            (k for k in params if k.startswith("m")),
            key=lambda k: int(k[1:].split("_")[0]),
        )
        det = dict(params[detect_name])
        for i, s in enumerate(STRIDES):
            b = dict(det[f"cv2_{i}_2"])
            b["bias"] = jnp.ones_like(b["bias"])
            det[f"cv2_{i}_2"] = b
            c = dict(det[f"cv3_{i}_2"])
            c["bias"] = jnp.full_like(
                c["bias"], float(np.log(5.0 / self.nc / (640.0 / s) ** 2))
            )
            det[f"cv3_{i}_2"] = c
        params[detect_name] = det
        return {**variables, "params": params}

    def _prepare(self, images: jnp.ndarray):
        img, scale, pad = letterbox(images, self.imgsz)
        return img, scale, pad

    def loss(self, images, target, bboxes):
        """Differentiable v8 training loss with every GT labeled `target`
        (the attack's target-assignment trick, `yolov3_detector.py:64-93`)."""
        self.load_model()
        images = images if images.ndim == 4 else images[None]
        bboxes = jnp.asarray(bboxes, jnp.float32).reshape(images.shape[0], -1, 4)
        img, scale, (px, py) = self._prepare(images)
        # GT boxes into letterboxed pixel coords
        gb = bboxes * scale + jnp.array([px, py, px, py], jnp.float32)
        m = gb.shape[1]
        gl = jnp.full((images.shape[0], m), int(target), jnp.int32)
        gv = jnp.any(bboxes != 0, axis=-1) | (
            (bboxes[..., 2] > bboxes[..., 0]) & (bboxes[..., 3] > bboxes[..., 1])
        )
        outs = self.model.apply(self.params, img)
        return v8_detection_loss(outs, gb, gl, gv, self.nc)

    def predict(self, image, threshold: float = 0.5) -> Detections:
        self.load_model()
        images = jnp.asarray(image)[None]
        h0, w0 = images.shape[1:3]
        img, scale, (px, py) = self._prepare(images)
        outs = self._fwd(self.params, img)
        hw = [(o.shape[1], o.shape[2]) for o in outs]
        anchors, strides_arr = make_anchors(hw)
        flat = jnp.concatenate(
            [o.reshape(1, -1, o.shape[-1]) for o in outs], axis=1
        )[0]
        boxes = decode_boxes(flat[:, : 4 * REG_MAX], anchors, strides_arr)
        scores = jax.nn.sigmoid(flat[:, 4 * REG_MAX :])
        best = jnp.argmax(scores, axis=-1)
        conf = jnp.max(scores, axis=-1)
        keep_mask = np.asarray(conf > threshold)
        if not keep_mask.any():
            return Detections(
                np.zeros((0, 4), np.float32), np.zeros(0, np.float32),
                np.zeros(0, np.int64),
            )
        b = np.asarray(boxes)[keep_mask]
        # back to original image coords
        b = (b - np.array([px, py, px, py])) / scale
        b[:, 0::2] = b[:, 0::2].clip(0, w0)
        b[:, 1::2] = b[:, 1::2].clip(0, h0)
        s = np.asarray(conf)[keep_mask]
        c = np.asarray(best)[keep_mask].astype(np.int64)
        keep = nms(b, s, iou_thres=0.45)
        return Detections(b[keep], s[keep], c[keep])
