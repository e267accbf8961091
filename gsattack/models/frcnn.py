"""Faster R-CNN R50-FPN scoring head — the reference's "detectron2"
detector rebuilt natively in flax.

The attack contract (`detectors/detectron2_detector.py:29-105`): run the
model in *training* mode on the rendered image with the silhouette GT box
labeled `target`, and return only the ROI-head classification loss
(`loss_cls`, target_loss_idx=[0]). Gradients flow image -> backbone ->
ROIAlign -> cls logits; proposal coordinates are detached (as detectron2
itself does). Inputs are [0,1] floats; the reference scales x*255+0.5 and
normalizes with the pixel mean/std inside the model — reproduced here.

Structure: ResNet-50 (frozen-BN bottlenecks) -> FPN P2..P6 -> RPN
(objectness + deltas, 3 aspect ratios) -> top-k proposals + GT box ->
ROIAlign 7x7 with FPN level assignment -> 2xFC box head -> (nc+1) cls
logits. Eval predict: per-class deltas + NMS + score threshold.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .base import COCO_CLASSES, Detections, Detector, nms

PIXEL_MEAN = np.array([103.530, 116.280, 123.675], np.float32)  # BGR means
PIXEL_STD = np.array([1.0, 1.0, 1.0], np.float32)
ANCHOR_SIZES = (32, 64, 128, 256, 512)  # per FPN level P2..P6
ASPECTS = (0.5, 1.0, 2.0)
FPN_CH = 256
POOL = 7


class FrozenBN(nn.Module):
    """Frozen batchnorm: per-channel affine with stored running stats."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features)
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features)
        ).value
        return (x - mean) * scale * jax.lax.rsqrt(var + 1e-5) + bias


class Bottleneck(nn.Module):
    out: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        mid = self.out // 4
        h = nn.Conv(mid, (1, 1), use_bias=False)(x)
        h = nn.relu(FrozenBN(mid)(h))
        h = nn.Conv(mid, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", use_bias=False)(h)
        h = nn.relu(FrozenBN(mid)(h))
        h = nn.Conv(self.out, (1, 1), use_bias=False)(h)
        h = FrozenBN(self.out)(h)
        if self.downsample:
            x = nn.Conv(self.out, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False)(x)
            x = FrozenBN(self.out)(x)
        return nn.relu(x + h)


class ResNet50(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False)(x)
        x = nn.relu(FrozenBN(64)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        outs = []
        for stage, (blocks, ch) in enumerate(
            [(3, 256), (4, 512), (6, 1024), (3, 2048)]
        ):
            stride = 1 if stage == 0 else 2
            x = Bottleneck(ch, stride, downsample=True)(x)
            for _ in range(blocks - 1):
                x = Bottleneck(ch)(x)
            outs.append(x)
        return outs  # C2, C3, C4, C5 at strides 4, 8, 16, 32


class FPN(nn.Module):
    @nn.compact
    def __call__(self, feats):
        c2, c3, c4, c5 = feats
        laterals = [
            nn.Conv(FPN_CH, (1, 1))(c) for c in (c2, c3, c4, c5)
        ]
        p5 = laterals[3]
        ps = [p5]
        for lat in laterals[2::-1]:
            up = jax.image.resize(
                ps[0], (lat.shape[0], lat.shape[1], lat.shape[2], FPN_CH),
                "nearest",
            )
            ps.insert(0, lat + up)
        outs = [nn.Conv(FPN_CH, (3, 3), padding="SAME")(p) for p in ps]
        p6 = nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
        return outs + [p6]  # P2..P6 at strides 4, 8, 16, 32, 64


class RPNHead(nn.Module):
    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(FPN_CH, (3, 3), padding="SAME", name="conv")
        obj = nn.Conv(len(ASPECTS), (1, 1), name="objectness")
        deltas = nn.Conv(len(ASPECTS) * 4, (1, 1), name="anchor_deltas")
        outs = []
        for f in feats:
            h = nn.relu(conv(f))
            outs.append((obj(h), deltas(h)))
        return outs


class BoxHead(nn.Module):
    nc: int

    @nn.compact
    def __call__(self, roi_feats):  # (R, POOL, POOL, FPN_CH)
        h = roi_feats.reshape(roi_feats.shape[0], -1)
        h = nn.relu(nn.Dense(1024)(h))
        h = nn.relu(nn.Dense(1024)(h))
        cls_logits = nn.Dense(self.nc + 1)(h)
        box_deltas = nn.Dense(self.nc * 4)(h)
        return cls_logits, box_deltas


class FasterRCNN(nn.Module):
    nc: int = 80

    @nn.compact
    def __call__(self, images):
        feats = ResNet50()(images)
        fpn = FPN()(feats)
        rpn = RPNHead()(fpn)
        return fpn, rpn

    # ROI phase is called separately so proposals can be computed in between.


def make_level_anchors(h, w, stride, size):
    ys = (jnp.arange(h) + 0.5) * stride
    xs = (jnp.arange(w) + 0.5) * stride
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    centers = jnp.stack([xx, yy], axis=-1).reshape(-1, 2)
    boxes = []
    for a in ASPECTS:
        ww = size * np.sqrt(1.0 / a)
        hh = size * np.sqrt(a)
        half = jnp.array([ww / 2, hh / 2], jnp.float32)
        boxes.append(jnp.concatenate([centers - half, centers + half], axis=-1))
    return jnp.stack(boxes, axis=1).reshape(-1, 4)  # (H*W*A, 4)


def decode_deltas(anchors, deltas):
    """Standard R-CNN box parameterization."""
    wa = anchors[:, 2] - anchors[:, 0]
    ha = anchors[:, 3] - anchors[:, 1]
    cxa = anchors[:, 0] + wa / 2
    cya = anchors[:, 1] + ha / 2
    dx, dy, dw, dh = deltas[:, 0], deltas[:, 1], deltas[:, 2], deltas[:, 3]
    cx = cxa + dx * wa
    cy = cya + dy * ha
    w = wa * jnp.exp(jnp.clip(dw, -4, 4))
    h = ha * jnp.exp(jnp.clip(dh, -4, 4))
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def roi_align(feat, boxes, stride, pool=POOL):
    """Bilinear ROIAlign: (H, W, C) feature + (R, 4) boxes -> (R, pool,
    pool, C). One sample per bin center (sampling_ratio=1 flavor)."""
    h, w, c = feat.shape

    def one(box):
        x1, y1, x2, y2 = box / stride
        bw = jnp.maximum(x2 - x1, 1e-3) / pool
        bh = jnp.maximum(y2 - y1, 1e-3) / pool
        xs = x1 + (jnp.arange(pool) + 0.5) * bw
        ys = y1 + (jnp.arange(pool) + 0.5) * bh
        # bilinear sample at (ys, xs) grid
        x0 = jnp.clip(jnp.floor(xs - 0.5), 0, w - 1)
        y0 = jnp.clip(jnp.floor(ys - 0.5), 0, h - 1)
        wx = jnp.clip((xs - 0.5) - x0, 0.0, 1.0)
        wy = jnp.clip((ys - 0.5) - y0, 0.0, 1.0)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        x1i = jnp.clip(x0i + 1, 0, w - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        f00 = feat[y0i[:, None], x0i[None, :]]
        f01 = feat[y0i[:, None], x1i[None, :]]
        f10 = feat[y1i[:, None], x0i[None, :]]
        f11 = feat[y1i[:, None], x1i[None, :]]
        wxg = wx[None, :, None]
        wyg = wy[:, None, None]
        return (
            f00 * (1 - wxg) * (1 - wyg)
            + f01 * wxg * (1 - wyg)
            + f10 * (1 - wxg) * wyg
            + f11 * wxg * wyg
        )

    return jax.vmap(one)(boxes)


def fpn_level_for_boxes(boxes):
    """detectron2 level assignment: floor(4 + log2(sqrt(area)/224)),
    clamped to P2..P5 (indices 0..3)."""
    area = jnp.maximum(
        (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 1e-6
    )
    lvl = jnp.floor(4 + jnp.log2(jnp.sqrt(area) / 224.0 + 1e-8))
    return jnp.clip(lvl, 2, 5).astype(jnp.int32) - 2


class FasterRCNNDetector(Detector):
    name = "detectron2"

    def __init__(
        self,
        num_classes: int = 80,
        seed: int = 0,
        num_proposals: int = 256,
        weights: Optional[str] = None,
    ):
        self.nc = num_classes
        self.seed = seed
        self.num_proposals = num_proposals
        self.weights_path = weights
        self.params = None
        self.model = FasterRCNN(nc=num_classes)
        self.box_head = BoxHead(nc=num_classes)

    @property
    def class_names(self):
        return COCO_CLASSES[: self.nc]

    def load_model(self) -> None:
        if self.params is not None:
            return
        k1, k2 = jax.random.split(jax.random.PRNGKey(self.seed))
        dummy = jnp.zeros((1, 128, 128, 3))
        self.params = self.model.init(k1, dummy)
        dummy_roi = jnp.zeros((1, POOL, POOL, FPN_CH))
        self.head_params = self.box_head.init(k2, dummy_roi)

    def _backbone(self, params, images01):
        # reference input transform: [0,1] -> x*255+0.5 clip, BGR mean-sub
        x = jnp.clip(images01 * 255.0 + 0.5, 0, 255)
        x = x[..., ::-1]  # RGB -> BGR (detectron2 default format)
        x = (x - PIXEL_MEAN) / PIXEL_STD
        return self.model.apply(params, x)

    def _proposals(self, fpn, rpn, image_hw, topk_per_level: int = 64):
        """Top-objectness decoded RPN boxes across levels (detached)."""
        boxes_all, scores_all = [], []
        for lvl, (f, (obj, deltas)) in enumerate(zip(fpn, rpn)):
            stride = 4 * (2**lvl)
            h, w = f.shape[1], f.shape[2]
            anchors = make_level_anchors(h, w, stride, ANCHOR_SIZES[lvl])
            obj_f = obj.reshape(-1)
            d = deltas.reshape(-1, 4)
            k = min(topk_per_level, obj_f.shape[0])
            top_s, top_i = jax.lax.top_k(obj_f, k)
            b = decode_deltas(anchors[top_i], d[top_i])
            b = jnp.clip(
                b,
                jnp.zeros(4),
                jnp.array([image_hw[1], image_hw[0], image_hw[1], image_hw[0]],
                          jnp.float32),
            )
            boxes_all.append(b)
            scores_all.append(top_s)
        boxes = jnp.concatenate(boxes_all)
        scores = jnp.concatenate(scores_all)
        k = min(self.num_proposals, boxes.shape[0])
        top_s, top_i = jax.lax.top_k(scores, k)
        return jax.lax.stop_gradient(boxes[top_i])

    def _roi_features(self, fpn, boxes):
        """ROIAlign with per-box FPN level selection (blend over the 4
        levels with a one-hot mask to stay jit-friendly)."""
        lvls = fpn_level_for_boxes(boxes)
        pooled = jnp.zeros((boxes.shape[0], POOL, POOL, FPN_CH))
        for li in range(4):
            stride = 4 * (2**li)
            feats = roi_align(fpn[li][0], boxes, stride)
            pooled = pooled + jnp.where(
                (lvls == li)[:, None, None, None], feats, 0.0
            )
        return pooled

    def loss(self, images, target, bboxes):
        """ROI-head `loss_cls` only (`detectron2_detector.py:76-104`):
        proposals (+ the GT box) labeled by IoU>=0.5 against the GT box as
        `target` vs background; softmax CE."""
        self.load_model()
        images = images if images.ndim == 4 else images[None]
        bboxes = jnp.asarray(bboxes, jnp.float32).reshape(images.shape[0], -1, 4)
        hw = images.shape[1:3]

        def one(img, gt):
            fpn, rpn = self._backbone(self.params, img[None])
            props = self._proposals(fpn, rpn, hw)
            props = jnp.concatenate([props, gt], axis=0)  # add GT proposal
            from .yolo import pairwise_iou_xyxy

            ious = pairwise_iou_xyxy(props, gt).max(axis=1)
            labels = jnp.where(ious >= 0.5, target, self.nc)
            roi = self._roi_features(fpn, props)
            logits, _ = self.box_head.apply(self.head_params, roi)
            logp = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
            return ce.mean()

        losses = jax.vmap(one)(images, bboxes)
        return losses.mean()

    def predict(self, image, threshold: float = 0.5) -> Detections:
        self.load_model()
        images = jnp.asarray(image)[None]
        hw = images.shape[1:3]
        fpn, rpn = self._backbone(self.params, images)
        props = self._proposals(fpn, rpn, hw)
        roi = self._roi_features(fpn, props)
        logits, deltas = self.box_head.apply(self.head_params, roi)
        probs = jax.nn.softmax(logits, axis=-1)[:, : self.nc]  # drop bg
        best = jnp.argmax(probs, axis=-1)
        conf = jnp.max(probs, axis=-1)
        d = deltas.reshape(-1, self.nc, 4)[jnp.arange(props.shape[0]), best]
        boxes = decode_deltas(props, d)
        boxes = jnp.clip(
            boxes,
            jnp.zeros(4),
            jnp.array([hw[1], hw[0], hw[1], hw[0]], jnp.float32),
        )
        keep_mask = np.asarray(conf > threshold)
        if not keep_mask.any():
            return Detections(
                np.zeros((0, 4), np.float32), np.zeros(0, np.float32),
                np.zeros(0, np.int64),
            )
        b = np.asarray(boxes)[keep_mask]
        s = np.asarray(conf)[keep_mask]
        c = np.asarray(best)[keep_mask].astype(np.int64)
        keep = nms(b, s, iou_thres=0.5)
        return Detections(b[keep], s[keep], c[keep])
