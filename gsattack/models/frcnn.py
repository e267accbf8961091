"""Faster R-CNN R50-FPN scoring head — the reference's "detectron2"
detector rebuilt natively in flax, weight-loadable from detectron2
checkpoints.

The attack contract (`detectors/detectron2_detector.py:29-105`): run the
model in *training* mode on the rendered image with the silhouette GT box
labeled `target`, and return only the ROI-head classification loss
(`loss_cls`, target_loss_idx=[0]). Gradients flow image -> backbone ->
ROIAlign -> cls logits; proposal coordinates are detached (as detectron2
itself does). Inputs are [0,1] floats; the reference scales x*255+0.5 and
normalizes with the pixel mean/std inside the model — reproduced here.

Structure mirrors detectron2's GeneralizedRCNN module tree, and the flax
submodule names mirror its state_dict keys so weight conversion is a
mechanical rename (convert_frcnn.py, proven by the torch-executed parity
test in tests/test_frcnn_parity.py):

  backbone.bottom_up.stem.conv1(.norm)   ResNet-50 stem (FrozenBN)
  backbone.bottom_up.res{2..5}.{i}.conv{1..3}(.norm), .shortcut(.norm)
      caffe-style bottlenecks: stride lives in conv1 (stride_in_1x1), the
      layout the detectron2 R50 weights assume
  backbone.fpn_lateral{2..5}, backbone.fpn_output{2..5}
  proposal_generator.rpn_head.{conv, objectness_logits, anchor_deltas}
  roi_heads.box_head.{fc1, fc2}   (input flattened channel-first like torch)
  roi_heads.box_predictor.{cls_score, bbox_pred}

Deviations (documented): ROIAlign uses aligned=True with a fixed
sampling_ratio=2 grid (detectron2's ratio-0 adapts the sample count to the
box size — data-dependent shapes, not XLA-expressible); RPN proposal
selection is deterministic top-k per level (no NMS between levels) and the
ROI batch uses a deterministic 512 @ 25%-positive subsample instead of
detectron2's random one (`roi_heads.py` label_and_sample_proposals).
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
ROI_BATCH = 512
ROI_POS_FRACTION = 0.25


class FrozenBN(nn.Module):
    """Frozen batchnorm: per-channel affine with stored running stats
    (detectron2 FrozenBatchNorm2d, eps=1e-5)."""

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


class D2Conv(nn.Module):
    """Conv whose kernel sits directly at the module scope + child norm —
    matches `convN.weight` / `convN.norm.*` key layout."""

    out: int
    k: int = 3
    s: int = 1

    @nn.compact
    def __call__(self, x):
        p = self.k // 2
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (self.k, self.k, x.shape[-1], self.out),
        )
        h = jax.lax.conv_general_dilated(
            x, kernel, (self.s, self.s), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return FrozenBN(self.out, name="norm")(h)


class BottleneckBlock(nn.Module):
    """Caffe-style bottleneck: stride in conv1 (stride_in_1x1=True)."""

    out: int
    stride: int = 1
    shortcut: bool = False

    @nn.compact
    def __call__(self, x):
        mid = self.out // 4
        h = nn.relu(D2Conv(mid, 1, self.stride, name="conv1")(x))
        h = nn.relu(D2Conv(mid, 3, 1, name="conv2")(h))
        h = D2Conv(self.out, 1, 1, name="conv3")(h)
        if self.shortcut:
            x = D2Conv(self.out, 1, self.stride, name="shortcut")(x)
        return nn.relu(x + h)


class Stem(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.relu(D2Conv(64, 7, 2, name="conv1")(x))
        return nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )


class BottomUp(nn.Module):
    """ResNet-50: stem + res2..res5 (3, 4, 6, 3 blocks)."""

    @nn.compact
    def __call__(self, x):
        x = Stem(name="stem")(x)
        outs = []
        for si, (blocks, ch) in enumerate(
            [(3, 256), (4, 512), (6, 1024), (3, 2048)]
        ):
            stage = si + 2
            stride = 1 if si == 0 else 2
            x = BottleneckBlock(
                ch, stride, shortcut=True, name=f"res{stage}_0"
            )(x)
            for b in range(1, blocks):
                x = BottleneckBlock(ch, name=f"res{stage}_{b}")(x)
            outs.append(x)
        return outs  # C2..C5 at strides 4, 8, 16, 32


class FPNBackbone(nn.Module):
    @nn.compact
    def __call__(self, x):
        c2, c3, c4, c5 = BottomUp(name="bottom_up")(x)
        laterals = [
            nn.Conv(FPN_CH, (1, 1), name=f"fpn_lateral{i + 2}")(c)
            for i, c in enumerate((c2, c3, c4, c5))
        ]
        p = laterals[3]
        tops = [p]
        for lat in laterals[2::-1]:
            up = jax.image.resize(
                tops[0],
                (lat.shape[0], lat.shape[1], lat.shape[2], FPN_CH),
                "nearest",
            )
            tops.insert(0, lat + up)
        outs = [
            nn.Conv(FPN_CH, (3, 3), padding=((1, 1), (1, 1)),
                    name=f"fpn_output{i + 2}")(t)
            for i, t in enumerate(tops)
        ]
        p6 = nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
        return outs + [p6]  # P2..P6 at strides 4, 8, 16, 32, 64


class RPNHead(nn.Module):
    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(FPN_CH, (3, 3), padding=((1, 1), (1, 1)), name="conv")
        obj = nn.Conv(len(ASPECTS), (1, 1), name="objectness_logits")
        deltas = nn.Conv(len(ASPECTS) * 4, (1, 1), name="anchor_deltas")
        outs = []
        for f in feats:
            h = nn.relu(conv(f))
            outs.append((obj(h), deltas(h)))
        return outs


class BoxHead(nn.Module):
    @nn.compact
    def __call__(self, roi_feats):  # (R, POOL, POOL, FPN_CH)
        # torch flattens (C, 7, 7) channel-first; match so fc1 weights load
        h = jnp.transpose(roi_feats, (0, 3, 1, 2)).reshape(
            roi_feats.shape[0], -1
        )
        h = nn.relu(nn.Dense(1024, name="fc1")(h))
        return nn.relu(nn.Dense(1024, name="fc2")(h))


class BoxPredictor(nn.Module):
    nc: int

    @nn.compact
    def __call__(self, h):
        cls_logits = nn.Dense(self.nc + 1, name="cls_score")(h)
        box_deltas = nn.Dense(self.nc * 4, name="bbox_pred")(h)
        return cls_logits, box_deltas


class ProposalGenerator(nn.Module):
    @nn.compact
    def __call__(self, feats):
        return RPNHead(name="rpn_head")(feats)


class ROIHeads(nn.Module):
    nc: int

    @nn.compact
    def __call__(self, roi_feats):
        h = BoxHead(name="box_head")(roi_feats)
        return BoxPredictor(self.nc, name="box_predictor")(h)


class D2FasterRCNN(nn.Module):
    """GeneralizedRCNN-shaped module tree; two-phase apply (backbone+RPN,
    then ROI on externally computed proposal boxes)."""

    nc: int = 80

    def setup(self):
        self.backbone = FPNBackbone(name="backbone")
        self.proposal_generator = ProposalGenerator(name="proposal_generator")
        self.roi_heads = ROIHeads(self.nc, name="roi_heads")

    def __call__(self, images):
        fpn = self.backbone(images)
        rpn = self.proposal_generator(fpn)
        return fpn, rpn

    def roi(self, roi_feats):
        return self.roi_heads(roi_feats)


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


def roi_align(feat, boxes, stride, pool=POOL, sampling: int = 2):
    """ROIAlign, aligned=True (half-pixel shift), fixed `sampling`^2
    bilinear samples per bin averaged — detectron2's ROIAlignV2 with
    sampling_ratio=2 (its ratio-0 adaptive count is data-dependent).
    (H, W, C) feature + (R, 4) pixel boxes -> (R, pool, pool, C)."""
    h, w, c = feat.shape

    def one(box):
        x1, y1, x2, y2 = box / stride
        bw = (x2 - x1) / pool
        bh = (y2 - y1) / pool
        # sample grid: `sampling` points per bin per axis
        def axis_samples(lo, bsz):
            # (pool, sampling) sample coords
            j = jnp.arange(pool, dtype=jnp.float32)[:, None]
            k = jnp.arange(sampling, dtype=jnp.float32)[None, :]
            return lo + (j + (k + 0.5) / sampling) * bsz

        xs = axis_samples(x1, bw).reshape(-1)  # (pool*sampling,)
        ys = axis_samples(y1, bh).reshape(-1)

        def bilinear(yc, xc):
            xg = xc - 0.5  # aligned=True continuous coords
            yg = yc - 0.5
            x0 = jnp.clip(jnp.floor(xg), 0, w - 1)
            y0 = jnp.clip(jnp.floor(yg), 0, h - 1)
            wx = jnp.clip(xg - x0, 0.0, 1.0)
            wy = jnp.clip(yg - y0, 0.0, 1.0)
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

        # (pool*s, pool*s, C) then average each s x s group
        g = bilinear(ys, xs)
        g = g.reshape(pool, sampling, pool, sampling, c).mean(axis=(1, 3))
        return g

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
        self.model = D2FasterRCNN(nc=num_classes)

    @property
    def class_names(self):
        return COCO_CLASSES[: self.nc]

    def load_model(self) -> None:
        """Init + (when `weights` is set) pour a converted detectron2
        checkpoint — the reference's `load_model` contract
        (`detectron2_detector.py:29-53`)."""
        if self.params is not None:
            return
        dummy = jnp.zeros((1, 128, 128, 3))
        dummy_roi = jnp.zeros((1, POOL, POOL, FPN_CH))
        self.params = self.model.init(
            jax.random.PRNGKey(self.seed), dummy,
        )
        # roi branch params initialize lazily in setup()-style modules only
        # when traced; run the roi method once to materialize them.
        roi_vars = self.model.init(
            jax.random.PRNGKey(self.seed + 1), dummy_roi,
            method=D2FasterRCNN.roi,
        )
        for coll in roi_vars:
            merged = dict(self.params.get(coll, {}))
            merged.update(roi_vars[coll])
            self.params = {**self.params, coll: merged}
        if self.weights_path:
            from .convert_frcnn import load_converted

            self.params = load_converted(self.weights_path, self.params)

    def _backbone(self, params, images01):
        # reference input transform: [0,1] -> x*255+0.5 clip, BGR mean-sub
        # (`detectron2_detector.py:78`)
        x = jnp.clip(images01 * 255.0 + 0.5, 0, 255)
        x = x[..., ::-1]  # RGB -> BGR (detectron2 default format)
        x = (x - PIXEL_MEAN) / PIXEL_STD
        return self.model.apply(params, x)

    def _roi_logits(self, params, roi_feats):
        return self.model.apply(params, roi_feats, method=D2FasterRCNN.roi)

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
        return jax.lax.stop_gradient(boxes[top_i]), jax.lax.stop_gradient(
            top_s[:k]
        )

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

    def _sample_rois(self, props, obj_scores, gt, target):
        """Deterministic analogue of detectron2's 512 @ 25%-positive ROI
        subsample (`label_and_sample_proposals`): label by IoU>=0.5 vs the
        GT box, keep the top positives by IoU (<= 128) and fill with the
        highest-objectness negatives. GT box is always appended (detectron2
        proposal_append_gt)."""
        from .yolo import pairwise_iou_xyxy

        props = jnp.concatenate([props, gt], axis=0)
        obj_scores = jnp.concatenate(
            [obj_scores, jnp.full((gt.shape[0],), 1e6)], axis=0
        )
        ious = pairwise_iou_xyxy(props, gt).max(axis=1)
        is_fg = ious >= 0.5
        n = props.shape[0]
        batch = min(ROI_BATCH, n)
        n_pos = int(batch * ROI_POS_FRACTION)
        # rank: positives by IoU first (top n_pos), then negatives by
        # objectness; implemented as one top-k over a composed score
        pos_rank = jnp.where(is_fg, 1e6 + ious, obj_scores)
        # cap positives at n_pos: demote positives beyond the n_pos best
        pos_sorted = jnp.sort(jnp.where(is_fg, ious, -1.0))[::-1]
        pos_cut = pos_sorted[jnp.minimum(n_pos - 1, n - 1)]
        demote = is_fg & (ious < pos_cut)
        rank = jnp.where(demote, obj_scores, pos_rank)
        _, idx = jax.lax.top_k(rank, batch)
        labels = jnp.where(is_fg[idx], target, self.nc)
        return props[idx], labels

    def loss(self, images, target, bboxes):
        """ROI-head `loss_cls` only (`detectron2_detector.py:76-104`):
        sampled proposals (+ the GT box) labeled by IoU>=0.5 against the GT
        box as `target` vs background; softmax CE."""
        self.load_model()
        images = images if images.ndim == 4 else images[None]
        bboxes = jnp.asarray(bboxes, jnp.float32).reshape(images.shape[0], -1, 4)
        hw = images.shape[1:3]

        def one(img, gt):
            fpn, rpn = self._backbone(self.params, img[None])
            props, scores = self._proposals(fpn, rpn, hw)
            rois, labels = self._sample_rois(props, scores, gt, target)
            roi = self._roi_features(fpn, rois)
            logits, _ = self._roi_logits(self.params, roi)
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
        props, _ = self._proposals(fpn, rpn, hw)
        roi = self._roi_features(fpn, props)
        logits, deltas = self._roi_logits(self.params, roi)
        probs = jax.nn.softmax(logits, axis=-1)[:, : self.nc]  # drop bg
        best = jnp.argmax(probs, axis=-1)
        conf = jnp.max(probs, axis=-1)
        d = deltas.reshape(-1, self.nc, 4)[jnp.arange(props.shape[0]), best]
        # detectron2 box-head deltas are scaled by (10, 10, 5, 5)
        d = d / jnp.array([10.0, 10.0, 5.0, 5.0])
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
