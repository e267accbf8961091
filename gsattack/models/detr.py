"""DETR scoring head — the torch-hub demo model rebuilt natively in flax,
weight-loadable from `detr_demo-da2a99e9.pth`.

The reference's `detectors/detr_detector.py:54-76` builds DETRdemo (the
facebookresearch/detr colab model: torchvision resnet50 trunk -> 1x1 conv
to 256 -> torch nn.Transformer(256, 8, 6, 6) with learned 50x128 row/col
positional embeds and 100 learned query_pos -> linear_class (nc+1) +
linear_bbox (sigmoid cxcywh)) and pulls its demo checkpoint from torch hub.
Its loss path is broken in the snapshot (imports a nonexistent module and
references an undefined `criterion`, SURVEY.md §2.5); here the set loss is
implemented working (class + L1 + GIoU with Hungarian matching — the
standard DETR criterion the reference sums, `detr_detector.py:100-115`).

flax module names mirror the torch state_dict keys (backbone.layer1.0.*,
transformer.encoder.layers.0.self_attn.in_proj_weight, linear_class, ...)
so weight conversion is the shared mechanical rename (convert_detr.py),
proven by the torch-executed parity test (tests/test_detr_parity.py) which
uses torch's OWN nn.Transformer as the mirror.

Faithful forward semantics: torchvision-v1 resnet50 (stride in the 3x3
conv, BN eps 1e-5), post-LayerNorm transformer (eps 1e-5, relu, ffn 2048),
positional embed added ONCE at the encoder input scaled against 0.1 * src
(the demo's quirk, not per-layer like full DETR), queries fed as decoder
input embeddings.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .base import COCO_CLASSES, Detections, Detector, nms

D_MODEL = 256
FFN = 2048
HEADS = 8


class TVBatchNorm(nn.Module):
    """Eval-mode BatchNorm2d (torchvision, eps=1e-5)."""

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


def _conv(out, k, s=1, name=None):
    p = k // 2
    return nn.Conv(
        out, (k, k), strides=(s, s), padding=((p, p), (p, p)),
        use_bias=False, name=name,
    )


class TVBottleneck(nn.Module):
    """torchvision Bottleneck: stride lives in conv2 (the 3x3)."""

    out: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        mid = self.out // 4
        h = nn.relu(TVBatchNorm(mid, name="bn1")(_conv(mid, 1, name="conv1")(x)))
        h = nn.relu(
            TVBatchNorm(mid, name="bn2")(
                _conv(mid, 3, self.stride, name="conv2")(h)
            )
        )
        h = TVBatchNorm(self.out, name="bn3")(_conv(self.out, 1, name="conv3")(h))
        if self.downsample:
            x = TVBatchNorm(self.out, name="downsample_1")(
                _conv(self.out, 1, self.stride, name="downsample_0")(x)
            )
        return nn.relu(x + h)


class TVResNet50(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.relu(TVBatchNorm(64, name="bn1")(_conv(64, 7, 2, name="conv1")(x)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for li, (blocks, ch) in enumerate(
            [(3, 256), (4, 512), (6, 1024), (3, 2048)]
        ):
            stride = 1 if li == 0 else 2
            x = TVBottleneck(
                ch, stride, downsample=True, name=f"layer{li + 1}_0"
            )(x)
            for b in range(1, blocks):
                x = TVBottleneck(ch, name=f"layer{li + 1}_{b}")(x)
        return x  # (B, H/32, W/32, 2048)


class TorchMHA(nn.Module):
    """torch nn.MultiheadAttention with packed in_proj, batch-first math."""

    d: int = D_MODEL
    heads: int = HEADS

    @nn.compact
    def __call__(self, q, k, v):
        d = self.d
        W = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * d, d)
        )
        b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        qp = q @ W[:d].T + b[:d]
        kp = k @ W[d : 2 * d].T + b[d : 2 * d]
        vp = v @ W[2 * d :].T + b[2 * d :]
        B, L, _ = qp.shape
        S = kp.shape[1]
        hd = d // self.heads
        qh = qp.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)
        kh = kp.reshape(B, S, self.heads, hd).transpose(0, 2, 1, 3)
        vh = vp.reshape(B, S, self.heads, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(
            jnp.einsum("bhld,bhsd->bhls", qh, kh) / jnp.sqrt(hd), axis=-1
        )
        out = jnp.einsum("bhls,bhsd->bhld", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, d)
        return nn.Dense(d, name="out_proj")(out)


def _ln(name):
    return nn.LayerNorm(epsilon=1e-5, name=name)


class EncoderLayer(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = _ln("norm1")(x + TorchMHA(name="self_attn")(x, x, x))
        h = nn.Dense(FFN, name="linear1")(x)
        h = nn.Dense(D_MODEL, name="linear2")(nn.relu(h))
        return _ln("norm2")(x + h)


class DecoderLayer(nn.Module):
    @nn.compact
    def __call__(self, t, mem):
        t = _ln("norm1")(t + TorchMHA(name="self_attn")(t, t, t))
        t = _ln("norm2")(t + TorchMHA(name="multihead_attn")(t, mem, mem))
        h = nn.Dense(FFN, name="linear1")(t)
        h = nn.Dense(D_MODEL, name="linear2")(nn.relu(h))
        return _ln("norm3")(t + h)


class Encoder(nn.Module):
    n: int = 6

    @nn.compact
    def __call__(self, x):
        for i in range(self.n):
            x = EncoderLayer(name=f"layers_{i}")(x)
        return _ln("norm")(x)


class Decoder(nn.Module):
    n: int = 6

    @nn.compact
    def __call__(self, t, mem):
        for i in range(self.n):
            t = DecoderLayer(name=f"layers_{i}")(t, mem)
        return _ln("norm")(t)


class Transformer(nn.Module):
    enc: int = 6
    dec: int = 6

    @nn.compact
    def __call__(self, src, tgt):
        mem = Encoder(self.enc, name="encoder")(src)
        return Decoder(self.dec, name="decoder")(tgt, mem)


class DETRDemo(nn.Module):
    """The facebookresearch/detr colab demo model."""

    nc: int = 91  # the demo checkpoint's COCO-91 head
    num_queries: int = 100
    enc_layers: int = 6
    dec_layers: int = 6

    @nn.compact
    def __call__(self, images):
        feat = TVResNet50(name="backbone")(images)
        h = nn.Conv(D_MODEL, (1, 1), name="conv")(feat)
        b, hh, ww, _ = h.shape
        col = self.param(
            "col_embed", nn.initializers.uniform(1.0), (50, D_MODEL // 2)
        )
        row = self.param(
            "row_embed", nn.initializers.uniform(1.0), (50, D_MODEL // 2)
        )
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(col[None, :ww], (hh, ww, D_MODEL // 2)),
                jnp.broadcast_to(row[:hh, None], (hh, ww, D_MODEL // 2)),
            ],
            axis=-1,
        ).reshape(1, hh * ww, D_MODEL)
        src = pos + 0.1 * h.reshape(b, hh * ww, D_MODEL)
        qp = self.param(
            "query_pos", nn.initializers.normal(1.0), (self.num_queries, D_MODEL)
        )
        tgt = jnp.broadcast_to(qp[None], (b, self.num_queries, D_MODEL))
        out = Transformer(self.enc_layers, self.dec_layers, name="transformer")(
            src, tgt
        )
        logits = nn.Dense(self.nc + 1, name="linear_class")(out)
        boxes = jax.nn.sigmoid(nn.Dense(4, name="linear_bbox")(out))
        return logits, boxes


def cxcywh_to_xyxy(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def giou_xyxy(a, b, eps=1e-7):
    """(..., 4) aligned generalized IoU."""
    x1 = jnp.maximum(a[..., 0], b[..., 0])
    y1 = jnp.maximum(a[..., 1], b[..., 1])
    x2 = jnp.minimum(a[..., 2], b[..., 2])
    y2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area_a + area_b - inter + eps
    iou = inter / union
    cx1 = jnp.minimum(a[..., 0], b[..., 0])
    cy1 = jnp.minimum(a[..., 1], b[..., 1])
    cx2 = jnp.maximum(a[..., 2], b[..., 2])
    cy2 = jnp.maximum(a[..., 3], b[..., 3])
    carea = (cx2 - cx1) * (cy2 - cy1) + eps
    return iou - (carea - union) / carea


def hungarian_match(cost: np.ndarray) -> np.ndarray:
    """(Q, M) cost -> for each gt m, the matched query index (exact; host
    scipy, used for eval/tests)."""
    from scipy.optimize import linear_sum_assignment

    q_idx, m_idx = linear_sum_assignment(cost)
    out = np.zeros(cost.shape[1], np.int32)
    out[m_idx] = q_idx
    return out


def greedy_match(cost: jnp.ndarray) -> jnp.ndarray:
    """jit-friendly sequential assignment: each GT (in order) claims the
    lowest-cost unclaimed query. Exact for one GT — the attack's case
    (`attack.py` always supplies a single silhouette box per view) — and a
    standard approximation beyond."""
    q, m = cost.shape

    def body(i, state):
        matched, taken = state
        c = jnp.where(taken, jnp.inf, cost[:, i])
        j = jnp.argmin(c)
        return matched.at[i].set(j), taken.at[j].set(True)

    matched0 = jnp.zeros(m, jnp.int32)
    taken0 = jnp.zeros(q, bool)
    matched, _ = jax.lax.fori_loop(0, m, body, (matched0, taken0))
    return matched


# ImageNet normalization the demo model's preprocessing applies
# (T.Normalize([0.485, 0.456, 0.406], [0.229, 0.224, 0.225])).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class DetrDetector(Detector):
    name = "detr"

    def __init__(self, num_classes: int = 91, seed: int = 0,
                 num_queries: int = 100, weights: Optional[str] = None):
        self.nc = num_classes
        self.seed = seed
        self.num_queries = num_queries
        self.weights_path = weights
        self.params = None
        self.model = DETRDemo(nc=num_classes, num_queries=num_queries)

    @property
    def class_names(self):
        return COCO_CLASSES[: self.nc]

    def load_model(self) -> None:
        if self.params is not None:
            return
        dummy = jnp.zeros((1, 128, 128, 3))
        self.params = self.model.init(jax.random.PRNGKey(self.seed), dummy)
        if self.weights_path:
            from .convert_detr import load_converted

            self.params = load_converted(self.weights_path, self.params)
        self._fwd = jax.jit(lambda p, x: self.model.apply(p, x))

    def _norm(self, images01):
        return (images01 - IMAGENET_MEAN) / IMAGENET_STD

    def loss(self, images, target, bboxes):
        """DETR set loss with every GT labeled `target`: Hungarian match on
        (cls, L1, GIoU) costs, then CE + 5*L1 + 2*GIoU on matched queries
        and no-object CE (weight 0.1) on the rest — the standard DETR
        criterion the reference sums (`detr_detector.py:100-115`)."""
        self.load_model()
        images = images if images.ndim == 4 else images[None]
        b, h, w = images.shape[:3]
        bboxes = jnp.asarray(bboxes, jnp.float32).reshape(b, -1, 4)
        scale = jnp.array([w, h, w, h], jnp.float32)
        gt_xyxy01 = bboxes / scale
        cls_logits, pboxes = self.model.apply(
            self.params, self._norm(images)
        )
        p_xyxy = cxcywh_to_xyxy(pboxes)

        def one(cl, pb_xyxy, pb_cxcywh, gt):
            prob = jax.nn.softmax(cl, axis=-1)
            m = gt.shape[0]
            gt_cxcywh = jnp.stack(
                [
                    (gt[:, 0] + gt[:, 2]) / 2,
                    (gt[:, 1] + gt[:, 3]) / 2,
                    gt[:, 2] - gt[:, 0],
                    gt[:, 3] - gt[:, 1],
                ],
                axis=-1,
            )
            cost_cls = -prob[:, target][:, None]  # (Q, M)
            cost_l1 = jnp.abs(pb_cxcywh[:, None, :] - gt_cxcywh[None]).sum(-1)
            cost_giou = -giou_xyxy(pb_xyxy[:, None, :], gt[None])
            cost = cost_cls + 5.0 * cost_l1 + 2.0 * cost_giou
            matched = greedy_match(jax.lax.stop_gradient(cost))
            # classification: matched queries -> target; rest -> no-object
            tgt_cls = jnp.full((cl.shape[0],), self.nc, jnp.int32)
            tgt_cls = tgt_cls.at[matched].set(target)
            weights = jnp.full((cl.shape[0],), 0.1).at[matched].set(1.0)
            logp = jax.nn.log_softmax(cl, axis=-1)
            ce = -jnp.take_along_axis(logp, tgt_cls[:, None], axis=-1)[:, 0]
            loss_ce = (ce * weights).sum() / weights.sum()
            pb_m = pb_cxcywh[matched]
            loss_l1 = jnp.abs(pb_m - gt_cxcywh).sum() / m
            loss_giou = (1.0 - giou_xyxy(pb_xyxy[matched], gt)).sum() / m
            return loss_ce + 5.0 * loss_l1 + 2.0 * loss_giou

        losses = jax.vmap(one)(cls_logits, p_xyxy, pboxes, gt_xyxy01)
        return losses.mean()

    def predict(self, image, threshold: float = 0.5) -> Detections:
        self.load_model()
        images = jnp.asarray(image)[None]
        h, w = images.shape[1:3]
        cls_logits, pboxes = self._fwd(self.params, self._norm(images))
        prob = jax.nn.softmax(cls_logits[0], axis=-1)[:, : self.nc]
        conf = jnp.max(prob, axis=-1)
        best = jnp.argmax(prob, axis=-1)
        boxes = cxcywh_to_xyxy(pboxes[0]) * jnp.array([w, h, w, h], jnp.float32)
        keep_mask = np.asarray(conf > threshold)
        if not keep_mask.any():
            return Detections(
                np.zeros((0, 4), np.float32), np.zeros(0, np.float32),
                np.zeros(0, np.int64),
            )
        b = np.asarray(boxes)[keep_mask].clip(0, max(h, w))
        s = np.asarray(conf)[keep_mask]
        c = np.asarray(best)[keep_mask].astype(np.int64)
        keep = nms(b, s, iou_thres=0.5)
        return Detections(b[keep], s[keep], c[keep])
