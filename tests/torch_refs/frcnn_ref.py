"""Torch mirror of detectron2's Faster R-CNN R50-FPN — TEST ONLY.

Reproduces the detectron2 GeneralizedRCNN module tree (state_dict keys:
``backbone.bottom_up.res2.0.conv1.norm.weight``,
``proposal_generator.rpn_head.conv.weight``,
``roi_heads.box_predictor.cls_score.weight`` ...) and forward semantics
(caffe-style stride-in-1x1 bottlenecks, FrozenBN eps=1e-5, FPN with
nearest top-down, aligned ROIAlign with a fixed 2x2 sample grid) so
gsattack's converter + flax graph can be proven by executed parity
(tests/test_frcnn_parity.py) without the detectron2 package.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class D2Conv2d(nn.Conv2d):
    """detectron2 Conv2d: optional .norm child applied after the conv."""

    def __init__(self, cin, cout, k, s=1, p=0, bias=False, norm=None):
        super().__init__(cin, cout, k, s, p, bias=bias)
        self.norm = norm

    def forward(self, x):
        x = F.conv2d(
            x, self.weight, self.bias, self.stride, self.padding
        )
        if self.norm is not None:
            x = self.norm(x)
        return x


def frozen_bn(c):
    bn = nn.BatchNorm2d(c, eps=1e-5)
    bn.eval()
    return bn


class BottleneckBlock(nn.Module):
    def __init__(self, cin, cout, stride=1, shortcut=False):
        super().__init__()
        mid = cout // 4
        self.conv1 = D2Conv2d(cin, mid, 1, stride, 0, norm=frozen_bn(mid))
        self.conv2 = D2Conv2d(mid, mid, 3, 1, 1, norm=frozen_bn(mid))
        self.conv3 = D2Conv2d(mid, cout, 1, 1, 0, norm=frozen_bn(cout))
        if shortcut:
            self.shortcut = D2Conv2d(cin, cout, 1, stride, 0,
                                     norm=frozen_bn(cout))
        else:
            self.shortcut = None

    def forward(self, x):
        h = F.relu(self.conv1(x))
        h = F.relu(self.conv2(h))
        h = self.conv3(h)
        s = self.shortcut(x) if self.shortcut is not None else x
        return F.relu(s + h)


class Stem(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = D2Conv2d(3, 64, 7, 2, 3, norm=frozen_bn(64))

    def forward(self, x):
        x = F.relu(self.conv1(x))
        return F.max_pool2d(x, 3, 2, 1)


class BottomUp(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = Stem()
        cin = 64
        for si, (blocks, ch) in enumerate(
            [(3, 256), (4, 512), (6, 1024), (3, 2048)]
        ):
            stride = 1 if si == 0 else 2
            mods = [BottleneckBlock(cin, ch, stride, shortcut=True)]
            mods += [BottleneckBlock(ch, ch) for _ in range(blocks - 1)]
            setattr(self, f"res{si + 2}", nn.Sequential(*mods))
            cin = ch

    def forward(self, x):
        x = self.stem(x)
        outs = []
        for s in (self.res2, self.res3, self.res4, self.res5):
            x = s(x)
            outs.append(x)
        return outs


class FPNBackbone(nn.Module):
    def __init__(self, ch=256):
        super().__init__()
        self.bottom_up = BottomUp()
        for i, cin in enumerate((256, 512, 1024, 2048)):
            setattr(self, f"fpn_lateral{i + 2}", nn.Conv2d(cin, ch, 1))
            setattr(self, f"fpn_output{i + 2}", nn.Conv2d(ch, ch, 3, 1, 1))

    def forward(self, x):
        c2, c3, c4, c5 = self.bottom_up(x)
        lats = [
            getattr(self, f"fpn_lateral{i + 2}")(c)
            for i, c in enumerate((c2, c3, c4, c5))
        ]
        tops = [lats[3]]
        for lat in lats[2::-1]:
            up = F.interpolate(tops[0], scale_factor=2, mode="nearest")
            tops.insert(0, lat + up)
        outs = [
            getattr(self, f"fpn_output{i + 2}")(t) for i, t in enumerate(tops)
        ]
        p6 = F.max_pool2d(outs[-1], 1, 2)
        return outs + [p6]


class RPNHead(nn.Module):
    def __init__(self, ch=256, a=3):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, 1, 1)
        self.objectness_logits = nn.Conv2d(ch, a, 1)
        self.anchor_deltas = nn.Conv2d(ch, a * 4, 1)

    def forward(self, feats):
        outs = []
        for f in feats:
            h = F.relu(self.conv(f))
            outs.append((self.objectness_logits(h), self.anchor_deltas(h)))
        return outs


class ProposalGenerator(nn.Module):
    def __init__(self):
        super().__init__()
        self.rpn_head = RPNHead()


class BoxHead(nn.Module):
    def __init__(self, ch=256, pool=7):
        super().__init__()
        self.fc1 = nn.Linear(ch * pool * pool, 1024)
        self.fc2 = nn.Linear(1024, 1024)

    def forward(self, roi_feats):  # (R, C, 7, 7)
        h = roi_feats.flatten(1)
        h = F.relu(self.fc1(h))
        return F.relu(self.fc2(h))


class BoxPredictor(nn.Module):
    def __init__(self, nc):
        super().__init__()
        self.cls_score = nn.Linear(1024, nc + 1)
        self.bbox_pred = nn.Linear(1024, nc * 4)

    def forward(self, h):
        return self.cls_score(h), self.bbox_pred(h)


class ROIHeads(nn.Module):
    def __init__(self, nc):
        super().__init__()
        self.box_head = BoxHead()
        self.box_predictor = BoxPredictor(nc)

    def forward(self, roi_feats):
        return self.box_predictor(self.box_head(roi_feats))


class TorchFasterRCNN(nn.Module):
    def __init__(self, nc=80):
        super().__init__()
        self.backbone = FPNBackbone()
        self.proposal_generator = ProposalGenerator()
        self.roi_heads = ROIHeads(nc)

    def forward(self, x):
        fpn = self.backbone(x)
        rpn = self.proposal_generator.rpn_head(fpn)
        return fpn, rpn


def roi_align_torch(feat, boxes, stride, pool=7, sampling=2):
    """Independent torch implementation of aligned ROIAlign with the fixed
    2x2 per-bin sample grid (matches gsattack.models.frcnn.roi_align's
    contract). feat (C, H, W), boxes (R, 4) in pixels."""
    c, h, w = feat.shape
    out = torch.zeros((boxes.shape[0], c, pool, pool))
    for r, box in enumerate(boxes):
        x1, y1, x2, y2 = (box / stride).tolist()
        bw = (x2 - x1) / pool
        bh = (y2 - y1) / pool
        for i in range(pool):
            for j in range(pool):
                acc = torch.zeros(c)
                for ky in range(sampling):
                    for kx in range(sampling):
                        yc = y1 + (i + (ky + 0.5) / sampling) * bh - 0.5
                        xc = x1 + (j + (kx + 0.5) / sampling) * bw - 0.5
                        x0 = min(max(int(torch.tensor(xc).floor()), 0), w - 1)
                        y0 = min(max(int(torch.tensor(yc).floor()), 0), h - 1)
                        wx = min(max(xc - x0, 0.0), 1.0)
                        wy = min(max(yc - y0, 0.0), 1.0)
                        x1i = min(x0 + 1, w - 1)
                        y1i = min(y0 + 1, h - 1)
                        acc += (
                            feat[:, y0, x0] * (1 - wx) * (1 - wy)
                            + feat[:, y0, x1i] * wx * (1 - wy)
                            + feat[:, y1i, x0] * (1 - wx) * wy
                            + feat[:, y1i, x1i] * wx * wy
                        )
                out[r, :, i, j] = acc / (sampling * sampling)
    return out
