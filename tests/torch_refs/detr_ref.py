"""Torch mirror of the DETR demo model — TEST ONLY.

Reproduces the facebookresearch/detr colab DETRdemo model without
torchvision: a hand-written torchvision-v1 ResNet-50 (same module names ->
same state_dict keys) + torch's OWN nn.Transformer + the demo's learned
positional embeds and forward quirks (pos added once, src scaled by 0.1).
Using the real nn.Transformer makes the parity test authoritative for the
transformer math gsattack reimplements in flax.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class TVBottleneck(nn.Module):
    def __init__(self, cin, cout, stride=1, downsample=False):
        super().__init__()
        mid = cout // 4
        self.conv1 = nn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv2 = nn.Conv2d(mid, mid, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.conv3 = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )
        else:
            self.downsample = None

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        s = self.downsample(x) if self.downsample is not None else x
        return F.relu(s + h)


class TVResNet50(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        cin = 64
        for li, (blocks, ch) in enumerate(
            [(3, 256), (4, 512), (6, 1024), (3, 2048)]
        ):
            stride = 1 if li == 0 else 2
            mods = [TVBottleneck(cin, ch, stride, downsample=True)]
            mods += [TVBottleneck(ch, ch) for _ in range(blocks - 1)]
            setattr(self, f"layer{li + 1}", nn.Sequential(*mods))
            cin = ch

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        for l in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = l(x)
        return x


class TorchDETRDemo(nn.Module):
    """The colab DETRdemo model verbatim (minus torchvision import)."""

    def __init__(self, num_classes=91, hidden_dim=256, nheads=8,
                 num_encoder_layers=6, num_decoder_layers=6):
        super().__init__()
        self.backbone = TVResNet50()
        self.conv = nn.Conv2d(2048, hidden_dim, 1)
        self.transformer = nn.Transformer(
            hidden_dim, nheads, num_encoder_layers, num_decoder_layers
        )
        self.linear_class = nn.Linear(hidden_dim, num_classes + 1)
        self.linear_bbox = nn.Linear(hidden_dim, 4)
        self.query_pos = nn.Parameter(torch.rand(100, hidden_dim))
        self.row_embed = nn.Parameter(torch.rand(50, hidden_dim // 2))
        self.col_embed = nn.Parameter(torch.rand(50, hidden_dim // 2))

    def forward(self, inputs):
        x = self.backbone(inputs)
        h = self.conv(x)
        H, W = h.shape[-2:]
        pos = (
            torch.cat(
                [
                    self.col_embed[:W].unsqueeze(0).repeat(H, 1, 1),
                    self.row_embed[:H].unsqueeze(1).repeat(1, W, 1),
                ],
                dim=-1,
            )
            .flatten(0, 1)
            .unsqueeze(1)
        )
        h = self.transformer(
            pos + 0.1 * h.flatten(2).permute(2, 0, 1),
            self.query_pos.unsqueeze(1).repeat(1, h.shape[0], 1),
        ).transpose(0, 1)
        return self.linear_class(h), torch.sigmoid(self.linear_bbox(h))
