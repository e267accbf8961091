"""Torch mirror of the ultralytics YOLO graphs — TEST ONLY.

The image has torch but not the ultralytics package, so converter parity is
proven against this mirror: it reproduces the ultralytics module tree
(attribute names -> state_dict keys like ``model.0.conv.weight``,
``model.22.cv2.0.2.bias``) and forward semantics (Conv-BN(eps=1e-3)-SiLU,
C3/C2f/C3k2/C2PSA blocks, SPPF, anchor-free Detect) for the same layer
specs gsattack's flax graphs are built from.  tests/test_yolo_parity.py
randomizes this model, exports its state_dict, converts, and asserts the
flax forward matches the torch forward.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn

from gsattack.models.yolo_blocks import (
    FORCE_C3K,
    REG_MAX,
    SCALES,
    SPECS,
)


def make_divisible(x, divisor=8):
    return math.ceil(x / divisor) * divisor


def autopad(k, p=None):
    return k // 2 if p is None else p


class Conv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, autopad(k, p), groups=g, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU() if act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


def DWConv(c1, c2, k=1, s=1, act=True):
    return Conv(c1, c2, k, s, g=math.gcd(c1, c2), act=act)


class Bottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True, g=1, k=(3, 3), e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, k[0], 1)
        self.cv2 = Conv(c_, c2, k[1], 1, g=g)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        return x + self.cv2(self.cv1(x)) if self.add else self.cv2(self.cv1(x))


class C3(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c1, c_, 1, 1)
        self.cv3 = Conv(2 * c_, c2, 1)
        self.m = nn.Sequential(
            *(Bottleneck(c_, c_, shortcut, g, k=(1, 3), e=1.0) for _ in range(n))
        )

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class C3k(C3):
    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5, k=3):
        super().__init__(c1, c2, n, shortcut, g, e)
        c_ = int(c2 * e)
        self.m = nn.Sequential(
            *(Bottleneck(c_, c_, shortcut, g, k=(k, k), e=1.0) for _ in range(n))
        )


class C2f(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False, g=1, e=0.5):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(
            Bottleneck(self.c, self.c, shortcut, g, k=(3, 3), e=1.0)
            for _ in range(n)
        )

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class C3k2(C2f):
    def __init__(self, c1, c2, n=1, c3k=False, e=0.5, g=1, shortcut=True):
        super().__init__(c1, c2, n, shortcut, g, e)
        self.m = nn.ModuleList(
            C3k(self.c, self.c, 2, shortcut, g)
            if c3k
            else Bottleneck(self.c, self.c, shortcut, g)
            for _ in range(n)
        )


class SPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c_ * 4, c2, 1, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class Attention(nn.Module):
    def __init__(self, dim, num_heads=8, attn_ratio=0.5):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim**-0.5
        nh_kd = self.key_dim * num_heads
        h = dim + nh_kd * 2
        self.qkv = Conv(dim, h, 1, act=False)
        self.proj = Conv(dim, dim, 1, act=False)
        self.pe = Conv(dim, dim, 3, 1, g=dim, act=False)

    def forward(self, x):
        B, C, H, W = x.shape
        N = H * W
        qkv = self.qkv(x)
        q, k, v = qkv.view(
            B, self.num_heads, self.key_dim * 2 + self.head_dim, N
        ).split([self.key_dim, self.key_dim, self.head_dim], dim=2)
        attn = (q.transpose(-2, -1) @ k) * self.scale
        attn = attn.softmax(dim=-1)
        x = (v @ attn.transpose(-2, -1)).view(B, C, H, W) + self.pe(
            v.reshape(B, C, H, W)
        )
        return self.proj(x)


class PSABlock(nn.Module):
    def __init__(self, c, attn_ratio=0.5, num_heads=4, shortcut=True):
        super().__init__()
        self.attn = Attention(c, attn_ratio=attn_ratio, num_heads=num_heads)
        self.ffn = nn.Sequential(Conv(c, c * 2, 1), Conv(c * 2, c, 1, act=False))
        self.add = shortcut

    def forward(self, x):
        x = x + self.attn(x) if self.add else self.attn(x)
        return x + self.ffn(x) if self.add else self.ffn(x)


class C2PSA(nn.Module):
    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        assert c1 == c2
        self.c = int(c1 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv(2 * self.c, c1, 1)
        self.m = nn.Sequential(
            *(
                PSABlock(self.c, attn_ratio=0.5, num_heads=max(self.c // 64, 1))
                for _ in range(n)
            )
        )

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), dim=1)
        b = self.m(b)
        return self.cv2(torch.cat((a, b), 1))


class Concat(nn.Module):
    def __init__(self, d=1):
        super().__init__()
        self.d = d

    def forward(self, xs):
        return torch.cat(xs, self.d)


class DFL(nn.Module):
    def __init__(self, c1=16):
        super().__init__()
        self.conv = nn.Conv2d(c1, 1, 1, bias=False).requires_grad_(False)
        self.conv.weight.data[:] = torch.arange(c1, dtype=torch.float).view(
            1, c1, 1, 1
        )


class Detect(nn.Module):
    def __init__(self, nc, ch, legacy=True):
        super().__init__()
        self.nc = nc
        self.reg_max = REG_MAX
        c2 = max(16, ch[0] // 4, self.reg_max * 4)
        c3 = max(ch[0], min(self.nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(
                Conv(x, c2, 3), Conv(c2, c2, 3),
                nn.Conv2d(c2, 4 * self.reg_max, 1),
            )
            for x in ch
        )
        if legacy:
            self.cv3 = nn.ModuleList(
                nn.Sequential(
                    Conv(x, c3, 3), Conv(c3, c3, 3), nn.Conv2d(c3, self.nc, 1)
                )
                for x in ch
            )
        else:
            self.cv3 = nn.ModuleList(
                nn.Sequential(
                    nn.Sequential(DWConv(x, x, 3), Conv(x, c3, 1)),
                    nn.Sequential(DWConv(c3, c3, 3), Conv(c3, c3, 1)),
                    nn.Conv2d(c3, self.nc, 1),
                )
                for x in ch
            )
        self.dfl = DFL(self.reg_max)

    def forward(self, feats):
        return [
            torch.cat((self.cv2[i](f), self.cv3[i](f)), 1)
            for i, f in enumerate(feats)
        ]


class TorchYolo(nn.Module):
    """Spec interpreter mirroring ultralytics DetectionModel.model naming."""

    def __init__(self, family="yolov8", scale="yolov8n", nc=80):
        super().__init__()
        spec = SPECS[family]
        depth, width, max_ch = SCALES[scale]
        force_c3k = scale in FORCE_C3K

        def w(c):
            return make_divisible(min(c, max_ch) * width, 8)

        def d(n):
            return max(round(n * depth), 1) if n > 1 else n

        layers = []
        channels = [3]
        self.froms = []
        for i, (frm, n, mod, args) in enumerate(spec):
            self.froms.append(frm)
            src_ch = (
                [channels[j + 1] if j >= 0 else channels[j] for j in frm]
                if isinstance(frm, list)
                else [channels[frm + 1] if frm >= 0 else channels[frm]]
            )
            if mod == "Conv":
                c2 = w(args[0])
                p = args[3] if len(args) > 3 else None
                layers.append(Conv(src_ch[0], c2, args[1], args[2], p))
            elif mod == "Bottleneck":
                c2 = w(args[0])
                sc = args[1] if len(args) > 1 else True
                reps = d(n)
                if reps == 1:
                    layers.append(Bottleneck(src_ch[0], c2, sc))
                else:
                    mods = [
                        Bottleneck(src_ch[0] if j == 0 else c2, c2, sc)
                        for j in range(reps)
                    ]
                    layers.append(nn.Sequential(*mods))
            elif mod == "C2f":
                c2 = w(args[0])
                sc = args[1] if len(args) > 1 else False
                layers.append(C2f(src_ch[0], c2, d(n), sc))
            elif mod == "C3":
                c2 = w(args[0])
                sc = args[1] if len(args) > 1 else True
                layers.append(C3(src_ch[0], c2, d(n), sc))
            elif mod == "C3k2":
                c2 = w(args[0])
                c3k = (args[1] if len(args) > 1 else False) or force_c3k
                e = args[2] if len(args) > 2 else 0.5
                layers.append(C3k2(src_ch[0], c2, d(n), c3k, e))
            elif mod == "SPPF":
                c2 = w(args[0])
                layers.append(SPPF(src_ch[0], c2, args[1]))
            elif mod == "C2PSA":
                c2 = src_ch[0]
                layers.append(C2PSA(c2, c2, d(n)))
            elif mod == "Upsample":
                c2 = src_ch[0]
                layers.append(nn.Upsample(scale_factor=args[0], mode="nearest"))
            elif mod == "Concat":
                c2 = sum(src_ch)
                layers.append(Concat(1))
            elif mod == "Detect":
                legacy = family != "yolov11"
                layers.append(Detect(nc, src_ch, legacy=legacy))
                c2 = 0
            else:
                raise ValueError(mod)
            channels.append(c2)
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        outputs = []
        y = x
        for i, layer in enumerate(self.model):
            frm = self.froms[i]
            if i == 0:
                src = x
            elif isinstance(frm, list):
                src = [outputs[j] for j in frm]
            else:
                src = outputs[frm]
            if isinstance(layer, Detect):
                return layer(src)
            y = layer(src)
            outputs.append(y)
        raise ValueError("no Detect layer")
