"""Faithful per-variant YOLO graphs (ultralytics v3u / v5u / v8 / v11).

The reference wraps four *distinct* ultralytics torch models
(`detectors/yolov8_detector.py:22-39` builds a DetectionModel from yaml with
per-scale handling; `yolov11_detector.py:32-36` has v11-specific scaling;
`yolov3_detector.py` / `yolov5_detector.py` load the u-variants). This
module re-builds those graphs natively in flax, driven by layer-spec tables
transcribed from the ultralytics model yamls (cfg/models/{v3,v5,v8,11}),
with the SAME block semantics (C3 vs C2f vs C3k2/C2PSA, SPPF, anchor-free
Detect with DFL) and the same channel/depth scaling rules as
ultralytics' parse_model.

Parameter naming mirrors the torch module tree mechanically: torch key
`model.{i}.rest...` maps to flax path `m{i}/rest'...` where every numeric
path token is merged onto its predecessor (`m.0` -> `m_0`,
`cv2.0.1` -> `cv2_0_1`).  convert_yolo.py exploits this to convert an
ultralytics state_dict key-by-key (no traversal-order guessing), and the
torch-executed parity tests (tests/test_yolo_parity.py) prove the mapping
end to end.

Anchor-based vs u-variant: the reference vendors *anchor-based* v3/v5
architecture cards (`pretrained-models/yolov3/yolov3.yaml`,
`yolov5/yolov5s.yaml` — their Detect rows carry `[nc, anchors]`), but the
checkpoints it loads through `attempt_load_one_weight` are ultralytics
u-variants with the anchor-free DFL head: `detectors/yolov3_detector.py:
20-25` sets `box=7.5, cls=0.5, dfl=1.5`, and a `dfl` gain only exists in
v8DetectionLoss, which requires the u-head. These tables therefore pair
the cards' backbone/neck rows (identical between the anchor and u cards;
pinned row-by-row against the vendored yamls by tests/test_yolo_specs.py,
no torch in the loop) with the anchor-free Detect.

Torch/XLA alignment notes:
  * convs use explicit torch-style padding k//2 (XLA "SAME" pads
    asymmetrically for stride 2 and would shift features);
  * BatchNorm is eval-mode (running stats), eps=1e-3 like ultralytics;
  * all activations are SiLU except where ultralytics sets act=False.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

REG_MAX = 16
STRIDES = (8, 16, 32)


def make_divisible(x: float, divisor: int = 8) -> int:
    """ultralytics.utils.ops.make_divisible (ceil-based)."""
    return math.ceil(x / divisor) * divisor


class UConv(nn.Module):
    """ultralytics Conv: Conv2d(bias=False) + BatchNorm2d(eps=1e-3) + SiLU."""

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None  # explicit padding (default autopad k//2)
    g: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.k // 2 if self.p is None else self.p
        x = nn.Conv(
            self.c2,
            (self.k, self.k),
            strides=(self.s, self.s),
            padding=((p, p), (p, p)),
            feature_group_count=self.g,
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, momentum=0.97, name="bn"
        )(x)
        return nn.silu(x) if self.act else x


class UBottleneck(nn.Module):
    """ultralytics Bottleneck: cv1 (k[0]) -> cv2 (k[1], groups g) + residual."""

    c1: int
    c2: int
    shortcut: bool = True
    g: int = 1
    k: tuple = (3, 3)
    e: float = 0.5

    @nn.compact
    def __call__(self, x):
        c_ = int(self.c2 * self.e)
        y = UConv(c_, self.k[0], 1, name="cv1")(x)
        y = UConv(self.c2, self.k[1], 1, g=self.g, name="cv2")(y)
        if self.shortcut and self.c1 == self.c2:
            y = x + y
        return y


class C3(nn.Module):
    """CSP bottleneck with 3 convs (v3u/v5u blocks)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5

    @nn.compact
    def __call__(self, x):
        c_ = int(self.c2 * self.e)
        a = UConv(c_, 1, 1, name="cv1")(x)
        b = UConv(c_, 1, 1, name="cv2")(x)
        for i in range(self.n):
            a = UBottleneck(
                c_, c_, self.shortcut, k=(1, 3), e=1.0, name=f"m_{i}"
            )(a)
        return UConv(self.c2, 1, name="cv3")(jnp.concatenate([a, b], axis=-1))


class C3k(nn.Module):
    """C3 whose bottlenecks use (k, k) kernels (v11)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    e: float = 0.5
    k: int = 3

    @nn.compact
    def __call__(self, x):
        c_ = int(self.c2 * self.e)
        a = UConv(c_, 1, 1, name="cv1")(x)
        b = UConv(c_, 1, 1, name="cv2")(x)
        for i in range(self.n):
            a = UBottleneck(
                c_, c_, self.shortcut, k=(self.k, self.k), e=1.0,
                name=f"m_{i}",
            )(a)
        return UConv(self.c2, 1, name="cv3")(jnp.concatenate([a, b], axis=-1))


class C2f(nn.Module):
    """v8 cross-stage-partial block: split, n bottlenecks, concat-all."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = False
    e: float = 0.5

    @nn.compact
    def __call__(self, x):
        c = int(self.c2 * self.e)
        y = UConv(2 * c, 1, 1, name="cv1")(x)
        y1, y2 = jnp.split(y, 2, axis=-1)
        outs = [y1, y2]
        h = y2
        for i in range(self.n):
            h = UBottleneck(
                c, c, self.shortcut, k=(3, 3), e=1.0, name=f"m_{i}"
            )(h)
            outs.append(h)
        return UConv(self.c2, 1, name="cv2")(jnp.concatenate(outs, axis=-1))


class C3k2(nn.Module):
    """v11 block: a C2f whose inner modules are C3k(n=2) or Bottleneck."""

    c1: int
    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        c = int(self.c2 * self.e)
        y = UConv(2 * c, 1, 1, name="cv1")(x)
        y1, y2 = jnp.split(y, 2, axis=-1)
        outs = [y1, y2]
        h = y2
        for i in range(self.n):
            if self.c3k:
                h = C3k(c, c, 2, self.shortcut, name=f"m_{i}")(h)
            else:
                h = UBottleneck(
                    c, c, self.shortcut, k=(3, 3), e=0.5, name=f"m_{i}"
                )(h)
            outs.append(h)
        return UConv(self.c2, 1, name="cv2")(jnp.concatenate(outs, axis=-1))


class SPPF(nn.Module):
    c1: int
    c2: int
    k: int = 5

    @nn.compact
    def __call__(self, x):
        c_ = self.c1 // 2
        y = UConv(c_, 1, 1, name="cv1")(x)
        p = self.k
        pools = [y]
        for _ in range(3):
            pools.append(
                nn.max_pool(
                    pools[-1], (p, p), strides=(1, 1),
                    padding=((p // 2, p // 2), (p // 2, p // 2)),
                )
            )
        return UConv(self.c2, 1, 1, name="cv2")(
            jnp.concatenate(pools, axis=-1)
        )


class UAttention(nn.Module):
    """ultralytics Attention (C2PSA): qkv conv, spatial softmax attention,
    depthwise positional conv on v, proj."""

    dim: int
    num_heads: int
    attn_ratio: float = 0.5

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        scale = key_dim**-0.5
        nh_kd = key_dim * self.num_heads
        h = self.dim + nh_kd * 2
        qkv = UConv(h, 1, act=False, name="qkv")(x)  # (B, H, W, h)
        n = hh * ww
        # torch views channels-first as (B, heads, key2+head, N); emulate by
        # moving channels first before the reshape so the per-head split
        # matches torch's memory layout exactly.
        qkv_cf = jnp.transpose(qkv, (0, 3, 1, 2)).reshape(
            b, self.num_heads, key_dim * 2 + head_dim, n
        )
        q = qkv_cf[:, :, :key_dim]  # (B, nh, kd, N)
        k = qkv_cf[:, :, key_dim : 2 * key_dim]
        v = qkv_cf[:, :, 2 * key_dim :]  # (B, nh, hd, N)
        attn = jnp.einsum("bhkn,bhkm->bhnm", q, k) * scale  # (B,nh,N,M)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhdm,bhnm->bhdn", v, attn)  # (B, nh, hd, N)
        out = out.reshape(b, self.dim, hh, ww)
        v_sp = v.reshape(b, self.dim, hh, ww)
        out_hwc = jnp.transpose(out, (0, 2, 3, 1))
        v_hwc = jnp.transpose(v_sp, (0, 2, 3, 1))
        pe = UConv(self.dim, 3, 1, g=self.dim, act=False, name="pe")(v_hwc)
        return UConv(self.dim, 1, act=False, name="proj")(out_hwc + pe)


class PSABlock(nn.Module):
    c: int
    num_heads: int
    attn_ratio: float = 0.5

    @nn.compact
    def __call__(self, x):
        x = x + UAttention(self.c, self.num_heads, self.attn_ratio,
                           name="attn")(x)
        y = UConv(self.c * 2, 1, name="ffn_0")(x)
        y = UConv(self.c, 1, act=False, name="ffn_1")(y)
        return x + y


class C2PSA(nn.Module):
    c1: int
    n: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x):
        c = int(self.c1 * self.e)
        y = UConv(2 * c, 1, 1, name="cv1")(x)
        a, b = jnp.split(y, 2, axis=-1)
        for i in range(self.n):
            b = PSABlock(c, num_heads=max(c // 64, 1), name=f"m_{i}")(b)
        return UConv(self.c1, 1, name="cv2")(jnp.concatenate([a, b], axis=-1))


class Detect(nn.Module):
    """Anchor-free decoupled head with DFL box regression.

    legacy=True (v3u/v5u/v8): cv2/cv3 = [Conv, Conv, Conv2d] per scale.
    legacy=False (v11): cls branch uses depthwise-separable stacks.
    Returns the per-scale (B, H, W, 4*REG_MAX + nc) maps.
    """

    nc: int
    ch: tuple  # input channels per scale
    legacy: bool = True

    @nn.compact
    def __call__(self, feats):
        c2 = max(16, self.ch[0] // 4, REG_MAX * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outs = []
        for i, f in enumerate(feats):
            box = UConv(c2, 3, name=f"cv2_{i}_0")(f)
            box = UConv(c2, 3, name=f"cv2_{i}_1")(box)
            box = nn.Conv(
                4 * REG_MAX, (1, 1), padding="VALID", name=f"cv2_{i}_2"
            )(box)
            if self.legacy:
                cls = UConv(c3, 3, name=f"cv3_{i}_0")(f)
                cls = UConv(c3, 3, name=f"cv3_{i}_1")(cls)
            else:
                ci = self.ch[i]
                cls = UConv(ci, 3, g=ci, name=f"cv3_{i}_0_0")(f)  # DWConv
                cls = UConv(c3, 1, name=f"cv3_{i}_0_1")(cls)
                cls = UConv(c3, 3, g=c3, name=f"cv3_{i}_1_0")(cls)  # DWConv
                cls = UConv(c3, 1, name=f"cv3_{i}_1_1")(cls)
            cls = nn.Conv(self.nc, (1, 1), padding="VALID", name=f"cv3_{i}_2")(
                cls
            )
            outs.append(jnp.concatenate([box, cls], axis=-1))
        return outs


# ---------------------------------------------------------------------------
# Layer-spec tables (transcribed from the ultralytics model yamls; rows are
# (from, repeats, module, args) exactly as in the yaml, before scaling).
# ---------------------------------------------------------------------------

YOLOV8_SPEC = [
    (-1, 1, "Conv", [64, 3, 2]),        # 0  P1/2
    (-1, 1, "Conv", [128, 3, 2]),       # 1  P2/4
    (-1, 3, "C2f", [128, True]),        # 2
    (-1, 1, "Conv", [256, 3, 2]),       # 3  P3/8
    (-1, 6, "C2f", [256, True]),        # 4
    (-1, 1, "Conv", [512, 3, 2]),       # 5  P4/16
    (-1, 6, "C2f", [512, True]),        # 6
    (-1, 1, "Conv", [1024, 3, 2]),      # 7  P5/32
    (-1, 3, "C2f", [1024, True]),       # 8
    (-1, 1, "SPPF", [1024, 5]),         # 9
    (-1, 1, "Upsample", [2]),           # 10
    ([-1, 6], 1, "Concat", []),         # 11
    (-1, 3, "C2f", [512]),              # 12
    (-1, 1, "Upsample", [2]),           # 13
    ([-1, 4], 1, "Concat", []),         # 14
    (-1, 3, "C2f", [256]),              # 15 P3 out
    (-1, 1, "Conv", [256, 3, 2]),       # 16
    ([-1, 12], 1, "Concat", []),        # 17
    (-1, 3, "C2f", [512]),              # 18 P4 out
    (-1, 1, "Conv", [512, 3, 2]),       # 19
    ([-1, 9], 1, "Concat", []),         # 20
    (-1, 3, "C2f", [1024]),             # 21 P5 out
    ([15, 18, 21], 1, "Detect", []),    # 22
]

YOLOV5_SPEC = [
    (-1, 1, "Conv", [64, 6, 2, 2]),     # 0  P1/2 (the 6x6 stem)
    (-1, 1, "Conv", [128, 3, 2]),       # 1  P2/4
    (-1, 3, "C3", [128]),               # 2
    (-1, 1, "Conv", [256, 3, 2]),       # 3  P3/8
    (-1, 6, "C3", [256]),               # 4
    (-1, 1, "Conv", [512, 3, 2]),       # 5  P4/16
    (-1, 9, "C3", [512]),               # 6
    (-1, 1, "Conv", [1024, 3, 2]),      # 7  P5/32
    (-1, 3, "C3", [1024]),              # 8
    (-1, 1, "SPPF", [1024, 5]),         # 9
    (-1, 1, "Conv", [512, 1, 1]),       # 10
    (-1, 1, "Upsample", [2]),           # 11
    ([-1, 6], 1, "Concat", []),         # 12
    (-1, 3, "C3", [512, False]),        # 13
    (-1, 1, "Conv", [256, 1, 1]),       # 14
    (-1, 1, "Upsample", [2]),           # 15
    ([-1, 4], 1, "Concat", []),         # 16
    (-1, 3, "C3", [256, False]),        # 17 P3 out
    (-1, 1, "Conv", [256, 3, 2]),       # 18
    ([-1, 14], 1, "Concat", []),        # 19
    (-1, 3, "C3", [512, False]),        # 20 P4 out
    (-1, 1, "Conv", [512, 3, 2]),       # 21
    ([-1, 10], 1, "Concat", []),        # 22
    (-1, 3, "C3", [1024, False]),       # 23 P5 out
    ([17, 20, 23], 1, "Detect", []),    # 24
]

YOLOV3_SPEC = [
    (-1, 1, "Conv", [32, 3, 1]),            # 0
    (-1, 1, "Conv", [64, 3, 2]),            # 1  P1/2
    (-1, 1, "Bottleneck", [64]),            # 2
    (-1, 1, "Conv", [128, 3, 2]),           # 3  P2/4
    (-1, 2, "Bottleneck", [128]),           # 4
    (-1, 1, "Conv", [256, 3, 2]),           # 5  P3/8
    (-1, 8, "Bottleneck", [256]),           # 6
    (-1, 1, "Conv", [512, 3, 2]),           # 7  P4/16
    (-1, 8, "Bottleneck", [512]),           # 8
    (-1, 1, "Conv", [1024, 3, 2]),          # 9  P5/32
    (-1, 4, "Bottleneck", [1024]),          # 10
    (-1, 1, "Bottleneck", [1024, False]),   # 11
    (-1, 1, "Conv", [512, 1, 1]),           # 12
    (-1, 1, "Conv", [1024, 3, 1]),          # 13
    (-1, 1, "Conv", [512, 1, 1]),           # 14
    (-1, 1, "Conv", [1024, 3, 1]),          # 15 P5 out
    (-2, 1, "Conv", [256, 1, 1]),           # 16
    (-1, 1, "Upsample", [2]),               # 17
    ([-1, 8], 1, "Concat", []),             # 18
    (-1, 1, "Bottleneck", [512, False]),    # 19
    (-1, 1, "Bottleneck", [512, False]),    # 20
    (-1, 1, "Conv", [256, 1, 1]),           # 21
    (-1, 1, "Conv", [512, 3, 1]),           # 22 P4 out
    (-2, 1, "Conv", [128, 1, 1]),           # 23
    (-1, 1, "Upsample", [2]),               # 24
    ([-1, 6], 1, "Concat", []),             # 25
    (-1, 1, "Bottleneck", [256, False]),    # 26
    (-1, 2, "Bottleneck", [256, False]),    # 27
    ([27, 22, 15], 1, "Detect", []),        # 28
]

YOLOV11_SPEC = [
    (-1, 1, "Conv", [64, 3, 2]),            # 0  P1/2
    (-1, 1, "Conv", [128, 3, 2]),           # 1  P2/4
    (-1, 2, "C3k2", [256, False, 0.25]),    # 2
    (-1, 1, "Conv", [256, 3, 2]),           # 3  P3/8
    (-1, 2, "C3k2", [512, False, 0.25]),    # 4
    (-1, 1, "Conv", [512, 3, 2]),           # 5  P4/16
    (-1, 2, "C3k2", [512, True]),           # 6
    (-1, 1, "Conv", [1024, 3, 2]),          # 7  P5/32
    (-1, 2, "C3k2", [1024, True]),          # 8
    (-1, 1, "SPPF", [1024, 5]),             # 9
    (-1, 2, "C2PSA", [1024]),               # 10
    (-1, 1, "Upsample", [2]),               # 11
    ([-1, 6], 1, "Concat", []),             # 12
    (-1, 2, "C3k2", [512, False]),          # 13
    (-1, 1, "Upsample", [2]),               # 14
    ([-1, 4], 1, "Concat", []),             # 15
    (-1, 2, "C3k2", [256, False]),          # 16 P3 out
    (-1, 1, "Conv", [256, 3, 2]),           # 17
    ([-1, 13], 1, "Concat", []),            # 18
    (-1, 2, "C3k2", [512, False]),          # 19 P4 out
    (-1, 1, "Conv", [512, 3, 2]),           # 20
    ([-1, 10], 1, "Concat", []),            # 21
    (-1, 2, "C3k2", [1024, True]),          # 22 P5 out
    ([16, 19, 22], 1, "Detect", []),        # 23
]

# scale tables: name -> (depth, width, max_channels); from the yamls'
# `scales:` sections.
SCALES = {
    "yolov8n": (0.33, 0.25, 1024),
    "yolov8s": (0.33, 0.50, 1024),
    "yolov8m": (0.67, 0.75, 768),
    "yolov8l": (1.00, 1.00, 512),
    "yolov8x": (1.00, 1.25, 512),
    "yolov5n": (0.33, 0.25, 1024),
    "yolov5s": (0.33, 0.50, 1024),
    "yolov5m": (0.67, 0.75, 1024),
    "yolov5l": (1.00, 1.00, 1024),
    "yolov5x": (1.33, 1.25, 1024),
    "yolov3": (1.00, 1.00, 1024),
    "yolov11n": (0.50, 0.25, 1024),
    "yolov11s": (0.50, 0.50, 1024),
    "yolov11m": (0.50, 1.00, 512),
    "yolov11l": (1.00, 1.00, 512),
    "yolov11x": (1.00, 1.50, 512),
}

SPECS = {
    "yolov8": YOLOV8_SPEC,
    "yolov5": YOLOV5_SPEC,
    "yolov3": YOLOV3_SPEC,
    "yolov11": YOLOV11_SPEC,
}

# v11 m/l/x force c3k=True on every C3k2 (ultralytics parse_model special
# case); n/s keep the yaml values.
FORCE_C3K = {"yolov11m", "yolov11l", "yolov11x"}


def resolve_variant(name: str) -> tuple[str, str]:
    """'yolov8s' -> (family 'yolov8', scale key 'yolov8s'); bare family
    names default to the reference's checkpoints (v8n, v5s, v3, v11n)."""
    defaults = {
        "yolov8": "yolov8n",
        "yolov5": "yolov5s",
        "yolov3": "yolov3",
        "yolov11": "yolov11n",
    }
    for fam in ("yolov11", "yolov8", "yolov5", "yolov3"):
        if name.startswith(fam):
            key = name if name in SCALES else defaults[fam]
            return fam, key
    raise ValueError(f"unknown yolo variant {name!r}")


class YoloGraph(nn.Module):
    """Interpreter over a layer-spec table — the flax analogue of
    ultralytics' parse_model + forward-with-save-list."""

    family: str = "yolov8"
    scale: str = "yolov8n"
    nc: int = 80

    @nn.compact
    def __call__(self, x):
        spec = SPECS[self.family]
        depth, width, max_ch = SCALES[self.scale]
        force_c3k = self.scale in FORCE_C3K

        def w(c):
            return make_divisible(min(c, max_ch) * width, 8)

        def d(n):
            return max(round(n * depth), 1) if n > 1 else n

        outputs: list[Any] = []
        channels: list[int] = []
        y = x
        c_in = x.shape[-1]
        for i, (frm, n, mod, args) in enumerate(spec):
            if i == 0:
                srcs, src_ch = [x], [c_in]
            elif isinstance(frm, list):
                # negative indices are relative (python list semantics match)
                srcs = [outputs[j] for j in frm]
                src_ch = [channels[j] for j in frm]
            else:
                srcs = [outputs[frm]]
                src_ch = [channels[frm]]
            name = f"m{i}"
            if mod == "Conv":
                c2 = w(args[0])
                k = args[1]
                s = args[2]
                p = args[3] if len(args) > 3 else None
                y = UConv(c2, k, s, p=p, name=name)(srcs[0])
                c_out = c2
            elif mod == "Bottleneck":
                c2 = w(args[0])
                shortcut = args[1] if len(args) > 1 else True
                c1 = src_ch[0]
                h = srcs[0]
                reps = d(n)
                if reps == 1:
                    h = UBottleneck(c1, c2, shortcut, name=name)(h)
                else:
                    for j in range(reps):
                        h = UBottleneck(
                            c1 if j == 0 else c2, c2, shortcut,
                            name=f"{name}_{j}",
                        )(h)
                y = h
                c_out = c2
            elif mod == "C2f":
                c2 = w(args[0])
                shortcut = args[1] if len(args) > 1 else False
                y = C2f(src_ch[0], c2, d(n), shortcut, name=name)(srcs[0])
                c_out = c2
            elif mod == "C3":
                c2 = w(args[0])
                shortcut = args[1] if len(args) > 1 else True
                y = C3(src_ch[0], c2, d(n), shortcut, name=name)(srcs[0])
                c_out = c2
            elif mod == "C3k2":
                c2 = w(args[0])
                c3k = (args[1] if len(args) > 1 else False) or force_c3k
                e = args[2] if len(args) > 2 else 0.5
                y = C3k2(src_ch[0], c2, d(n), c3k, e, name=name)(srcs[0])
                c_out = c2
            elif mod == "SPPF":
                c2 = w(args[0])
                y = SPPF(src_ch[0], c2, args[1], name=name)(srcs[0])
                c_out = c2
            elif mod == "C2PSA":
                c1 = src_ch[0]
                y = C2PSA(c1, d(n), name=name)(srcs[0])
                c_out = c1
            elif mod == "Upsample":
                b, hh, ww, cc = srcs[0].shape
                y = jax.image.resize(
                    srcs[0], (b, hh * args[0], ww * args[0], cc), "nearest"
                )
                c_out = src_ch[0]
            elif mod == "Concat":
                y = jnp.concatenate(srcs, axis=-1)
                c_out = sum(src_ch)
            elif mod == "Detect":
                legacy = self.family != "yolov11"
                return Detect(
                    self.nc, tuple(src_ch), legacy=legacy, name=name
                )(srcs)
            else:  # pragma: no cover
                raise ValueError(f"unknown module {mod}")
            outputs.append(y)
            channels.append(c_out)
        raise ValueError("spec has no Detect layer")  # pragma: no cover
