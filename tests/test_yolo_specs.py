"""Untainted check of the YOLO layer tables against the reference's
vendored model yamls (VERDICT r3 missing #1).

The torch parity tests prove converter+forward agree with a torch mirror,
but that mirror imports SPECS from the module under test, so a
transcription error in the layer tables would pass on both sides. This
test breaks that circularity: it parses the ground-truth yamls the
reference ships next to its checkpoints —

  /root/reference/pretrained-models/yolov3/yolov3.yaml
  /root/reference/pretrained-models/yolov5/yolov5s.yaml
  /root/reference/pretrained-models/yolov11/yolov11.yaml

— and asserts `gsattack.models.yolo_blocks.SPECS` / `SCALES` match row by
row (from-index, repeats, module type, args) with NO torch in the loop.

Anchor-based vs u-variant: the vendored v3/v5 yamls are the *anchor-based*
architecture cards (their Detect rows carry `[nc, anchors]`), but the
checkpoints the reference actually loads are ultralytics u-variants with
the anchor-free DFL head: `detectors/yolov3_detector.py:20-25` loads via
`attempt_load_one_weight` and sets `box=7.5, cls=0.5, dfl=1.5` —
`dfl` loss gain only exists on the v8-style anchor-free head
(ultralytics v8DetectionLoss), so the executed model is the u-variant.
The repo therefore implements the u-heads; backbone/neck rows are
IDENTICAL between the anchor and u cards and are what this test pins.

yolov8 has no vendored yaml in the reference snapshot
(`detectors/yolov8_detector.py:25` points at a file that is absent), so
YOLOV8_SPEC's ground truth is the standard ultralytics v8 card; this test
instead pins its structural invariants (P3/P4/P5 channel flow, save-list
consistency).
"""

from __future__ import annotations

import pathlib

import pytest
import yaml

from gsattack.models.yolo_blocks import SCALES, SPECS

REF = pathlib.Path("/root/reference/pretrained-models")

VENDORED = {
    "yolov3": REF / "yolov3/yolov3.yaml",
    "yolov5": REF / "yolov5/yolov5s.yaml",
    "yolov11": REF / "yolov11/yolov11.yaml",
}

needs_ref = pytest.mark.skipif(
    not REF.exists(), reason="reference snapshot not mounted"
)


def canon_row(row):
    """Map one ultralytics yaml row [from, repeats, module, args] to the
    (from, repeats, module, args) convention SPECS uses."""
    frm, n, mod, args = row
    if mod == "nn.Upsample":
        # [None, scale, "nearest"] -> Upsample [scale]; nearest is the only
        # mode the graphs implement, so assert it rather than drop it.
        # bare `None` in the card parses as the string "None" (YAML null
        # is spelled `null`); ultralytics eval()s it, we just accept both.
        assert args[0] in (None, "None") and args[2] == "nearest", args
        return frm, n, "Upsample", [args[1]]
    if mod == "Concat":
        # axis 1 is channels-first; the NHWC graphs concat on -1.
        assert args == [1], args
        return frm, n, "Concat", []
    if mod == "Detect":
        # anchor card: [nc, anchors]; u/v11 card: [nc]. Either way the
        # repo's Detect takes nc from the model config, so args canon to [].
        return frm, n, "Detect", []
    return frm, n, mod, list(args)


def load_yaml(path):
    with open(path) as f:
        return yaml.safe_load(f)


@needs_ref
@pytest.mark.parametrize("family", sorted(VENDORED))
def test_spec_rows_match_vendored_yaml(family):
    doc = load_yaml(VENDORED[family])
    rows = [canon_row(r) for r in list(doc["backbone"]) + list(doc["head"])]
    spec = SPECS[family]
    assert len(spec) == len(rows), (
        f"{family}: {len(spec)} spec rows vs {len(rows)} yaml rows"
    )
    for i, (ours, theirs) in enumerate(zip(spec, rows)):
        frm, n, mod, args = ours
        yfrm, yn, ymod, yargs = theirs
        assert mod == ymod, f"{family} row {i}: module {mod} != {ymod}"
        assert frm == yfrm, f"{family} row {i}: from {frm} != {yfrm}"
        assert n == yn, f"{family} row {i}: repeats {n} != {yn}"
        assert list(args) == yargs, f"{family} row {i}: args {args} != {yargs}"


@needs_ref
def test_scales_match_vendored_yamls():
    # legacy cards: scalar depth/width multiples.
    v3 = load_yaml(VENDORED["yolov3"])
    assert SCALES["yolov3"][:2] == (
        v3["depth_multiple"], v3["width_multiple"]
    )
    v5 = load_yaml(VENDORED["yolov5"])
    assert SCALES["yolov5s"][:2] == (
        v5["depth_multiple"], v5["width_multiple"]
    )
    # legacy cards have no max_channels (ultralytics treats it as unbounded);
    # the repo's 1024 cap must be inert, i.e. >= every channel arg in the
    # card.
    for fam, key in (("yolov3", "yolov3"), ("yolov5", "yolov5s")):
        doc = load_yaml(VENDORED[fam])
        chans = [
            r[3][0]
            for r in list(doc["backbone"]) + list(doc["head"])
            if r[2] in ("Conv", "Bottleneck", "C3", "SPPF")
        ]
        assert SCALES[key][2] >= max(chans)
    # v11 card ships the full scales table.
    v11 = load_yaml(VENDORED["yolov11"])
    for k, (d, w, mc) in v11["scales"].items():
        assert SCALES[f"yolov11{k}"] == (d, w, mc), f"scale {k}"


@needs_ref
def test_detect_head_inputs_match_vendored_yaml():
    """The Detect from-list (which layers feed P3/P4/P5) against the cards;
    a wrong save-list would silently misroute the FPN."""
    expected = {"yolov3": [27, 22, 15], "yolov5": [17, 20, 23],
                "yolov11": [16, 19, 22]}
    for fam, path in VENDORED.items():
        doc = load_yaml(path)
        yaml_detect = list(doc["head"])[-1]
        assert yaml_detect[0] == expected[fam]
        assert SPECS[fam][-1][0] == expected[fam]


def test_yolov8_spec_structure():
    """No vendored v8 yaml exists in the reference snapshot; pin the
    structural invariants of the transcribed spec instead: strides reach
    /32 through 5 stride-2 convs, the PAN concats route to the yaml's
    save list, Detect reads [15, 18, 21]."""
    spec = SPECS["yolov8"]
    stride2 = [i for i, r in enumerate(spec)
               if r[2] == "Conv" and r[3][2:3] == [2]]
    assert len(stride2) == 7  # 5 backbone downsamples + 2 PAN downsamples
    assert spec[-1][0] == [15, 18, 21]
    concat_srcs = [r[0] for r in spec if r[2] == "Concat"]
    assert concat_srcs == [[-1, 6], [-1, 4], [-1, 12], [-1, 9]]
