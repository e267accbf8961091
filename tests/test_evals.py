"""Eval tooling tests: ASR parsing/compute, COCO AP evaluator sanity,
render-eval pipeline end-to-end with the toy detector, grouping viz."""

import json
import logging
import os

import jax.numpy as jnp
import numpy as np

from gsattack.evals import (
    COCOEvaluator,
    RenderEvalConfig,
    build_coco_jsons,
    compute_asr,
    load_preds,
    run_render_eval,
)
from tests.conftest import make_toy_camera, make_toy_scene


def _write_log(path, entries):
    with open(path, "w") as f:
        for e in entries:
            f.write(f"2025-01-01 00:00:00,000 - INFO - {json.dumps(e)}\n")


def test_load_preds_and_asr(tmp_path):
    benign = [
        {"cam": 0, "pred_class": "car"},
        {"cam": 1, "pred_class": "car"},
        {"cam": 2, "pred_class": "None"},
        {"cam": 3, "pred_class": "car"},
    ]
    adv = [
        {"cam": 0, "pred_class": "clock"},
        {"cam": 1, "pred_class": "car"},
        {"cam": 2, "pred_class": "car"},
        {"cam": 3, "pred_class": "None"},
    ]
    bp, ap = str(tmp_path / "b.log"), str(tmp_path / "a.log")
    _write_log(bp, benign)
    _write_log(ap, adv)
    b, a = load_preds(bp), load_preds(ap)
    assert b[2] is None
    successful, total, asr = compute_asr(b, a, "car")
    assert (successful, total) == (2, 3)  # cams 0 and 3 flipped, cam 1 didn't
    assert abs(asr - 2 / 3) < 1e-9


def test_coco_evaluator_perfect_detections():
    gt = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 20, 20]},
        {"image_id": 1, "category_id": 1, "bbox": [5, 5, 10, 10]},
    ]
    dt = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [5, 5, 10, 10], "score": 0.8},
    ]
    res = COCOEvaluator(gt, dt, iou_thrs=[0.5]).evaluate()
    assert res["AP"] > 0.99
    assert res["AR_maxdets1"] > 0.99


def test_coco_evaluator_false_positives_lower_ap():
    gt = [{"image_id": 0, "category_id": 1, "bbox": [10, 10, 20, 20]}]
    dt_good = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9}
    ]
    # higher-scored false positive ahead of the true positive
    dt_bad = dt_good + [
        {"image_id": 0, "category_id": 1, "bbox": [100, 100, 5, 5], "score": 0.95}
    ]
    ap_good = COCOEvaluator(gt, dt_good, iou_thrs=[0.5]).evaluate()["AP"]
    ap_bad = COCOEvaluator(gt, dt_bad, iou_thrs=[0.5]).evaluate()["AP"]
    assert ap_bad < ap_good


def test_coco_evaluator_localization_threshold():
    gt = [{"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10]}]
    # IoU ~ 0.38 vs gt: TP at 0.3, FP at 0.5
    dt = [{"image_id": 0, "category_id": 1, "bbox": [4, 0, 10, 10], "score": 0.9}]
    ap50 = COCOEvaluator(gt, dt, iou_thrs=[0.5]).evaluate()["AP"]
    ap30 = COCOEvaluator(gt, dt, iou_thrs=[0.3]).evaluate()["AP"]
    assert ap50 < 0.01
    assert ap30 > 0.99


def test_coco_evaluator_missed_gt_caps_recall():
    gt = [
        {"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10]},
        {"image_id": 0, "category_id": 1, "bbox": [50, 50, 10, 10]},
    ]
    dt = [{"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10], "score": 0.9}]
    res = COCOEvaluator(gt, dt, iou_thrs=[0.5]).evaluate()
    assert abs(res["AR_maxdets100"] - 0.5) < 1e-6


def test_build_coco_jsons_roundtrip(tmp_path):
    entries = [
        {
            "cam": 0,
            "pred_class": "car",
            "pred_category_id": 2,
            "confidence": "0.8000",
            "bbox": [10.0, 10.0, 20.0, 20.0],
            "gt_bbox": [10.0, 10.0, 20.0, 20.0],
            "iou": 1.0,
        },
        {
            "cam": 1,
            "pred_class": "None",
            "pred_category_id": None,
            "confidence": "None",
            "bbox": None,
            "gt_bbox": [5.0, 5.0, 10.0, 10.0],
            "iou": None,
        },
    ]
    lp = str(tmp_path / "render.log")
    _write_log(lp, entries)
    gtp, dtp = str(tmp_path / "gt.json"), str(tmp_path / "dt.json")
    build_coco_jsons(lp, 64, 64, gtp, dtp, "car")
    gt = json.load(open(gtp))
    dt = json.load(open(dtp))
    assert len(gt["annotations"]) == 2
    assert len(gt["images"]) == 2
    assert len(dt) == 1
    from gsattack.evals import run_coco_eval

    res = run_coco_eval(gtp, dtp)
    assert 0 <= res["AP"] <= 1


def test_render_eval_pipeline(tmp_path):
    from gsattack.models import ToyDetector

    scene = make_toy_scene(n=48)
    views = []
    from gsattack.core.camera import CameraExtrinsics

    for i in range(2):
        views.append(
            CameraExtrinsics(np.eye(3), np.array([0.0, 0.0, 0.05 * i]), 1.0, 1.0, 64, 64)
        )
    det = ToyDetector(num_classes=8)
    logger = logging.getLogger("render_test")
    logger.setLevel(logging.INFO)
    logf = str(tmp_path / "render.log")
    fh = logging.FileHandler(logf)
    fh.setFormatter(logging.Formatter("%(asctime)s - %(message)s"))
    logger.addHandler(fh)

    cfg = RenderEvalConfig(
        target=2,
        attack_conf_thresh=0.3,
        renders_dir=str(tmp_path / "renders"),
        preds_dir=str(tmp_path / "preds"),
    )
    out = run_render_eval(scene, views, det, cfg, logger=logger)
    fh.flush()
    assert len(out["records"]) == 2
    assert os.path.exists(out["dirs"]["coco_json"])
    assert os.path.exists(os.path.join(out["dirs"]["renders"], "render_0.png"))
    # the log is parseable by the ASR analyzer
    preds = load_preds(logf)
    assert set(preds.keys()) == {0, 1}


def test_grouping_eval(tmp_path):
    from gsattack.evals import render_grouping_set

    scene = make_toy_scene(n=32)
    cams = [make_toy_camera(width=32, height=32)]
    w = jnp.asarray(np.random.default_rng(0).normal(size=(4, 16)).astype(np.float32))
    b = jnp.zeros(4)
    out = render_grouping_set(
        scene, cams, str(tmp_path / "eval"), classifier=(w, b), make_video=False
    )
    assert out["num_frames"] == 1
    assert os.path.exists(os.path.join(out["dirs"]["renders"], "00000.png"))
    assert os.path.exists(os.path.join(out["dirs"]["objects_feature16"], "00000.png"))
    assert os.path.exists(os.path.join(out["dirs"]["objects_pred"], "00000.png"))


def test_feature_to_rgb_shape():
    from gsattack.evals import feature_to_rgb

    rng = np.random.default_rng(0)
    f = rng.normal(size=(16, 8, 8)).astype(np.float32)
    rgb = feature_to_rgb(f)
    assert rgb.shape == (8, 8, 3)
    assert rgb.dtype == np.uint8
