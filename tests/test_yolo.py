"""YOLO detector family tests: architecture shapes, DFL decode, CIoU,
task-aligned assigner, loss differentiability through the image, letterbox,
and eval predict. Torch-executed converter/weight
parity lives in test_yolo_parity.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsattack.models.yolo import (
    REG_MAX,
    YoloDetector,
    ciou,
    decode_boxes,
    dfl_expectation,
    letterbox,
    make_anchors,
    task_aligned_assign,
    v8_detection_loss,
)


@pytest.fixture(scope="module")
def small_det():
    det = YoloDetector(variant="yolov8", num_classes=8, imgsz=160, seed=0)
    det.load_model()
    return det


def test_model_output_shapes(small_det):
    x = jnp.zeros((1, 160, 160, 3))
    outs = small_det.model.apply(small_det.params, x)
    assert len(outs) == 3
    for o, s in zip(outs, (8, 16, 32)):
        assert o.shape == (1, 160 // s, 160 // s, 4 * REG_MAX + 8)


def test_make_anchors():
    pts, strs = make_anchors([(4, 4), (2, 2), (1, 1)])
    assert pts.shape == (21, 2)
    np.testing.assert_allclose(np.asarray(pts[0]), [4.0, 4.0])  # (0.5)*8
    np.testing.assert_allclose(np.asarray(strs[:16]), 8.0)
    np.testing.assert_allclose(np.asarray(pts[16]), [8.0, 8.0])  # (0.5)*16


def test_dfl_expectation_peaky():
    logits = jnp.full((1, 4, REG_MAX), -10.0).at[0, :, 5].set(10.0)
    d = dfl_expectation(logits)
    np.testing.assert_allclose(np.asarray(d), 5.0, atol=1e-3)


def test_decode_boxes_geometry():
    anchors = jnp.array([[100.0, 50.0]])
    strides = jnp.array([8.0])
    logits = jnp.full((1, 4 * REG_MAX), -10.0)
    # peak all four distances at bin 2 -> 16 px at stride 8
    for i in range(4):
        logits = logits.at[0, i * REG_MAX + 2].set(10.0)
    box = np.asarray(decode_boxes(logits, anchors, strides))[0]
    np.testing.assert_allclose(box, [84.0, 34.0, 116.0, 66.0], atol=0.01)


def test_ciou_identical_is_one():
    b = jnp.array([[10.0, 10.0, 20.0, 20.0]])
    np.testing.assert_allclose(np.asarray(ciou(b, b)), 1.0, atol=1e-5)
    b2 = jnp.array([[30.0, 30.0, 40.0, 40.0]])
    assert float(ciou(b, b2)[0]) < 0  # disjoint + center distance penalty


def test_task_aligned_assigner_picks_inside_anchors():
    anchors, _ = make_anchors([(8, 8)], strides=(8,))
    a = anchors.shape[0]
    scores = jnp.full((a, 3), 0.5)
    pred = jnp.concatenate([anchors - 6, anchors + 6], axis=-1)
    gt_boxes = jnp.array([[8.0, 8.0, 32.0, 32.0], [0.0, 0.0, 0.0, 0.0]])
    gt_labels = jnp.array([1, 0])
    gt_valid = jnp.array([True, False])
    fg, tl, tb, ts = task_aligned_assign(scores, pred, anchors, gt_boxes, gt_labels, gt_valid)
    fg = np.asarray(fg)
    assert fg.any()
    inside = (
        (np.asarray(anchors)[:, 0] > 8) & (np.asarray(anchors)[:, 0] < 32)
        & (np.asarray(anchors)[:, 1] > 8) & (np.asarray(anchors)[:, 1] < 32)
    )
    assert (fg <= inside).all()  # fg only inside the gt box
    assert (np.asarray(tl)[fg] == 1).all()
    assert np.asarray(ts).max() <= 1.0 + 1e-6
    assert np.asarray(ts)[fg, 1].min() > 0


def test_v8_loss_finite_and_positive(small_det):
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 160, 160, 3))
    outs = small_det.model.apply(small_det.params, x)
    gb = jnp.tile(jnp.array([[[20.0, 20.0, 120.0, 120.0]]]), (2, 1, 1))
    gl = jnp.zeros((2, 1), jnp.int32)
    gv = jnp.ones((2, 1), bool)
    loss = v8_detection_loss(outs, gb, gl, gv, nc=8)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_detector_loss_differentiable_wrt_image(small_det):
    img = jnp.full((1, 96, 96, 3), 0.5)
    bboxes = np.array([[10.0, 10.0, 80.0, 80.0]], np.float32)
    g = jax.grad(lambda im: small_det.loss(im, 2, bboxes))(img)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_detector_loss_decreases_under_pgd(small_det):
    """A few signed-gradient steps on the image should reduce the targeted
    loss — the core mechanism DAGGER relies on."""
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 96, 96, 3))
    bboxes = np.array([[8.0, 8.0, 88.0, 88.0]], np.float32)
    lf = jax.jit(jax.value_and_grad(lambda im: small_det.loss(im, 3, bboxes)))
    l0, g = lf(img)
    x = img
    for _ in range(5):
        l, g = lf(x)
        x = jnp.clip(x - 0.03 * jnp.sign(g), 0, 1)
    l1, _ = lf(x)
    assert float(l1) < float(l0)


def test_letterbox_geometry():
    img = jnp.ones((1, 100, 200, 3))
    out, scale, (px, py) = letterbox(img, 320)
    assert out.shape == (1, 320, 320, 3)
    assert abs(scale - 1.6) < 1e-6
    assert px == 0 and py == 80
    # padded rows are gray
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), 114 / 255, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 160, 100]), 1.0, atol=1e-6)


def test_predict_returns_detections_type(small_det):
    img = jax.random.uniform(jax.random.PRNGKey(2), (96, 96, 3))
    dets = small_det.predict(img, threshold=0.0)
    assert dets.boxes.shape[1] == 4
    assert (dets.boxes[:, 2] >= dets.boxes[:, 0]).all()
    # boxes are clipped to the original image
    assert dets.boxes.min() >= 0 and dets.boxes.max() <= 96


def test_factory_builds_all_variants():
    from gsattack.models import load_detector

    for name in ("yolov3", "yolov5", "yolov8", "yolov11"):
        det = load_detector(name, num_classes=4, imgsz=64)
        assert det.name == name


def test_variant_graphs_are_distinct():
    """v3/v5/v8/v11 must be different architectures (VERDICT item 2), not
    one family rescaled: their param trees differ structurally."""
    import jax

    trees = {}
    for name in ("yolov3", "yolov5", "yolov8", "yolov11"):
        det = YoloDetector(variant=name, num_classes=4, imgsz=64)
        det.load_model()
        trees[name] = jax.tree_util.tree_structure(det.params)
    structs = list(trees.values())
    assert len({str(s) for s in structs}) == 4
