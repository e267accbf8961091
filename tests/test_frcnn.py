"""Faster R-CNN head tests: structure, anchors/deltas, ROIAlign, level
assignment, loss differentiability, predict."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsattack.models.frcnn import (
    FasterRCNNDetector,
    decode_deltas,
    fpn_level_for_boxes,
    make_level_anchors,
    roi_align,
)


@pytest.fixture(scope="module")
def det():
    d = FasterRCNNDetector(num_classes=8, num_proposals=32)
    d.load_model()
    return d


def test_anchors_shapes_and_centers():
    a = make_level_anchors(4, 6, 8, 32)
    assert a.shape == (4 * 6 * 3, 4)
    # first anchor centered at (4, 4) with aspect 0.5 -> w = 32*sqrt(2)
    c = np.asarray(a[0])
    np.testing.assert_allclose((c[0] + c[2]) / 2, 4.0, atol=1e-4)
    np.testing.assert_allclose(c[2] - c[0], 32 * np.sqrt(2), rtol=1e-5)


def test_decode_deltas_identity_and_shift():
    anchors = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    z = jnp.zeros((1, 4))
    np.testing.assert_allclose(np.asarray(decode_deltas(anchors, z)), np.asarray(anchors), atol=1e-5)
    d = jnp.array([[0.1, 0.0, 0.0, 0.0]])  # shift cx by 0.1*w = 1
    out = np.asarray(decode_deltas(anchors, d))[0]
    np.testing.assert_allclose(out, [1.0, 0.0, 11.0, 10.0], atol=1e-4)


def test_roi_align_constant_feature():
    feat = jnp.ones((16, 16, 4)) * 3.0
    boxes = jnp.array([[8.0, 8.0, 40.0, 40.0]])
    out = roi_align(feat, boxes, stride=4)
    assert out.shape == (1, 7, 7, 4)
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)


def test_roi_align_gradient_flows():
    feat = jnp.ones((8, 8, 2))
    boxes = jnp.array([[0.0, 0.0, 16.0, 16.0]])
    g = jax.grad(lambda f: roi_align(f, boxes, stride=2).sum())(feat)
    assert np.abs(np.asarray(g)).sum() > 0


def test_fpn_level_assignment():
    boxes = jnp.array(
        [
            [0, 0, 32, 32],     # small -> P2 (idx 0)
            [0, 0, 224, 224],   # canonical -> P4 (idx 2)
            [0, 0, 900, 900],   # large -> P5 (idx 3)
        ],
        jnp.float32,
    )
    lv = np.asarray(fpn_level_for_boxes(boxes))
    assert lv[0] == 0 and lv[1] == 2 and lv[2] == 3


def test_loss_cls_differentiable_wrt_image(det):
    img = jnp.full((1, 64, 64, 3), 0.5)
    bboxes = np.array([[8.0, 8.0, 56.0, 56.0]], np.float32)
    loss, g = jax.value_and_grad(lambda im: det.loss(im, 2, bboxes))(img)
    assert np.isfinite(float(loss)) and float(loss) > 0
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_loss_targeted_pgd_decreases(det):
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    bboxes = np.array([[8.0, 8.0, 56.0, 56.0]], np.float32)
    lf = jax.jit(jax.value_and_grad(lambda im: det.loss(im, 1, bboxes)))
    l0, _ = lf(img)
    x = img
    for _ in range(4):
        _, g = lf(x)
        x = jnp.clip(x - 0.05 * jnp.sign(g), 0, 1)
    l1, _ = lf(x)
    assert float(l1) < float(l0)


def test_predict_types(det):
    img = jax.random.uniform(jax.random.PRNGKey(1), (64, 64, 3))
    dets = det.predict(img, threshold=0.0)
    if len(dets):
        assert dets.boxes.min() >= 0
        assert dets.boxes[:, 2].max() <= 64
        assert dets.classes.max() < 8


def test_factory_name():
    from gsattack.models import load_detector

    d = load_detector("detectron2", num_classes=4)
    assert isinstance(d, FasterRCNNDetector)
