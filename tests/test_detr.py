"""DETR head tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsattack.models.detr import (
    DetrDetector,
    cxcywh_to_xyxy,
    giou_xyxy,
    hungarian_match,
)


@pytest.fixture(scope="module")
def det():
    d = DetrDetector(num_classes=8, num_queries=16)
    d.load_model()
    return d


def test_box_conversion():
    b = jnp.array([[0.5, 0.5, 0.2, 0.4]])
    out = np.asarray(cxcywh_to_xyxy(b))[0]
    np.testing.assert_allclose(out, [0.4, 0.3, 0.6, 0.7], atol=1e-6)


def test_giou_range():
    a = jnp.array([0.0, 0.0, 1.0, 1.0])
    assert abs(float(giou_xyxy(a, a)) - 1.0) < 1e-5
    far = jnp.array([5.0, 5.0, 6.0, 6.0])
    assert float(giou_xyxy(a, far)) < 0


def test_demo_module_tree_matches_torch_names(det):
    """The flax tree must carry the demo checkpoint's structure (backbone
    resnet50, transformer 6+6, learned embeds, linear heads)."""
    p = det.params["params"]
    assert {"backbone", "conv", "transformer", "linear_class", "linear_bbox",
            "query_pos", "row_embed", "col_embed"} <= set(p)
    assert "layer4_2" in p["backbone"]
    assert "layers_5" in p["transformer"]["encoder"]
    assert p["transformer"]["decoder"]["layers_0"]["multihead_attn"][
        "in_proj_weight"
    ].shape == (768, 256)


def test_hungarian_exact():
    cost = np.array([[1.0, 9.0], [9.0, 1.0], [5.0, 5.0]])
    out = hungarian_match(cost)
    assert list(out) == [0, 1]
    cost2 = np.array([[1.0], [0.5], [2.0]])
    assert hungarian_match(cost2)[0] == 1


def test_detr_forward_shapes(det):
    cls_logits, boxes = det.model.apply(det.params, jnp.zeros((1, 96, 96, 3)))
    assert cls_logits.shape == (1, 16, 9)
    assert boxes.shape == (1, 16, 4)
    b = np.asarray(boxes)
    assert (b >= 0).all() and (b <= 1).all()


def test_detr_loss_differentiable(det):
    img = jnp.full((1, 96, 96, 3), 0.5)
    bboxes = np.array([[10.0, 10.0, 80.0, 80.0]], np.float32)
    loss, g = jax.value_and_grad(lambda im: det.loss(im, 2, bboxes))(img)
    assert np.isfinite(float(loss))
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_detr_pgd_decreases(det):
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 96, 96, 3))
    bboxes = np.array([[8.0, 8.0, 88.0, 88.0]], np.float32)
    lf = jax.value_and_grad(lambda im: det.loss(im, 3, bboxes))
    l0, _ = lf(img)
    x = img
    for _ in range(4):
        _, g = lf(x)
        x = jnp.clip(x - 0.05 * jnp.sign(g), 0, 1)
    l1, _ = lf(x)
    assert float(l1) < float(l0)


def test_detr_predict(det):
    img = jax.random.uniform(jax.random.PRNGKey(1), (96, 96, 3))
    dets = det.predict(img, threshold=0.0)
    if len(dets):
        assert dets.classes.max() < 8  # no-object class filtered out


def test_factory():
    from gsattack.models import load_detector

    d = load_detector("detr", num_classes=4, num_queries=8)
    assert isinstance(d, DetrDetector)
