"""Detector-head robustness: the attack differentiates detector.loss
through the renderer, so a non-finite loss gradient on a degenerate
render (saturated, blown-out) would silently kill the PGD loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsattack.models import load_detector


@pytest.mark.parametrize("name,kw", [
    ("yolov8", dict(imgsz=64)),
    ("detr", {}),
    ("detectron2", {}),
])
def test_detector_loss_and_grads_finite_on_extreme_images(name, kw):
    det = load_detector(name, **kw)
    det.load_model()
    img = jnp.full((2, 48, 64, 3), 1e3)  # blown-out render
    bboxes = jnp.array([[[8.0, 8.0, 40.0, 40.0]]] * 2)
    loss, g = jax.value_and_grad(lambda im: det.loss(im, 2, bboxes))(img)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(g)).all()
