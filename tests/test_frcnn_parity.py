"""Torch-executed parity for the Faster R-CNN converter (VERDICT item 1).

Random detectron2-shaped torch mirror -> state_dict -> convert -> flax
forward must match the torch forward: FPN features, RPN outputs, ROIAlign
pooling, and box-head logits on fixed proposal boxes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _randomize(model, seed):
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.Conv2d):
                fan_in = m.weight.shape[1] * m.weight.shape[2] * m.weight.shape[3]
                m.weight.normal_(0, (2.0 / fan_in) ** 0.5, generator=g)
                if m.bias is not None:
                    m.bias.normal_(0, 0.02, generator=g)
            elif isinstance(m, torch.nn.Linear):
                m.weight.normal_(0, (1.0 / m.weight.shape[1]) ** 0.5,
                                 generator=g)
                m.bias.normal_(0, 0.02, generator=g)
            elif isinstance(m, torch.nn.BatchNorm2d):
                m.weight.uniform_(0.8, 1.2, generator=g)
                m.bias.normal_(0, 0.05, generator=g)
                m.running_mean.normal_(0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
    return model


@pytest.fixture(scope="module")
def pair():
    import torch

    from gsattack.models.convert_frcnn import convert_state_dict
    from gsattack.models.frcnn import FasterRCNNDetector
    from tests.torch_refs.frcnn_ref import TorchFasterRCNN

    tm = _randomize(TorchFasterRCNN(nc=8), seed=0).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    det = FasterRCNNDetector(num_classes=8, num_proposals=16)
    det.load_model()
    det.params = convert_state_dict(sd, det.params)
    return tm, det


def test_backbone_rpn_parity(pair):
    import torch

    tm, det = pair
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        tfpn, trpn = tm(torch.from_numpy(x))
    jfpn, jrpn = det.model.apply(det.params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(jfpn) == len(tfpn) == 5

    def close(j, t):
        # activation-magnitude-scaled atol: randomized FrozenBN stats push
        # resnet activations to O(1e3); f32 summation-order drift between
        # torch and XLA is ~1e-5 relative to that scale
        t = t.numpy().transpose(0, 2, 3, 1)
        scale = max(np.abs(t).max(), 1.0)
        np.testing.assert_allclose(
            np.asarray(j), t, atol=5e-5 * scale, rtol=1e-3
        )

    for j, t in zip(jfpn, tfpn):
        close(j, t)
    for (jo, jd), (to, td) in zip(jrpn, trpn):
        close(jo, to)
        close(jd, td)


def test_roi_align_parity():
    import torch

    from gsattack.models.frcnn import roi_align
    from tests.torch_refs.frcnn_ref import roi_align_torch

    rng = np.random.default_rng(2)
    feat = rng.normal(size=(24, 32, 16)).astype(np.float32)
    boxes = np.array(
        [
            [8.0, 8.0, 60.0, 48.0],
            [0.0, 0.0, 128.0, 96.0],
            [33.3, 17.9, 77.2, 63.1],
        ],
        np.float32,
    )
    j = roi_align(jnp.asarray(feat), jnp.asarray(boxes), stride=4)
    t = roi_align_torch(
        torch.from_numpy(feat.transpose(2, 0, 1)), torch.from_numpy(boxes),
        stride=4,
    )
    np.testing.assert_allclose(
        np.asarray(j), t.numpy().transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-4
    )


def test_box_head_parity_on_fixed_boxes(pair):
    import torch

    from gsattack.models.frcnn import D2FasterRCNN, fpn_level_for_boxes
    from tests.torch_refs.frcnn_ref import roi_align_torch

    tm, det = pair
    rng = np.random.default_rng(3)
    x = rng.uniform(size=(1, 3, 128, 128)).astype(np.float32)
    boxes = np.array(
        [[4.0, 4.0, 60.0, 60.0], [10.0, 20.0, 120.0, 110.0],
         [40.0, 40.0, 56.0, 52.0]],
        np.float32,
    )
    with torch.no_grad():
        tfpn, _ = tm(torch.from_numpy(x))
        lvls = np.asarray(fpn_level_for_boxes(jnp.asarray(boxes)))
        troi = torch.zeros((len(boxes), 256, 7, 7))
        for li in range(4):
            sel = lvls == li
            if sel.any():
                troi[sel] = roi_align_torch(
                    tfpn[li][0], torch.from_numpy(boxes[sel]), 4 * 2**li
                )
        tcls, tbox = tm.roi_heads(troi)

    jfpn, _ = det.model.apply(det.params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    jroi = det._roi_features(jfpn, jnp.asarray(boxes))
    jcls, jbox = det.model.apply(det.params, jroi, method=D2FasterRCNN.roi)
    np.testing.assert_allclose(
        np.asarray(jcls), tcls.numpy(), atol=3e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(jbox), tbox.numpy(), atol=3e-4, rtol=1e-3
    )


def test_loss_runs_on_converted_weights(pair):
    _, det = pair
    img = jnp.full((1, 96, 96, 3), 0.5)
    bb = np.array([[10.0, 10.0, 80.0, 80.0]], np.float32)
    g = jax.grad(lambda im: det.loss(im, 2, bb))(img)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
