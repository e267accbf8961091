"""Attack subsystem tests: PGD step semantics (vs hand-computed torch
renorm/clamp behavior), silhouette bboxes (vs PIL), scene editing ops,
toy detector, and the full DAGGER loop end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsattack.attack import (
    AttackConfig,
    l2_step,
    linf_step,
    pgd_attack_step,
    run_dagger,
    silhouette_bbox,
)
from gsattack.models import ToyDetector, evaluate_success, load_detector, nms
from gsattack.models.base import Detections, box_iou
from tests.conftest import make_toy_camera, make_toy_scene


# ---- PGD steps ------------------------------------------------------------


def test_linf_step_semantics():
    p = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    orig = p
    g = jnp.array([[0.5, -0.2], [0.0, 3.0]])
    out = linf_step(p, g, orig, alpha=0.3, epsilon=0.25, targeted=True)
    # targeted: p - alpha*sign(g), clamped to +-eps around originals
    want = np.array([[1.0 - 0.25, 2.0 + 0.25], [3.0, 4.0 - 0.25]])
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)
    out_u = linf_step(p, g, orig, alpha=0.1, epsilon=0.25, targeted=False)
    want_u = np.array([[1.1, 1.9], [3.0, 4.1]])
    np.testing.assert_allclose(np.asarray(out_u), want_u, atol=1e-6)


def test_l2_step_global_norm_and_row_projection():
    p = jnp.zeros((3, 2))
    orig = p
    g = jnp.array([[3.0, 4.0], [0.0, 0.0], [0.0, 5.0]])
    gnorm = np.sqrt(9 + 16 + 25)
    out = l2_step(p, g, orig, alpha=1.0, epsilon=10.0, targeted=True)
    want = -np.asarray(g) / gnorm
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)
    # row projection: each row delta clipped to eps L2 norm (torch renorm dim=0)
    big = jnp.array([[6.0, 8.0], [0.1, 0.0], [0.0, 0.0]])
    out2 = l2_step(big, jnp.zeros_like(big), orig, alpha=0.0, epsilon=5.0)
    np.testing.assert_allclose(np.asarray(out2)[0], [3.0, 4.0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out2)[1], [0.1, 0.0], rtol=1e-5)


def test_l2_step_zero_grad_no_step():
    p = jnp.ones((2, 2))
    out = l2_step(p, jnp.zeros_like(p), p, alpha=1.0, epsilon=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(p))


def test_pgd_step_masked():
    sc = make_toy_scene(n=8)
    orig = sc.params()
    grads = jax.tree_util.tree_map(jnp.ones_like, orig)
    mask = jnp.asarray([True] * 4 + [False] * 4)
    out = pgd_attack_step(
        sc, grads, orig, alpha=0.1, epsilon=1.0, attributes=("color",), norm="linf",
        mask=mask,
    )
    d_dc = np.asarray(out.f_dc - sc.f_dc)
    assert np.abs(d_dc[:4]).max() > 0
    assert np.abs(d_dc[4:]).max() == 0
    # non-color attributes untouched
    np.testing.assert_allclose(np.asarray(out.xyz), np.asarray(sc.xyz))


def test_pgd_step_attribute_selection():
    sc = make_toy_scene(n=8)
    orig = sc.params()
    grads = jax.tree_util.tree_map(jnp.ones_like, orig)
    out = pgd_attack_step(
        sc, grads, orig, 0.1, 1.0, ("position", "opacity"), "l2"
    )
    assert np.abs(np.asarray(out.xyz - sc.xyz)).max() > 0
    assert np.abs(np.asarray(out.opacity_logit - sc.opacity_logit)).max() > 0
    np.testing.assert_allclose(np.asarray(out.f_dc), np.asarray(sc.f_dc))


# ---- silhouette bbox ------------------------------------------------------


def test_silhouette_bbox_matches_pil():
    from PIL import Image

    rng = np.random.default_rng(0)
    img = np.zeros((40, 60, 3), np.float32)
    img[10:25, 5:50] = rng.uniform(0.2, 1.0, size=(15, 45, 3))
    got = np.asarray(silhouette_bbox(jnp.asarray(img)))
    pil = Image.fromarray((img * 255).astype(np.uint8)).convert("L")
    pil = pil.point(lambda p: p > 20 and 255)
    want = pil.getbbox()
    np.testing.assert_array_equal(got, np.asarray(want))


def test_silhouette_bbox_empty():
    got = np.asarray(silhouette_bbox(jnp.zeros((16, 16, 3))))
    np.testing.assert_array_equal(got, [0, 0, 0, 0])


# ---- detector base --------------------------------------------------------


def test_box_iou_and_nms():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[5, 5, 15, 15], [20, 20, 30, 30]], np.float32)
    iou = box_iou(a, b)
    np.testing.assert_allclose(iou[0, 0], 25.0 / 175.0, rtol=1e-5)
    assert iou[0, 1] == 0
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = nms(boxes, scores, iou_thres=0.45)
    assert list(keep) == [0, 2]


def test_evaluate_success_targeted():
    dets = Detections(
        boxes=np.array([[0, 0, 10, 10]], np.float32),
        scores=np.array([0.9], np.float32),
        classes=np.array([3], np.int64),
    )
    ok, info = evaluate_success(dets, [0, 0, 10, 10], target=3, untarget=None, is_targeted=True)
    assert ok and info["best_iou"] == 1.0
    ok2, _ = evaluate_success(dets, [0, 0, 10, 10], target=5, untarget=None, is_targeted=True)
    assert not ok2
    # untargeted: success means untarget class NOT detected on the object
    ok3, _ = evaluate_success(dets, [0, 0, 10, 10], target=None, untarget=3, is_targeted=False)
    assert not ok3
    ok4, _ = evaluate_success(dets, [0, 0, 10, 10], target=None, untarget=7, is_targeted=False)
    assert ok4


def test_evaluate_success_no_dets():
    empty = Detections(np.zeros((0, 4), np.float32), np.zeros(0), np.zeros(0, np.int64))
    ok, _ = evaluate_success(empty, [0, 0, 5, 5], target=None, untarget=2, is_targeted=False)
    assert ok  # nothing detected -> untarget gone
    ok2, _ = evaluate_success(empty, [0, 0, 5, 5], target=1, untarget=None, is_targeted=True)
    assert not ok2


def test_toy_detector_loss_differentiable():
    det = ToyDetector(num_classes=8)
    det.load_model()
    img = jnp.ones((1, 64, 64, 3)) * 0.5
    bboxes = np.array([[8, 8, 48, 48]], np.float32)
    g = jax.grad(lambda im: det.loss(im, 2, bboxes))(img)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_detector_factory():
    det = load_detector("toy", num_classes=4)
    assert isinstance(det, ToyDetector)
    with pytest.raises(ValueError):
        load_detector("nope")


# ---- editing ops ----------------------------------------------------------


def test_convex_hull_mask():
    from gsattack.ops.hull import points_inside_convex_hull

    rng = np.random.default_rng(0)
    cube = rng.uniform(-1, 1, size=(200, 3))
    mask = np.zeros(200, bool)
    # hull from the cube corners: everything is inside
    corners = np.array(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)], float
    )
    pts = np.concatenate([cube, corners * 1.01])
    mask = np.concatenate([np.zeros(200, bool), np.ones(8, bool)])
    inside = points_inside_convex_hull(pts, mask, remove_outliers=False)
    assert inside[:200].all()
    outside = points_inside_convex_hull(
        np.concatenate([cube * 5, corners]),
        np.concatenate([np.zeros(200, bool), np.ones(8, bool)]),
        remove_outliers=False,
    )
    assert outside[:200].mean() < 0.2


def test_combine_scene_plys(tmp_path):
    from gsattack.core.edit import combine_scene_plys
    from gsattack.io import save_scene_ply

    a = make_toy_scene(n=8, seed=1)
    b = make_toy_scene(n=12, seed=2)
    pa, pb = str(tmp_path / "a.ply"), str(tmp_path / "b.ply")
    save_scene_ply(a, pa)
    save_scene_ply(b, pb)
    combined, masks = combine_scene_plys([pa, pb])
    assert combined.num_points == 20
    assert masks[0].sum() == 8 and masks[1].sum() == 12
    assert not (masks[0] & masks[1]).any()
    np.testing.assert_allclose(np.asarray(combined.xyz[:8]), np.asarray(a.xyz), atol=1e-6)
    # obj features are zeroed on combine (reference behavior)
    assert np.abs(np.asarray(combined.obj_dc)).max() == 0


def test_object_selection_mask():
    from gsattack.core.edit import object_selection_mask

    sc = make_toy_scene(n=50, seed=3)
    # classifier that maps obj channel 0 strongly to class 1
    w = jnp.zeros((4, 16)).at[1, 0].set(50.0).at[0, 1].set(50.0)
    b = jnp.zeros(4)
    # make first 10 points strongly class 1
    obj = jnp.zeros((50, 1, 16)).at[:10, 0, 0].set(1.0).at[10:, 0, 1].set(1.0)
    sc = sc.replace(obj_dc=obj)
    m = object_selection_mask(sc, w, b, [1], threshold=0.5, use_convex_hull=False)
    assert m[:10].all() and not m[10:].any()


def test_inpaint_scene():
    from gsattack.core.edit import inpaint_scene

    sc = make_toy_scene(n=30, seed=4)
    rm = np.zeros(30, bool)
    rm[:5] = True
    out = inpaint_scene(sc, rm, k=3)
    assert out.num_points == 30  # 25 kept + 5 re-initialized
    # re-initialized points are means of remaining neighbors -> within cloud bounds
    kept = np.asarray(sc.xyz)[~rm]
    new = np.asarray(out.xyz)[25:]
    assert new.min() >= kept.min() - 1e-5 and new.max() <= kept.max() + 1e-5


def test_recolor_tools():
    from gsattack.core import sh as shlib
    from gsattack.core.edit import recolor_grayscale, recolor_single

    sc = make_toy_scene(n=6)
    red = recolor_single(sc, [1.0, 0.0, 0.0])
    np.testing.assert_allclose(
        np.asarray(shlib.sh_to_rgb_dc(red.f_dc[0, 0])), [1, 0, 0], atol=1e-6
    )
    assert np.abs(np.asarray(red.f_rest)).max() == 0
    gray = recolor_grayscale(sc)
    dc = np.asarray(gray.f_dc)[:, 0, :]
    sh_vals = np.asarray(sc.f_dc)[:, 0, :]
    want = 0.2989 * sh_vals[:, 0] + 0.587 * sh_vals[:, 1] + 0.114 * sh_vals[:, 2]
    np.testing.assert_allclose(dc[:, 0], np.asarray(shlib.rgb_to_sh(want)), rtol=1e-5)
    np.testing.assert_allclose(dc[:, 0], dc[:, 1], rtol=1e-6)


# ---- end-to-end DAGGER ----------------------------------------------------


def _toy_views(n=2, width=64, height=64):
    from gsattack.core.camera import CameraExtrinsics

    views = []
    for i in range(n):
        ext = CameraExtrinsics(
            np.eye(3), np.array([0.0, 0.0, 0.1 * i]), 1.0, 1.0, width, height, uid=i
        )
        views.append(ext)
    return views


def test_dagger_loop_runs_and_reduces_loss(tmp_path):
    scene = make_toy_scene(n=48, seed=0)
    det = ToyDetector(num_classes=8)
    cfg = AttackConfig(
        epsilon=5.0,
        alpha=0.5,
        max_iters=6,
        batch_mode=True,
        batch_size=2,
        target=2,
        untarget=None,
        is_targeted=True,
        attributes=("color",),
        norm="l2",
        output_dir=str(tmp_path),
        eval_every=2,
        attack_conf_thresh=0.9,  # effectively unreachable for random weights
    )
    res = run_dagger(scene, _toy_views(2), det, cfg, log=lambda *_: None)
    assert len(res.losses) >= 4
    assert res.losses[-1] < res.losses[0]  # PGD reduces the detector loss
    # scene actually moved, only in color attributes
    assert np.abs(np.asarray(res.scene.f_dc - scene.f_dc)).max() > 0
    np.testing.assert_allclose(np.asarray(res.scene.xyz), np.asarray(scene.xyz))


def test_dagger_success_retires_views(tmp_path, monkeypatch):
    scene = make_toy_scene(n=32, seed=1)
    det = ToyDetector(num_classes=8)
    calls = {"n": 0}

    def fake_predict_and_save(**kwargs):
        calls["n"] += 1
        return True  # every view fooled immediately

    monkeypatch.setattr(det, "predict_and_save", lambda **kw: fake_predict_and_save(**kw))
    cfg = AttackConfig(
        max_iters=5,
        batch_mode=True,
        batch_size=2,
        target=1,
        output_dir=str(tmp_path),
        scene_name="toy",
        detector_name="toy",
    )
    res = run_dagger(scene, _toy_views(4), det, cfg, log=lambda *_: None)
    assert res.success
    assert res.adv_ply_path is not None
    import os

    assert os.path.exists(res.adv_ply_path)
    assert calls["n"] >= 4


def test_dagger_epsilon_ball_respected(tmp_path):
    scene = make_toy_scene(n=32, seed=2)
    det = ToyDetector(num_classes=8)
    eps = 0.05
    cfg = AttackConfig(
        epsilon=eps,
        alpha=0.5,
        max_iters=4,
        batch_mode=False,
        batch_size=1,
        target=3,
        norm="linf",
        attributes=("color", "position"),
        output_dir=str(tmp_path),
    )
    res = run_dagger(scene, _toy_views(1), det, cfg, log=lambda *_: None)
    assert np.abs(np.asarray(res.scene.f_dc - scene.f_dc)).max() <= eps + 1e-5
    assert np.abs(np.asarray(res.scene.xyz - scene.xyz)).max() <= eps + 1e-5


def test_expand_viewpoints_yaw():
    from gsattack.attack import expand_viewpoints

    views = _toy_views(1)
    out = expand_viewpoints(views, add_cams=3)
    assert len(out) == 3
    assert not np.allclose(out[1].R, out[0].R)


def test_dagger_camera_range_selection(monkeypatch):
    """start_cam/end_cam slice the attack's camera set (`attack.py:262`,
    carried-but-dormant in the reference; live here)."""
    import gsattack.attack.dagger as dg
    from gsattack.attack import AttackConfig, run_dagger
    from gsattack.models import ToyDetector
    from tests.conftest import make_toy_scene

    captured = {}
    orig = dg.expand_viewpoints

    def spy(cams, add_cams):
        captured["n"] = len(cams)
        return orig(cams, add_cams)

    monkeypatch.setattr(dg, "expand_viewpoints", spy)
    det = ToyDetector(num_classes=4)
    scene = make_toy_scene(n=48, seed=2)
    run_dagger(
        scene, _toy_views(4), det,
        AttackConfig(max_iters=2, batch_mode=False, target=1,
                     save_ply=False, start_cam=1, end_cam=3),
        log=lambda *_: None,
    )
    assert captured["n"] == 2  # cameras [1:3]


def test_dagger_checkpoint_resume(tmp_path):
    """Attack resilience (a capability the reference lacks): interrupt after
    a few iterations, resume from the checkpoint, and end at the same state
    as an uninterrupted run."""
    scene = make_toy_scene(n=32, seed=3)
    det = ToyDetector(num_classes=8)
    common = dict(
        epsilon=5.0, alpha=0.5, batch_mode=True, batch_size=2, target=2,
        eval_every=100, attack_conf_thresh=0.99, output_dir=str(tmp_path),
        checkpoint_every=2,
    )
    views = _toy_views(2)

    # Uninterrupted run for 6 iterations.
    full = run_dagger(
        scene, views, det, AttackConfig(max_iters=6, **common),
        log=lambda *_: None,
    )

    # Interrupted run: 3 iterations (checkpoint lands at it=2), then resume.
    ck = str(tmp_path / "ck")
    run_dagger(
        scene, views, det,
        AttackConfig(max_iters=3, checkpoint_dir=ck, **common),
        log=lambda *_: None,
    )
    resumed = run_dagger(
        scene, views, det,
        AttackConfig(max_iters=6, checkpoint_dir=ck, resume=True, **common),
        log=lambda *_: None,
    )
    # Resume restores the saved loss history and continues from it=3: the
    # complete histories must match.
    np.testing.assert_allclose(resumed.losses, full.losses, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(resumed.scene.f_dc), np.asarray(full.scene.f_dc), atol=1e-6
    )
