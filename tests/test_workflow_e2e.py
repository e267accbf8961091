"""Golden end-to-end workflow test (VERDICT r2 item 8): the full reference
chain `attack.py -> utils/render.py -> analyze_asr.py` driven through the
CLI on one synthetic COLMAP scene:

  synth COLMAP scene + rendered GT images
    -> `cli train` (3DGS training loop)
    -> `cli attack` with a CONVERTED YOLOv8 checkpoint (targeted, succeeds,
       writes the adversarial PLY)
    -> `cli render-eval` on benign + adversarial scenes (render.log JSON
       records + detections_coco.json)
    -> `cli asr` pipeline over the two logs (nonzero totals)

The YOLO head is a real converted state_dict (torch mirror export) whose
detection biases are crafted deterministically: the class branch strongly
prefers "car" and the DFL box branch ramps toward the outer bins so every
anchor predicts a near-full-image box — giving the targeted success rule
(class match + IoU>0.5 vs the silhouette box, `models/base.py`) a
deterministic pass once the scene fills the frame.
"""

import json
import logging
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gsattack.io.colmap as cm

W, H = 64, 48
NC = 8
CAR = 2  # COCO_CLASSES[2] == "car"


def _write_scene(root, cams_rt, points, colors):
    sparse = root / "sparse" / "0"
    os.makedirs(sparse)
    cm.write_intrinsics_text(
        str(sparse / "cameras.txt"),
        {1: cm.ColmapCamera(1, "PINHOLE", W, H, np.array([60.0, 60.0, W / 2, H / 2]))},
    )
    images = {}
    for i, (q, t) in enumerate(cams_rt, start=1):
        images[i] = cm.ColmapImage(
            i, q, t, 1, f"im_{i:03d}.png", np.zeros((0, 2)), np.zeros(0, int)
        )
    cm.write_extrinsics_text(str(sparse / "images.txt"), images)
    with open(sparse / "points3D.txt", "w") as f:
        f.write("# points\n")
        for i, (p, c) in enumerate(zip(points, colors)):
            r, g, b = (np.asarray(c) * 255).astype(int)
            f.write(f"{i} {p[0]} {p[1]} {p[2]} {r} {g} {b} 0.5 \n")


def _yolo_weights(tmp_path):
    """Converted yolov8n state_dict with crafted Detect biases (see module
    docstring)."""
    import torch

    from tests.test_yolo_parity import _randomize
    from tests.torch_refs.yolo_ref import TorchYolo

    tm = _randomize(TorchYolo("yolov8", "yolov8n", nc=NC), seed=11)
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    for i in range(3):
        cls_b = np.full(NC, -8.0, np.float32)
        cls_b[CAR] = 8.0
        sd[f"model.22.cv3.{i}.2.bias"] = cls_b
        # zero the conv weights so the biases dominate the logits
        sd[f"model.22.cv3.{i}.2.weight"] = np.zeros_like(
            sd[f"model.22.cv3.{i}.2.weight"]
        )
        ramp = np.tile(np.arange(16, dtype=np.float32) * 2.0, 4)
        sd[f"model.22.cv2.{i}.2.bias"] = ramp
        sd[f"model.22.cv2.{i}.2.weight"] = np.zeros_like(
            sd[f"model.22.cv2.{i}.2.weight"]
        )
    path = tmp_path / "yolov8n_car_sd.npz"
    np.savez(path, **sd)
    return str(path)


def test_full_workflow_train_attack_rendereval_asr(tmp_path, monkeypatch):
    from PIL import Image

    from gsattack.cli import main
    from gsattack.core import scene_from_points
    from gsattack.io import load_scene_info
    from gsattack.render import render

    monkeypatch.chdir(os.path.dirname(os.path.dirname(__file__)))

    # ---- 1. synthetic target scene + COLMAP layout --------------------
    rng = np.random.default_rng(0)
    n = 400
    pts = rng.normal(size=(n, 3)).astype(np.float64)
    pts = pts * np.array([1.0, 0.8, 0.3]) + np.array([0.0, 0.0, 2.5])
    cols = rng.uniform(0.3, 0.95, size=(n, 3))
    cams_rt = [
        (np.array([1.0, 0.0, 0.0, 0.0]), np.array([0.0, 0.0, 0.12 * i]))
        for i in range(4)
    ]
    src = tmp_path / "scene"
    _write_scene(src, cams_rt, pts, cols)

    # GT images: render the target scene from the COLMAP cameras
    target = scene_from_points(pts, cols, max_sh_degree=0)
    target = target.replace(
        opacity_logit=jnp.full_like(target.opacity_logit, 1.5),
        log_scale=target.log_scale + 0.7,
    )
    info = load_scene_info(str(src))
    os.makedirs(src / "images")
    for cam_ext in info.train_cameras:
        cam = cam_ext.build()
        img = np.asarray(render(target, cam, jnp.zeros(3))["render"])
        # loader strips the extension from image_name; files keep .png
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            src / "images" / f"{cam_ext.image_name}.png"
        )

    model_dir = tmp_path / "model"
    common = [
        f"scene.source_path={src}",
        f"scene.model_path={model_dir}",
        "scene.synthetic=false",
        "scene.cam_indices=[]",
        "sh_degree=0",
        "resolution=1",
    ]

    # ---- 2. cli train (sharded over the 8-device mesh: use_mesh routes
    # the Trainer's per-point state over the splats axis) ----------------
    rc = main(["train", "--iterations", "120", "use_mesh=true"] + common)
    assert rc == 0
    ply = model_dir / "point_cloud" / "iteration_120" / "point_cloud.ply"
    assert ply.exists()

    # ---- 3. cli attack with the converted YOLOv8 head ------------------
    weights = _yolo_weights(tmp_path)
    det_over = [
        "scene.detector_name=yolov8",
        f"scene.detector_weights={weights}",
        f"scene.detector_num_classes={NC}",
        "scene.detector_imgsz=64",
        "scene.target=car",
        "scene.is_targeted=true",
    ]
    rc = main(
        ["attack", "no_groups=true", "combine_splats=false",
         "max_iters=4", "batch_mode=true", "batch_size=2", "eval_every=1",
         f"splat_asset_path={tmp_path}"]
        + common + det_over
    )
    assert rc == 0
    adv_ply = tmp_path / "toy_adv_yolov8.ply"
    assert adv_ply.exists(), "targeted attack did not succeed / save the PLY"

    # ---- 4. cli render-eval on benign and adversarial scenes -----------
    adv_model = tmp_path / "adv_model"
    os.makedirs(adv_model / "point_cloud" / "iteration_1")
    import shutil

    shutil.copy(adv_ply, adv_model / "point_cloud" / "iteration_1" / "point_cloud.ply")

    logs = {}
    for tag, mp in (("benign", model_dir), ("adv", adv_model)):
        log_path = tmp_path / f"{tag}_render.log"
        handler = logging.FileHandler(log_path)
        handler.setFormatter(
            logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
        )
        rlog = logging.getLogger("render")
        rlog.setLevel(logging.INFO)  # pytest sets root to WARNING
        rlog.addHandler(handler)
        try:
            rc = main(
                ["render-eval", "no_groups=true", "combine_splats=false",
                 f"scene.model_path={mp}"]
                + [o for o in common if "model_path" not in o] + det_over
            )
        finally:
            logging.getLogger("render").removeHandler(handler)
            handler.close()
        assert rc == 0
        text = log_path.read_text()
        assert '"pred_class"' in text, f"{tag} render.log has no records"
        logs[tag] = str(log_path)

    # ---- 5. cli asr ----------------------------------------------------
    from gsattack.evals import analyze_asr_logs

    r = analyze_asr_logs(logs["benign"], logs["adv"], "car")
    assert r is not None
    assert r["total"] > 0, "ASR pipeline measured nothing"
    assert 0.0 <= r["asr"] <= 1.0
    rc = main(
        ["asr", "--benign-log", logs["benign"], "--adv-log", logs["adv"],
         "--target", "car"]
    )
    assert rc == 0
