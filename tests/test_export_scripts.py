"""End-to-end proof of the offline weight-export scripts (VERDICT r4 #5).

No published checkpoint can enter this environment (zero egress, the
reference's weights are LFS stubs), so each test synthesizes a REAL-SHAPE
torch checkpoint on disk from the repo's torch mirror modules, executes
the actual `scripts/export_*_weights.py` file as a subprocess (the exact
artifact a user runs), and loads the result through the detector's
`weights=` path — covering the full offline conversion chain:

  torch checkpoint file -> export script -> .npz -> load_converted -> jax
"""

import subprocess
import sys

import numpy as np
import pytest

REPO = "/root/repo"


def _run_script(name, *argv):
    r = subprocess.run(
        [sys.executable, f"{REPO}/scripts/{name}", *map(str, argv)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, (r.stdout, r.stderr)
    return r


def test_export_frcnn_script_end_to_end(tmp_path):
    """A detectron2 Checkpointer-style archive ({"model": state_dict})
    flows through export_frcnn_weights.py into Detectron2Detector."""
    import torch

    from tests.torch_refs.frcnn_ref import TorchFasterRCNN

    tm = TorchFasterRCNN(nc=8).eval()
    sd = tm.state_dict()
    pth = tmp_path / "model_final.pth"
    torch.save({"model": sd, "iteration": 270000}, pth)

    npz = tmp_path / "frcnn_r50_sd.npz"
    _run_script("export_frcnn_weights.py", pth, npz)

    from gsattack.models.frcnn import FasterRCNNDetector

    det = FasterRCNNDetector(num_classes=8, weights=str(npz))
    det.load_model()
    w = np.asarray(
        det.params["params"]["backbone"]["bottom_up"]["stem"]["conv1"]["kernel"]
    )
    np.testing.assert_array_equal(
        w, sd["backbone.bottom_up.stem.conv1.weight"].numpy()
        .transpose(2, 3, 1, 0),
    )


def test_export_detr_script_end_to_end(tmp_path):
    """A raw torch-hub state_dict file flows through
    export_detr_weights.py into DetrDetector."""
    import torch

    from tests.torch_refs.detr_ref import TorchDETRDemo

    tm = TorchDETRDemo(num_classes=10).eval()
    sd = tm.state_dict()
    pth = tmp_path / "detr_demo-da2a99e9.pth"
    torch.save(sd, pth)

    npz = tmp_path / "detr_demo.npz"
    _run_script("export_detr_weights.py", pth, npz)

    from gsattack.models.detr import DetrDetector

    det = DetrDetector(num_classes=10, weights=str(npz))
    det.load_model()
    w = np.asarray(det.params["params"]["query_pos"])
    np.testing.assert_array_equal(w, sd["query_pos"].numpy())


def test_export_yolo_script_end_to_end(tmp_path, monkeypatch):
    """export_yolo_weights.py needs the `ultralytics` package (absent in
    this image) — a stub module with the real API surface (YOLO(path)
    .model.state_dict()) stands in, so the script's own logic runs
    unmodified against a real-shape yolov8n checkpoint file."""
    import torch

    from tests.torch_refs.yolo_ref import TorchYolo

    tm = TorchYolo("yolov8", "yolov8n", nc=8).eval()
    pth = tmp_path / "yolov8n.pt"
    torch.save(tm.state_dict(), pth)

    stub = tmp_path / "ultralytics.py"
    stub.write_text(
        "import sys, torch\n"
        f"sys.path.insert(0, {REPO + '/tests'!r})\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "from torch_refs.yolo_ref import TorchYolo\n"
        "class YOLO:\n"
        "    def __init__(self, src):\n"
        "        self.model = TorchYolo('yolov8', 'yolov8n', nc=8)\n"
        "        self.model.load_state_dict(\n"
        "            torch.load(src, weights_only=True))\n"
    )
    npz = tmp_path / "yolov8n_sd.npz"
    env_path = f"{tmp_path}"
    r = subprocess.run(
        [sys.executable, f"{REPO}/scripts/export_yolo_weights.py",
         str(pth), str(npz)],
        capture_output=True, text=True, cwd=REPO,
        env={**__import__("os").environ, "PYTHONPATH": env_path},
    )
    assert r.returncode == 0, (r.stdout, r.stderr)

    from gsattack.models.yolo import YoloDetector

    det = YoloDetector(variant="yolov8", num_classes=8, imgsz=64,
                       weights=str(npz))
    det.load_model()
    w = np.asarray(det.params["params"]["m0"]["conv"]["kernel"])
    np.testing.assert_array_equal(
        w, tm.state_dict()["model.0.conv.weight"].numpy()
        .transpose(2, 3, 1, 0),
    )
