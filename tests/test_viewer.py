"""Network viewer round-trip test."""

import threading

import numpy as np

from gsattack.utils.viewer import request_frame, serve_scene
from tests.conftest import make_toy_camera, make_toy_scene


def test_viewer_roundtrip():
    scene = make_toy_scene(n=32)
    ready = threading.Event()
    port = 16321
    t = threading.Thread(
        target=serve_scene,
        args=(scene,),
        kwargs={"port": port, "max_requests": 1, "ready_event": ready},
        daemon=True,
    )
    t.start()
    assert ready.wait(10)
    cam = make_toy_camera(width=48, height=32)
    req = {
        "width": 48,
        "height": 32,
        "fovx": 1.0,
        "fovy": 1.0,
        "view": np.asarray(cam.view).tolist(),
    }
    frame = request_frame(req, port=port)
    assert frame.shape == (32, 48, 3)
    assert frame.max() > 0  # scene visible
    t.join(timeout=30)
