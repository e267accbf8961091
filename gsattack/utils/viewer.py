"""Interactive network viewer — the reference's `gaussian_renderer/
network_gui.py` capability (a socket server the SIBR viewer dials for
rendered frames; dead code upstream, SURVEY §2.1) rebuilt with a documented
JSON protocol:

request (one JSON line):
  {"width": W, "height": H, "fovx": f, "fovy": f,
   "view": [[...4x4...]], "scaling_modifier": 1.0}
response: 4-byte little-endian length + raw RGB8 (H*W*3) frame.

`serve_scene` runs a blocking single-client loop (daemon-thread friendly);
`request_frame` is the matching client used by the tests.
"""

from __future__ import annotations

import json
import socket
import struct
import threading
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from ..core.scene import GaussianScene
from ..render import render


def _camera_from_request(req: dict) -> Camera:
    view = np.asarray(req["view"], np.float32).reshape(4, 4)
    from ..core.transforms import perspective_projection_matrix

    proj = perspective_projection_matrix(
        req.get("znear", 0.01), req.get("zfar", 100.0), req["fovx"], req["fovy"]
    )
    full = (proj @ view).astype(np.float32)
    cam_center = np.linalg.inv(view)[:3, 3].astype(np.float32)
    return Camera(
        view=jnp.asarray(view),
        full_proj=jnp.asarray(full),
        cam_center=jnp.asarray(cam_center),
        tanfovx=jnp.float32(np.tan(req["fovx"] * 0.5)),
        tanfovy=jnp.float32(np.tan(req["fovy"] * 0.5)),
        width=int(req["width"]),
        height=int(req["height"]),
    )


def serve_scene(
    scene: GaussianScene,
    host: str = "127.0.0.1",
    port: int = 6009,
    bg: Optional[jnp.ndarray] = None,
    max_requests: Optional[int] = None,
    ready_event: Optional[threading.Event] = None,
) -> None:
    """Blocking render server (reference init/try_connect/send loop,
    `network_gui.py:26-86`)."""
    bg = jnp.zeros(3) if bg is None else bg
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(1)
    if ready_event is not None:
        ready_event.set()
    served = 0
    try:
        while max_requests is None or served < max_requests:
            conn, _ = srv.accept()
            with conn:
                f = conn.makefile("rb")
                line = f.readline()
                if not line:
                    continue
                req = json.loads(line)
                cam = _camera_from_request(req)
                out = render(
                    scene, cam, bg,
                    scaling_modifier=float(req.get("scaling_modifier", 1.0)),
                )
                img = np.asarray(
                    jnp.clip(out["render"], 0, 1) * 255
                ).astype(np.uint8)
                payload = img.tobytes()
                conn.sendall(struct.pack("<I", len(payload)) + payload)
            served += 1
    finally:
        srv.close()


def request_frame(req: dict, host: str = "127.0.0.1", port: int = 6009) -> np.ndarray:
    """Client: send one camera request, return the (H, W, 3) uint8 frame."""
    with socket.create_connection((host, port), timeout=30) as s:
        s.sendall((json.dumps(req) + "\n").encode())
        f = s.makefile("rb")
        (n,) = struct.unpack("<I", f.read(4))
        data = f.read(n)
    return np.frombuffer(data, np.uint8).reshape(req["height"], req["width"], 3)
