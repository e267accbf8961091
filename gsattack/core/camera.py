"""Camera model: a jit-friendly pytree replacing the reference's
`scene/cameras.py` nn.Module Camera.

A `Camera` carries precomputed view / full-projection matrices (standard
column-vector convention — the reference stores these transposed for
row-vector multiply, `scene/cameras.py:54-57`) plus the static image size.
Width/height are static pytree fields so one compiled renderer serves all
cameras of a given resolution; cameras of equal resolution stack with
`jax.tree.map(lambda *x: jnp.stack(x), *cams)` for vmapped multi-view PGD.

Attack-specific manipulation (translate / yaw, `scene/cameras.py:60-105`)
is functional: it returns a new Camera.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from .transforms import (
    perspective_projection_matrix,
    world_to_view_matrix,
    yaw_rotation_matrix,
)

ZNEAR = 0.01
ZFAR = 100.0


@struct.dataclass
class Camera:
    # Arrays (leaves)
    view: jnp.ndarray  # (4,4) world->camera
    full_proj: jnp.ndarray  # (4,4) proj @ view
    cam_center: jnp.ndarray  # (3,) camera position in world space
    tanfovx: jnp.ndarray  # scalar
    tanfovy: jnp.ndarray  # scalar
    # Static metadata
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)
    uid: int = struct.field(pytree_node=False, default=0)
    image_name: str = struct.field(pytree_node=False, default="")


def make_camera(
    R: np.ndarray,
    T: np.ndarray,
    fovx: float,
    fovy: float,
    width: int,
    height: int,
    trans: Optional[np.ndarray] = None,
    scale: float = 1.0,
    uid: int = 0,
    image_name: str = "",
    znear: float = ZNEAR,
    zfar: float = ZFAR,
) -> Camera:
    """Build a Camera from COLMAP-style extrinsics.

    R is camera-to-world rotation, T world->cam translation — identical
    meaning to the reference `Camera.__init__` (`scene/cameras.py:18-57`).
    """
    view = world_to_view_matrix(R, T, trans, scale)
    proj = perspective_projection_matrix(znear, zfar, fovx, fovy)
    full = (proj @ view).astype(np.float32)
    cam_center = np.linalg.inv(view)[:3, 3].astype(np.float32)
    return Camera(
        view=jnp.asarray(view),
        full_proj=jnp.asarray(full),
        cam_center=jnp.asarray(cam_center),
        tanfovx=jnp.float32(np.tan(fovx * 0.5)),
        tanfovy=jnp.float32(np.tan(fovy * 0.5)),
        width=int(width),
        height=int(height),
        uid=uid,
        image_name=image_name,
    )


class CameraExtrinsics:
    """Mutable host-side camera description (R, T, fov, size) that can emit
    jit-ready `Camera` pytrees; carries the reference's attack-time camera
    manipulation API (`transform` / `yaw`, `scene/cameras.py:72-105`)."""

    def __init__(
        self,
        R: np.ndarray,
        T: np.ndarray,
        fovx: float,
        fovy: float,
        width: int,
        height: int,
        uid: int = 0,
        image_name: str = "",
        trans: Optional[np.ndarray] = None,
        scale: float = 1.0,
        image: Optional[np.ndarray] = None,
    ):
        self.R = np.asarray(R, dtype=np.float64)
        self.T = np.asarray(T, dtype=np.float64)
        self.fovx = float(fovx)
        self.fovy = float(fovy)
        self.width = int(width)
        self.height = int(height)
        self.uid = uid
        self.image_name = image_name
        self.trans = np.zeros(3) if trans is None else np.asarray(trans)
        self.scale = float(scale)
        self.image = image  # optional (H,W,3) float ground-truth image

    def translate(self, T: np.ndarray) -> "CameraExtrinsics":
        """Replace camera translation (reference `Camera.transform`,
        `scene/cameras.py:72-83`)."""
        out = self.copy()
        out.T = np.asarray(T, dtype=np.float64)
        return out

    def yaw(self, angle_deg: float) -> "CameraExtrinsics":
        """Premultiply R by a Y-axis rotation (reference `Camera.yaw`,
        `scene/cameras.py:85-105`)."""
        out = self.copy()
        out.R = yaw_rotation_matrix(angle_deg) @ self.R
        return out

    def copy(self) -> "CameraExtrinsics":
        return CameraExtrinsics(
            self.R.copy(),
            self.T.copy(),
            self.fovx,
            self.fovy,
            self.width,
            self.height,
            self.uid,
            self.image_name,
            self.trans.copy(),
            self.scale,
            self.image,
        )

    def build(self) -> Camera:
        return make_camera(
            self.R,
            self.T,
            self.fovx,
            self.fovy,
            self.width,
            self.height,
            self.trans,
            self.scale,
            uid=self.uid,
            image_name=self.image_name,
        )


def stack_cameras(cams: list[Camera]) -> Camera:
    """Stack same-resolution cameras into a batched Camera (leading view axis)."""
    assert len({(c.width, c.height) for c in cams}) == 1, "resolutions differ"
    import jax

    # uid/image_name are static pytree metadata and would make treedefs
    # unequal across views — normalize them away for the batched camera.
    cams = [c.replace(uid=0, image_name="") for c in cams]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)
    return stacked
