"""Quaternion / covariance / projection-matrix math for 3DGS.

Functional jnp equivalents of the reference's tensor helpers
(`utils/general_utils.py:64-110`, `utils/graphics_utils.py:38-71`), written
batched-first so they vmap/shard cleanly.

Conventions: quaternions are (w, x, y, z); matrices act on column vectors
(``p' = M @ p``). The reference stores its 4x4 transforms transposed for
row-vector multiplication; we keep the standard math convention and
transpose only at the (rare) interop boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _safe_unit_quat(q: jnp.ndarray) -> jnp.ndarray:
    """q / ||q|| with a finite gradient at ||q|| = 0 (a zero quat — from an
    attacked rotation attribute or a corrupt PLY — must not NaN every
    parameter's gradient through the normalization's 0/0). The epsilon is
    far below f32 resolution: ||q||^2 + 1e-24 rounds to ||q||^2 for any
    valid quat, so the normal path is bit-identical to the plain form."""
    return q * jax.lax.rsqrt(
        jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24
    )


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Normalized quaternion(s) (..., 4) wxyz -> rotation matrix (..., 3, 3).

    Matches `utils/general_utils.py:78-99` (normalizes first).
    """
    q = _safe_unit_quat(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s): (..., 3) x (..., 4) -> (..., 3, 3).

    Matches `utils/general_utils.py:101-110`.
    """
    return quat_to_rotmat(q) * s[..., None, :]


def build_covariance(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Full 3D covariance Sigma = L L^T, (..., 3, 3)."""
    L = build_scaling_rotation(s, q)
    return L @ jnp.swapaxes(L, -1, -2)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) symmetric -> (..., 6) upper-triangular packing.

    Order (xx, xy, xz, yy, yz, zz) as `utils/general_utils.py:64-76`.
    """
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def unpack_symmetric(cov6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) packed -> (..., 3, 3) symmetric matrix."""
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def covariance6(s: jnp.ndarray, q: jnp.ndarray, modifier: float = 1.0) -> jnp.ndarray:
    """Activated covariance as the reference's `get_covariance`
    (`scene/gaussian_model.py:25-29,123`), packed (xx, xy, xz, yy, yz, zz).

    Computed ELEMENTWISE as Sigma_ij = sum_k s_k^2 R_ik R_jk instead of the
    batched `L @ L.T`: (N,3,3) matmuls are MXU-hostile on TPU (3x3 tiles on
    a 128x128 systolic array) and their autodiff transpose doubles down —
    the matmul form cost ~5 ms of the projection BACKWARD at N=100k where
    this form is a fused VPU map (same r1 lesson as the elementwise EWA
    quad in ops/project.compute_cov2d)."""
    q = _safe_unit_quat(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - r * z)
    r02 = 2 * (x * z + r * y)
    r10 = 2 * (x * y + r * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - r * x)
    r20 = 2 * (x * z - r * y)
    r21 = 2 * (y * z + r * x)
    r22 = 1 - 2 * (x * x + y * y)
    s2 = jnp.square(s * modifier)
    s0, s1, s2_ = s2[..., 0], s2[..., 1], s2[..., 2]
    xx = s0 * r00 * r00 + s1 * r01 * r01 + s2_ * r02 * r02
    xy = s0 * r00 * r10 + s1 * r01 * r11 + s2_ * r02 * r12
    xz = s0 * r00 * r20 + s1 * r01 * r21 + s2_ * r02 * r22
    yy = s0 * r10 * r10 + s1 * r11 * r11 + s2_ * r12 * r12
    yz = s0 * r10 * r20 + s1 * r11 * r21 + s2_ * r12 * r22
    zz = s0 * r20 * r20 + s1 * r21 * r21 + s2_ * r22 * r22
    return jnp.stack([xx, xy, xz, yy, yz, zz], axis=-1)


def world_to_view_matrix(
    R: np.ndarray,
    t: np.ndarray,
    translate: np.ndarray | None = None,
    scale: float = 1.0,
) -> np.ndarray:
    """World->camera 4x4 (column-vector convention).

    Semantics of `getWorld2View2` (`utils/graphics_utils.py:38-49`): R is the
    camera-to-world rotation (COLMAP loaders store R = qvec2rotmat(q)^T), t
    the world->cam translation; optional recenter/rescale of the camera
    center. Returned UNtransposed (reference transposes for row-vectors at
    `scene/cameras.py:54`).
    """
    if translate is None:
        translate = np.zeros(3)
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = np.asarray(R).T
    Rt[:3, 3] = np.asarray(t)
    Rt[3, 3] = 1.0
    c2w = np.linalg.inv(Rt)
    c2w[:3, 3] = (c2w[:3, 3] + translate) * scale
    return np.linalg.inv(c2w).astype(np.float32)


def perspective_projection_matrix(
    znear: float, zfar: float, fovx: float, fovy: float
) -> np.ndarray:
    """OpenGL-style z in [0,1] perspective matrix (column-vector convention).

    Same element values as `getProjectionMatrix` (`utils/graphics_utils.py:51-71`).
    """
    tan_half_fovy = float(np.tan(fovy / 2))
    tan_half_fovx = float(np.tan(fovx / 2))
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * float(np.tan(fov / 2)))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * float(np.arctan(pixels / (2 * focal)))


def inverse_sigmoid(x):
    """log(x / (1-x)) — `utils/general_utils.py:18`. Works on np or jnp."""
    return jnp.log(x / (1 - x)) if isinstance(x, jnp.ndarray) else np.log(x / (1 - x))


def yaw_rotation_matrix(angle_deg: float) -> np.ndarray:
    """Y-axis rotation used by `Camera.yaw` (`scene/cameras.py:85-105`)."""
    theta = np.radians(angle_deg)
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float64)
