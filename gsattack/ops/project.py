"""Per-Gaussian projection: frustum cull, EWA 3D->2D covariance, SH color.

This is the "preprocess" stage of the differentiable rasterizer — the
TPU-native counterpart of the CUDA `preprocess` kernel behind
`GaussianRasterizer.__call__` (call contract at
`gaussian_renderer/__init__.py:36-95`). All of it is dense vectorized jnp:
XLA fuses the whole thing into a handful of VPU loops over N, and it shards
trivially over a `splats` mesh axis.

Conventions replicated from the published Inria rasterizer algorithm (the
reference imports it as a non-vendored CUDA submodule, SURVEY.md §2.3):
  * near-plane cull at view-space z <= 0.2
  * EWA Jacobian with tan-FoV clamping at 1.3x the frustum half-extent
  * +0.3 px low-pass added to the 2D covariance diagonal
  * radius = ceil(3 * sqrt(lambda_max)), 16-px tiles downstream
  * ndc2pix(v, S) = ((v + 1) * S - 1) / 2
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core import sh as shlib
from ..core.camera import Camera
from ..core.scene import GaussianScene


def _affine3(xyz: jnp.ndarray, rot: jnp.ndarray, trans) -> jnp.ndarray:
    """(N, 3) @ rot.T + trans as explicit elementwise VPU maps.

    A (N, 3) x (3, 3) matmul pads the contraction dim 3 -> 128 on the MXU
    (~40x wasted tiles) and, worse, breaks XLA fusion around it; nine
    scalar-broadcast FMAs fuse into the surrounding projection map (same
    lesson as the covariance6 rewrite, CLAUDE.md r2)."""
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    cols = [
        x * rot[i, 0] + y * rot[i, 1] + z * rot[i, 2] + trans[i]
        for i in range(rot.shape[0])
    ]
    return jnp.stack(cols, axis=-1)


class ProjectedGaussians(NamedTuple):
    """Screen-space quantities for every Gaussian (dense over capacity N)."""

    mean2d: jnp.ndarray  # (N, 2) pixel coords
    depth: jnp.ndarray  # (N,) view-space z
    conic: jnp.ndarray  # (N, 3) inverse 2D covariance (a, b, c)
    radius: jnp.ndarray  # (N,) int32 screen-space radius in pixels (0 = culled)
    color: jnp.ndarray  # (N, 3) RGB from SH (or override)
    obj: jnp.ndarray  # (N, C_obj) object features
    opacity: jnp.ndarray  # (N,) activated opacity
    # Opacity-aware binning radius (float, <= radius): beyond
    # r_t = sqrt(2 ln(255 op) lambda1) every pixel fails the blend's
    # alpha >= 1/255 skip, so tiles outside it contribute exactly nothing.
    # Only the pair BINNING consumes this; `radius`/`visibility_filter`
    # keep the reference's 3-sigma semantics.
    radius_tight: jnp.ndarray  # (N,) float32 (0 = culled)


def compute_cov2d(
    xyz: jnp.ndarray,
    cov3d6: jnp.ndarray,
    view: jnp.ndarray,
    tanfovx: jnp.ndarray,
    tanfovy: jnp.ndarray,
    width: int,
    height: int,
) -> jnp.ndarray:
    """EWA splatting: project 3D covariance to 2D screen space. (N,3) packed
    (cov_xx, cov_xy, cov_yy) with the +0.3 low-pass on the diagonal."""
    t = _affine3(xyz, view[:3, :3], view[:3, 3])  # view-space positions (N,3)
    # Double-where guard: points at/behind the near plane are culled later,
    # but a raw 1/tz would poison *gradients* of masked-out lanes with NaNs.
    tz = jnp.where(t[:, 2] > 0.2, t[:, 2], 1.0)
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    txtz = jnp.clip(t[:, 0] / tz, -limx, limx)
    tytz = jnp.clip(t[:, 1] / tz, -limy, limy)
    tx = txtz * tz
    ty = tytz * tz

    fx = width / (2.0 * tanfovx)
    fy = height / (2.0 * tanfovy)

    # J rows: (fx/tz, 0, -fx tx/tz^2) and (0, fy/tz, -fy ty/tz^2);
    # M = J @ W_rot expands to two (N, 3) row vectors. The full quadratic
    # form M V M^T is computed elementwise on the packed 6-vector — (N,3,3)
    # batched matmuls waste the MXU on 3x3 tiles (4ms -> ~0.2ms at N=100k).
    j00 = fx / tz
    j02 = -fx * tx / (tz * tz)
    j11 = fy / tz
    j12 = -fy * ty / (tz * tz)
    W = view[:3, :3]  # world->view rotation
    m0 = j00[:, None] * W[0][None, :] + j02[:, None] * W[2][None, :]  # (N, 3)
    m1 = j11[:, None] * W[1][None, :] + j12[:, None] * W[2][None, :]

    xx, xy, xz = cov3d6[:, 0], cov3d6[:, 1], cov3d6[:, 2]
    yy, yz, zz = cov3d6[:, 3], cov3d6[:, 4], cov3d6[:, 5]

    def quad(a, b):
        return (
            xx * a[:, 0] * b[:, 0]
            + yy * a[:, 1] * b[:, 1]
            + zz * a[:, 2] * b[:, 2]
            + xy * (a[:, 0] * b[:, 1] + a[:, 1] * b[:, 0])
            + xz * (a[:, 0] * b[:, 2] + a[:, 2] * b[:, 0])
            + yz * (a[:, 1] * b[:, 2] + a[:, 2] * b[:, 1])
        )

    return jnp.stack(
        [quad(m0, m0) + 0.3, quad(m0, m1), quad(m1, m1) + 0.3], axis=-1
    )


def project(
    scene: GaussianScene,
    camera: Camera,
    scaling_modifier: float = 1.0,
    override_color: Optional[jnp.ndarray] = None,
    sh_degree: Optional[int] = None,
) -> ProjectedGaussians:
    """Dense projection of every Gaussian in the scene for one camera."""
    xyz = scene.xyz
    n = xyz.shape[0]
    view = camera.view

    # View-space depth + frustum cull (z <= 0.2 like the Inria preprocess).
    depth = _affine3(xyz, view[2:3, :3], view[2:3, 3])[:, 0]
    in_front = depth > 0.2

    # Clip-space -> pixel coords via the full projection matrix.
    hom = _affine3(xyz, camera.full_proj[:3, :3], camera.full_proj[:3, 3])
    w = _affine3(xyz, camera.full_proj[3:4, :3], camera.full_proj[3:4, 3])[:, 0]
    # Same double-where guard as the covariance path: culled points must not
    # emit inf/NaN that would leak into gradients through jnp.where.
    w = jnp.where(in_front, w, 1.0)
    inv_w = 1.0 / (w + 1e-7)
    ndc = hom * inv_w[:, None]
    mean2d = jnp.stack(
        [
            ((ndc[:, 0] + 1.0) * camera.width - 1.0) * 0.5,
            ((ndc[:, 1] + 1.0) * camera.height - 1.0) * 0.5,
        ],
        axis=-1,
    )

    cov3d6 = scene.covariance(scaling_modifier)
    cov2d = compute_cov2d(
        xyz, cov3d6, view, camera.tanfovx, camera.tanfovy, camera.width, camera.height
    )
    a, b, c = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2]
    det = a * c - b * b
    det_ok = det != 0.0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))
    visible = in_front & det_ok & scene.alive
    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    # Tight binning radius (gsplat-style opacity-aware cutoff): alpha along
    # the worst (major-eigenvector) direction is op*exp(-d^2/(2 lambda1)),
    # which crosses the blend's 1/255 skip at d^2 = 2 lambda1 ln(255 op).
    # min with the reference 3-sigma radius keeps its truncation semantics;
    # op <= 1/255 never survives the skip anywhere -> radius_tight = 0.
    # Slice-then-activate: going through scene.opacity ((N, 1) sigmoid,
    # then [:, 0]) leaves XLA computing on lane-padded (N, 1) arrays —
    # each one is a 51 MB physical pass at 100k splats (HLO-measured
    # ~0.15 ms per materialized copy). 1-D (N,) maps are compact.
    opacity_act = jax.nn.sigmoid(scene.opacity_logit[:, 0]) * scene.alive
    q_cut = 2.0 * jnp.log(jnp.maximum(opacity_act * 255.0, 1e-6))
    r_tight = jnp.sqrt(jnp.maximum(q_cut, 0.0) * jnp.maximum(lambda1, 0.0))
    # +0.01px guard: f32 rounding at the exact alpha = 1/255 boundary must
    # err toward keeping (the blend's own skip test decides those pixels).
    radius_tight = jnp.where(
        visible, jnp.minimum(radius_f, r_tight + 0.01), 0.0
    )

    # Color: SH evaluated at per-point view directions (CUDA path semantics,
    # `gaussian_renderer/__init__.py:73-81`), or an override color.
    if override_color is not None:
        color = override_color
    else:
        deg = scene.active_sh_degree if sh_degree is None else sh_degree
        dirs = xyz - camera.cam_center[None, :]
        # Double-where guard: a (dead/padded) point exactly at the camera
        # center has dirs == 0, where the norm's gradient is 0/0 — the raw
        # normalize would leak NaN into every xyz gradient via where's
        # chain rule even though the point is culled downstream.
        n2 = jnp.sum(dirs * dirs, axis=-1, keepdims=True)
        safe = n2 > 1e-18
        inv = 1.0 / jnp.sqrt(jnp.where(safe, n2, 1.0))
        dirs = jnp.where(safe, dirs * inv, 0.0)
        # features stay coefficient-major (N, K, 3): eval_sh_features
        # avoids the swapaxes whose fwd+bwd layout copies cost ~0.85 ms
        # at 100k splats (HLO-measured).
        color = jnp.maximum(
            shlib.eval_sh_features(deg, scene.features, dirs) + 0.5, 0.0
        )

    # Object features, blended like degree-0 SH (Gaussian-Grouping fork).
    obj = jnp.maximum(scene.obj_dc[:, 0, :] * shlib.C0 + 0.5, 0.0)

    return ProjectedGaussians(
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        radius=radius,
        color=color,
        obj=obj,
        opacity=opacity_act,
        radius_tight=radius_tight,
    )
