"""Real spherical-harmonics evaluation for Gaussian-splat view-dependent color.

Same basis/constants and evaluation semantics as the reference's
`utils/sh_utils.py:26-118` (PlenOctree-lineage hardcoded real SH polynomials,
degrees 0..4), re-expressed as vectorized jnp so that XLA can fuse the whole
polynomial into the projection pass.
"""

from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def _sh_basis(deg: int, dirs: jnp.ndarray) -> list:
    """Coefficient-scaled SH basis factors at unit directions: a list of
    (deg+1)^2 arrays shaped [..., 1], so `sum(b_k * sh_k)` evaluates the
    expansion against either channel-major [..., C, K] (index k last) or
    coefficient-major [..., K, C] (index k middle) storage."""
    x = dirs[..., 0:1]
    y = dirs[..., 1:2]
    z = dirs[..., 2:3]
    one = jnp.ones_like(x)
    basis = [C0 * one]
    if deg > 0:
        basis += [-C1 * y, C1 * z, -C1 * x]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            basis += [
                C2[0] * xy,
                C2[1] * yz,
                C2[2] * (2.0 * zz - xx - yy),
                C2[3] * xz,
                C2[4] * (xx - yy),
            ]
            if deg > 2:
                basis += [
                    C3[0] * y * (3 * xx - yy),
                    C3[1] * xy * z,
                    C3[2] * y * (4 * zz - xx - yy),
                    C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                    C3[4] * x * (4 * zz - xx - yy),
                    C3[5] * z * (xx - yy),
                    C3[6] * x * (xx - 3 * yy),
                ]
                if deg > 3:
                    basis += [
                        C4[0] * xy * (xx - yy),
                        C4[1] * yz * (3 * xx - yy),
                        C4[2] * xy * (7 * zz - 1),
                        C4[3] * yz * (7 * zz - 3),
                        C4[4] * (zz * (35 * zz - 30) + 3),
                        C4[5] * xz * (7 * zz - 3),
                        C4[6] * (xx - yy) * (7 * zz - 1),
                        C4[7] * xz * (xx - 3 * yy),
                        C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
                    ]
    return basis


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH at unit directions.

    Args:
      deg: static SH degree in [0, 4].
      sh: [..., C, (deg+1)**2] coefficients (channel-major like the
          reference's `eval_sh`, `utils/sh_utils.py:57-69`).
      dirs: [..., 3] unit view directions.

    Returns:
      [..., C] evaluated color (pre 0.5-shift).
    """
    assert 0 <= deg <= 4
    assert sh.shape[-1] >= num_sh_coeffs(deg)
    basis = _sh_basis(deg, dirs)
    result = basis[0] * sh[..., 0]
    for k in range(1, len(basis)):
        result = result + basis[k] * sh[..., k]
    return result


def eval_sh_features(deg: int, features: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """eval_sh on coefficient-major [..., K, C] features — the scene's
    native storage (`core/scene.py` features = concat(f_dc, f_rest)).

    Avoids the [..., K, C] -> [..., C, K] swapaxes the channel-major form
    forces on every projection call: on TPU that transpose (and its
    transpose in the backward) materializes ~0.5 ms of layout copies at
    100k splats (measured in the compiled HLO), while indexing sh[..., k, :]
    per basis term fuses into the projection map."""
    assert 0 <= deg <= 4
    assert features.shape[-2] >= num_sh_coeffs(deg)
    basis = _sh_basis(deg, dirs)
    result = basis[0] * features[..., 0, :]
    for k in range(1, len(basis)):
        result = result + basis[k] * features[..., k, :]
    return result


def sh_to_rgb(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """SH -> clamped RGB as the rasterizer does: max(eval + 0.5, 0).

    Mirrors the CUDA rasterizer's `computeColorFromSH` clamp semantics (the
    reference Python path at `gaussian_renderer/__init__.py:73-78`). Gradients
    are zero where the clamp is active, matching the CUDA `clamped` flags.
    """
    return jnp.maximum(eval_sh(deg, sh, dirs) + 0.5, 0.0)


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the DC band: (rgb - 0.5) / C0 (`utils/sh_utils.py:114`)."""
    return (rgb - 0.5) / C0


def sh_to_rgb_dc(sh: jnp.ndarray) -> jnp.ndarray:
    """DC band only: sh * C0 + 0.5 (`utils/sh_utils.py:117`)."""
    return sh * C0 + 0.5
