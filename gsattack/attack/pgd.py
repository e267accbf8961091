"""DAGGER PGD step library — pure functional re-design of the reference's
11 in-place step functions (`attack.py:25-201`).

Semantics preserved exactly:
  * **linf**: p <- p - alpha * sign(g) (targeted; `+` for untargeted), then
    the perturbation is clamped elementwise into the [-eps, eps] box around
    the frozen originals (`attack.py:25-51,121-143`).
  * **l2**: step along g / ||g||_2 (single global norm over the whole
    tensor), then the per-point delta row is projected onto the eps L2 ball
    — torch's `renorm(p=2, dim=0, maxnorm=eps)` (`attack.py:53-119,145-173`).
  * masked variants restrict the update to a boolean point mask
    (`attack.py:176-201`, minus its `original_features_*` NameError defect,
    SURVEY.md §2.5).

Each step is `(param, grad, original) -> param` — jit/vmap/shard-friendly,
composable with any subset of attributes via `ATTRIBUTE_STEPS`.
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax.numpy as jnp

from ..core.scene import GaussianScene

# Attribute-name aliases: reference name -> GaussianScene field.
ATTR_MAP = {
    "color": ("f_dc", "f_rest"),
    "position": ("xyz",),
    "rotation": ("quat",),
    "opacity": ("opacity_logit",),
    "scaling": ("log_scale",),
    "objects": ("obj_dc",),
}


def linf_step(
    param: jnp.ndarray,
    grad: jnp.ndarray,
    original: jnp.ndarray,
    alpha: float,
    epsilon: float,
    targeted: bool = True,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    sign = -1.0 if targeted else 1.0
    eta = sign * alpha * jnp.sign(grad)
    new = param + eta
    new = original + jnp.clip(new - original, -epsilon, epsilon)
    if mask is not None:
        m = mask.reshape((mask.shape[0],) + (1,) * (param.ndim - 1))
        new = jnp.where(m, new, param)
    return new


def l2_step(
    param: jnp.ndarray,
    grad: jnp.ndarray,
    original: jnp.ndarray,
    alpha: float,
    epsilon: float,
    targeted: bool = True,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    sign = -1.0 if targeted else 1.0
    gnorm = jnp.linalg.norm(grad.reshape(-1))
    eta = jnp.where(gnorm > 0, sign * alpha * grad / jnp.where(gnorm > 0, gnorm, 1.0), 0.0)
    new = param + eta
    # torch renorm(p=2, dim=0, maxnorm=eps): each row (point) of the delta is
    # scaled down to norm <= eps.
    delta = new - original
    row_norm = jnp.linalg.norm(delta.reshape(delta.shape[0], -1), axis=1)
    scale = jnp.where(row_norm > epsilon, epsilon / jnp.maximum(row_norm, 1e-20), 1.0)
    delta = delta * scale.reshape((-1,) + (1,) * (delta.ndim - 1))
    new = original + delta
    if mask is not None:
        m = mask.reshape((mask.shape[0],) + (1,) * (param.ndim - 1))
        new = jnp.where(m, new, param)
    return new


def pgd_attack_step(
    scene: GaussianScene,
    grads: dict,
    originals: dict,
    alpha: float,
    epsilon: float,
    attributes: Iterable[str] = ("color",),
    norm: str = "l2",
    targeted: bool = True,
    mask: Optional[jnp.ndarray] = None,
) -> GaussianScene:
    """Apply one PGD step over the selected attribute groups.

    `attributes` uses the reference's vocabulary: any of
    color / position / rotation / opacity / scaling / objects.
    `originals` is a params dict snapshotted at attack start
    (`attack.py:388-394`).
    """
    step = {"linf": linf_step, "l2": l2_step}[norm]
    params = scene.params()
    for attr in attributes:
        for field in ATTR_MAP[attr]:
            params[field] = step(
                params[field],
                grads[field],
                originals[field],
                alpha,
                epsilon,
                targeted=targeted,
                mask=mask,
            )
    return scene.with_params(params)


# -- named wrappers mirroring the reference's public step-function surface --


def _mk(attr, norm):
    def fn(scene, grads, originals, alpha, epsilon, targeted=True, mask=None):
        return pgd_attack_step(
            scene, grads, originals, alpha, epsilon, (attr,), norm, targeted, mask
        )

    fn.__name__ = f"gaussian_{attr}_{norm}_attack"
    fn.__doc__ = f"Reference-parity wrapper: attack.py gaussian_{attr}_{norm}_attack."
    return fn


gaussian_color_linf_attack = _mk("color", "linf")
gaussian_color_l2_attack = _mk("color", "l2")
gaussian_position_linf_attack = _mk("position", "linf")
gaussian_position_l2_attack = _mk("position", "l2")
gaussian_rotation_linf_attack = _mk("rotation", "linf")
gaussian_rotation_l2_attack = _mk("rotation", "l2")
gaussian_opacity_linf_attack = _mk("opacity", "linf")
gaussian_opacity_l2_attack = _mk("opacity", "l2")
gaussian_scaling_linf_attack = _mk("scaling", "linf")
gaussian_scaling_l2_attack = _mk("scaling", "l2")


def gaussian_color_linf_attack_masked(
    scene, grads, originals, alpha, epsilon, mask, targeted=True
):
    """Masked color step (`attack.py:176-201`), with the mask actually
    applied to both update and projection (the reference reads undefined
    module globals there — documented defect, not replicated)."""
    return pgd_attack_step(
        scene, grads, originals, alpha, epsilon, ("color",), "linf", targeted, mask
    )
