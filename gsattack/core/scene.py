"""GaussianScene — the 3DGS parameter store as an immutable JAX pytree.

TPU-first re-design of the reference's mutable `GaussianModel`
(`scene/gaussian_model.py:40-158`): the seven per-point parameter tensors
become arrays in a `flax.struct` dataclass, activations become pure
functions, and all editing ops (removal / concat / combine) operate on an
explicit `alive` mask plus an optional `grad_mask` instead of rebuilding
torch optimizers. Fixed capacity + masks keep every shape static under jit.

Parameter semantics (per point, N = capacity):
  xyz            (N, 3)    world position
  f_dc           (N, 1, 3) SH DC coefficients
  f_rest         (N, K, 3) SH rest coefficients, K = (max_deg+1)^2 - 1
  log_scale      (N, 3)    log of per-axis scale (activation: exp)
  quat           (N, 4)    wxyz rotation (activation: normalize)
  opacity_logit  (N, 1)    opacity logit (activation: sigmoid)
  obj_dc         (N, 1, C_obj) Gaussian-Grouping object feature (C_obj=16)

matching `scene/gaussian_model.py:24-39,97-121` activation wiring.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import sh as shlib
from .transforms import covariance6, inverse_sigmoid

NUM_OBJECTS = 16  # grouping feature channels, `scene/gaussian_model.py:52`


@struct.dataclass
class GaussianScene:
    xyz: jnp.ndarray
    f_dc: jnp.ndarray
    f_rest: jnp.ndarray
    log_scale: jnp.ndarray
    quat: jnp.ndarray
    opacity_logit: jnp.ndarray
    obj_dc: jnp.ndarray
    alive: jnp.ndarray  # (N,) bool — False rows render as fully transparent
    active_sh_degree: int = struct.field(pytree_node=False, default=0)
    max_sh_degree: int = struct.field(pytree_node=False, default=3)

    # ---- activated views (mirror `get_*` properties, gaussian_model.py:97-123)

    @property
    def num_points(self) -> int:
        return self.xyz.shape[0]

    @property
    def scaling(self) -> jnp.ndarray:
        return jnp.exp(self.log_scale)

    @property
    def rotation(self) -> jnp.ndarray:
        from .transforms import _safe_unit_quat

        return _safe_unit_quat(self.quat)

    @property
    def opacity(self) -> jnp.ndarray:
        """Sigmoid opacity gated by the alive mask (dead points vanish)."""
        return jax.nn.sigmoid(self.opacity_logit) * self.alive[:, None]

    @property
    def features(self) -> jnp.ndarray:
        """(N, (D+1)^2, 3) — cat of DC + rest (`gaussian_model.py:107-113`)."""
        return jnp.concatenate([self.f_dc, self.f_rest], axis=1)

    def covariance(self, scaling_modifier: float = 1.0) -> jnp.ndarray:
        return covariance6(self.scaling, self.quat, scaling_modifier)

    def oneup_sh_degree(self) -> "GaussianScene":
        if self.active_sh_degree < self.max_sh_degree:
            return self.replace(active_sh_degree=self.active_sh_degree + 1)
        return self

    # ---- editing ops (attack-support API) --------------------------------

    def removal_setup(self, remove_mask: jnp.ndarray) -> "GaussianScene":
        """Kill the masked points (reference `removal_setup`,
        `scene/gaussian_model.py:216-241`, which physically prunes; here the
        capacity stays and `alive` turns off)."""
        return self.replace(alive=self.alive & ~remove_mask)

    def keep_only(self, keep_mask: jnp.ndarray) -> "GaussianScene":
        return self.replace(alive=self.alive & keep_mask)

    def concat(self, other: "GaussianScene") -> "GaussianScene":
        """Append another scene's points (reference `concat_setup`,
        `scene/gaussian_model.py:243-262`). Host-side: shapes change."""
        assert self.max_sh_degree == other.max_sh_degree
        cat = lambda a, b: jnp.concatenate([a, b], axis=0)
        return GaussianScene(
            xyz=cat(self.xyz, other.xyz),
            f_dc=cat(self.f_dc, other.f_dc),
            f_rest=cat(self.f_rest, other.f_rest),
            log_scale=cat(self.log_scale, other.log_scale),
            quat=cat(self.quat, other.quat),
            opacity_logit=cat(self.opacity_logit, other.opacity_logit),
            obj_dc=cat(self.obj_dc, other.obj_dc),
            alive=cat(self.alive, other.alive),
            active_sh_degree=max(self.active_sh_degree, other.active_sh_degree),
            max_sh_degree=self.max_sh_degree,
        )

    def compact(self) -> "GaussianScene":
        """Drop dead rows (host-side, dynamic shape — call outside jit)."""
        keep = np.asarray(self.alive)
        take = lambda a: jnp.asarray(np.asarray(a)[keep])
        return GaussianScene(
            xyz=take(self.xyz),
            f_dc=take(self.f_dc),
            f_rest=take(self.f_rest),
            log_scale=take(self.log_scale),
            quat=take(self.quat),
            opacity_logit=take(self.opacity_logit),
            obj_dc=take(self.obj_dc),
            alive=jnp.ones(int(keep.sum()), dtype=bool),
            active_sh_degree=self.active_sh_degree,
            max_sh_degree=self.max_sh_degree,
        )

    def pad_to(self, capacity: int) -> "GaussianScene":
        """Pad with dead points up to a static capacity (for jit stability)."""
        n = self.num_points
        assert capacity >= n
        pad = capacity - n
        if pad == 0:
            return self
        padf = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
        )
        quat_pad = jnp.zeros((pad, 4), self.quat.dtype).at[:, 0].set(1.0)
        return GaussianScene(
            xyz=padf(self.xyz),
            f_dc=padf(self.f_dc),
            f_rest=padf(self.f_rest),
            log_scale=padf(self.log_scale),
            quat=jnp.concatenate([self.quat, quat_pad], axis=0),
            opacity_logit=padf(self.opacity_logit),
            obj_dc=padf(self.obj_dc),
            alive=jnp.concatenate([self.alive, jnp.zeros(pad, dtype=bool)]),
            active_sh_degree=self.active_sh_degree,
            max_sh_degree=self.max_sh_degree,
        )

    def params(self) -> dict:
        """The differentiable parameter sub-pytree (for jax.grad / optax)."""
        return {
            "xyz": self.xyz,
            "f_dc": self.f_dc,
            "f_rest": self.f_rest,
            "log_scale": self.log_scale,
            "quat": self.quat,
            "opacity_logit": self.opacity_logit,
            "obj_dc": self.obj_dc,
        }

    def with_params(self, p: dict) -> "GaussianScene":
        return self.replace(**p)


def scene_from_points(
    points: np.ndarray,
    colors: np.ndarray,
    max_sh_degree: int = 3,
    key: Optional[jax.Array] = None,
    knn_dist2: Optional[np.ndarray] = None,
) -> GaussianScene:
    """Initialize a scene from a point cloud — semantics of
    `create_from_pcd` (`scene/gaussian_model.py:130-158`):

    * f_dc = RGB2SH(colors); f_rest = 0
    * log_scale = log(sqrt(clamp_min(mean-3NN-dist^2, 1e-7))) per axis
    * quat = identity; opacity = inverse_sigmoid(0.1)
    * obj_dc = RGB2SH(U[0,1)) random grouping features
    """
    from ..ops.knn import mean_knn_dist2  # lazy import to avoid cycle

    n = points.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    if knn_dist2 is None:
        knn_dist2 = mean_knn_dist2(jnp.asarray(points, jnp.float32))
    dist2 = jnp.clip(jnp.asarray(knn_dist2, jnp.float32), 1e-7, None)
    log_scale = jnp.tile(jnp.log(jnp.sqrt(dist2))[:, None], (1, 3))
    k_rest = (max_sh_degree + 1) ** 2 - 1
    obj = shlib.rgb_to_sh(jax.random.uniform(key, (n, NUM_OBJECTS)))
    return GaussianScene(
        xyz=jnp.asarray(points, jnp.float32),
        f_dc=jnp.asarray(shlib.rgb_to_sh(np.asarray(colors, np.float32)))[:, None, :],
        f_rest=jnp.zeros((n, k_rest, 3), jnp.float32),
        log_scale=log_scale,
        quat=jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0),
        opacity_logit=jnp.full((n, 1), inverse_sigmoid(jnp.asarray(0.1)), jnp.float32),
        obj_dc=obj[:, None, :],
        alive=jnp.ones(n, dtype=bool),
        active_sh_degree=0,
        max_sh_degree=max_sh_degree,
    )
