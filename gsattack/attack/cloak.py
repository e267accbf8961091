"""CLOAK — data-poisoning attack via adversarial training views.

The reference describes CLOAK (README.md:6-12, docs/demos.md) but ships no
code for it (SURVEY.md §0): adversarial perturbations are baked into the
3DGS *training images* for selected viewpoints, so the retrained scene
renders cloaked content that fools the detector from those views.

Implementation here (SURVEY.md §7 stage 8):
  1. `poison_image` — image-space PGD (linf) against the frozen detector's
     loss: targeted (make `target` appear on the object) or untargeted
     (make `untarget` disappear), a jitted scan.
  2. `run_cloak` — substitute the poisoned images into the training set for
     the victim viewpoints and run the 3DGS trainer.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from ..core.scene import GaussianScene
from ..models.base import Detector
from ..train.trainer import TrainConfig, Trainer
from .silhouette import silhouette_bbox


@dataclasses.dataclass
class CloakConfig:
    epsilon: float = 16.0 / 255.0  # image-space linf budget
    alpha: float = 2.0 / 255.0
    steps: int = 40
    target: Optional[int] = None
    untarget: Optional[int] = None
    is_targeted: bool = True
    poison_view_indices: tuple = ()


def poison_image(
    image: jnp.ndarray,
    detector: Detector,
    bbox: np.ndarray,
    cfg: CloakConfig,
) -> jnp.ndarray:
    """Image-space PGD on one view: clamp to [0,1], linf-eps around the
    original. Targeted: minimize loss toward `target`; untargeted: maximize
    the loss of `untarget` staying detected."""
    detector.load_model()
    target_idx = cfg.target if cfg.is_targeted else cfg.untarget
    sign = -1.0 if cfg.is_targeted else 1.0
    bboxes = jnp.asarray(bbox, jnp.float32).reshape(1, 4)
    orig = image

    def loss_fn(img):
        return detector.loss(img[None], int(target_idx), bboxes)

    g = jax.grad(loss_fn)

    def step(img, _):
        img = img + sign * cfg.alpha * jnp.sign(g(img))
        img = orig + jnp.clip(img - orig, -cfg.epsilon, cfg.epsilon)
        img = jnp.clip(img, 0.0, 1.0)
        return img, None

    out, _ = jax.lax.scan(step, image, None, length=cfg.steps)
    return out


def run_cloak(
    init_scene: GaussianScene,
    cameras: Sequence[Camera],
    gt_images: Sequence[np.ndarray],
    detector: Detector,
    cloak_cfg: CloakConfig,
    train_cfg: Optional[TrainConfig] = None,
    iterations: int = 2000,
    cameras_extent: float = 1.0,
    log: Callable[[str], None] = print,
    mesh=None,  # jax.sharding.Mesh: shard the retraining over splats
) -> tuple[GaussianScene, list[np.ndarray]]:
    """Poison the selected views and retrain. Returns (poisoned scene,
    poisoned images). With `mesh`, the retraining runs sharded
    (BASELINE config #5: airport_scene sharded retraining)."""
    train_cfg = train_cfg or TrainConfig()
    images = [np.asarray(g) for g in gt_images]
    poisoned = []
    for vi in cloak_cfg.poison_view_indices:
        bbox = np.asarray(silhouette_bbox(jnp.asarray(images[vi])))
        log(f"[cloak] poisoning view {vi} (bbox {bbox.tolist()})")
        adv = poison_image(jnp.asarray(images[vi]), detector, bbox, cloak_cfg)
        images[vi] = np.asarray(adv)
        poisoned.append(images[vi])
    trainer = Trainer(
        init_scene, train_cfg, cameras_extent=cameras_extent, mesh=mesh
    )
    scene = trainer.fit(list(cameras), images, iterations=iterations)
    return scene, poisoned
