"""3DGS training loop — the subsystem the reference *requires* but does not
vendor (it lives in the non-vendored gaussian-splatting submodule,
SURVEY.md §0/§7 stage 8); required for CLOAK poisoned-view training.

Built TPU-first: one jitted `train_step` (render -> (1-l)L1 + l(1-SSIM) ->
Adam with the reference's per-group learning rates -> densification stats),
a jitted static-capacity densify/prune (train/densify.py), and host-side
orchestration for schedules, SH degree warmup and capacity growth.

Hyperparameter defaults mirror `OptimizationParams`
(`arguments/__init__.py:71-90`) and `configs/config.yaml:23-44`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..core.camera import Camera
from ..core.scene import GaussianScene
from ..render import render
from ..utils.losses import dssim_l1_loss, expon_lr_schedule
from .densify import (
    DensifyStats,
    add_densification_stats,
    densify_and_prune,
    grow_capacity,
    reset_opacity,
)


@dataclasses.dataclass
class TrainConfig:
    iterations: int = 30_000
    position_lr_init: float = 1.6e-4
    position_lr_final: float = 1.6e-6
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 2.5e-3
    opacity_lr: float = 0.05
    scaling_lr: float = 5e-3
    rotation_lr: float = 1e-3
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3_000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 2e-4
    min_opacity: float = 0.005
    max_screen_size: float = 20.0
    white_background: bool = False
    sh_increase_interval: int = 1_000
    capacity_headroom: float = 1.5
    pairs_per_gaussian: int = 32
    max_chunks: int = 16
    backend: str = "xla"
    pairs_budget: int = 0
    # Binning row-compaction and pair-indexed-backward capacities
    # (ops/raster.bin_gaussians, ops/pallas_blend.pack_pairs). Training
    # grows the splat set, so leave headroom when setting these.
    rect_candidates: int = 0
    compact_budget: int = 0
    # Tiered-bin caps for the post-densification (large-scene) regime
    # (ops/raster.bin_gaussians tier_split/heavy_budget; size with
    # auto_tier_caps + headroom — heavy overflow is counted, not silent).
    tier_split: int = 0
    heavy_budget: int = 0
    spatial_lr_scale: float = 1.0
    # Gaussian-Grouping 3D consistency regularizer (reference knobs
    # `configs/config.yaml:37-41`; loss in train/reg3d.py). Enabled when
    # a classifier head is given; applied every `reg3d_interval` steps.
    use_reg3d: bool = False
    reg3d_interval: int = 2
    reg3d_k: int = 5
    reg3d_lambda_val: float = 2.0
    reg3d_max_points: int = 300_000
    reg3d_sample_size: int = 1_000


class TrainState(struct.PyTreeNode):
    scene: GaussianScene
    opt_state: optax.OptState
    stats: DensifyStats
    step: jnp.ndarray


def make_lr_tree(cfg: TrainConfig):
    """Per-group learning rates (`training_setup`,
    `scene/gaussian_model.py:160-179`): xyz on the exponential schedule
    scaled by spatial extent, f_rest at feature_lr / 20."""
    xyz_sched = expon_lr_schedule(
        cfg.position_lr_init * cfg.spatial_lr_scale,
        cfg.position_lr_final * cfg.spatial_lr_scale,
        lr_delay_mult=cfg.position_lr_delay_mult,
        max_steps=cfg.position_lr_max_steps,
    )

    def lr_tree(step):
        return {
            "xyz": xyz_sched(step),
            "f_dc": cfg.feature_lr,
            "f_rest": cfg.feature_lr / 20.0,
            "opacity_logit": cfg.opacity_lr,
            "log_scale": cfg.scaling_lr,
            "quat": cfg.rotation_lr,
            "obj_dc": cfg.feature_lr,
        }

    return lr_tree


class Trainer:
    """Host-side orchestration around the jitted step functions."""

    def __init__(
        self,
        scene: GaussianScene,
        cfg: TrainConfig,
        cameras_extent: float = 1.0,
        classifier: Optional[tuple] = None,  # (weight (C,16), bias (C,))
        mesh=None,  # jax.sharding.Mesh: shard training over splats
    ):
        self.cfg = cfg
        self.cameras_extent = cameras_extent
        self.classifier = (
            (jnp.asarray(classifier[0]), jnp.asarray(classifier[1]))
            if classifier is not None
            else None
        )
        capacity = int(scene.num_points * cfg.capacity_headroom)
        self._mesh = mesh
        self._splats_mult = 1
        if mesh is not None:
            # BASELINE config #5 (sharded CLOAK retraining): per-point
            # state shards its capacity dim over the splats axis and jit
            # auto-partitions every step (the fixed-capacity slot
            # allocator keeps shapes — and therefore shardings — static
            # across densify/prune). Round capacity up for even shards.
            from ..parallel.mesh import SPLATS_AXIS
            from ..parallel.shardings import pad_to_multiple

            self._splats_mult = mesh.shape[SPLATS_AXIS]
            capacity = pad_to_multiple(capacity, self._splats_mult)
        scene = scene.pad_to(capacity)
        self.adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15)
        self.lr_tree = make_lr_tree(cfg)
        self.state = self._shard_state(TrainState(
            scene=scene,
            opt_state=self.adam.init(scene.params()),
            stats=DensifyStats.zeros(capacity),
            step=jnp.zeros((), jnp.int32),
        ))
        self._step_fn = jax.jit(self._train_step)

    def _shard_state(self, state: "TrainState") -> "TrainState":
        """Re-apply the splats-axis sharding to the whole TrainState
        (no-op without a mesh). Must run after any host-side capacity
        change (grow_capacity) or the state silently reverts to the
        default unsharded layout."""
        if self._mesh is None:
            return state
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import SPLATS_AXIS

        capacity = state.scene.xyz.shape[0]

        def put(x):
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] == capacity:
                return jax.device_put(
                    x, NamedSharding(self._mesh, P(SPLATS_AXIS))
                )
            return jax.device_put(x, NamedSharding(self._mesh, P()))

        return jax.tree_util.tree_map(put, state)

    # ---- one jitted training step ----------------------------------------

    def _train_step(self, state: TrainState, camera: Camera, gt: jnp.ndarray):
        cfg = self.cfg
        bg = jnp.ones(3) if cfg.white_background else jnp.zeros(3)
        scene0 = state.scene

        def loss_fn(params, mean2d_offset):
            sc = scene0.with_params(params)
            out = render(
                sc,
                camera,
                bg,
                mean2d_offset=mean2d_offset,
                pairs_per_gaussian=cfg.pairs_per_gaussian,
                max_chunks=cfg.max_chunks,
                backend=cfg.backend,
                pairs_budget=cfg.pairs_budget,
                rect_candidates=cfg.rect_candidates,
                compact_budget=cfg.compact_budget,
                tier_split=cfg.tier_split,
                heavy_budget=cfg.heavy_budget,
            )
            loss = dssim_l1_loss(out["render"], gt, cfg.lambda_dssim)
            if cfg.use_reg3d and self.classifier is not None:
                from .reg3d import reg3d_loss

                w, b = self.classifier
                key = jax.random.fold_in(jax.random.PRNGKey(17), state.step)
                reg = reg3d_loss(
                    sc, w, b, key,
                    k=cfg.reg3d_k,
                    sample_size=cfg.reg3d_sample_size,
                    max_points=cfg.reg3d_max_points,
                    lambda_val=cfg.reg3d_lambda_val,
                )
                # Every `reg3d_interval` steps (reference schedule knob);
                # cond-free masking keeps the step a single jitted graph.
                apply = (state.step % cfg.reg3d_interval == 0).astype(
                    jnp.float32
                )
                loss = loss + apply * reg
            return loss, out["radii"]

        params = scene0.params()
        offset = jnp.zeros((scene0.num_points, 2))
        (loss, radii), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            params, offset
        )
        param_grads, mean2d_grad = grads

        updates, opt_state = self.adam.update(param_grads, state.opt_state, params)
        lrs = self.lr_tree(state.step)
        params = jax.tree_util.tree_map(
            lambda p, u, lr: p - lr * u, params, updates, lrs
        )
        stats = add_densification_stats(state.stats, mean2d_grad, radii)
        new_scene = scene0.with_params(params)
        return (
            TrainState(
                scene=new_scene,
                opt_state=opt_state,
                stats=stats,
                step=state.step + 1,
            ),
            loss,
        )

    # ---- host loop --------------------------------------------------------

    def train_step(self, camera: Camera, gt: jnp.ndarray) -> float:
        self.state, loss = self._step_fn(self.state, camera, gt)
        return float(loss)

    def maybe_densify(self, iteration: int, key: jax.Array) -> None:
        cfg = self.cfg
        if not (
            cfg.densify_from_iter <= iteration <= cfg.densify_until_iter
            and iteration % cfg.densification_interval == 0
        ):
            return
        use_screen = iteration > cfg.opacity_reset_interval
        adam_state = self.state.opt_state
        # Route the Adam moments through the same slot allocator as the
        # params: surviving points KEEP their moments, pruned slots and new
        # children get zeros — matching the reference's `_prune_optimizer` /
        # `cat_tensors_to_optimizer` (`scene/gaussian_model.py:573-650`)
        # instead of wiping all moments every densification.
        scene, stats, dropped, moments = densify_and_prune(
            self.state.scene,
            self.state.stats,
            key,
            moments=(adam_state.mu, adam_state.nu),
            max_grad=cfg.densify_grad_threshold,
            min_opacity=cfg.min_opacity,
            extent=self.cameras_extent,
            percent_dense=cfg.percent_dense,
            max_screen_size=cfg.max_screen_size,
            use_screen_limit=use_screen,
        )
        grew = int(dropped) > 0
        if grew:
            scene, stats, moments = grow_capacity(
                scene, stats, cfg.capacity_headroom, moments=moments,
                round_to=self._splats_mult,
            )
        self.state = TrainState(
            scene=scene,
            opt_state=adam_state._replace(mu=moments[0], nu=moments[1]),
            stats=stats,
            step=self.state.step,
        )
        if grew:
            # capacity changed on the host: restore the mesh layout
            self.state = self._shard_state(self.state)

    def maybe_reset_opacity(self, iteration: int) -> None:
        cfg = self.cfg
        if iteration % cfg.opacity_reset_interval == 0 and iteration > 0:
            scene = reset_opacity(self.state.scene)
            # Replace only the opacity moments (the reference's
            # `replace_tensor_to_optimizer`, `scene/gaussian_model.py:558`);
            # other groups keep their Adam state.
            st = self.state.opt_state
            mu = dict(st.mu)
            nu = dict(st.nu)
            mu["opacity_logit"] = jnp.zeros_like(mu["opacity_logit"])
            nu["opacity_logit"] = jnp.zeros_like(nu["opacity_logit"])
            self.state = self.state.replace(
                scene=scene, opt_state=st._replace(mu=mu, nu=nu)
            )

    def maybe_increase_sh(self, iteration: int) -> None:
        if (
            iteration % self.cfg.sh_increase_interval == 0
            and iteration > 0
            and self.state.scene.active_sh_degree < self.state.scene.max_sh_degree
        ):
            scene = self.state.scene.oneup_sh_degree()
            self.state = self.state.replace(scene=scene)
            self._step_fn = jax.jit(self._train_step)  # degree is static

    def fit(
        self,
        cameras: Sequence[Camera],
        gt_images: Sequence[np.ndarray],
        iterations: Optional[int] = None,
        key: Optional[jax.Array] = None,
        log: Callable[[int, float], None] = lambda i, l: None,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 1000,
    ) -> GaussianScene:
        """Full training loop: random view per iteration (the standard 3DGS
        camera sampling), densify/prune/opacity-reset schedules. With
        `checkpoint_dir`, orbax snapshots of the full TrainState land every
        `checkpoint_every` iterations (resume via
        io.checkpoint.restore_checkpoint into `trainer.state`)."""
        iterations = iterations or self.cfg.iterations
        key = key if key is not None else jax.random.PRNGKey(0)
        n = len(cameras)
        gts = [jnp.asarray(g) for g in gt_images]
        start = int(self.state.step)
        for it in range(start + 1, iterations + 1):
            key, k1, k2 = jax.random.split(key, 3)
            vi = int(jax.random.randint(k1, (), 0, n))
            loss = self.train_step(cameras[vi], gts[vi])
            log(it, loss)
            self.maybe_increase_sh(it)
            self.maybe_densify(it, k2)
            self.maybe_reset_opacity(it)
            if checkpoint_dir and it % checkpoint_every == 0:
                from ..io.checkpoint import save_checkpoint

                save_checkpoint(checkpoint_dir, self.state, step=it)
        return self.state.scene
