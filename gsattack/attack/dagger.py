"""DAGGER attack driver — the orchestration loop of the reference's
`attack.py run()` (`attack.py:205-607`) re-built as a thin host loop around
one jitted render+loss+grad step.

TPU-first differences from the reference (SURVEY.md §7 stage 5):
  * the forward over a batch of views is a single vmapped+jitted function,
    not a Python loop of rasterizer calls (`attack.py:481-485`);
  * no deepcopy-per-iteration: the eval overlay scene is the pure
    `scene.concat(frozen)` of pytrees (`attack.py:513-520`);
  * the benign silhouette-bbox pass runs on-device (attack/silhouette.py)
    instead of PNG+PIL round trips (`attack.py:433-461`);
  * success checks (host, eval-mode) can be throttled via `eval_every`.

Faithful behavior kept: yaw-augmented extra cameras (7 deg * i,
`attack.py:404-415`), truncation to a batch-size multiple (:417-423),
per-batch iteration budget with batch drop (:465-473), the >= B-1 batch
success rule (:556-569), and the adversarial PLY artifact on completion
(:566-568, `output/{scene}_adv_{detector}.ply`).
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera, CameraExtrinsics, stack_cameras
from ..core.scene import GaussianScene
from ..models.base import Detector
from ..render import render
from .pgd import pgd_attack_step
from .silhouette import silhouette_bbox


@dataclasses.dataclass
class AttackConfig:
    """Attack knobs — same surface as `configs/config.yaml:46-58`."""

    epsilon: float = 5.0
    alpha: float = 0.5
    max_iters: int = 100
    batch_mode: bool = True
    batch_size: int = 5
    attack_conf_thresh: float = 0.25
    is_targeted: bool = True
    target: Optional[int] = None
    untarget: Optional[int] = None
    attributes: tuple = ("color",)
    norm: str = "l2"
    add_cams: int = 0
    # Camera-range selection (`attack.py:262`, config keys start_cam /
    # end_cam — carried but left commented out in the reference; live
    # here). None = no slicing.
    start_cam: Optional[int] = None
    end_cam: Optional[int] = None
    shift_amount: float = 0.15
    white_background: bool = False
    eval_every: int = 1
    scene_name: str = "scene"
    detector_name: str = "toy"
    output_dir: str = "output"
    preds_dir: Optional[str] = None  # save predict_and_save images when set
    pairs_per_gaussian: int = 32
    max_chunks: int = 16
    backend: str = "xla"  # "pallas" on TPU for the fast blend kernels
    pairs_budget: int = 0
    # Rect-enumeration capacity for binning row compaction (-1 = auto-pair
    # with pairs_per_gaussian=-1; 0 = off). See ops/raster.bin_gaussians.
    rect_candidates: int = 0
    # Pair-indexed backward-scatter capacity (-1 = auto-measure with the
    # other caps; 0 = off). See ops/pallas_blend.pack_pairs.
    compact_budget: int = 0
    # Tiered-bin caps for large scenes (-1 = auto-measure with the other
    # caps, off when unprofitable; 0 = off). See ops/raster.bin_gaussians.
    tier_split: int = 0
    heavy_budget: int = 0
    save_ply: bool = True
    # Checkpoint/resume (capability the reference lacks, SURVEY §5): save
    # attack state every N iterations; resume picks up pending views + params.
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 25
    resume: bool = False


@dataclasses.dataclass
class AttackResult:
    scene: GaussianScene
    success: bool
    iterations: int
    losses: list
    per_view_success: list
    adv_ply_path: Optional[str] = None


def render_views(
    scene: GaussianScene,
    cams: Camera,
    bg: jnp.ndarray,
    pairs_per_gaussian: int = 32,
    max_chunks: int = 16,
    backend: str = "xla",
    pairs_budget: int = 0,
    rect_candidates: int = 0,
    mesh=None,
    compact_budget: int = 0,
    tier_split: int = 0,
    heavy_budget: int = 0,
    band_tiles: tuple | None = None,
) -> jnp.ndarray:
    """Batched multi-view render -> (B, H, W, 3). `cams` is a stacked Camera.

    The XLA path vmaps over views; the pallas path projects/bins per view
    and blends the whole batch in ONE kernel launch with grid
    (views, tiles) (ops/raster.rasterize_views) — replacing the r1
    `lax.map` serialization (vmapping the pallas custom call tripped an
    XLA fusion crash, and per-view launches repaid the grid overhead
    every view).

    With a `jax.sharding.Mesh` and the pallas backend, routes through the
    explicit shard_map composition (parallel/pallas_shard.py: splats-
    sharded projection -> all_gather -> tile-banded blend) when the view
    batch and splat capacity divide the mesh axes; otherwise falls back
    to GSPMD auto-partitioning of this function's graph."""

    if backend == "pallas" and mesh is not None:
        from ..parallel.mesh import SPLATS_AXIS, VIEWS_AXIS
        from ..parallel.pallas_shard import render_views_sharded
        from ..parallel.shardings import pad_to_multiple

        n_views = cams.view.shape[0]
        if n_views % mesh.shape[VIEWS_AXIS] == 0:
            # A splat count off the splats axis (e.g. the eval overlay
            # scene, adv.concat(frozen)) is padded with dead splats so
            # the shard_map path still applies.
            n_splats = scene.xyz.shape[0]
            ns = mesh.shape[SPLATS_AXIS]
            if n_splats % ns:
                scene = scene.pad_to(pad_to_multiple(n_splats, ns))
            return render_views_sharded(
                scene, cams, bg, mesh,
                pairs_per_gaussian=pairs_per_gaussian,
                max_chunks=max_chunks,
                pairs_budget=pairs_budget,
                interpret=jax.default_backend() == "cpu",
                rect_candidates=rect_candidates,
                compact_budget=compact_budget,
                tier_split=tier_split,
                heavy_budget=heavy_budget,
                band_tiles=band_tiles,
            )
        # A view batch off the views axis cannot take the shard_map
        # path, and a GSPMD-partitioned pallas custom call is unsupported
        # (crashes XLA fusion) — drop to the XLA blend for this call.
        backend = "xla"

    if backend == "pallas":
        from ..ops.project import project
        from ..ops.raster import rasterize_views

        proj = jax.vmap(lambda c: project(scene, c))(cams)
        return rasterize_views(
            proj, cams.width, cams.height, bg,
            pairs_per_gaussian=pairs_per_gaussian,
            max_chunks=max_chunks,
            backend="pallas",
            pairs_budget=pairs_budget,
            rect_candidates=rect_candidates,
            compact_budget=compact_budget,
            tier_split=tier_split,
            heavy_budget=heavy_budget,
            # compiled Mosaic needs a TPU; CPU (tests/dev) interprets
            interpret=jax.default_backend() == "cpu",
        )["render"]

    def one(cam):
        return render(
            scene,
            cam,
            bg,
            pairs_per_gaussian=pairs_per_gaussian,
            max_chunks=max_chunks,
            backend=backend,
            pairs_budget=pairs_budget,
            rect_candidates=rect_candidates,
        )["render"]

    return jax.vmap(one)(cams)


def expand_viewpoints(
    cameras: Sequence[CameraExtrinsics], add_cams: int
) -> list[CameraExtrinsics]:
    """Yaw-augmented extra viewpoints (`attack.py:404-415`)."""
    out = list(cameras)
    for i in range(1, add_cams):
        out.append(cameras[0].yaw(7 * i))
    return out


def run_dagger(
    scene: GaussianScene,
    cameras: Sequence[CameraExtrinsics],
    detector: Detector,
    cfg: AttackConfig,
    frozen_scene: Optional[GaussianScene] = None,
    attack_mask: Optional[np.ndarray] = None,
    log: Callable[[str], None] = print,
    mesh=None,
) -> AttackResult:
    """Run the DAGGER PGD attack. `scene` holds the attacked splats;
    `frozen_scene` (optional) is overlaid for the success-evaluation render
    (the reference's gaussians_original concat).

    With a `jax.sharding.Mesh` (axes "views", "splats"), the scene/original
    params shard over splats and each camera batch shards over views — the
    multi-chip layout the reference lacks (SURVEY §2.4); the batch size
    must divide by the views axis."""
    detector.load_model()
    originals = jax.tree_util.tree_map(jnp.array, scene.params())
    mask = None if attack_mask is None else jnp.asarray(attack_mask)
    shard_batch = lambda x: x
    if mesh is not None:
        from ..parallel.mesh import SPLATS_AXIS, VIEWS_AXIS
        from jax.sharding import NamedSharding, PartitionSpec as P

        splat_sh = NamedSharding(mesh, P(SPLATS_AXIS))
        originals = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, splat_sh), originals
        )
        scene = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, splat_sh)
            if hasattr(x, "ndim") and x.ndim >= 1
            else x,
            scene,
        )
        view_sh = NamedSharding(mesh, P(VIEWS_AXIS))
        shard_batch = lambda c: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, view_sh), c
        )

    cameras = list(cameras)
    if cfg.start_cam is not None or cfg.end_cam is not None:
        cameras = cameras[cfg.start_cam : cfg.end_cam]
    views = expand_viewpoints(cameras, cfg.add_cams)
    if cfg.batch_mode and cfg.batch_size > 0:
        rem = len(views) % cfg.batch_size
        if rem:
            log(f"[Info] Truncating {rem} camera(s) to a batch_size multiple.")
            views = views[: len(views) - rem]
    batch_size = cfg.batch_size if cfg.batch_mode else 1
    num_batches = (
        math.ceil(len(views) / batch_size) if cfg.batch_mode and batch_size else 1
    )

    built = [v.build() for v in views]
    assert len({(c.width, c.height) for c in built}) == 1, (
        "all attack views must share a resolution for batched rendering"
    )

    bg = (
        jnp.ones(3, jnp.float32)
        if cfg.white_background
        else jnp.zeros(3, jnp.float32)
    )
    black = jnp.zeros(3, jnp.float32)

    # Auto-size the static pair caps from the real binned geometry
    # (value -1): too-small caps silently drop pairs and oversize caps are
    # pure sort/pack bandwidth, so measure instead of guessing. Max over
    # all attack cameras -> one compile.
    if (
        cfg.pairs_per_gaussian < 0
        or cfg.pairs_budget < 0
        or cfg.rect_candidates < 0
        or cfg.compact_budget < 0
        or cfg.tier_split < 0
    ):
        from ..ops.project import project
        from ..ops.raster import (
            auto_compact_budget, auto_pair_caps, auto_pairs_budget,
            auto_pairs_per_gaussian,
        )

        # Probe the eval overlay scene too: success evaluation renders
        # adv.concat(frozen_scene), whose pair counts exceed the attacked
        # sub-scene's — sizing only the latter would silently truncate the
        # eval images in grouped mode.
        probe_scenes = [scene] + (
            [scene.concat(frozen_scene)] if frozen_scene is not None else []
        )
        projs = [
            (project(sc, c), c) for sc in probe_scenes for c in built
        ]
        if cfg.pairs_per_gaussian < 0 and cfg.rect_candidates < 0:
            caps = [auto_pair_caps(p, c.width, c.height) for p, c in projs]
            pairs = max(k for k, _ in caps)
            rect = max(r for _, r in caps)
            # rect == pairs is kept: the left-pack alone enables the
            # tiered bin (large scenes hit max-survivors == max-footprint);
            # zeroed below if tiering resolves to off.
            if rect < pairs:
                rect = 0
            cfg = dataclasses.replace(
                cfg, pairs_per_gaussian=pairs, rect_candidates=rect
            )
            log(
                f"[Info] Auto-sized pairs_per_gaussian = {pairs}, "
                f"rect_candidates = {rect}"
            )
        elif cfg.pairs_per_gaussian < 0:
            pairs = max(
                auto_pairs_per_gaussian(p, c.width, c.height)
                for p, c in projs
            )
            cfg = dataclasses.replace(cfg, pairs_per_gaussian=pairs)
            log(f"[Info] Auto-sized pairs_per_gaussian = {pairs}")
        elif cfg.rect_candidates < 0:
            cfg = dataclasses.replace(cfg, rect_candidates=0)
        if cfg.pairs_budget < 0:
            budget = max(
                auto_pairs_budget(
                    p, c.width, c.height, cfg.pairs_per_gaussian,
                    rect_candidates=cfg.rect_candidates,
                )
                for p, c in projs
            )
            cfg = dataclasses.replace(cfg, pairs_budget=budget)
            log(f"[Info] Auto-sized pairs_budget = {budget}")
        if cfg.compact_budget < 0:
            # PGD moves the splats, so keep the 1.25 drift margin.
            compact = max(
                auto_compact_budget(
                    p, c.width, c.height, cfg.pairs_per_gaussian,
                    margin=1.25, rect_candidates=cfg.rect_candidates,
                )
                for p, c in projs
            )
            cfg = dataclasses.replace(cfg, compact_budget=compact)
            log(f"[Info] Auto-sized compact_budget = {compact}")
        if cfg.tier_split < 0:
            from ..ops.raster import auto_tier_caps

            if 0 < cfg.pairs_per_gaussian <= cfg.rect_candidates:
                tcaps = [
                    auto_tier_caps(
                        p, c.width, c.height, cfg.pairs_per_gaussian,
                        cfg.rect_candidates,
                    )
                    for p, c in projs
                ]
                # One static config across views: the largest split keeps
                # tier A covering at least as much everywhere. The heavy
                # capacity must then be re-measured at THAT split for
                # EVERY view — a view whose own auto_tier_caps returned
                # (0, 0) still has heavy gaussians at the global split,
                # and undersizing hb silently drops their overflow pairs
                # during the attack (advisor r4).
                ts = max(t for t, _ in tcaps)
                if ts:
                    from ..ops.raster import auto_heavy_budget

                    hb = max(
                        auto_heavy_budget(
                            p, c.width, c.height, cfg.pairs_per_gaussian,
                            cfg.rect_candidates, ts,
                        )
                        for p, c in projs
                    )
                else:
                    hb = 0
            else:
                ts = hb = 0
            if ts == 0 and cfg.rect_candidates == cfg.pairs_per_gaussian:
                # identity left-pack with no tier: skip it
                cfg = dataclasses.replace(cfg, rect_candidates=0)
            cfg = dataclasses.replace(cfg, tier_split=ts, heavy_budget=hb)
            if ts:
                log(f"[Info] Auto-sized tier_split = {ts}, "
                    f"heavy_budget = {hb}")

    # ---- pair-balanced tile bands for the sharded render path: measure
    # per-tile-row pair costs over (a sample of) the attack views and let
    # the exact linear-partition planner pick the band heights, so a
    # skewed scene (object low in frame, sky empty) doesn't leave most
    # devices idle behind the hottest equal-height band (VERDICT r4 weak
    # #3 — the mechanism existed, production callers never passed it).
    band_tiles = None
    if mesh is not None and cfg.backend == "pallas":
        from ..ops.raster import TILE
        from ..parallel.mesh import SPLATS_AXIS
        from ..parallel.pallas_shard import (
            measure_tile_row_costs, plan_bands,
        )

        ns = mesh.shape[SPLATS_AXIS]
        tiles_y = (built[0].height + TILE - 1) // TILE
        if 1 < ns <= tiles_y:
            from ..ops.project import project as _project

            sample = built[:: max(1, len(built) // 4)][:4]
            costs = sum(
                measure_tile_row_costs(
                    _project(scene, c), c.width, c.height,
                    cfg.pairs_per_gaussian, cfg.rect_candidates,
                )
                for c in sample
            )
            band_tiles = plan_bands(costs, ns)
            log(f"[Info] Pair-balanced tile bands: {band_tiles}")

    # ---- benign pass: silhouette GT boxes on black bg (attack.py:433-461)
    @jax.jit
    def benign_bbox(cam):
        out = render(
            scene,
            cam,
            black,
            pairs_per_gaussian=cfg.pairs_per_gaussian,
            max_chunks=cfg.max_chunks,
            backend=cfg.backend,
            pairs_budget=cfg.pairs_budget,
            rect_candidates=cfg.rect_candidates,
            interpret=jax.default_backend() == "cpu",
        )
        return silhouette_bbox(out["render"]), out["num_truncated_pairs"]

    bb = [benign_bbox(c) for c in built]
    gt_bboxes = np.stack([np.asarray(b) for b, _ in bb])
    n_trunc = sum(int(t) for _, t in bb)
    if n_trunc:
        log(
            f"[Warning] {n_trunc} valid pairs truncated by "
            "pairs_budget/max_chunks across the benign renders — images are "
            "missing contributions; raise pairs_budget or max_chunks."
        )

    # ---- the jitted attack step: batched render -> detector loss -> grads
    target_idx = cfg.target if cfg.target is not None else 0

    def loss_fn(params, cams, bboxes):
        sc = scene.with_params(params)
        imgs = render_views(
            sc, cams, bg, cfg.pairs_per_gaussian, cfg.max_chunks,
            cfg.backend, cfg.pairs_budget, cfg.rect_candidates, mesh,
            cfg.compact_budget, cfg.tier_split, cfg.heavy_budget,
            band_tiles=band_tiles,
        )
        return detector.loss(imgs, target_idx, bboxes)

    @jax.jit
    def attack_step(params, cams, bboxes):
        # ONE dispatch per PGD iteration (grad + step fused): a separate
        # grad_fn/step_fn pair pays two host->device round-trips per iter
        # on the tunneled chip.
        loss, grads = jax.value_and_grad(loss_fn)(params, cams, bboxes)
        sc = scene.with_params(params)
        sc = pgd_attack_step(
            sc,
            grads,
            originals,
            cfg.alpha,
            cfg.epsilon,
            cfg.attributes,
            cfg.norm,
            cfg.is_targeted,
            mask,
        )
        return sc.params(), loss

    params = jax.tree_util.tree_map(jnp.array, scene.params())
    pending = list(range(len(built)))
    pending_boxes = list(gt_bboxes)
    losses: list[float] = []
    per_view_success: list[bool] = []
    it = 0
    start_it = 0
    all_done = False

    ckpt_path = (
        os.path.join(cfg.checkpoint_dir, "attack_state.npz")
        if cfg.checkpoint_dir
        else None
    )
    if cfg.resume and ckpt_path and os.path.exists(ckpt_path):
        with np.load(ckpt_path, allow_pickle=False) as z:
            params = {k[2:]: jnp.asarray(z[k]) for k in z.files if k.startswith("p_")}
            pending = [int(v) for v in z["pending"]]
            pending_boxes = list(z["pending_boxes"])
            start_it = int(z["iteration"]) + 1
            losses = [float(v) for v in z["losses"]]
        log(f"[resume] iteration {start_it}, {len(pending)} views pending")

    def save_ckpt(iteration):
        if not ckpt_path:
            return
        os.makedirs(cfg.checkpoint_dir, exist_ok=True)
        np.savez(
            ckpt_path,
            **{f"p_{k}": np.asarray(v) for k, v in params.items()},
            pending=np.asarray(pending, np.int64),
            pending_boxes=np.asarray(
                pending_boxes if pending_boxes else np.zeros((0, 4))
            ),
            iteration=iteration,
            losses=np.asarray(losses, np.float64),
        )

    for it in range(start_it, cfg.max_iters * num_batches):
        if cfg.batch_mode and not pending:
            break
        if cfg.batch_mode and (it + 1) % cfg.max_iters == 0:
            log(
                f"[Info] Per-batch budget of {cfg.max_iters} iterations hit; "
                "moving to next batch."
            )
            pending = pending[batch_size:]
            pending_boxes = pending_boxes[batch_size:]
            continue

        cur = pending[:batch_size] if cfg.batch_mode else pending[:1]
        cur_boxes = np.stack(pending_boxes[: len(cur)])
        cams = shard_batch(stack_cameras([built[i] for i in cur]))

        params, loss = attack_step(params, cams, jnp.asarray(cur_boxes))
        losses.append(float(loss))
        log(f"Iteration: {it}, Loss: {float(loss)}")

        if (it % cfg.eval_every) == 0:
            # ---- success evaluation on the overlay scene (attack.py:513-600)
            adv = scene.with_params(params)
            eval_scene = (
                adv.concat(frozen_scene) if frozen_scene is not None else adv
            )
            eval_imgs = np.asarray(
                render_views(
                    eval_scene, cams, bg, cfg.pairs_per_gaussian,
                    cfg.max_chunks, cfg.backend, cfg.pairs_budget,
                    cfg.rect_candidates, mesh,
                    band_tiles=band_tiles,
                )  # eval is forward-only: the compact cap is a bwd knob
            )
            successes = []
            for j, vi in enumerate(cur):
                path = (
                    os.path.join(cfg.preds_dir, f"render_it{it}_c{j}.png")
                    if cfg.preds_dir
                    else None
                )
                ok = detector.predict_and_save(
                    image=eval_imgs[j],
                    path=path,
                    target=cfg.target,
                    untarget=cfg.untarget,
                    is_targeted=cfg.is_targeted,
                    threshold=cfg.attack_conf_thresh,
                    gt_bbox=cur_boxes[j],
                )
                successes.append(bool(ok))
            n_ok = sum(successes)
            log(f"Successes: {n_ok}/{len(cur)}")
            if n_ok >= len(cur) - (1 if cfg.batch_mode and len(cur) > 1 else 0):
                per_view_success.extend(successes)
                pending = pending[len(cur) :]
                pending_boxes = pending_boxes[len(cur) :]
                if not pending:
                    all_done = True
                    log("All camera viewpoints attacked successfully")
                    break

        # Checkpoint AFTER the success eval pruned `pending`: saving before
        # it would make a resume replay views already recorded successful at
        # this iteration, diverging from an uninterrupted run.
        if ckpt_path and it > 0 and it % cfg.checkpoint_every == 0:
            save_ckpt(it)

    final = scene.with_params(params)
    ply_path = None
    if all_done and cfg.save_ply:
        from ..io.ply import save_scene_ply

        ply_path = os.path.join(
            cfg.output_dir, f"{cfg.scene_name}_adv_{cfg.detector_name}.ply"
        )
        log(f"saving gaussians to {ply_path}")
        save_scene_ply(final, ply_path)
    return AttackResult(
        scene=final,
        success=all_done,
        iterations=it + 1,
        losses=losses,
        per_view_success=per_view_success,
        adv_ply_path=ply_path,
    )
