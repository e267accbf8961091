"""Benchmark: fwd+bwd rasterization throughput on the flagship pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md: "published": {}), so
vs_baseline is reported against this repo's own north-star bookkeeping
(1.0 = the recorded value itself). Diagnostics go to stderr.

Runs on whatever JAX platform the environment provides (the driver runs it
on one real TPU chip). Scene: synthetic nyc_block-scale cloud (default
100k splats, SH degree 3, 800x800) — the real asset PLYs are git-LFS stubs
in the reference snapshot.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_problem(n_points: int, width: int, height: int, sh_degree: int):
    import jax.numpy as jnp

    from gsattack.core import make_camera, scene_from_points

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n_points, 3)).astype(np.float32)
    pts = pts * np.array([2.0, 2.0, 1.0]) + np.array([0.0, 0.0, 6.0])
    cols = rng.uniform(0.05, 0.95, size=(n_points, 3))
    # Realistic footprint: small per-point scales so tile occupancy mirrors a
    # trained scene rather than a wall of screen-filling splats.
    knn = np.full(n_points, 1e-4, np.float32)
    scene = scene_from_points(pts, cols, max_sh_degree=sh_degree, knn_dist2=knn)
    scene = scene.replace(
        active_sh_degree=sh_degree,
        f_rest=jnp.asarray(
            rng.normal(size=scene.f_rest.shape).astype(np.float32) * 0.02
        ),
        opacity_logit=jnp.asarray(
            rng.normal(size=(n_points, 1)).astype(np.float32)
        ),
    )
    cam = make_camera(
        np.eye(3), np.zeros(3), 1.0, 1.0 * height / width, width, height
    )
    return scene, cam


def bench_fwd_bwd(scene, cam, iters: int, pairs: int, chunk: int, max_chunks: int, backend: str = "xla", pairs_budget: int = 0, with_objects: bool = False, rect: int = 0, compact_budget: int = 0, tier=(0, 0)):
    import jax
    import jax.numpy as jnp

    from gsattack.render import render

    bg = jnp.zeros(3)
    target = jnp.zeros((cam.height, cam.width, 3))

    def loss_fn(params):
        sc = scene.with_params(params)
        out = render(
            sc, cam, bg, pairs_per_gaussian=pairs, chunk=chunk,
            max_chunks=max_chunks, backend=backend, pairs_budget=pairs_budget,
            with_objects=with_objects, rect_candidates=rect,
            compact_budget=compact_budget,
            tier_split=tier[0], heavy_budget=tier[1],
        )
        return jnp.mean((out["render"] - target) ** 2)

    # eps (a per-iteration 1e-30 that rounds away against f32 positions)
    # defeats the axon result cache, which returns repeated identical
    # calls instantly and would fake the throughput.
    vg = jax.jit(lambda p, eps: jax.value_and_grad(loss_fn)(
        {**p, "xyz": p["xyz"] + eps}))
    params = scene.params()
    t0 = time.perf_counter()
    loss, grads = vg(params, jnp.float32(0.0))
    jax.block_until_ready(grads)
    log(f"first fwd+bwd (compile + run): {time.perf_counter() - t0:.1f}s, loss={float(loss):.6f}")

    # pre-upload the eps scalars so no host->device transfer rides the
    # loop; clock-salted so no other bench PROCESS ever issued the same
    # calls (the axon result cache is cross-process).
    salt0 = (time.time_ns() % (1 << 20)) * 1e-38
    eps_seq = jax.block_until_ready(
        [jnp.float32((i + 1) * 1e-30 + salt0) for i in range(iters)])
    # At near-HBM-capacity scales (8M splats RGB) two pipelined frames'
    # live buffers overlap and OOM where one frame fits; serialize the
    # loop there (the per-iter block costs ~ms against a multi-second
    # frame, and capacity anchoring beats dispatch-gap purity).
    serialize = os.environ.get("GSATTACK_BENCH_SERIALIZE", "") == "1"
    t0 = time.perf_counter()
    for e in eps_seq:
        if serialize:
            grads = None  # free last frame's ~2 GB grad pytree first
        loss, grads = vg(params, e)
        if serialize:
            jax.block_until_ready(grads)
    jax.block_until_ready(grads)
    dt = time.perf_counter() - t0
    mpix = cam.width * cam.height * iters / dt / 1e6
    log(f"fwd+bwd: {iters} iters in {dt:.3f}s -> {mpix:.2f} Mpix/s")

    if serialize:
        # The scan companion fuses the whole loop into one executable and
        # needs ~2 frames of live buffers — exactly what the serialized
        # mode exists to avoid at capacity scales.
        return mpix, mpix

    # Production-loop shape: a lax.scan over the same iters inside ONE
    # dispatch (how a training/attack loop that doesn't inspect per-iter
    # values runs) — isolates pure device throughput from the ~2 ms/iter
    # host dispatch gap of the python loop above. Reported as a companion
    # field; the headline stays the dispatch-inclusive number.
    def scan_body(p_base, i):
        p, base = p_base
        l, g = jax.value_and_grad(loss_fn)(
            {**p, "xyz": p["xyz"] + base + (i + 1).astype(jnp.float32) * 1e-30})
        # consume EVERY grad element: an unused g would let XLA dead-code
        # the whole backward out of the scan
        gsum = sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(g))
        # 1e-30 (not 0.0) so no algebraic simplification can erase it
        return (p, base), l + 1e-30 * gsum

    # `base` must differ between warmup and timed call AND between bench
    # processes: the axon result cache is cross-process, and a constant
    # 1e-30 replayed an earlier run's scan in 1 ms (bogus 10939 Mpix/s,
    # r4) — derive it from the clock.
    scan_fn = jax.jit(lambda p, base: jax.lax.scan(
        scan_body, (p, base), jnp.arange(iters))[1])
    salt = (time.time_ns() % (1 << 20)) * 1e-38
    ls = jax.block_until_ready(scan_fn(params, jnp.float32(salt)))
    t0 = time.perf_counter()
    ls = jax.block_until_ready(scan_fn(params, jnp.float32(2 * salt + 1e-38)))
    dt = time.perf_counter() - t0
    mpix_scan = cam.width * cam.height * iters / dt / 1e6
    log(f"fwd+bwd scan: {iters} iters in {dt:.3f}s -> {mpix_scan:.2f} Mpix/s")
    return mpix, mpix_scan


def bench_forward(scene, cam, iters: int, pairs: int, chunk: int, max_chunks: int, backend: str = "xla", pairs_budget: int = 0, with_objects: bool = False, rect: int = 0):
    import jax
    import jax.numpy as jnp

    from gsattack.render import render

    bg = jnp.zeros(3)

    @jax.jit
    def fwd(params, eps):
        # eps: inert per-iteration nudge to defeat the axon result cache
        sc = scene.with_params({**params, "xyz": params["xyz"] + eps})
        return render(
            sc, cam, bg, pairs_per_gaussian=pairs, chunk=chunk,
            max_chunks=max_chunks, backend=backend, pairs_budget=pairs_budget,
            with_objects=with_objects, rect_candidates=rect,
        )["render"]

    params = scene.params()
    img = jax.block_until_ready(fwd(params, jnp.float32(0.0)))
    _salt = (time.time_ns() % (1 << 20)) * 1e-38  # cross-process cache foil
    eps_seq = jax.block_until_ready(
        [jnp.float32((i + 1) * 1e-30 + _salt) for i in range(iters)])
    t0 = time.perf_counter()
    for e in eps_seq:
        img = fwd(params, e)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    mpix = cam.width * cam.height * iters / dt / 1e6
    log(f"forward: {iters} iters in {dt:.3f}s -> {mpix:.2f} Mpix/s")
    return mpix


def bench_train(scene, cam, iters: int, pairs: int, max_chunks: int,
                backend: str, pairs_budget: int, rect: int,
                compact_budget: int, tier=(0, 0), use_mesh: bool = False):
    """3DGS training-step throughput (the CLOAK retraining workload,
    BASELINE config #5's core loop): full render -> dssim+l1 -> grads ->
    per-group Adam -> densify stats, one jitted step per iteration.
    Densification is scheduled outside the timed window so one graph is
    measured (the trainer re-jits on capacity growth anyway).

    `use_mesh=True` shards the whole TrainState over a (1, n_devices)
    splats mesh (GSPMD partitions every step) — the training-scaling
    harness (BASELINE: >=80% efficiency 1 chip -> multi-chip). On one
    real chip this measures sharding overhead ~ 1x; it becomes a real
    scaling number the day a multi-chip slice is attached, and on the
    virtual CPU mesh it exercises the harness itself (VERDICT r4 #7)."""
    import jax
    import jax.numpy as jnp

    from gsattack.render import render
    from gsattack.train.trainer import TrainConfig, Trainer

    mesh = None
    if use_mesh:
        from gsattack.parallel import make_mesh

        mesh = make_mesh((1, len(jax.devices())))
        log(f"train mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    cfg = TrainConfig(
        iterations=iters,
        densify_from_iter=10**9,  # keep the timed window on one graph
        sh_increase_interval=10**9,
        backend=backend,
        pairs_per_gaussian=pairs,
        max_chunks=max_chunks,
        pairs_budget=pairs_budget,
        rect_candidates=rect,
        compact_budget=compact_budget,
        tier_split=tier[0],
        heavy_budget=tier[1],
    )
    trainer = Trainer(scene, cfg, mesh=mesh)
    # GT: the scene rendered with a nudged opacity — a realistic non-zero
    # loss surface instead of a black target.
    gt = render(
        scene.replace(opacity_logit=scene.opacity_logit + 0.1), cam,
        jnp.zeros(3), pairs_per_gaussian=pairs, max_chunks=max_chunks,
        backend=backend, pairs_budget=pairs_budget, rect_candidates=rect,
    )["render"]
    gt = jax.block_until_ready(gt)

    t0 = time.perf_counter()
    loss = trainer.train_step(cam, gt)
    log(f"first train step (compile + run): {time.perf_counter() - t0:.1f}s,"
        f" loss={loss:.6f}")
    t0 = time.perf_counter()
    for _ in range(iters):
        loss = trainer.train_step(cam, gt)
    dt = time.perf_counter() - t0
    log(f"train: {iters} iters in {dt:.3f}s -> {iters / dt:.2f} it/s "
        f"(loss {loss:.6f})")
    return iters / dt


def check_parity(scene, cam, pairs, chunk, max_chunks, pairs_budget,
                 with_objects, rect: int = 0, compact_budget: int = 0,
                 tier=(0, 0)):
    """Compiled pallas vs XLA fwd + grads on the bench scene (VERDICT r2
    item 6): the driver loop runs this every round, so a Mosaic regression
    ships loudly instead of silently. Returns (max_rel_err, ok)."""
    import jax
    import jax.numpy as jnp

    from gsattack.render import render

    bg = jnp.zeros(3)
    target = jnp.zeros((cam.height, cam.width, 3))

    def loss_fn(params, backend, budget):
        sc = scene.with_params(params)
        out = render(
            sc, cam, bg, pairs_per_gaussian=pairs, chunk=chunk,
            max_chunks=max_chunks, backend=backend, pairs_budget=budget,
            with_objects=with_objects, rect_candidates=rect,
            compact_budget=compact_budget if backend == "pallas" else 0,
            # BOTH backends get the tier caps: the tiered bin reorders
            # quantized-depth ties, and the gate must compare identical
            # pair orders (ties are pointwise-visible, not epsilon).
            tier_split=tier[0], heavy_budget=tier[1],
        )
        return jnp.mean((out["render"] - target) ** 2), out["render"]

    params = scene.params()
    vg = jax.jit(jax.value_and_grad(loss_fn, has_aux=True),
                 static_argnames=("backend", "budget"))
    (_, img_p), g_p = vg(params, backend="pallas", budget=pairs_budget)
    (_, img_x), g_x = vg(params, backend="xla", budget=0)
    img_err = float(jnp.abs(img_p - img_x).max())
    max_rel = img_err  # image is O(1)
    for k in g_p:
        scale = float(jnp.abs(g_x[k]).max())
        if scale == 0.0:
            continue
        err = float(jnp.abs(g_p[k] - g_x[k]).max()) / scale
        max_rel = max(max_rel, err)
    ok = max_rel < 1e-3
    log(f"parity pallas-vs-xla: max rel err {max_rel:.2e} image err "
        f"{img_err:.2e} -> {'OK' if ok else 'FAIL'}")
    return max_rel, ok


def bench_fwd_bwd_views(scene, cam, iters: int, pairs: int, max_chunks: int,
                        views: int, pairs_budget: int, with_objects: bool,
                        rect: int = 0):
    """Multi-view batched fwd+bwd: ONE (views, tiles)-grid pallas launch
    per step — the amortized path DAGGER uses for its camera batches."""
    import jax
    import jax.numpy as jnp

    from gsattack.core import make_camera, stack_cameras
    from gsattack.ops.project import project
    from gsattack.ops.raster import rasterize_views

    cams = stack_cameras([
        make_camera(np.eye(3), np.array([0.0, 0.0, 0.05 * i]), 1.0,
                    cam.height / cam.width, cam.width, cam.height)
        for i in range(views)
    ])
    bg = jnp.zeros(3)
    target = jnp.zeros((views, cam.height, cam.width, 3))

    def loss_fn(params):
        sc = scene.with_params(params)
        proj = jax.vmap(lambda c: project(sc, c))(cams)
        out = rasterize_views(
            proj, cam.width, cam.height, bg, pairs_per_gaussian=pairs,
            max_chunks=max_chunks, backend="pallas",
            pairs_budget=pairs_budget, with_objects=with_objects,
            rect_candidates=rect,
        )
        return jnp.mean((out["render"] - target) ** 2)

    # eps: inert per-iteration nudge to defeat the axon result cache
    vg = jax.jit(lambda p, eps: jax.value_and_grad(loss_fn)(
        {**p, "xyz": p["xyz"] + eps}))
    params = scene.params()
    t0 = time.perf_counter()
    loss, grads = vg(params, jnp.float32(0.0))
    jax.block_until_ready(grads)
    log(f"first batched fwd+bwd (compile + run): {time.perf_counter() - t0:.1f}s")
    _salt = (time.time_ns() % (1 << 20)) * 1e-38  # cross-process cache foil
    eps_seq = jax.block_until_ready(
        [jnp.float32((i + 1) * 1e-30 + _salt) for i in range(iters)])
    t0 = time.perf_counter()
    for e in eps_seq:
        loss, grads = vg(params, e)
    jax.block_until_ready(grads)
    dt = time.perf_counter() - t0
    mpix = cam.width * cam.height * views * iters / dt / 1e6
    log(f"batched fwd+bwd: {iters} x {views} views in {dt:.3f}s -> {mpix:.2f} Mpix/s")
    return mpix


def bench_bisect(scene, cam, iters: int, pairs: int, max_chunks: int,
                 pairs_budget: int, with_objects: bool, rect: int = 0):
    """Cumulative-prefix timing of the REAL fwd+bwd pipeline from params:
    unlike `stages` (isolated pieces fed device constants), each step here
    jits a growing prefix of the actual loss graph, so consecutive deltas
    include XLA's cross-stage fusion/scheduling — the numbers add up to
    the end-to-end figure and localize glue costs `stages` cannot see."""
    import jax
    import jax.numpy as jnp

    from gsattack.ops.pallas_blend import GEOM_W, pack_pairs, pallas_blend_views
    from gsattack.ops.project import project
    from gsattack.ops.raster import TILE, bin_gaussians, rasterize
    from gsattack.render import render

    params = scene.params()
    tiles_x = (cam.width + TILE - 1) // TILE
    tiles_y = (cam.height + TILE - 1) // TILE

    def timed(name, fn):
        # The axon runtime caches results keyed on input buffers: repeated
        # identical calls return instantly and fake the timing. Thread a
        # per-iteration epsilon (1e-30 rounds away against f32 positions,
        # so the compiled graph and outputs are unchanged) to force a
        # distinct cache key every call.
        def perturbed(p, eps):
            return fn({**p, "xyz": p["xyz"] + eps})

        jfn = jax.jit(perturbed)
        out = jax.block_until_ready(jfn(params, jnp.float32(0.0)))
        eps_seq = jax.block_until_ready(
            [jnp.float32((i + 1) * 1e-30
                          + (time.time_ns() % (1 << 20)) * 1e-38)
             for i in range(iters)])
        t0 = time.perf_counter()
        for e in eps_seq:
            out = jfn(params, e)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        log(f"bisect {name}: {dt:.2f} ms")
        return dt

    def proj_of(p):
        return project(scene.with_params(p), cam)

    def bins_of(p):
        pr = proj_of(p)
        return pr, bin_gaussians(
            pr.mean2d, pr.depth, pr.radius_tight, cam.width, cam.height,
            pairs, conic=pr.conic, opacity=pr.opacity, rect_candidates=rect,
        )

    def packed_of(p):
        pr, bins = bins_of(p)
        channels = (
            jnp.concatenate([pr.color, pr.obj], axis=-1)
            if with_objects else pr.color
        )
        geom = jnp.concatenate(
            [pr.mean2d, pr.conic, pr.opacity[:, None],
             jnp.zeros((pr.mean2d.shape[0], GEOM_W - 6), jnp.float32)],
            axis=-1,
        )
        return pack_pairs(
            geom, channels, bins.gauss_idx, bins.tile_start, bins.tile_end,
            budget=pairs_budget,
        )

    def blend_of(p):
        pk, ps, pe, ch_pad, _ = packed_of(p)
        return pallas_blend_views(
            pk[None], ps[None], pe[None], tiles_x, tiles_y, max_chunks, False
        )

    def full_of(p):
        out = render(
            scene.with_params(p), cam, jnp.zeros(3), pairs_per_gaussian=pairs,
            max_chunks=max_chunks, backend="pallas", pairs_budget=pairs_budget,
            with_objects=with_objects, rect_candidates=rect,
        )
        return jnp.mean(out["render"] ** 2)

    # forward-only prefixes
    timed("fwd proj", lambda p: proj_of(p).mean2d)
    timed("fwd +bins", lambda p: bins_of(p)[1].gauss_idx)
    timed("fwd +pack", lambda p: packed_of(p)[0])
    timed("fwd +blend", blend_of)
    timed("fwd full(loss)", full_of)
    # fwd+bwd prefixes (grad via mean-of-output cotangent)
    timed("f+b proj", jax.grad(lambda p: jnp.mean(proj_of(p).mean2d)
                               + jnp.mean(proj_of(p).color)))
    timed("f+b +pack", jax.grad(lambda p: jnp.mean(packed_of(p)[0])))
    timed("f+b +blend", jax.grad(lambda p: jnp.mean(blend_of(p))))
    timed("f+b full", jax.grad(full_of))


def bench_stages(scene, cam, iters: int, pairs: int, max_chunks: int,
                 pairs_budget: int, with_objects: bool, rect: int = 0):
    """Per-stage timing of the pallas pipeline (fwd+bwd where meaningful):
    projection, binning+sort, pack, blend kernel. Guides optimization."""
    import jax
    import jax.numpy as jnp

    from gsattack.ops.pallas_blend import GEOM_W, pack_pairs, pallas_blend_views
    from gsattack.ops.project import project
    from gsattack.ops.raster import TILE, bin_gaussians

    params = scene.params()
    tiles_x = (cam.width + TILE - 1) // TILE
    tiles_y = (cam.height + TILE - 1) // TILE

    def timed(name, fn, *args):
        # Defeat the axon result cache (repeated identical inputs return
        # instantly): nudge the first float operand by a per-iteration
        # 1e-30 that rounds away against its f32 values, so every call
        # has a fresh cache key but an identical compiled graph + output.
        def perturb(a, eps):
            if isinstance(a, dict):
                return {**a, "xyz": a["xyz"] + eps}
            assert jnp.issubdtype(a.dtype, jnp.floating), a.dtype
            return a + eps

        jfn = jax.jit(lambda eps, a0, *rest: fn(perturb(a0, eps), *rest))
        out = jax.block_until_ready(jfn(jnp.float32(0.0), *args))
        eps_seq = jax.block_until_ready(
            [jnp.float32((i + 1) * 1e-30
                          + (time.time_ns() % (1 << 20)) * 1e-38)
             for i in range(iters)])
        t0 = time.perf_counter()
        for e in eps_seq:
            out = jfn(e, *args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        log(f"stage {name}: {dt:.2f} ms")
        return out, dt

    # projection fwd+bwd
    def proj_loss(p):
        pr = project(scene.with_params(p), cam)
        return jnp.sum(pr.mean2d * 1e-6) + jnp.sum(pr.color * 1e-6)

    timed("project fwd+bwd", jax.jit(jax.grad(proj_loss)), params)

    proj = jax.block_until_ready(jax.jit(
        lambda p: project(scene.with_params(p), cam))(params))

    def bins_fn(m, d, r, con, op):
        b = bin_gaussians(m, d, r, cam.width, cam.height, pairs,
                          conic=con, opacity=op, rect_candidates=rect)
        return b.gauss_idx, b.tile_start, b.tile_end

    (gidx, ts, te), _ = timed(
        "bin+sort", jax.jit(bins_fn), proj.mean2d, proj.depth,
        proj.radius_tight, proj.conic, proj.opacity,
    )

    channels = (
        jnp.concatenate([proj.color, proj.obj], axis=-1)
        if with_objects else proj.color
    )
    geom = jnp.concatenate(
        [proj.mean2d, proj.conic, proj.opacity[:, None],
         jnp.zeros((proj.mean2d.shape[0], GEOM_W - 6), jnp.float32)], axis=-1,
    )

    def pack_loss(g, c):
        pk, ps, pe, _, _ = pack_pairs(g, c, gidx, ts, te, budget=pairs_budget)
        return jnp.sum(pk * 1e-6), (pk, ps, pe)

    grad_pack = jax.jit(jax.grad(lambda g, c: pack_loss(g, c)[0], argnums=(0, 1)))
    timed("pack fwd+bwd", grad_pack, geom, channels)
    packed, ps, pe = jax.jit(lambda g, c: pack_loss(g, c)[1])(geom, channels)

    def blend_loss(pk):
        out = pallas_blend_views(
            pk[None], ps[None], pe[None], tiles_x, tiles_y, max_chunks, False
        )
        return jnp.sum(out * 1e-6)

    timed("blend fwd", jax.jit(
        lambda pk: pallas_blend_views(
            pk[None], ps[None], pe[None], tiles_x, tiles_y, max_chunks, False
        )), packed)
    timed("blend fwd+bwd", jax.jit(jax.grad(blend_loss)), packed)


def bench_pgd(scene, cam, iters: int, pairs: int, chunk: int, max_chunks: int,
              backend: str = "xla", batch: int = 2, pairs_budget: int = 0,
              use_mesh: bool = False, rect: int = 0, detector: str = "toy",
              det_weights: str = "", compact_budget: int = 0, tier=(0, 0),
              yaw_aug: bool = False):
    """End-to-end DAGGER PGD iterations/s: batched multi-view render ->
    detector loss -> grads -> color-l2 step (the BASELINE.md attack-speed
    metric). `detector` picks the frozen scoring head: the default toy
    conv net, or any zoo name (yolov8 etc.) for a reference-comparable
    number with the real detection-loss graph in the PGD loop."""
    import jax
    import jax.numpy as jnp

    from gsattack.attack.pgd import pgd_attack_step
    from gsattack.core import make_camera, stack_cameras
    from gsattack.models import ToyDetector, load_detector
    from gsattack.render import render

    det = (ToyDetector(num_classes=8) if detector == "toy"
           else load_detector(detector, weights=det_weights))
    det.load_model()
    if detector != "toy" and not det_weights:
        log(f"NOTE: {detector} runs on seeded random init (no --det-weights"
            " given) — timing is representative, loss values are not.")
    if yaw_aug:
        # The reference's add_cams shape (`attack.py:404-415` via
        # expand_viewpoints): base view + yaw(7 deg * i) augmentations,
        # so the batch renders genuinely different geometry per view.
        from gsattack.core.camera import CameraExtrinsics

        base = CameraExtrinsics(
            np.eye(3), np.array([0.0, 0.0, 0.0]), 1.0,
            cam.height / cam.width, cam.width, cam.height,
        )
        cams = stack_cameras(
            [base.build()]
            + [base.yaw(7.0 * i).build() for i in range(1, batch)]
        )
    else:
        cams = stack_cameras(
            [
                make_camera(np.eye(3), np.array([0.0, 0.0, 0.05 * i]), 1.0,
                            cam.height / cam.width, cam.width, cam.height)
                for i in range(batch)
            ]
        )
    bg = jnp.zeros(3)
    bboxes = jnp.tile(
        jnp.array([[cam.width * 0.25, cam.height * 0.25, cam.width * 0.75,
                    cam.height * 0.75]], jnp.float32), (batch, 1),
    )
    originals = scene.params()

    mesh = None
    if use_mesh:
        # Scaling machinery (BASELINE.md: >=80% efficiency to multi-chip):
        # views-DP over the camera batch + splats sharding of the scene.
        # backend=pallas runs the shard_map composition
        # (parallel/pallas_shard.py); batch % views_axis == 0 required.
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from gsattack.parallel import make_mesh
        from gsattack.parallel.mesh import SPLATS_AXIS, VIEWS_AXIS
        import math as _math

        n_dev = len(_jax.devices())
        views_axis = _math.gcd(batch, n_dev)
        mesh = make_mesh((views_axis, n_dev // views_axis))
        log(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
        splat_sh = NamedSharding(mesh, P(SPLATS_AXIS))
        scene = _jax.tree_util.tree_map(
            lambda x: _jax.device_put(x, splat_sh)
            if hasattr(x, "ndim") and x.ndim >= 1 else x,
            scene,
        )
        originals = _jax.tree_util.tree_map(
            lambda x: _jax.device_put(x, splat_sh), originals
        )
        cams = _jax.tree_util.tree_map(
            lambda x: _jax.device_put(x, NamedSharding(mesh, P(VIEWS_AXIS))), cams
        )

    from gsattack.attack.dagger import render_views

    def loss_fn(params):
        sc = scene.with_params(params)
        if mesh is not None and backend == "pallas":
            from gsattack.parallel.pallas_shard import render_views_sharded

            imgs = render_views_sharded(
                sc, cams, bg, mesh, pairs_per_gaussian=pairs,
                max_chunks=max_chunks, pairs_budget=pairs_budget,
                interpret=jax.default_backend() == "cpu",
                compact_budget=compact_budget,
                tier_split=tier[0], heavy_budget=tier[1],
            )
        else:
            imgs = render_views(sc, cams, bg, pairs, max_chunks, backend,
                                pairs_budget, rect,
                                compact_budget=compact_budget,
                                tier_split=tier[0], heavy_budget=tier[1])
        return det.loss(imgs, 2, bboxes)

    @jax.jit
    def pgd_iter(params):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        sc = pgd_attack_step(
            scene.with_params(params), grads, originals, 0.5, 5.0,
            ("color",), "l2", True,
        )
        return sc.params(), loss

    params = scene.params()
    t0 = time.perf_counter()
    params, loss = pgd_iter(params)
    jax.block_until_ready(loss)
    log(f"first pgd iter (compile + run): {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(iters):
        params, loss = pgd_iter(params)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    ips = iters / dt
    log(f"pgd: {iters} iters ({batch} views each) in {dt:.3f}s -> {ips:.3f} it/s")
    return ips


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-points", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--sh-degree", type=int, default=3)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--pairs", type=int, default=-1,
                    help="-1: auto (measured max tile footprint)")
    ap.add_argument("--rect", type=int, default=-1,
                    help="rect_candidates for row compaction; -1: auto "
                         "(measured), 0: disabled")
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--max-chunks", type=int, default=16)
    ap.add_argument("--forward-only", action="store_true")
    ap.add_argument("--backend", default="pallas", choices=["xla", "pallas"])
    ap.add_argument("--pairs-budget", type=int, default=-1, help="-1: auto (4*n_points, pallas only)")
    ap.add_argument("--compact-budget", type=int, default=-1,
                    help="pair-indexed backward scatter capacity; -1: auto "
                         "(measured valid pairs * margin), 0: off")
    ap.add_argument("--tier-split", type=int, default=-1,
                    help="tiered-bin split c1; -1: auto (measured survivor "
                         "histogram, off when unprofitable), 0: off")
    ap.add_argument("--heavy-budget", type=int, default=-1,
                    help="tiered-bin heavy-gaussian capacity; -1: auto")
    ap.add_argument("--mode", default="raster",
                    choices=["raster", "raster-views", "pgd", "stages",
                             "bisect", "scale", "train"])
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--objects", action="store_true", help="blend the 16 grouping channels too")
    ap.add_argument("--mesh", action="store_true", help="shard PGD over a (views, splats) mesh (multi-device)")
    ap.add_argument("--detector", default="toy",
                    help="pgd mode scoring head: toy (default) or a zoo "
                         "name (yolov3/yolov5/yolov8/yolov11/detectron2/detr)"
                         "; without --det-weights zoo heads run on seeded "
                         "random init (timing-representative only)")
    ap.add_argument("--det-weights", default="",
                    help="converted checkpoint (.npz) for --detector")
    ap.add_argument("--yaw-aug", action="store_true",
                    help="PGD camera batch = base + yaw(7*i) augmentations "
                         "(the reference's add_cams shape) instead of "
                         "translated copies")
    ap.add_argument("--parity", dest="parity", action="store_true",
                    default=None, help="gate compiled pallas vs XLA parity")
    ap.add_argument("--no-parity", dest="parity", action="store_false")
    ap.add_argument("--no-scale-probe", dest="scale_probe",
                    action="store_false", default=True,
                    help="skip the 500k@1600x1200 scale probe + PGD line "
                         "appended to the default raster record")
    args = ap.parse_args()

    # Fail fast when the axon relay is down: jax.devices() would HANG
    # (not error) with the tunnel ports closed, wedging the caller.
    # Probe the device-enumeration port before touching jax.
    import os
    import socket
    import sys as _sys

    cpu_forced = os.environ.get("JAX_PLATFORMS", "") == "cpu" or (
        "jax" in _sys.modules
        and _sys.modules["jax"].config.jax_platforms == "cpu"
    )
    if not cpu_forced and "axon" in os.environ.get("JAX_PLATFORMS", "axon"):
        try:
            socket.create_connection(("127.0.0.1", 8083), timeout=3).close()
        except OSError:
            log("FATAL: axon tunnel port 8083 closed — TPU relay is down; "
                "refusing to hang in jax.devices(). Retry when the relay "
                "is back.")
            return 3
        # The chip is single-tenant: two TPU processes starve each other.
        # Serialize benches behind a host-wide lock (held for the whole
        # run; waiting is better than corrupting both runs' timings).
        # GSATTACK_SKIP_TPU_LOCK=1: child probe of a bench that already
        # holds the lock and blocks on us (scale_probe_fields).
        if os.environ.get("GSATTACK_SKIP_TPU_LOCK") != "1":
            import fcntl

            lockf = open("/tmp/gsattack_tpu.lock", "w")
            try:
                fcntl.flock(lockf, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except OSError:
                log("another TPU bench holds /tmp/gsattack_tpu.lock — "
                    "waiting for it to finish...")
                fcntl.flock(lockf, fcntl.LOCK_EX)
            globals()["_tpu_lock"] = lockf  # keep the fd (and lock) alive

        # The relay has a half-down failure mode (observed: multi-hour
        # outages) where the ports ACCEPT but every RPC blocks forever, so
        # the port probe above passes and jax.devices() still hangs. Probe
        # enumeration in a subprocess with a hard timeout before wedging
        # this process (and its caller) on it. Normal enumeration is
        # seconds; 180s is outage, not load.
        import subprocess

        try:
            subprocess.run(
                [_sys.executable, "-c", "import jax; jax.devices()"],
                timeout=180, capture_output=True,
            )
        except subprocess.TimeoutExpired:
            log("FATAL: axon relay accepts TCP but device enumeration hung "
                ">180s — TPU tunnel is wedged; refusing to hang. Retry "
                "when the relay is back.")
            return 3

    import jax

    # Persistent compilation cache: first compiles over the axon remote
    # tunnel run 5-16 minutes; warm reruns should skip them entirely.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/gsattack_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:
        log(f"compilation cache unavailable: {e}")

    log(f"devices: {jax.devices()}")
    scene, cam = build_problem(args.n_points, args.width, args.height, args.sh_degree)
    log(f"scene: {scene.num_points} splats, SH{args.sh_degree}, {args.width}x{args.height}")
    if args.pairs < 0 or args.rect < 0 or (
        (args.pairs_budget < 0 or args.tier_split < 0)
        and args.backend == "pallas"
    ):
        from gsattack.ops.project import project
        from gsattack.ops.raster import (
            auto_pair_caps, auto_pairs_budget, auto_pairs_per_gaussian,
        )

        proj0 = project(scene, cam)
    if args.pairs < 0 and args.rect < 0:
        # Auto-size BOTH static caps: the rect enumeration capacity
        # (max tile footprint) and the post-ellipse-test survivor cap that
        # actually feeds the N*pairs global sort (row compaction).
        args.pairs, args.rect = auto_pair_caps(proj0, args.width, args.height)
        # rect == pairs is kept: the left-pack alone enables the tiered
        # bin (the 1M regime hits max-survivors == max-footprint); it is
        # zeroed below if tiering turns out unprofitable.
    elif args.pairs < 0:
        # Auto-size the static per-gaussian pair cap: the raw pair list is
        # N * pairs feeding the global sort, so slack is sort bandwidth.
        args.pairs = auto_pairs_per_gaussian(proj0, args.width, args.height)
    if args.rect < 0:
        args.rect = 0
    budget = args.pairs_budget
    if budget < 0 and args.backend == "pallas":
        # Auto-size the packed capacity from the real padded pair total
        # (r1 ran a 561k-slot layout against ~330k needed — every per-slot
        # pack op scales with the capacity).
        # Probe with the run's exact binning config (rect compaction). PGD
        # keeps the drift margin (means move during the attack); the static
        # raster benches measure the exact padded total, margin 1 + the
        # CHUNK slack suffices and every slot of slack is pack time.
        budget = auto_pairs_budget(
            proj0, args.width, args.height, args.pairs,
            margin=1.25 if args.mode == "pgd" else 1.0,
            rect_candidates=args.rect,
        )
    elif budget < 0:
        budget = 0
    compact = args.compact_budget
    if compact < 0 and args.backend == "pallas":
        from gsattack.ops.raster import auto_compact_budget

        compact = auto_compact_budget(
            proj0, args.width, args.height, args.pairs,
            margin=1.25 if args.mode == "pgd" else 1.0,
            rect_candidates=args.rect,
        )
    elif compact < 0:
        compact = 0
    tier = (max(args.tier_split, 0), max(args.heavy_budget, 0))
    if (
        args.tier_split < 0
        and args.backend == "pallas"
        and 0 < args.pairs <= args.rect
    ):
        from gsattack.ops.raster import auto_tier_caps

        tier = auto_tier_caps(
            proj0, args.width, args.height, args.pairs, args.rect,
        )
        if tier == (0, 0) and args.rect == args.pairs:
            args.rect = 0  # identity left-pack with no tier: skip it
    log(f"backend={args.backend} pairs={args.pairs} rect={args.rect} "
        f"pairs_budget={budget} compact_budget={compact} tier={tier}")

    if args.mode == "train":
        ips = bench_train(
            scene, cam, args.iters, args.pairs, args.max_chunks,
            args.backend, budget, args.rect, compact, tier,
        )
        if args.mesh:
            # Training-scaling harness (VERDICT r4 #7): single device vs
            # the full splats mesh, efficiency = speedup / n_devices.
            n_dev = len(jax.devices())
            ips_n = bench_train(
                scene, cam, args.iters, args.pairs, args.max_chunks,
                args.backend, budget, args.rect, compact, tier,
                use_mesh=True,
            )
            eff = ips_n / ips / n_dev
            log(f"train scale: single {ips:.3f} it/s, {n_dev}-device mesh "
                f"{ips_n:.3f} it/s, efficiency {eff:.3f}")
            print(json.dumps({
                "metric": "train_scaling_efficiency",
                "value": round(eff, 4),
                "unit": f"x{n_dev}dev",
                "vs_baseline": 1.0,
                "single_it_per_s": round(ips, 3),
                "mesh_it_per_s": round(ips_n, 3),
            }))
            return
        print(json.dumps({
            "metric": "train_iters_per_s",
            "value": round(ips, 3),
            "unit": "it/s",
            "vs_baseline": 1.0,
        }))
        return
    if args.mode == "pgd":
        ips = bench_pgd(
            scene, cam, args.iters, args.pairs, args.chunk, args.max_chunks,
            args.backend, args.views, budget, args.mesh, args.rect,
            args.detector, args.det_weights, compact, tier,
            yaw_aug=args.yaw_aug,
        )
        print(
            json.dumps(
                {
                    "metric": "pgd_iters_per_s",
                    "value": round(ips, 4),
                    "unit": "it/s",
                    "vs_baseline": 1.0,
                }
            )
        )
        return
    if args.mode == "scale":
        # Scaling-efficiency harness (SURVEY §7 stage 7: >=80% 1 chip ->
        # multi-chip): same PGD workload replicated on one device, then
        # sharded over the full (views, splats) mesh; efficiency =
        # speedup / n_devices. On one real chip this degenerates to ~1;
        # it becomes meaningful the day a multi-chip slice is attached
        # (and on the virtual CPU mesh it exercises the harness itself).
        n_dev = len(jax.devices())
        ips1 = bench_pgd(
            scene, cam, args.iters, args.pairs, args.chunk, args.max_chunks,
            args.backend, args.views, budget, False, args.rect,
            args.detector, args.det_weights,
        )
        ips_n = bench_pgd(
            scene, cam, args.iters, args.pairs, args.chunk, args.max_chunks,
            args.backend, args.views, budget, True, args.rect,
            args.detector, args.det_weights,
        )
        eff = ips_n / ips1 / n_dev
        log(f"scale: single {ips1:.3f} it/s, {n_dev}-device mesh "
            f"{ips_n:.3f} it/s, efficiency {eff:.3f}")
        print(json.dumps({
            "metric": "pgd_scaling_efficiency",
            "value": round(eff, 4),
            "unit": f"x{n_dev}dev",
            "vs_baseline": 1.0,
            "single_it_per_s": round(ips1, 4),
            "mesh_it_per_s": round(ips_n, 4),
        }))
        return
    if args.mode == "stages":
        bench_stages(
            scene, cam, args.iters, args.pairs, args.max_chunks, budget,
            args.objects, args.rect,
        )
        print(json.dumps({"metric": "stages", "value": 0, "unit": "ms",
                          "vs_baseline": 1.0}))
        return
    if args.mode == "bisect":
        bench_bisect(
            scene, cam, args.iters, args.pairs, args.max_chunks, budget,
            args.objects, args.rect,
        )
        print(json.dumps({"metric": "bisect", "value": 0, "unit": "ms",
                          "vs_baseline": 1.0}))
        return
    if args.mode == "raster-views":
        mpix = bench_fwd_bwd_views(
            scene, cam, args.iters, args.pairs, args.max_chunks, args.views,
            budget, args.objects, args.rect,
        )
        metric = "fwd_bwd_views_mpix_per_s"
    elif args.forward_only:
        mpix = bench_forward(
            scene, cam, args.iters, args.pairs, args.chunk, args.max_chunks,
            args.backend, budget, args.objects, args.rect,
        )
        metric = "fwd_mpix_per_s"
    else:
        mpix, mpix_scan = bench_fwd_bwd(
            scene, cam, args.iters, args.pairs, args.chunk, args.max_chunks,
            args.backend, budget, args.objects, args.rect, compact, tier,
        )
        metric = "fwd_bwd_mpix_per_s"

    record = {
        "metric": metric,
        "value": round(mpix, 3),
        "unit": "Mpix/s",
        "vs_baseline": 1.0,
    }
    # Apples-to-apples companion number: the reference rasterizer ALWAYS
    # blends the 16 object-feature channels (gaussian_renderer/__init__.py
    # :86-95), so the default (RGB-only) headline also reports the
    # with-objects figure (VERDICT r1 weak #2).
    if args.mode == "raster" and not args.forward_only and not args.objects:
        mpix_obj, _ = bench_fwd_bwd(
            scene, cam, args.iters, args.pairs, args.chunk, args.max_chunks,
            args.backend, budget, True, args.rect, compact, tier,
        )
        record["with_objects_mpix_per_s"] = round(mpix_obj, 3)
        record["scan_mpix_per_s"] = round(mpix_scan, 3)
    # Parity gate (default on for the single-view raster bench with the
    # pallas backend): a Mosaic regression must show up in BENCH_r*.json.
    run_parity = args.parity
    if run_parity is None:
        run_parity = args.mode == "raster" and args.backend == "pallas"
    if run_parity:
        max_err, ok = check_parity(
            scene, cam, args.pairs, args.chunk, args.max_chunks, budget,
            args.objects, args.rect, compact, tier,
        )
        record["parity_max_rel_err"] = float(f"{max_err:.3e}")
        record["parity_ok"] = bool(ok)
    # Driver-certify the large-scene + attack story (VERDICT r4 #4): the
    # default bench record carries the 500k@1600x1200 scale probe (RGB +
    # the reference's always-19-channel shape) and a PGD line, so
    # BENCH_r*.json holds driver-captured numbers instead of
    # builder-authored docs. Failures degrade to an error field — a scale
    # regression must not take down the headline metric.
    if (
        args.mode == "raster" and not args.forward_only and not args.objects
        and args.backend == "pallas" and args.scale_probe
    ):
        try:
            record.update(scale_probe_fields(args))
        except Exception as e:  # noqa: BLE001 — recorded, not fatal
            log(f"scale probe failed: {type(e).__name__}: {e}")
            record["scale_error"] = f"{type(e).__name__}: {e}"[:200]
        try:
            ips = bench_pgd(
                scene, cam, max(args.iters // 2, 5), args.pairs, args.chunk,
                args.max_chunks, "pallas", 4, budget, False, args.rect,
                "toy", "", compact, tier,
            )
            record["pgd_iters_per_s"] = round(ips, 3)
        except Exception as e:  # noqa: BLE001
            log(f"pgd probe failed: {type(e).__name__}: {e}")
            record["pgd_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(record))


def scale_probe_fields(args) -> dict:
    """The post-densification product regime (BASELINE north star
    nyc_block): 500k splats @ 1600x1200, measured caps, RGB and
    with-objects fwd+bwd Mpix/s."""
    from gsattack.ops.project import project
    from gsattack.ops.raster import auto_caps

    n, w, h = 500_000, 1600, 1200
    scene, cam = build_problem(n, w, h, args.sh_degree)
    proj0 = project(scene, cam)
    pairs, rect, budget, compact, tier = auto_caps(proj0, w, h)
    log(f"scale probe: n={n} {w}x{h} pairs={pairs} rect={rect} "
        f"budget={budget} compact={compact} tier={tier}")
    iters = max(args.iters // 2, 5)
    mpix, _ = bench_fwd_bwd(
        scene, cam, iters, pairs, args.chunk, args.max_chunks, "pallas",
        budget, False, rect, compact, tier,
    )
    mpix_obj, _ = bench_fwd_bwd(
        scene, cam, iters, pairs, args.chunk, args.max_chunks, "pallas",
        budget, True, rect, compact, tier,
    )
    out = {
        "scale_mpix_per_s": round(mpix, 3),
        "scale_obj_mpix_per_s": round(mpix_obj, 3),
    }
    # Million-splat line (VERDICT r4 missing #1), run in a SUBPROCESS: the
    # parent's dispatch loop degrades ~30x after this run's many compiles
    # (relay per-process distortion, r3/r5 notes — the same leg's scan
    # companion measured 9.27 Mpix/s while the in-process python loop
    # read 0.27), and a fresh process measures cleanly with the warm
    # persistent compile cache. The child skips the held TPU lock.
    try:
        import subprocess

        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--n-points", "1000000", "--width", str(w), "--height",
             str(h), "--sh-degree", str(args.sh_degree), "--iters", "5",
             "--no-scale-probe", "--no-parity"],
            capture_output=True, text=True, timeout=2400,
            env={**os.environ, "GSATTACK_SKIP_TPU_LOCK": "1"},
        )
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        out["probe_1m_mpix_per_s"] = rec["value"]
        out["probe_1m_obj_mpix_per_s"] = rec["with_objects_mpix_per_s"]
    except Exception as e:  # noqa: BLE001 — recorded, not fatal
        log(f"1M probe failed: {type(e).__name__}: {e}")
        out["probe_1m_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


if __name__ == "__main__":
    sys.exit(main())
