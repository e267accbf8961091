"""Training subsystem tests: losses vs torch reference math, lr schedule,
densify/prune slot allocator, end-to-end fit on a toy scene, CLOAK."""

import jax
import jax.numpy as jnp
import numpy as np

from gsattack.train import (
    DensifyStats,
    TrainConfig,
    Trainer,
    add_densification_stats,
    densify_and_prune,
    reset_opacity,
)
from gsattack.utils import dssim_l1_loss, expon_lr_schedule, l1_loss, psnr, ssim
from tests.conftest import make_toy_camera, make_toy_scene


def test_ssim_identical_is_one():
    img = jnp.asarray(np.random.default_rng(0).uniform(size=(32, 32, 3)).astype(np.float32))
    assert abs(float(ssim(img, img)) - 1.0) < 1e-5


def test_ssim_matches_torch_reference():
    """Cross-check against the reference's torch implementation
    (utils/loss_utils.py:23-63) executed with torch CPU."""
    import torch
    import torch.nn.functional as F
    from math import exp

    rng = np.random.default_rng(1)
    a = rng.uniform(size=(3, 24, 24)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape).astype(np.float32), 0, 1)

    def torch_ssim(img1, img2, window_size=11):
        def gaussian(ws, sigma):
            g = torch.Tensor([exp(-((x - ws // 2) ** 2) / (2 * sigma**2)) for x in range(ws)])
            return g / g.sum()

        ch = img1.size(0)
        w1 = gaussian(window_size, 1.5).unsqueeze(1)
        win = w1.mm(w1.t()).unsqueeze(0).unsqueeze(0).expand(ch, 1, window_size, window_size)
        img1, img2 = img1.unsqueeze(0), img2.unsqueeze(0)
        mu1 = F.conv2d(img1, win, padding=window_size // 2, groups=ch)
        mu2 = F.conv2d(img2, win, padding=window_size // 2, groups=ch)
        mu1s, mu2s, mu12 = mu1**2, mu2**2, mu1 * mu2
        s1 = F.conv2d(img1 * img1, win, padding=window_size // 2, groups=ch) - mu1s
        s2 = F.conv2d(img2 * img2, win, padding=window_size // 2, groups=ch) - mu2s
        s12 = F.conv2d(img1 * img2, win, padding=window_size // 2, groups=ch) - mu12
        c1, c2 = 0.01**2, 0.03**2
        m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1s + mu2s + c1) * (s1 + s2 + c2))
        return float(m.mean())

    want = torch_ssim(torch.tensor(a), torch.tensor(b))
    got = float(ssim(jnp.asarray(a.transpose(1, 2, 0)), jnp.asarray(b.transpose(1, 2, 0))))
    assert abs(got - want) < 1e-5


def test_l1_and_combined_loss():
    a = jnp.zeros((8, 8, 3))
    b = jnp.ones((8, 8, 3)) * 0.5
    assert abs(float(l1_loss(a, b)) - 0.5) < 1e-6
    comb = float(dssim_l1_loss(a, b, lambda_dssim=0.0))
    assert abs(comb - 0.5) < 1e-6


def test_psnr():
    a = jnp.zeros((4, 4, 3))
    b = jnp.full((4, 4, 3), 0.1)
    assert abs(float(psnr(a, b)) - 20.0) < 1e-4


def test_expon_lr_schedule():
    sched = expon_lr_schedule(1.6e-4, 1.6e-6, lr_delay_mult=0.01, max_steps=30000)
    assert abs(float(sched(0)) - 1.6e-4) < 1e-9
    assert abs(float(sched(30000)) - 1.6e-6) < 1e-9
    mid = float(sched(15000))
    assert 1.6e-6 < mid < 1.6e-4
    np.testing.assert_allclose(mid, np.sqrt(1.6e-4 * 1.6e-6), rtol=1e-4)


def test_densify_stats_accumulation():
    stats = DensifyStats.zeros(4)
    g = jnp.array([[3.0, 4.0], [1.0, 0.0], [0.0, 0.0], [1.0, 1.0]])
    radii = jnp.array([2, 0, 1, 3])
    out = add_densification_stats(stats, g, radii)
    np.testing.assert_allclose(np.asarray(out.xyz_gradient_accum), [5.0, 0, 0, np.sqrt(2)], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.denom), [1, 0, 1, 1])
    np.testing.assert_allclose(np.asarray(out.max_radii2d), [2, 0, 1, 3])


def test_densify_clone_into_free_slots():
    sc = make_toy_scene(n=8).pad_to(16)
    stats = DensifyStats.zeros(16)
    # small scale (clone) + big grad on point 0 and 3
    accum = jnp.zeros(16).at[0].set(10.0).at[3].set(10.0)
    stats = stats._replace(xyz_gradient_accum=accum, denom=jnp.ones(16))
    sc = sc.replace(log_scale=jnp.full_like(sc.log_scale, -10.0))  # tiny -> clone
    out, _, dropped, _ = densify_and_prune(
        sc, stats, jax.random.PRNGKey(0), max_grad=1.0, extent=1.0
    )
    assert int(dropped) == 0
    assert int(out.alive.sum()) == 10  # 8 alive + 2 clones
    # clones replicate parent positions
    new_idx = np.nonzero(np.asarray(out.alive))[0][8:]
    parents = np.asarray(sc.xyz)[[0, 3]]
    news = np.asarray(out.xyz)[new_idx]
    assert np.allclose(np.sort(news, axis=0), np.sort(parents, axis=0), atol=1e-6)


def test_densify_split_replaces_parent():
    sc = make_toy_scene(n=4).pad_to(16)
    stats = DensifyStats.zeros(16)
    accum = jnp.zeros(16).at[1].set(10.0)
    stats = stats._replace(xyz_gradient_accum=accum, denom=jnp.ones(16))
    sc = sc.replace(log_scale=jnp.full_like(sc.log_scale, 2.0))  # big -> split
    out, _, dropped, _ = densify_and_prune(
        sc, stats, jax.random.PRNGKey(1), max_grad=1.0, extent=1.0, percent_dense=0.01
    )
    assert int(dropped) == 0
    # parent pruned, 2 children added: 4 - 1 + 2 = 5
    assert int(out.alive.sum()) == 5
    # the parent's exact position is gone from the alive set (slot may be
    # reused by a child, so check identity not slot index)
    alive_xyz = np.asarray(out.xyz)[np.asarray(out.alive)]
    parent_xyz = np.asarray(sc.xyz)[1]
    assert not np.any(np.all(np.isclose(alive_xyz, parent_xyz, atol=1e-7), axis=1))
    # children scale shrank by 0.8*2: exactly two alive points at that scale
    alive_scale = np.exp(np.asarray(out.log_scale)[np.asarray(out.alive)])
    n_children = int(np.isclose(alive_scale[:, 0], np.exp(2.0) / 1.6, rtol=1e-5).sum())
    assert n_children == 2


def test_densify_prune_low_opacity():
    sc = make_toy_scene(n=6).pad_to(8)
    sc = sc.replace(
        opacity_logit=jnp.full((8, 1), -10.0).at[0, 0].set(2.0).at[1, 0].set(2.0)
    )
    stats = DensifyStats.zeros(8)
    out, _, _, _ = densify_and_prune(sc, stats, jax.random.PRNGKey(0))
    assert int(out.alive.sum()) == 2


def test_densify_capacity_overflow_reports_dropped():
    sc = make_toy_scene(n=8)  # no free capacity at all
    sc = sc.replace(log_scale=jnp.full_like(sc.log_scale, -10.0))
    stats = DensifyStats(
        xyz_gradient_accum=jnp.full(8, 10.0), denom=jnp.ones(8),
        max_radii2d=jnp.zeros(8),
    )
    out, _, dropped, _ = densify_and_prune(sc, stats, jax.random.PRNGKey(0), max_grad=1.0)
    assert int(dropped) == 8  # all clones dropped


def test_densify_routes_adam_moments_through_allocator():
    """Surviving points keep their moments; pruned slots and new children
    get zeros (reference `scene/gaussian_model.py:573-650`)."""
    sc = make_toy_scene(n=8).pad_to(16)
    stats = DensifyStats.zeros(16)
    accum = jnp.zeros(16).at[0].set(10.0).at[3].set(10.0)
    stats = stats._replace(xyz_gradient_accum=accum, denom=jnp.ones(16))
    sc = sc.replace(log_scale=jnp.full_like(sc.log_scale, -10.0))  # clone
    # point 5 pruned by low opacity
    sc = sc.replace(opacity_logit=sc.opacity_logit.at[5, 0].set(-10.0))
    params = sc.params()
    mu = {k: jnp.ones_like(v) * 2.0 for k, v in params.items()}
    nu = {k: jnp.ones_like(v) * 3.0 for k, v in params.items()}
    out, _, dropped, (mu2, nu2) = densify_and_prune(
        sc, stats, jax.random.PRNGKey(0), moments=(mu, nu),
        max_grad=1.0, extent=1.0,
    )
    assert int(dropped) == 0
    alive0 = np.asarray(sc.alive)
    alive1 = np.asarray(out.alive)
    assert alive1.sum() == 8 - 1 + 2  # one pruned, two clones
    m = np.asarray(mu2["xyz"])
    v = np.asarray(nu2["xyz"])
    pruned = np.zeros(16, bool)
    pruned[5] = True  # may be reused by a child (then moments are zeroed)
    survivors = alive0 & alive1 & ~pruned
    assert (m[survivors] == 2.0).all() and (v[survivors] == 3.0).all()
    new_slots = (alive1 & ~alive0) | (pruned & alive1)  # clone children
    assert new_slots.sum() == 2
    assert (m[new_slots] == 0.0).all() and (v[new_slots] == 0.0).all()
    assert (m[5] == 0.0).all()  # pruned slot cleared (or zeroed child)


def test_trainer_preserves_moments_across_densify():
    from gsattack.render import render

    target = make_toy_scene(n=32, seed=6)
    cam = make_toy_camera(width=32, height=32)
    gt = jnp.asarray(np.asarray(render(target, cam, jnp.zeros(3))["render"]))
    cfg = TrainConfig(
        densify_from_iter=1, densification_interval=5, densify_until_iter=100,
        densify_grad_threshold=1e9,  # nothing densifies: pure identity pass
        opacity_reset_interval=10_000, sh_increase_interval=10_000,
    )
    trainer = Trainer(make_toy_scene(n=32, seed=7), cfg)
    for it in range(1, 5):
        trainer.train_step(cam, gt)
    mu_before = np.asarray(trainer.state.opt_state.mu["xyz"])
    assert np.abs(mu_before).max() > 0
    trainer.maybe_densify(5, jax.random.PRNGKey(0))
    mu_after = np.asarray(trainer.state.opt_state.mu["xyz"])
    alive = np.asarray(trainer.state.scene.alive)
    np.testing.assert_allclose(mu_after[alive], mu_before[alive], rtol=1e-6)

    # opacity reset wipes only the opacity moments
    trainer.maybe_reset_opacity(10_000)  # no-op (interval mismatch handled)
    cfg2_mu = trainer.state.opt_state.mu
    st = trainer.state.opt_state
    trainer.cfg.opacity_reset_interval = 5
    trainer.maybe_reset_opacity(5)
    st2 = trainer.state.opt_state
    assert np.abs(np.asarray(st2.mu["opacity_logit"])).max() == 0
    np.testing.assert_allclose(
        np.asarray(st2.mu["xyz"]), np.asarray(st.mu["xyz"])
    )


def test_reset_opacity():
    sc = make_toy_scene(n=4)
    out = reset_opacity(sc)
    op = np.asarray(jax.nn.sigmoid(out.opacity_logit))
    assert (op <= 0.01 + 1e-6).all()


def test_trainer_reduces_loss_and_improves_psnr():
    """End-to-end: train a fresh random scene toward renders of a target
    scene from 3 views (the de-facto integration test the reference lacks)."""
    from gsattack.render import render

    target = make_toy_scene(n=64, seed=5)
    cams = [make_toy_camera(width=48, height=48, z=0.15 * i) for i in range(3)]
    bg = jnp.zeros(3)
    gts = [np.asarray(render(target, c, bg)["render"]) for c in cams]

    init = make_toy_scene(n=64, seed=9)
    cfg = TrainConfig(
        densify_from_iter=10_000,  # keep densify off for this short run
        sh_increase_interval=10_000,
        opacity_reset_interval=10_000,
    )
    trainer = Trainer(init, cfg)
    losses = []
    for it in range(1, 61):
        vi = it % 3
        losses.append(trainer.train_step(cams[vi], jnp.asarray(gts[vi])))
    assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:10])


def test_trainer_densify_cycle_runs():
    target = make_toy_scene(n=32, seed=6)
    cams = [make_toy_camera(width=32, height=32)]
    from gsattack.render import render

    gts = [np.asarray(render(target, cams[0], jnp.zeros(3))["render"])]
    cfg = TrainConfig(
        densify_from_iter=2,
        densification_interval=5,
        densify_until_iter=100,
        densify_grad_threshold=1e-9,  # force some densification
        opacity_reset_interval=17,
        sh_increase_interval=8,
    )
    trainer = Trainer(make_toy_scene(n=32, seed=7), cfg)
    scene = trainer.fit(cams, gts, iterations=20)
    assert bool(scene.alive.any())
    assert np.isfinite(np.asarray(scene.xyz)).all()
    assert scene.active_sh_degree >= 1  # SH warmup kicked in


def test_trainer_sharded_over_mesh_trains_through_densify():
    """BASELINE config #5 (sharded CLOAK retraining): the Trainer under a
    (views, splats) mesh shards per-point state over splats (GSPMD), the
    loss descends, and a densify cycle keeps the sharded layout."""
    from gsattack.parallel import make_mesh
    from gsattack.parallel.mesh import SPLATS_AXIS
    from gsattack.render import render

    target = make_toy_scene(n=64, seed=5)
    cams = [make_toy_camera(width=48, height=48, z=0.15 * i) for i in range(3)]
    bg = jnp.zeros(3)
    gts = [np.asarray(render(target, c, bg)["render"]) for c in cams]

    mesh = make_mesh((2, 4))
    cfg = TrainConfig(
        densify_from_iter=20, densification_interval=25,
        densify_until_iter=100, densify_grad_threshold=1e-9,
        sh_increase_interval=10_000, opacity_reset_interval=10_000,
    )
    init = make_toy_scene(n=64, seed=9)
    trainer = Trainer(init, cfg, mesh=mesh)
    capacity = trainer.state.scene.xyz.shape[0]
    assert capacity % mesh.shape[SPLATS_AXIS] == 0
    alive0 = int(np.asarray(trainer.state.scene.alive).sum())
    losses = []
    for it in range(1, 61):
        vi = it % 3
        losses.append(trainer.train_step(cams[vi], jnp.asarray(gts[vi])))
        trainer.maybe_densify(it, jax.random.PRNGKey(it))
    # densification fired (forced by the tiny grad threshold) and the
    # loss still descends through it under the sharded layout
    assert int(np.asarray(trainer.state.scene.alive).sum()) > alive0
    assert np.mean(losses[-10:]) < 0.85 * np.mean(losses[:10])
    assert np.isfinite(np.asarray(trainer.state.scene.xyz)).all()


def test_trainer_sharded_capacity_growth_keeps_even_shards():
    """A densify overflow grows capacity on the host; under a mesh the
    new capacity must stay a splats-axis multiple and the state must be
    re-sharded (regression: grow_capacity silently dropped the layout)."""
    from gsattack.parallel import make_mesh
    from gsattack.parallel.mesh import SPLATS_AXIS
    from gsattack.render import render

    target = make_toy_scene(n=48, seed=5)
    cam = make_toy_camera(width=32, height=32)
    gt = jnp.asarray(np.asarray(render(target, cam, jnp.zeros(3))["render"]))
    mesh = make_mesh((2, 4))
    cfg = TrainConfig(
        capacity_headroom=1.05,  # overflow on the first densify
        densify_from_iter=1, densification_interval=2,
        densify_until_iter=100, densify_grad_threshold=1e-9,
        sh_increase_interval=10_000, opacity_reset_interval=10_000,
    )
    trainer = Trainer(make_toy_scene(n=48, seed=9), cfg, mesh=mesh)
    cap0 = trainer.state.scene.xyz.shape[0]
    ns = mesh.shape[SPLATS_AXIS]
    for it in range(1, 9):
        trainer.train_step(cam, gt)
        trainer.maybe_densify(it, jax.random.PRNGKey(it))
    cap1 = trainer.state.scene.xyz.shape[0]
    assert cap1 > cap0  # growth happened
    assert cap1 % ns == 0  # still evenly shardable
    sh = trainer.state.scene.xyz.sharding
    assert SPLATS_AXIS in getattr(sh, "spec", ())  # layout restored
    loss = trainer.train_step(cam, gt)  # still trains at the new capacity
    assert np.isfinite(float(loss))


def test_cloak_poisoning_changes_images_and_trains():
    from gsattack.attack.cloak import CloakConfig, poison_image, run_cloak
    from gsattack.models import ToyDetector
    from gsattack.render import render

    det = ToyDetector(num_classes=8)
    det.load_model()
    target_scene = make_toy_scene(n=32, seed=8)
    cams = [make_toy_camera(width=48, height=48, z=0.1 * i) for i in range(2)]
    gts = [np.asarray(render(target_scene, c, jnp.zeros(3))["render"]) for c in cams]

    ccfg = CloakConfig(epsilon=8 / 255, alpha=2 / 255, steps=5, target=2,
                       is_targeted=True, poison_view_indices=(0,))
    bbox = np.array([8, 8, 40, 40], np.float32)
    adv = np.asarray(poison_image(jnp.asarray(gts[0]), det, bbox, ccfg))
    delta = np.abs(adv - gts[0])
    assert delta.max() > 1e-4  # image actually perturbed
    assert delta.max() <= 8 / 255 + 1e-5  # within the linf budget

    tcfg = TrainConfig(densify_from_iter=10_000, sh_increase_interval=10_000,
                       opacity_reset_interval=10_000)
    scene, poisoned = run_cloak(
        make_toy_scene(n=32, seed=10), cams, gts, det, ccfg,
        train_cfg=tcfg, iterations=5, log=lambda *_: None,
    )
    assert len(poisoned) == 1
    assert np.isfinite(np.asarray(scene.xyz)).all()


def test_bench_train_mesh_harness():
    """The training-scaling harness (`bench.py --mode train --mesh`) runs
    on the virtual CPU mesh: single-device and full-mesh train-step
    throughput both measure, through the same bench_train entry the
    driver uses (VERDICT r4 #7)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import bench

    scene, cam = bench.build_problem(256, 32, 32, 1)
    ips1 = bench.bench_train(
        scene, cam, 3, 16, 4, "xla", 0, 0, 0, use_mesh=False
    )
    ips_n = bench.bench_train(
        scene, cam, 3, 16, 4, "xla", 0, 0, 0, use_mesh=True
    )
    assert ips1 > 0 and ips_n > 0
