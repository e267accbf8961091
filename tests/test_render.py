"""Renderer tests: oracle sanity + tile-renderer parity with the oracle
(the BASELINE.md correctness contract) + differentiability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsattack.render import render, render_oracle
from tests.conftest import make_toy_camera, make_toy_scene


def test_oracle_renders_nonempty(toy_scene, toy_camera):
    out = render_oracle(toy_scene, toy_camera, jnp.zeros(3))
    img = np.asarray(out["render"])
    assert img.shape == (64, 64, 3)
    assert img.max() > 0.01
    assert np.isfinite(img).all()
    assert np.asarray(out["visibility_filter"]).any()


def test_oracle_background_fills_empty_pixels():
    # Scene far off-screen: image should be exactly the background.
    sc = make_toy_scene(n=8, center=(100.0, 100.0, 3.0))
    cam = make_toy_camera()
    bg = jnp.array([0.25, 0.5, 0.75])
    out = render_oracle(sc, cam, bg)
    img = np.asarray(out["render"])
    np.testing.assert_allclose(img, np.broadcast_to(bg, img.shape), atol=1e-6)


def test_oracle_alpha_blending_two_splats():
    """Hand-checkable case: two isotropic splats on the optical axis."""
    from gsattack.core import scene_from_points

    pts = np.array([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]])
    cols = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    sc = scene_from_points(pts, cols, max_sh_degree=0, knn_dist2=np.array([0.04, 0.04]))
    # big opacity for front, full for back
    sc = sc.replace(opacity_logit=jnp.array([[0.0], [8.0]]))  # sigmoid: 0.5, ~1.0
    cam = make_toy_camera(width=32, height=32)
    out = render_oracle(sc, cam, jnp.zeros(3))
    img = np.asarray(out["render"])
    c = img[16, 16]
    # Front splat (red) alpha~0.5 at center, back (green) nearly opaque:
    assert c[0] > 0.3  # red contribution
    assert c[1] > 0.2  # green shows through
    assert c[2] < 0.05


def test_tile_matches_oracle(toy_scene, toy_camera):
    bg = jnp.array([0.1, 0.2, 0.3])
    ref = render_oracle(toy_scene, toy_camera, bg)
    got = render(toy_scene, toy_camera, bg, pairs_per_gaussian=32, max_chunks=8)
    assert int(got["num_culled_pairs"]) == 0
    np.testing.assert_allclose(
        np.asarray(got["render"]), np.asarray(ref["render"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["render_object"]), np.asarray(ref["render_object"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["final_transmittance"]),
        np.asarray(ref["final_transmittance"]),
        atol=2e-5,
    )


@pytest.mark.parametrize("seed,n", [(1, 16), (2, 128), (3, 256)])
def test_tile_matches_oracle_sweep(seed, n):
    sc = make_toy_scene(n=n, seed=seed)
    cam = make_toy_camera(width=48, height=80)  # non-square, non-multiple of 16
    bg = jnp.array([1.0, 1.0, 1.0])
    ref = render_oracle(sc, cam, bg)
    got = render(sc, cam, bg, pairs_per_gaussian=32, max_chunks=16)
    assert int(got["num_culled_pairs"]) == 0
    # 6e-5: tight tile culling drops zero-contribution pairs, which shifts
    # chunk boundaries and reassociates the f32 log-space cumsum (verified
    # pixel-level: every surviving mismatch has NO culled contributor).
    np.testing.assert_allclose(
        np.asarray(got["render"]), np.asarray(ref["render"]), atol=6e-5
    )


def test_tile_gradients_match_oracle(toy_scene, toy_camera):
    """allclose attribute gradients: tile renderer vs oracle (AD both)."""
    bg = jnp.zeros(3)
    target = jnp.ones((64, 64, 3)) * 0.5

    def loss_with(renderer):
        def fn(params):
            sc = toy_scene.with_params(params)
            out = renderer(sc, toy_camera, bg)
            return jnp.mean((out["render"] - target) ** 2)

        return fn

    params = toy_scene.params()
    g_ref = jax.grad(loss_with(render_oracle))(params)
    g_tile = jax.grad(loss_with(render))(params)
    for k in params:
        ref = np.asarray(g_ref[k])
        got = np.asarray(g_tile[k])
        assert np.isfinite(got).all(), k
        scale = max(np.abs(ref).max(), 1e-6)
        np.testing.assert_allclose(got, ref, atol=2e-4 * scale, err_msg=k)


def test_grad_nonzero_for_visible_attributes(toy_scene, toy_camera):
    def loss(params):
        sc = toy_scene.with_params(params)
        out = render(sc, toy_camera, jnp.zeros(3))
        return jnp.sum(out["render"])

    g = jax.grad(loss)(toy_scene.params())
    assert np.abs(np.asarray(g["xyz"])).max() > 0
    assert np.abs(np.asarray(g["f_dc"])).max() > 0
    assert np.abs(np.asarray(g["opacity_logit"])).max() > 0
    assert np.abs(np.asarray(g["log_scale"])).max() > 0
    assert np.abs(np.asarray(g["quat"])).max() > 0


def test_mean2d_offset_grad(toy_scene, toy_camera):
    """The screenspace-points grad tap (densification stats input)."""
    def loss(off):
        out = render(toy_scene, toy_camera, jnp.zeros(3), mean2d_offset=off)
        return jnp.sum(out["render"] ** 2)

    off = jnp.zeros((toy_scene.num_points, 2))
    g = np.asarray(jax.grad(loss)(off))
    assert np.abs(g).max() > 0
    vis = np.asarray(render(toy_scene, toy_camera, jnp.zeros(3))["visibility_filter"])
    assert (np.abs(g[~vis]) == 0).all()


def test_dead_points_do_not_render(toy_scene, toy_camera):
    bg = jnp.zeros(3)
    alive = toy_scene.alive.at[:32].set(False)
    sc_masked = toy_scene.replace(alive=alive)
    out_masked = render(sc_masked, toy_camera, bg)
    sc_compact = sc_masked.compact()
    out_compact = render(sc_compact, toy_camera, bg)
    np.testing.assert_allclose(
        np.asarray(out_masked["render"]),
        np.asarray(out_compact["render"]),
        atol=2e-5,
    )


def test_override_color(toy_scene, toy_camera):
    override = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (toy_scene.num_points, 1))
    out = render(toy_scene, toy_camera, jnp.zeros(3), override_color=override)
    img = np.asarray(out["render"])
    assert img[..., 0].max() > 0.1
    # Green/blue only from background (zero): must be ~0
    assert img[..., 1].max() < 1e-5
    assert img[..., 2].max() < 1e-5


def test_without_objects_matches_rgb(toy_scene, toy_camera):
    bg = jnp.array([0.1, 0.2, 0.3])
    full = render(toy_scene, toy_camera, bg)
    slim = render(toy_scene, toy_camera, bg, with_objects=False)
    np.testing.assert_allclose(
        np.asarray(slim["render"]), np.asarray(full["render"]), atol=1e-6
    )
    assert np.asarray(slim["render_object"]).max() == 0.0
    assert slim["render_object"].shape == full["render_object"].shape


def test_rect_candidates_compaction_exact(toy_scene, toy_camera):
    """Row compaction (`rect_candidates` > pairs cap) must be output- and
    gradient-exact vs plain binning: survivors are the same pair set, only
    the padded sort width shrinks."""
    bg = jnp.array([0.1, 0.2, 0.3])
    plain = render(toy_scene, toy_camera, bg, pairs_per_gaussian=32)
    # 64x64 -> 16 tiles total, so a 16-survivor cap can never overflow.
    comp = render(
        toy_scene, toy_camera, bg, pairs_per_gaussian=16, rect_candidates=32
    )
    assert int(comp["num_culled_pairs"]) == 0
    np.testing.assert_array_equal(
        np.asarray(comp["render"]), np.asarray(plain["render"])
    )

    target = jnp.ones_like(plain["render"]) * 0.5

    def loss_with(**kw):
        def fn(params):
            sc = toy_scene.with_params(params)
            out = render(sc, toy_camera, bg, **kw)
            return jnp.mean((out["render"] - target) ** 2)

        return fn

    params = toy_scene.params()
    g0 = jax.grad(loss_with(pairs_per_gaussian=32))(params)
    g1 = jax.grad(loss_with(pairs_per_gaussian=16, rect_candidates=32))(params)
    for k in params:
        np.testing.assert_array_equal(
            np.asarray(g0[k]), np.asarray(g1[k]), err_msg=k
        )


def test_rect_candidates_overflow_counted(toy_scene, toy_camera):
    """Pairs dropped by an undersized post-compaction cap must surface in
    num_culled_pairs (budget-overflow observability, VERDICT r1 item 7)."""
    out = render(
        toy_scene, toy_camera, jnp.zeros(3), pairs_per_gaussian=1,
        rect_candidates=32,
    )
    assert int(out["num_culled_pairs"]) > 0


def test_auto_budget_probe_matches_compacted_run(toy_scene, toy_camera):
    """`auto_pairs_budget` must bin exactly like the run it sizes: with
    row compaction on, a margin-1.0 budget equals the compacted binning's
    padded pair total + the CHUNK slack (probe/run divergence would make
    'auto' budgets silently truncate; VERDICT r1 item 7)."""
    from gsattack.ops.pallas_blend import CHUNK
    from gsattack.ops.project import project
    from gsattack.ops.raster import (
        auto_pair_caps, auto_pairs_budget, bin_gaussians,
    )

    proj = project(toy_scene, toy_camera)
    pairs, rect = auto_pair_caps(proj, toy_camera.width, toy_camera.height)
    budget = auto_pairs_budget(
        proj, toy_camera.width, toy_camera.height, pairs,
        margin=1.0, rect_candidates=rect,
    )
    bins = bin_gaussians(
        proj.mean2d, proj.depth, proj.radius_tight,
        toy_camera.width, toy_camera.height, pairs,
        conic=proj.conic, opacity=proj.opacity, rect_candidates=rect,
    )
    counts = np.asarray(bins.tile_end - bins.tile_start)
    padded_total = int(((counts + CHUNK - 1) // CHUNK * CHUNK).sum())
    assert budget == padded_total + CHUNK
    # and the compacted pallas render fits that budget with zero truncation
    out = render(
        toy_scene, toy_camera, jnp.zeros(3), pairs_per_gaussian=pairs,
        rect_candidates=rect, backend="pallas", interpret=True,
        pairs_budget=budget,
    )
    assert int(out["num_truncated_pairs"]) == 0


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_extreme_scenes_render_and_grads_finite(backend):
    """Robustness fuzz: degenerate scales, points at/behind the camera
    plane, zero-norm quats, saturated opacities — the renderer and its
    VJP must stay finite on every attribute (the r2 NaN-gradient leak at
    camera-center points regressed exactly here)."""
    rng = np.random.default_rng(12)
    n = 96
    pts = rng.normal(size=(n, 3)) * 2.0 + np.array([0.0, 0.0, 2.0])
    pts[:8, 2] = -1.0          # behind the camera
    pts[8:12, 2] = 1e-6        # on the near plane
    pts[12:14] = 0.0           # exactly at the camera center
    sc = make_toy_scene(n=n, seed=12)
    sc = sc.replace(
        xyz=jnp.asarray(pts, jnp.float32),
        log_scale=sc.log_scale.at[:10].set(-25.0).at[10:20].set(4.0),
        quat=sc.quat.at[:5].set(0.0),  # zero-norm quats
        opacity_logit=sc.opacity_logit.at[:20].set(30.0).at[20:30].set(-30.0),
    )
    cam = make_toy_camera(width=48, height=48)
    kw = dict(pairs_per_gaussian=16, max_chunks=4, backend=backend)
    if backend == "pallas":
        kw["interpret"] = True

    out = render(sc, cam, jnp.zeros(3), **kw)
    assert np.isfinite(np.asarray(out["render"])).all()

    def loss(params):
        o = render(sc.with_params(params), cam, jnp.zeros(3), **kw)
        return jnp.mean(o["render"] ** 2)

    g = jax.grad(loss)(sc.params())
    for k, v in g.items():
        assert np.isfinite(np.asarray(v)).all(), f"non-finite grad in {k}"
