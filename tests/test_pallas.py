"""Pallas blend kernel tests (interpret mode on CPU): forward and backward
parity against the XLA path (which is itself oracle-validated)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsattack.render import render
from tests.conftest import make_toy_camera, make_toy_scene

KW = dict(pairs_per_gaussian=32, max_chunks=8)


@pytest.mark.parametrize("seed,n,wh", [(3, 128, (48, 48)), (5, 64, (40, 56))])
def test_pallas_forward_matches_xla(seed, n, wh):
    sc = make_toy_scene(n=n, seed=seed)
    cam = make_toy_camera(width=wh[0], height=wh[1])
    bg = jnp.array([0.2, 0.4, 0.6])
    ref = render(sc, cam, bg, **KW)
    got = render(sc, cam, bg, backend="pallas", interpret=True, **KW)
    np.testing.assert_allclose(
        np.asarray(got["render"]), np.asarray(ref["render"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["render_object"]), np.asarray(ref["render_object"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["final_transmittance"]),
        np.asarray(ref["final_transmittance"]),
        atol=1e-5,
    )


def test_pallas_backward_matches_xla_all_attributes():
    sc = make_toy_scene(n=96, seed=7)
    sc = sc.replace(active_sh_degree=3)  # exercise SH gradient path
    cam = make_toy_camera(width=48, height=48)
    bg = jnp.zeros(3)
    target = jnp.ones((48, 48, 3)) * 0.4

    def loss(params, backend, interpret):
        out = render(
            sc.with_params(params), cam, bg, backend=backend,
            interpret=interpret, **KW,
        )
        # touch rgb + obj channels + transmittance so every grad path runs
        return (
            jnp.mean((out["render"] - target) ** 2)
            + 0.05 * jnp.mean(out["render_object"] ** 2)
            + 0.1 * jnp.mean(out["final_transmittance"])
        )

    p = sc.params()
    g_ref = jax.grad(lambda p: loss(p, "xla", False))(p)
    g_pal = jax.grad(lambda p: loss(p, "pallas", True))(p)
    for k in p:
        r, q = np.asarray(g_ref[k]), np.asarray(g_pal[k])
        scale = max(np.abs(r).max(), 1e-9)
        np.testing.assert_allclose(q, r, atol=5e-5 * scale, err_msg=k)
        if k not in ("f_rest",):
            assert np.abs(r).max() > 0, f"no reference grad for {k}"


def test_pallas_empty_scene_is_background():
    sc = make_toy_scene(n=16, center=(100.0, 100.0, 3.0))  # fully off-screen
    cam = make_toy_camera(width=32, height=32)
    bg = jnp.array([0.3, 0.6, 0.9])
    out = render(sc, cam, bg, backend="pallas", interpret=True, **KW)
    np.testing.assert_allclose(
        np.asarray(out["render"]),
        np.broadcast_to(np.asarray(bg), (32, 32, 3)),
        atol=1e-6,
    )


def test_bwd_zeroes_truncated_chunk_regions():
    """Tiles whose pair count exceeds max_chunks*CHUNK must get ZERO
    gradients in the truncated region (the kernel zero-DMAs those chunks;
    unwritten they would be uninitialized HBM that scatter-adds garbage
    into parameter grads on compiled TPU — compiled-mode coverage rides
    bench.py --parity). The written region must carry real gradients."""
    from gsattack.ops.pallas_blend import CHUNK, GEOM_W, pallas_blend_views

    rng = np.random.default_rng(0)
    p_pad = 4 * CHUNK
    rows = GEOM_W + 8
    packed = jnp.asarray(
        rng.uniform(0.2, 0.8, size=(1, rows, p_pad)).astype(np.float32)
    )
    # center the splat means on the 16x16 tile so alphas are live
    packed = packed.at[0, 0].set(8.0).at[0, 1].set(8.0)
    packed = packed.at[0, 2].set(0.05).at[0, 3].set(0.0).at[0, 4].set(0.05)
    tile_start = jnp.array([[0]], jnp.int32)
    tile_end = jnp.array([[3 * CHUNK - 5]], jnp.int32)  # 3 chunks of pairs

    def f(pk):
        out = pallas_blend_views(
            pk, tile_start, tile_end, 1, 1, max_chunks=2, interpret=True
        )
        return jnp.sum(out[:, :, : rows - GEOM_W, :])

    g = np.asarray(jax.grad(f)(packed))[0]
    assert np.abs(g[:, :CHUNK]).max() > 0  # written chunk has gradients
    assert (g[:, 2 * CHUNK : 3 * CHUNK] == 0).all()  # truncated chunk zeroed


def test_pallas_budget_paths():
    """A generous budget must not change the image; fwd+bwd must agree on
    the truncated pair set when max_chunks clips a hot tile."""
    sc = make_toy_scene(n=96, seed=11)
    cam = make_toy_camera(width=32, height=32)
    bg = jnp.zeros(3)
    ref = render(sc, cam, bg, backend="pallas", interpret=True, **KW)
    got = render(
        sc, cam, bg, backend="pallas", interpret=True, pairs_budget=96 * 8, **KW
    )
    np.testing.assert_allclose(
        np.asarray(got["render"]), np.asarray(ref["render"]), atol=1e-5
    )

    # Severe max_chunks clipping: gradients stay finite and the fwd/bwd
    # pair sets agree (no NaNs from inconsistent truncation).
    def loss(params):
        out = render(
            sc.with_params(params), cam, bg, backend="pallas", interpret=True,
            pairs_per_gaussian=32, max_chunks=1,
        )
        return jnp.mean(out["render"] ** 2)

    g = jax.grad(loss)(sc.params())
    for k, v in g.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_batched_views_blend_matches_per_view():
    """One (views, tiles)-grid launch must reproduce per-view renders and
    the XLA gradients (VERDICT r2 item 4: the lax.map killer)."""
    from gsattack.ops.project import project
    from gsattack.ops.raster import rasterize, rasterize_views

    sc = make_toy_scene(n=96, seed=3)
    cams = [make_toy_camera(width=48, height=48, z=0.1 * i) for i in range(3)]
    bg = jnp.array([0.2, 0.4, 0.6])
    projs = [project(sc, c) for c in cams]
    batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *projs)
    out = rasterize_views(
        batched, 48, 48, bg, backend="pallas", interpret=True, max_chunks=8
    )
    for i, p in enumerate(projs):
        ref = rasterize(p, 48, 48, bg, backend="pallas", interpret=True,
                        max_chunks=8)
        np.testing.assert_allclose(
            np.asarray(out["render"][i]), np.asarray(ref["render"]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["final_transmittance"][i]),
            np.asarray(ref["final_transmittance"]), atol=1e-5,
        )

    def loss_b(params):
        s2 = sc.with_params(params)
        pr = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[project(s2, c) for c in cams]
        )
        o = rasterize_views(pr, 48, 48, bg, backend="pallas", interpret=True,
                            max_chunks=8)
        return jnp.mean(o["render"] ** 2)

    def loss_x(params):
        s2 = sc.with_params(params)
        tot = 0.0
        for c in cams:
            o = rasterize(project(s2, c), 48, 48, bg, backend="xla")
            tot = tot + jnp.mean(o["render"] ** 2)
        return tot / 3

    gb = jax.grad(loss_b)(sc.params())
    gx = jax.grad(loss_x)(sc.params())
    for k in gb:
        r, q = np.asarray(gx[k]), np.asarray(gb[k])
        s = max(np.abs(r).max(), 1e-9)
        np.testing.assert_allclose(q, r, atol=5e-5 * s, err_msg=k)


def _tier_pressure_scene():
    """512 moderate diagonal-anisotropic splats: tilted ellipses make the
    rect AABB much larger than the exact-ellipse survivor set (rect 36 vs
    keep 14 at 128x128), and the survivor histogram is skewed enough that
    auto_tier_caps turns the tiered bin on."""
    sc = make_toy_scene(n=512, seed=11)
    rng = np.random.default_rng(5)
    base = rng.uniform(-3.4, -2.2, size=(512, 1)).astype(np.float32)
    aniso = np.concatenate([base + 1.1, base - 0.8, base], axis=1)
    return sc.replace(
        log_scale=jnp.asarray(aniso),
        quat=jnp.asarray(rng.normal(size=(512, 4)).astype(np.float32)),
    )


def test_tiered_bin_matches_untiered_all_backwards(monkeypatch):
    """The tiered bin (tier_split/heavy_budget) must be output- AND
    grad-exact vs the untiered path across all three backward regimes:
    compact scatter, single-table, and the two-tier table (forced by
    dropping the pair-count gate). The candidate SET is identical — only
    the flat emission layout changes — so the IMAGES are bitwise-equal;
    the gradients differ only by f32 accumulation order (scatter-add vs
    windowed reduce), so they get a tight tolerance instead."""
    from gsattack.ops import pallas_blend as pb
    from gsattack.ops.project import project
    from gsattack.ops.raster import (
        auto_compact_budget, auto_pair_caps, auto_pairs_budget,
        auto_tier_caps,
    )

    sc = _tier_pressure_scene()
    wh = 128
    cam = make_toy_camera(width=wh, height=wh)
    bg = jnp.zeros(3)
    proj0 = project(sc, cam)
    keep, rect = auto_pair_caps(proj0, wh, wh)
    assert rect > keep, "toy scene must exercise row compaction"
    ts, hb = auto_tier_caps(proj0, wh, wh, keep, rect, quantum=64)
    assert ts > 0, "toy scene must make tiering profitable"
    pbud = auto_pairs_budget(proj0, wh, wh, keep, rect_candidates=rect)
    cbud = auto_compact_budget(proj0, wh, wh, keep, rect_candidates=rect)

    def loss(params, tier, gate):
        monkeypatch.setattr(pb, "_TABLE_MIN_PAIRS", gate)
        out = render(
            sc.with_params(params), cam, bg, backend="pallas",
            interpret=True, pairs_per_gaussian=keep, rect_candidates=rect,
            pairs_budget=pbud, compact_budget=cbud,
            tier_split=tier[0], heavy_budget=tier[1], max_chunks=16,
        )
        return (
            jnp.mean(out["render"] ** 2)
            + 0.1 * jnp.mean(out["render_object"] ** 2)
        ), out["render"]

    p = sc.params()
    grad = jax.grad(loss, has_aux=True)
    (g0, img0) = grad(p, (0, 0), 10**9)        # untiered, scatter bwd
    for tier, gate in [((ts, hb), 10**9),      # tiered, scatter bwd
                       ((ts, hb), 1),          # tiered, two-tier table bwd
                       ((0, 0), 1)]:           # untiered, single table bwd
        # _TABLE_MIN_PAIRS is read at TRACE time but rasterize's jit cache
        # keys only on static args — without a cache flush the gate=1 legs
        # would silently reuse the gate=10**9 executables and never run
        # the table backwards (advisor r4, medium).
        jax.clear_caches()
        g1, img1 = grad(p, tier, gate)
        np.testing.assert_array_equal(np.asarray(img1), np.asarray(img0))
        for k in g0:
            scale = float(np.abs(np.asarray(g0[k])).max()) or 1.0
            np.testing.assert_allclose(
                np.asarray(g1[k]), np.asarray(g0[k]),
                rtol=1e-4, atol=1e-5 * scale,
                err_msg=f"{k} tier={tier} gate={gate}",
            )


def test_slab_probe_matches_bin_gaussians():
    """The slab-wise cap probe (_probe_pair_stats) must reproduce the
    bin_gaussians-derived statistics exactly — survivor histogram, padded
    budget and valid-pair totals — including with a slab size that forces
    multiple padded slabs (the 8M-splat OOM fix must not drift caps at
    any scale)."""
    from gsattack.ops.project import project
    from gsattack.ops.raster import (
        _probe_pair_stats, auto_pair_caps, bin_gaussians,
    )

    sc = _tier_pressure_scene()
    wh = 128
    cam = make_toy_camera(width=wh, height=wh)
    proj = project(sc, cam)
    keep, rect = auto_pair_caps(proj, wh, wh)
    n = proj.mean2d.shape[0]

    for c, rc in [(keep, rect), (rect, rect), (keep, 0)]:
        bins = bin_gaussians(
            proj.mean2d, proj.depth, proj.radius_tight, wh, wh, c,
            conic=proj.conic, opacity=proj.opacity, rect_candidates=rc,
        )
        p_valid = int(jnp.sum(bins.tile_end - bins.tile_start))
        ref_counts = np.bincount(
            np.asarray(bins.gauss_idx)[:p_valid], minlength=n
        )[:n]
        ref_tiles = np.asarray(bins.tile_end - bins.tile_start)
        for slab in (1 << 20, 100):  # one-shot and multi-slab-with-pad
            counts, hist = _probe_pair_stats(proj, wh, wh, c, rc, slab=slab)
            np.testing.assert_array_equal(counts, ref_counts,
                                          err_msg=f"c={c} rc={rc} {slab}")
            np.testing.assert_array_equal(hist, ref_tiles,
                                          err_msg=f"c={c} rc={rc} {slab}")


def test_tiered_bin_engages_at_rect_equals_pairs():
    """The 1M regime: max survivors == max rect footprint, so
    auto_pair_caps returns pairs == rect. The tiered bin must still
    engage (the left-pack alone enables it) and stay output-exact vs the
    untiered path — before the r5 fix the `rect > pairs` gates silently
    disabled BOTH compaction and tiering there, exploding the flat sort
    to N*c rows."""
    from gsattack.ops.project import project
    from gsattack.ops.raster import (
        auto_pair_caps, auto_pairs_budget, auto_tier_caps,
    )

    sc = _tier_pressure_scene()
    wh = 128
    cam = make_toy_camera(width=wh, height=wh)
    bg = jnp.zeros(3)
    proj0 = project(sc, cam)
    _, rect = auto_pair_caps(proj0, wh, wh)
    keep = rect  # the 1M-regime equality
    ts, hb = auto_tier_caps(proj0, wh, wh, keep, rect, quantum=64)
    assert ts > 0, "tiering must engage at rect == pairs"
    pbud = auto_pairs_budget(proj0, wh, wh, keep, rect_candidates=rect)

    def img(tier):
        return render(
            sc, cam, bg, backend="pallas", interpret=True,
            pairs_per_gaussian=keep, rect_candidates=rect,
            pairs_budget=pbud, tier_split=tier[0], heavy_budget=tier[1],
            max_chunks=16,
        )["render"]

    np.testing.assert_array_equal(
        np.asarray(img((ts, hb))), np.asarray(img((0, 0)))
    )


def test_tiered_bin_heavy_overflow_counted():
    """Heavy gaussians beyond heavy_budget lose exactly their overflow
    columns — and every lost pair lands in num_culled_pairs."""
    from gsattack.ops.project import project
    from gsattack.ops.raster import auto_pair_caps, bin_gaussians

    sc = _tier_pressure_scene()
    wh = 128
    cam = make_toy_camera(width=wh, height=wh)
    proj0 = project(sc, cam)
    keep, rect = auto_pair_caps(proj0, wh, wh)
    kw = dict(conic=proj0.conic, opacity=proj0.opacity,
              rect_candidates=rect)
    b0 = bin_gaussians(proj0.mean2d, proj0.depth, proj0.radius_tight,
                       wh, wh, keep, **kw)
    v0 = int(jnp.sum(b0.tile_end - b0.tile_start))
    c0 = int(b0.num_culled_pairs)
    bt = bin_gaussians(proj0.mean2d, proj0.depth, proj0.radius_tight,
                       wh, wh, keep, tier_split=2, heavy_budget=8, **kw)
    vt = int(jnp.sum(bt.tile_end - bt.tile_start))
    ct = int(bt.num_culled_pairs)
    assert vt < v0, "tiny heavy budget must actually drop pairs"
    assert ct - c0 == v0 - vt, "every dropped pair must be counted"
