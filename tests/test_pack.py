"""Direct unit tests of pack_pairs against a numpy brute-force layout.

pack_pairs reconstructs the slot -> gaussian map with chunk-aligned
two-row lookups + lane rolls instead of a per-slot gather; these tests
pin that machinery (incl. zero-count tiles, budget clamping, and the
drop counter) independently of the render-level parity tests.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gsattack.ops.pallas_blend import CHUNK, GEOM_W, pack_pairs


def brute_force_pack(geom, channels, gauss_idx, tile_start, tile_end,
                     budget):
    """Slot-by-slot reference: each tile's pairs laid out from its
    CHUNK-aligned packed start; padding slots carry the sacrificial
    all-zero row (gaussian index n)."""
    n = geom.shape[0]
    p = gauss_idx.shape[0]
    num_tiles = tile_start.shape[0]
    counts = tile_end - tile_start
    padded = (counts + CHUNK - 1) // CHUNK * CHUNK
    start_raw = np.concatenate([[0], np.cumsum(padded)[:-1]]).astype(np.int64)
    if budget:
        p_pad = (budget + CHUNK - 1) // CHUNK * CHUNK
    else:
        p_pad = (p + CHUNK - 1) // CHUNK * CHUNK + num_tiles * CHUNK
    unified = np.concatenate([geom, channels], axis=1)
    out = np.zeros((p_pad, unified.shape[1]), unified.dtype)
    packed_start = np.minimum(start_raw, p_pad)
    packed_end = np.minimum(start_raw + counts, p_pad)
    dropped = int(counts.sum() - (packed_end - packed_start).sum())
    for t in range(num_tiles):
        for k in range(packed_end[t] - packed_start[t]):
            out[packed_start[t] + k] = unified[gauss_idx[tile_start[t] + k]]
    return out.T, packed_start, packed_end, dropped


def random_problem(seed, n, num_tiles, max_count):
    rng = np.random.default_rng(seed)
    geom = rng.normal(size=(n, GEOM_W)).astype(np.float32)
    channels = rng.normal(size=(n, 8)).astype(np.float32)
    counts = (rng.integers(0, max_count, size=num_tiles) if max_count
              else np.zeros(num_tiles, np.int64))
    # sprinkle zero-count tiles incl. runs at the start/end
    counts[rng.integers(0, num_tiles, size=max(1, num_tiles // 4))] = 0
    counts[0] = 0
    counts[-1] = 0
    tile_end = np.cumsum(counts)
    tile_start = tile_end - counts
    p = int(tile_end[-1])
    gauss_idx = rng.integers(0, n, size=p)
    return geom, channels, gauss_idx, tile_start, tile_end


@pytest.mark.parametrize("seed,n,num_tiles,max_count,budget", [
    (0, 50, 9, 300, 0),          # no cap, multi-chunk tiles
    (1, 20, 17, 40, 0),          # many small tiles, zero-count runs
    (2, 40, 11, 200, 1024),      # budget clamps mid-stream
    (3, 30, 5, 90, 256),         # budget smaller than demand
    (4, 10, 3, 0, 0),            # all tiles empty
    (5, 25, 7, 60, 100),         # budget NOT a CHUNK multiple: capacity
                                 # is the round-up (128), not the raw 100
])
def test_pack_pairs_matches_brute_force(seed, n, num_tiles, max_count, budget):
    geom, channels, gauss_idx, ts, te = random_problem(
        seed, n, num_tiles, max_count
    )
    ref, ref_s, ref_e, ref_drop = brute_force_pack(
        geom, channels, gauss_idx, ts, te, budget
    )
    got, got_s, got_e, ch_pad, got_drop = pack_pairs(
        jnp.asarray(geom), jnp.asarray(channels),
        jnp.asarray(gauss_idx, jnp.int32),
        jnp.asarray(ts, jnp.int32), jnp.asarray(te, jnp.int32),
        budget=budget,
    )
    assert ch_pad == 8
    np.testing.assert_array_equal(np.asarray(got_s), ref_s)
    np.testing.assert_array_equal(np.asarray(got_e), ref_e)
    assert int(got_drop) == ref_drop
    np.testing.assert_array_equal(np.asarray(got), ref)


@pytest.mark.parametrize("seed,budget", [(11, 0), (12, 512)])
def test_pack_pairs_custom_vjp_matches_ad(seed, budget):
    """The hand-written pack backward (scatter-add through src_gauss) must
    equal plain JAX AD through an index-identical gather composition —
    including cotangents landing on budget-dropped and padding slots."""
    import jax

    geom, channels, gauss_idx, ts, te = random_problem(seed, 24, 6, 70)
    args = (
        jnp.asarray(gauss_idx, jnp.int32),
        jnp.asarray(ts, jnp.int32),
        jnp.asarray(te, jnp.int32),
    )

    def loss(g, c):
        packed = pack_pairs(jnp.asarray(g), jnp.asarray(c), *args,
                            budget=budget)[0]
        # nonuniform weighting so slot placement errors show up in grads
        w = jnp.sin(jnp.arange(packed.size, dtype=jnp.float32)).reshape(
            packed.shape
        )
        return jnp.sum(packed * w)

    def loss_ad(g, c):
        # same math via plain AD: rebuild the gather with stop_grad indices
        from gsattack.ops.pallas_blend import _gather_pack_T

        packed_ref, *_ = pack_pairs(
            jnp.asarray(g), jnp.asarray(c), *args, budget=budget
        )
        # recover src_gauss by matching: recompute through the public fn is
        # circular, so instead drive AD through the custom-vjp-free core by
        # calling its underlying python impl
        unified = jnp.concatenate([jnp.asarray(g), jnp.asarray(c)], axis=1)
        n = unified.shape[0]
        # src_gauss reconstruction: gather positions where packed equals the
        # unified rows is ambiguous; instead use jax.custom_vjp's own fwd
        # primal (identical indexing) and differentiate the reference
        # composition directly:
        src = _pack_src_indices(g, c, args, budget)
        zero_row = jnp.zeros((1, unified.shape[1]), unified.dtype)
        packed = jnp.concatenate([unified, zero_row])[src].T
        w = jnp.sin(jnp.arange(packed.size, dtype=jnp.float32)).reshape(
            packed.shape
        )
        return jnp.sum(packed * w)

    def _pack_src_indices(g, c, args, budget):
        # derive the slot->gaussian map by packing row indices as payload
        n = g.shape[0]
        marker = jnp.arange(n, dtype=jnp.float32)[:, None]
        mgeom = jnp.broadcast_to(marker, (n, GEOM_W))
        mch = jnp.broadcast_to(marker, (n, c.shape[1]))
        mpacked, ps, pe, _, _ = pack_pairs(mgeom, mch, *args, budget=budget)
        slot_q = jnp.arange(mpacked.shape[1])
        end_map = jnp.zeros(mpacked.shape[1], bool)
        for s, e in zip(np.asarray(ps), np.asarray(pe)):
            end_map = end_map | ((slot_q >= s) & (slot_q < e))
        return jnp.where(end_map, mpacked[0].astype(jnp.int32), n)

    g1, c1 = jax.grad(loss, argnums=(0, 1))(geom, channels)
    g2, c2 = jax.grad(loss_ad, argnums=(0, 1))(geom, channels)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-6)


@pytest.mark.parametrize("seed,budget", [(21, 0), (22, 1024)])
def test_pack_pairs_compact_backward_matches(seed, budget):
    """The pair-indexed backward (scatter only valid pairs) must produce
    identical gradients to the slot-indexed backward when the compact
    budget covers every valid pair."""
    import jax

    geom, channels, gauss_idx, ts, te = random_problem(seed, 30, 8, 80)
    args = (
        jnp.asarray(gauss_idx, jnp.int32),
        jnp.asarray(ts, jnp.int32),
        jnp.asarray(te, jnp.int32),
    )
    cb = int(gauss_idx.shape[0]) + 256  # covers all

    def loss(g, c, compact):
        out = pack_pairs(jnp.asarray(g), jnp.asarray(c), *args,
                         budget=budget, compact_budget=compact)
        packed = out[0]
        w = jnp.cos(jnp.arange(packed.size, dtype=jnp.float32)).reshape(
            packed.shape)
        return jnp.sum(packed * w)

    # forward identical
    f0 = loss(geom, channels, 0)
    f1 = loss(geom, channels, cb)
    np.testing.assert_allclose(float(f0), float(f1), rtol=1e-6)
    g0 = jax.grad(loss, argnums=(0, 1))(geom, channels, 0)
    g1 = jax.grad(loss, argnums=(0, 1))(geom, channels, cb)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_pack_pairs_compact_budget_overflow_counted():
    """Valid pairs beyond compact_budget are counted as dropped."""
    geom, channels, gauss_idx, ts, te = random_problem(23, 20, 5, 120)
    total_valid = int(te[-1])
    tight = 128  # deliberately smaller than the valid pair count
    assert total_valid > tight
    out = pack_pairs(
        jnp.asarray(geom), jnp.asarray(channels),
        jnp.asarray(gauss_idx, jnp.int32),
        jnp.asarray(ts, jnp.int32), jnp.asarray(te, jnp.int32),
        budget=0, compact_budget=tight,
    )
    assert int(out[4]) == total_valid - tight


def test_pack_pairs_channel_padding():
    """Non-multiple-of-8 channel counts pad with zero rows."""
    geom, channels, gauss_idx, ts, te = random_problem(7, 16, 4, 50)
    ch3 = channels[:, :3]
    got, _, _, ch_pad, _ = pack_pairs(
        jnp.asarray(geom), jnp.asarray(ch3),
        jnp.asarray(gauss_idx, jnp.int32),
        jnp.asarray(ts, jnp.int32), jnp.asarray(te, jnp.int32),
    )
    assert ch_pad == 8
    ref, _, _, _ = brute_force_pack(
        geom, np.concatenate([ch3, np.zeros((16, 5), np.float32)], axis=1),
        gauss_idx, ts, te, 0,
    )
    np.testing.assert_array_equal(np.asarray(got), ref)


def random_problem_grouped(seed, n, c, num_tiles):
    """bin_gaussians-shaped problem: every gaussian emits EXACTLY c
    candidate pairs (tile == num_tiles is the invalid sentinel), pairs
    sorted by tile with the invalid tail past the last tile's range —
    the multiplicity contract behind the large-scene table backward."""
    rng = np.random.default_rng(seed)
    geom = rng.normal(size=(n, GEOM_W)).astype(np.float32)
    channels = rng.normal(size=(n, 8)).astype(np.float32)
    tid = rng.integers(0, num_tiles + 1, size=(n, c))
    flat_t = tid.reshape(-1)
    flat_g = np.repeat(np.arange(n), c)
    order = np.argsort(flat_t, kind="stable")
    st = flat_t[order]
    gauss_idx = flat_g[order]
    tile_start = np.searchsorted(st, np.arange(num_tiles), side="left")
    tile_end = np.searchsorted(st, np.arange(num_tiles), side="right")
    return geom, channels, gauss_idx, tile_start, tile_end, c


@pytest.mark.parametrize("seed,budget", [(31, 0), (32, 1024)])
def test_pack_pairs_table_backward_matches(seed, budget, monkeypatch):
    """The large-scene TABLE backward ((N, c) slot-table gather-sum) must
    produce identical gradients to the exact slot-indexed scatter when
    the compact budget covers every valid pair. Exercised on CPU by
    dropping the pair-count gate."""
    import jax

    from gsattack.ops import pallas_blend as pb

    monkeypatch.setattr(pb, "_TABLE_MIN_PAIRS", 0)
    geom, channels, gauss_idx, ts, te, c = random_problem_grouped(
        seed, 30, 12, 8
    )
    args = (
        jnp.asarray(gauss_idx, jnp.int32),
        jnp.asarray(ts, jnp.int32),
        jnp.asarray(te, jnp.int32),
    )
    cb = int(gauss_idx.shape[0]) + 256  # covers all valid pairs

    def loss(g, ch, compact, mult):
        out = pack_pairs(jnp.asarray(g), jnp.asarray(ch), *args,
                         budget=budget, compact_budget=compact,
                         gauss_multiplicity=mult)
        packed = out[0]
        w = jnp.cos(jnp.arange(packed.size, dtype=jnp.float32)).reshape(
            packed.shape)
        return jnp.sum(packed * w)

    f0 = loss(geom, channels, 0, 0)
    f1 = loss(geom, channels, cb, c)
    np.testing.assert_allclose(float(f0), float(f1), rtol=1e-6)
    g0 = jax.grad(loss, argnums=(0, 1))(geom, channels, 0, 0)
    g1 = jax.grad(loss, argnums=(0, 1))(geom, channels, cb, c)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_pack_pairs_table_budget_overflow_counted(monkeypatch):
    """Valid pairs beyond compact_budget lose their backward contribution
    on the table path too — and are counted."""
    from gsattack.ops import pallas_blend as pb

    monkeypatch.setattr(pb, "_TABLE_MIN_PAIRS", 0)
    geom, channels, gauss_idx, ts, te, c = random_problem_grouped(
        33, 40, 10, 5
    )
    total_valid = int(te[-1])
    tight = 128
    assert total_valid > tight
    out = pack_pairs(
        jnp.asarray(geom), jnp.asarray(channels),
        jnp.asarray(gauss_idx, jnp.int32),
        jnp.asarray(ts, jnp.int32), jnp.asarray(te, jnp.int32),
        budget=0, compact_budget=tight, gauss_multiplicity=c,
    )
    assert int(out[4]) == total_valid - tight


def random_problem_tiered(seed, n, num_tiles, c1, cb, hb):
    """Emulate the tiered bin_gaussians contract: every real gaussian id
    appears exactly c1 times, every virtual id n+h exactly cb times; the
    heavy list maps rank -> real id (ascending, padded with n)."""
    rng = np.random.default_rng(seed)
    geom = rng.normal(size=(n, GEOM_W)).astype(np.float32)
    channels = rng.normal(size=(n, 8)).astype(np.float32)
    n_heavy = rng.integers(1, hb)
    heavy_list = np.concatenate([
        np.sort(rng.choice(n, size=n_heavy, replace=False)),
        np.full(hb - n_heavy, n),
    ]).astype(np.int64)
    tidA = rng.integers(0, num_tiles + 1, size=(n, c1))
    tidB = np.where(
        (heavy_list < n)[:, None],
        rng.integers(0, num_tiles + 1, size=(hb, cb)),
        num_tiles,  # padding rows: invalid sentinel tile
    )
    flat_t = np.concatenate([tidA.reshape(-1), tidB.reshape(-1)])
    flat_g = np.concatenate([
        np.repeat(np.arange(n), c1),
        np.repeat(np.minimum(heavy_list, n - 1), cb),
    ])
    flat_tid = np.concatenate([
        np.repeat(np.arange(n), c1),
        np.repeat(n + np.arange(hb), cb),
    ])
    order = np.argsort(flat_t, kind="stable")
    st = flat_t[order]
    gauss_idx = flat_g[order]
    table_idx = flat_tid[order]
    tile_start = np.searchsorted(st, np.arange(num_tiles), side="left")
    tile_end = np.searchsorted(st, np.arange(num_tiles), side="right")
    return (geom, channels, gauss_idx, table_idx, heavy_list, tile_start,
            tile_end)


@pytest.mark.parametrize("seed,budget", [(41, 0), (42, 2048)])
def test_pack_pairs_two_tier_table_backward_matches(seed, budget,
                                                    monkeypatch):
    """The TWO-TIER table backward (tiered bin) must produce identical
    gradients to the exact slot-indexed scatter."""
    import jax

    from gsattack.ops import pallas_blend as pb

    monkeypatch.setattr(pb, "_TABLE_MIN_PAIRS", 0)
    c1, cb, hb = 3, 5, 16
    geom, channels, gauss_idx, table_idx, heavy_list, ts, te = (
        random_problem_tiered(seed, 40, 14, c1, cb, hb)
    )
    args = (
        jnp.asarray(gauss_idx, jnp.int32),
        jnp.asarray(ts, jnp.int32),
        jnp.asarray(te, jnp.int32),
    )
    cbud = int(gauss_idx.shape[0]) + 256

    def loss(g, ch, tiered):
        kw = dict(budget=budget, compact_budget=cbud)
        if tiered:
            kw.update(
                table_idx=jnp.asarray(table_idx, jnp.int32),
                heavy_list=jnp.asarray(heavy_list, jnp.int32),
                tier_split=c1,
            )
        packed = pack_pairs(jnp.asarray(g), jnp.asarray(ch), *args, **kw)[0]
        w = jnp.cos(jnp.arange(packed.size, dtype=jnp.float32)).reshape(
            packed.shape)
        return jnp.sum(packed * w)

    f0 = loss(geom, channels, False)
    f1 = loss(geom, channels, True)
    np.testing.assert_allclose(float(f0), float(f1), rtol=1e-6)
    g0 = jax.grad(loss, argnums=(0, 1))(geom, channels, False)
    g1 = jax.grad(loss, argnums=(0, 1))(geom, channels, True)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
