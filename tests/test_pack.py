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
