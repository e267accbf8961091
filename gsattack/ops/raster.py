"""Tile-based differentiable rasterization (production path, pure XLA v1).

TPU-native re-design of the CUDA tile rasterizer the reference imports
(`diff_gaussian_rasterization`, call contract at
`gaussian_renderer/__init__.py:36-95`, SURVEY.md §2.3). The CUDA original
uses atomics, dynamic duplication and per-tile radix sort; none of that maps
to XLA's static-shape world, so the algorithm is restructured:

1. **Pair expansion** (static capacity): every Gaussian emits up to
   `pairs_per_gaussian` (tile, depth, index) tuples covering its 3-sigma
   tile rect — a dense (N, C) computation instead of atomic counters.
2. **Global two-key sort** `(tile_id, depth)` via `jax.lax.sort` — one fused
   device sort replaces the CUDA prefix-sum + radix-sort pipeline.
3. **Range lookup** per tile with `searchsorted`.
4. **Chunked associative blending**: per tile, gaussians are consumed in
   depth-ordered chunks of K; within a chunk, front-to-back compositing is
   rewritten with log-space cumulative transmittance (cumsum of log1p(-a))
   so the whole chunk is one VPU-vectorized (K, P) computation and the
   color accumulation is a (P, K) @ (K, CH) matmul on the MXU. The serial
   per-Gaussian walk of the CUDA kernel disappears.

The saturation rules replicate the reference blend exactly: alpha clamp at
0.99, skip below 1/255, skip when the Mahalanobis power is positive, and a
pixel stops compositing permanently once its transmittance would cross 1e-4.

Everything is differentiable by JAX AD (the sort/gather indices are integer
and naturally non-differentiable); a custom-VJP Pallas path supersedes this
for speed while this stays as the semantic reference for it.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from .project import ProjectedGaussians

TILE = 16
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


class TileBins(NamedTuple):
    gauss_idx: jnp.ndarray  # (P,) sorted pair -> gaussian index
    tile_start: jnp.ndarray  # (num_tiles,)
    tile_end: jnp.ndarray  # (num_tiles,)
    num_culled_pairs: jnp.ndarray  # () int32 pairs dropped by the static cap
    # Tiered-bin extras (None when tier_split == 0): the sorted pairs'
    # TABLE ids (real gaussian id for tier-A pairs, N + heavy_rank for
    # tier-B overflow pairs) and the heavy-gaussian id list (padded with
    # N). Together they let pack_pairs build the two-tier backward tables
    # with one (id, slot) sort + two reshapes.
    table_idx: jnp.ndarray | None = None  # (P,) int32
    heavy_list: jnp.ndarray | None = None  # (heavy_budget,) int32


def _tile_rect(mean2d, radius, tiles_x, tiles_y):
    """Inria getRect: tile index ranges covered by the radius bbox.

    NOTE: the CUDA original's `(v + TILE - 1) / TILE` ceil trick is only
    correct for integer v; with float centers/radii it undercounts the max
    tile when frac(v/TILE) < 1/TILE, so the exclusive bound is computed as
    floor(v/TILE) + 1 (covers the last pixel center <= mean + r exactly)."""
    r = radius.astype(jnp.float32)
    rmin_x = jnp.clip(
        jnp.floor((mean2d[:, 0] - r) / TILE), 0, tiles_x
    ).astype(jnp.int32)
    rmax_x = jnp.clip(
        jnp.floor((mean2d[:, 0] + r) / TILE) + 1, 0, tiles_x
    ).astype(jnp.int32)
    rmin_y = jnp.clip(
        jnp.floor((mean2d[:, 1] - r) / TILE), 0, tiles_y
    ).astype(jnp.int32)
    rmax_y = jnp.clip(
        jnp.floor((mean2d[:, 1] + r) / TILE) + 1, 0, tiles_y
    ).astype(jnp.int32)
    return rmin_x, rmax_x, rmin_y, rmax_y


def _box_quad_min(a, b, c, lx, ux, ly, uy):
    """Exact min of the PD quadratic q(d) = a dx^2 + 2b dx dy + c dy^2 over
    the box [lx,ux] x [ly,uy]. Convexity: if the origin is inside, the min
    is 0; otherwise it lies on one of the 4 edges, each a 1D quadratic
    whose clamped vertex is closed-form. All elementwise VPU math."""
    inside = (lx <= 0.0) & (ux >= 0.0) & (ly <= 0.0) & (uy >= 0.0)
    c_s = jnp.maximum(c, 1e-12)
    a_s = jnp.maximum(a, 1e-12)

    def q(x, y):
        return a * x * x + 2.0 * b * x * y + c * y * y

    def edge_x(x):  # dx fixed, dy free
        y = jnp.clip(-b * x / c_s, ly, uy)
        return q(x, y)

    def edge_y(y):  # dy fixed, dx free
        x = jnp.clip(-b * y / a_s, lx, ux)
        return q(x, y)

    qe = jnp.minimum(
        jnp.minimum(edge_x(lx), edge_x(ux)),
        jnp.minimum(edge_y(ly), edge_y(uy)),
    )
    return jnp.where(inside, 0.0, qe)


def _candidate_cells(
    mean2d: jnp.ndarray,
    radius: jnp.ndarray,
    conic: jnp.ndarray | None,
    opacity: jnp.ndarray | None,
    tiles_x: int,
    tiles_y: int,
    c_rect: int,
    do_ellipse: bool,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The per-gaussian rect-enumeration cells with the exact ellipse test
    applied: (tile_id (N, c_rect) with the num_tiles sentinel on invalid
    cells, valid (N, c_rect), touched (N,)). Shared by bin_gaussians and
    the slab-wise cap probes so their semantics cannot drift."""
    num_tiles = tiles_x * tiles_y
    rmin_x, rmax_x, rmin_y, rmax_y = _tile_rect(
        mean2d, radius, tiles_x, tiles_y
    )
    rect_w = rmax_x - rmin_x
    touched = jnp.where(radius > 0, rect_w * (rmax_y - rmin_y), 0)  # (N,)

    j = jnp.arange(c_rect, dtype=jnp.int32)[None, :]  # (1, C_rect)
    w_safe = jnp.maximum(rect_w, 1)[:, None]
    tx = rmin_x[:, None] + j % w_safe
    ty = rmin_y[:, None] + j // w_safe
    valid = j < touched[:, None]
    if do_ellipse:
        # Tile pixel centers span [t*TILE, t*TILE + TILE-1] in each axis.
        lx = (tx * TILE).astype(jnp.float32) - mean2d[:, 0:1]
        ly = (ty * TILE).astype(jnp.float32) - mean2d[:, 1:2]
        qmin = _box_quad_min(
            conic[:, 0:1], conic[:, 1:2], conic[:, 2:3],
            lx, lx + (TILE - 1.0), ly, ly + (TILE - 1.0),
        )
        # alpha_max = op * exp(-qmin/2) >= 1/255  <=>  qmin <= 2 ln(255 op).
        # +1e-3 slack: keep pixels within f32 rounding of the boundary (the
        # blend's alpha test decides them; keeping is always safe).
        q_cut = (
            2.0 * jnp.log(jnp.maximum(opacity * 255.0, 1e-6)) + 1e-3
        )[:, None]
        pd = (conic[:, 0:1] > 0.0) & (conic[:, 2:3] > 0.0)
        valid &= (qmin <= q_cut) | ~pd  # non-PD conic: keep (blend decides)
    tile_id = jnp.where(valid, ty * tiles_x + tx, num_tiles).astype(jnp.int32)
    return tile_id, valid, touched


def bin_gaussians(
    mean2d: jnp.ndarray,
    depth: jnp.ndarray,
    radius: jnp.ndarray,
    width: int,
    height: int,
    pairs_per_gaussian: int = 32,
    conic: jnp.ndarray | None = None,
    opacity: jnp.ndarray | None = None,
    rect_candidates: int = 0,
    tier_split: int = 0,
    heavy_budget: int = 0,
) -> TileBins:
    """Build depth-sorted per-tile index lists with static shapes.

    `radius` is the binning radius — pass `proj.radius_tight` to get the
    opacity-aware footprint (the reference bins the full 3-sigma rect;
    tiles beyond the tight radius are exactly invisible, SURVEY §2.3 CUDA
    `getRect`). With `conic`+`opacity` given, each candidate rect tile
    additionally passes an EXACT ellipse test: the min of the Mahalanobis
    form over the tile's pixel-center box must keep alpha >= 1/255
    somewhere, else the tile's pairs are dropped (output-exact — the blend
    skips those pixels anyway; kills the rect's corner/elongation waste).

    `rect_candidates` (>= pairs_per_gaussian, needs conic+opacity) splits
    the two capacities: the rect is enumerated at `rect_candidates` cells,
    ellipse-surviving cells are COMPACTED left with a cheap per-row sort
    (a ~10-stage network over C columns vs ~440 for the global pair sort),
    and only the first `pairs_per_gaussian` columns feed the global sort —
    on the bench scene the max rect footprint is 9 but max survivors is 5,
    so the N*C global sort halves. 0 disables compaction.

    `tier_split`/`heavy_budget` (both > 0, compaction required) enable the
    TIERED emission for large scenes: per-gaussian survivor counts are
    heavily skewed (500k probe scene: mean 2.4, max 14 — a uniform c=14
    emission is 7M candidates for 1.2M valid pairs), so every gaussian
    emits only its first `tier_split` compacted columns under its real id,
    and the <= `heavy_budget` HEAVY gaussians (survivors > tier_split,
    index-ordered, tail overflow counted in num_culled_pairs) re-emit
    their remaining columns under a VIRTUAL id N + heavy_rank. The flat
    pair list shrinks to N*c1 + H*(c - c1) (3.2x at the 500k probe) — the
    global sort, the backward's (id, slot) sort and the table backward's
    candidate gather all scale with it. The depth sort carries BOTH ids
    (real for the forward pack, table for the backward); `TileBins` gains
    `table_idx` + `heavy_list` for pack_pairs' two-tier backward."""
    n = mean2d.shape[0]
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    num_tiles = tiles_x * tiles_y
    c = pairs_per_gaussian
    do_ellipse = conic is not None and opacity is not None
    # Equality (rect_candidates == c) is allowed: the rect enumeration
    # width is unchanged but the per-row left-pack still runs, which is
    # what the TIERED emission needs ("first c1 columns hold the real
    # survivors"). The 1M regime hits max-survivors == max-footprint, and
    # without this the tier — the only thing taming an N*c flat sort at
    # that scale — would silently disengage.
    compact = do_ellipse and 0 < c <= rect_candidates
    c_rect = rect_candidates if compact else c

    tile_id, valid, touched = _candidate_cells(
        mean2d, radius, conic, opacity, tiles_x, tiles_y, c_rect,
        do_ellipse,
    )
    overflow = jnp.maximum(touched - c_rect, 0)
    if compact:
        # Pack survivors left (key: valid cells keep their enumeration
        # index j, invalid get C_rect; within a gaussian every tile is
        # distinct so relative order is irrelevant) and keep the first c
        # columns.
        j = jnp.arange(c_rect, dtype=jnp.int32)[None, :]
        skey, tile_id = jax.lax.sort(
            (jnp.where(valid, j, c_rect).astype(jnp.int32), tile_id),
            num_keys=1, is_stable=False,
        )
        overflow = overflow + jnp.maximum(jnp.sum(valid, axis=1) - c, 0)
        tile_id = tile_id[:, :c]
        valid = skey[:, :c] < c_rect

    # Single-key sort: pack (tile, depth) into one uint32 — the CUDA
    # reference radix-sorts a packed 64-bit key the same way; one 32-bit
    # key beats TPU's lexicographic 2-key variadic sort. Bit split adapts:
    # tiles take ceil(log2(T+2)) high bits (the +1 sentinel for invalid
    # pairs must fit), depth gets the rest via the monotonic squash
    # q = d/(d+1) in (0,1). At 800x800 that is 20 depth bits (~3e-5 world
    # resolution at d=3) — only true near-ties can reorder, and alpha
    # compositing of coincident-depth splats is order-insensitive to f32
    # noise anyway. (A rank-packed payload-free variant — pre-sort N by
    # depth, pack (tile << idx_bits) | rank — measured 2.4x SLOWER on TPU:
    # the post-sort 1.2M-element index gather swamps the narrower sort.)
    nbits_tile = max(int(np.ceil(np.log2(num_tiles + 2))), 1)
    depth_bits = 32 - nbits_tile
    q = jnp.clip(depth / (depth + 1.0), 0.0, 1.0 - 1e-7)
    dq = jnp.minimum(
        (q * np.float32(2.0**depth_bits)).astype(jnp.uint32),
        np.uint32(2**depth_bits - 1),
    )
    use_tier = compact and 0 < tier_split < c and heavy_budget > 0
    if use_tier:
        # hb > n (auto_tier_caps' quantum floor on a small scene) would
        # leave heavy_list at length n (slices clamp) and break the
        # (hb, c-c1) broadcasts below; no scene has more than n heavy
        # gaussians, so clamping is exact (advisor r4).
        c1, hb = tier_split, min(heavy_budget, n)
        ids = jnp.arange(n, dtype=jnp.int32)
        count = jnp.sum(valid, axis=1).astype(jnp.int32)
        heavy = count > c1
        # Heavy rank in index order (matches the sorted selection below).
        rank = jnp.cumsum(heavy.astype(jnp.int32)) - 1
        heavy_list = jax.lax.sort(jnp.where(heavy, ids, n))[:hb]  # pad n
        # Heavy gaussians past the static capacity lose their overflow
        # columns (their first c1 survive in tier A) — observable drop.
        overflow = overflow + jnp.where(
            heavy & (rank >= hb), count - c1, 0
        )
        hsafe = jnp.minimum(heavy_list, n - 1)
        pad_h = (heavy_list >= n)[:, None]
        tile_b = jnp.where(pad_h, num_tiles, tile_id[hsafe][:, c1:])
        key = jnp.concatenate([
            (jnp.left_shift(tile_id[:, :c1].astype(jnp.uint32), depth_bits)
             | dq[:, None]).reshape(-1),
            (jnp.left_shift(tile_b.astype(jnp.uint32), depth_bits)
             | dq[hsafe][:, None]).reshape(-1),
        ])
        flat_gidx = jnp.concatenate([
            jnp.broadcast_to(ids[:, None], (n, c1)).reshape(-1),
            jnp.broadcast_to(hsafe[:, None], (hb, c - c1)).reshape(-1),
        ])
        flat_tid = jnp.concatenate([
            jnp.broadcast_to(ids[:, None], (n, c1)).reshape(-1),
            jnp.broadcast_to(
                (n + jnp.arange(hb, dtype=jnp.int32))[:, None],
                (hb, c - c1),
            ).reshape(-1),
        ])
        sorted_key, sorted_gidx, sorted_tid = jax.lax.sort(
            (key, flat_gidx, flat_tid), num_keys=1, is_stable=False
        )
    else:
        heavy_list = sorted_tid = None
        key = (
            jnp.left_shift(tile_id.astype(jnp.uint32), depth_bits)
            | jnp.broadcast_to(dq[:, None], (n, c))
        ).reshape(-1)
        flat_gidx = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[:, None], (n, c)
        ).reshape(-1)
        # is_stable=False: a stable sort makes XLA carry an extra iota
        # tiebreaker through the 600k-element sort (~3 arrays instead of
        # 2). Ties are (tile, quantized-depth) collisions whose blend
        # order is semantically arbitrary — the reference's radix sort is
        # likewise arbitrary across equal keys, and the oracle orders by
        # TRUE depth, which a stable candidate-index order doesn't
        # reproduce either.
        sorted_key, sorted_gidx = jax.lax.sort(
            (key, flat_gidx), num_keys=1, is_stable=False
        )
    tids = jnp.arange(num_tiles + 1, dtype=jnp.uint32)
    # scan_unrolled: the default scan method wraps the ~20 binary-search
    # gathers in a while loop whose per-step tuple threading costs as much
    # as the gathers themselves (0.34 + 0.34 ms at 600k keys, r4 profile);
    # unrolled, the loop shell disappears and the gathers pipeline.
    bounds = jnp.searchsorted(
        sorted_key, jnp.left_shift(tids, depth_bits), side="left",
        method="scan_unrolled",
    ).astype(jnp.int32)
    tile_start = bounds[:-1]
    tile_end = bounds[1:]
    culled = jnp.sum(overflow)
    return TileBins(
        sorted_gidx, tile_start, tile_end, culled,
        table_idx=sorted_tid, heavy_list=heavy_list,
    )


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _probe_slab_stats(
    mean2d, radius, conic, opacity, tiles_x, tiles_y, c, c_rect
):
    tile_id, valid, _ = _candidate_cells(
        mean2d, radius, conic, opacity, tiles_x, tiles_y, c_rect, True
    )
    # The left-pack keeps each row's first c survivors in enumeration
    # order; cells beyond that truncate (bin_gaussians compact semantics).
    kept = valid & (jnp.cumsum(valid.astype(jnp.int32), axis=1) <= c)
    num_tiles = tiles_x * tiles_y
    hist = jnp.bincount(
        jnp.where(kept, tile_id, num_tiles).reshape(-1),
        length=num_tiles + 1,
    )[:num_tiles]
    return jnp.sum(kept, axis=1).astype(jnp.int32), hist


def _probe_pair_stats(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    c: int,
    rect_candidates: int,
    slab: int = 1 << 20,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side slab-wise cap probe: (per-gaussian kept-survivor counts
    (N,), per-tile kept-pair counts (num_tiles,)) — WITHOUT materializing
    the N x C candidate list or its global sort. The one-shot
    bin_gaussians probe was the FIRST thing to OOM at 8M splats (the
    render itself fits); slabbing bounds probe memory at slab x c_rect
    regardless of N. Semantics match bin_gaussians exactly (shared
    _candidate_cells + first-c-in-enumeration-order truncation)."""
    n = proj.mean2d.shape[0]
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    c_rect = rect_candidates if 0 < c <= rect_candidates else c
    counts = np.empty(n, np.int32)
    hist = np.zeros(tiles_x * tiles_y, np.int64)
    for a in range(0, n, slab):
        b = min(a + slab, n)
        pad = slab - (b - a) if n > slab else 0
        f = (lambda x: np.pad(np.asarray(x[a:b]), [(0, pad)] + [(0, 0)] * (
            x.ndim - 1))) if pad else (lambda x: x[a:b])
        cnt, h = _probe_slab_stats(
            f(proj.mean2d), f(proj.radius_tight), f(proj.conic),
            f(proj.opacity), tiles_x, tiles_y, c, c_rect,
        )
        counts[a:b] = np.asarray(cnt)[: b - a]  # pad rows: radius 0 -> 0
        hist += np.asarray(h, np.int64)
    return counts, hist


def auto_pairs_budget(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    pairs_per_gaussian: int = 32,
    margin: float = 1.25,
    rect_candidates: int = 0,
) -> int:
    """Size `pairs_budget` (the packed-layout SLOT capacity, including each
    tile's round-up-to-CHUNK padding — pack_pairs semantics) from the
    actual binned pair counts of one view (margin headroom, rounded to the
    DMA chunk quantum). Pass the run's `rect_candidates` so the probe bins
    EXACTLY like the run — with compaction on, a probe binned at only
    `pairs_per_gaussian` rect cells truncates the rect enumeration where
    the run compacts ellipse survivors, so their pair sets (and padded
    totals) diverge. Host-side helper — runs one binning pass; call once
    at setup, not inside jit."""
    from .pallas_blend import CHUNK

    _, hist = _probe_pair_stats(
        proj, width, height, pairs_per_gaussian, rect_candidates
    )
    padded_total = int(((hist + CHUNK - 1) // CHUNK).sum() * CHUNK)
    budget = int(padded_total * margin) + CHUNK
    return ((budget + CHUNK - 1) // CHUNK) * CHUNK


def auto_compact_budget(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    pairs_per_gaussian: int = 32,
    margin: float = 1.25,
    rect_candidates: int = 0,
) -> int:
    """Size `compact_budget` (the PAIR-indexed backward-scatter capacity,
    pack_pairs semantics) from one view's actual valid pair count. The TPU
    scatter-add runs a serial loop per update row, so scattering only the
    valid pairs instead of every padded slot cuts the render backward's
    most expensive op roughly in half. Host-side; call once at setup."""
    from .pallas_blend import CHUNK

    _, hist = _probe_pair_stats(
        proj, width, height, pairs_per_gaussian, rect_candidates
    )
    budget = int(int(hist.sum()) * margin) + CHUNK
    return ((budget + CHUNK - 1) // CHUNK) * CHUNK


def auto_pairs_per_gaussian(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    quantum: int = 4,
    floor: int = 4,
) -> int:
    """Size the static per-gaussian pair capacity from the view's actual
    max tile footprint (rounded up to `quantum`). The raw pair list is
    N * pairs_per_gaussian and feeds the global sort, so an oversized cap
    is pure sort bandwidth: the bench scene needs 12 where the default of
    16 sorts 33% more keys. Host-side helper; call once at setup (a new
    value recompiles, so callers should take the max over their cameras)."""
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    rmin_x, rmax_x, rmin_y, rmax_y = _tile_rect(
        proj.mean2d, proj.radius_tight, tiles_x, tiles_y
    )
    touched = jnp.where(
        proj.radius_tight > 0, (rmax_x - rmin_x) * (rmax_y - rmin_y), 0
    )
    m = max(int(jnp.max(touched)), floor)
    return ((m + quantum - 1) // quantum) * quantum


def auto_pair_caps(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    quantum: int = 2,
    floor: int = 2,
) -> tuple[int, int]:
    """Measure BOTH static pair capacities for `bin_gaussians` row
    compaction: (pairs_per_gaussian, rect_candidates) = (max cells
    surviving the exact ellipse test, max rect footprint), each rounded up
    to `quantum`. The first sizes the global sort, the second the rect
    enumeration. Host-side; call at setup, max over cameras (each distinct
    value is a recompile)."""
    rect = auto_pairs_per_gaussian(proj, width, height, quantum, floor)
    # Survivor count per gaussian via the slab-wise probe (no N x C
    # candidate materialization — the one-shot probe was the first OOM at
    # 8M splats). One-time setup cost.
    counts, _ = _probe_pair_stats(proj, width, height, rect, rect)
    keep = max(int(counts.max()), floor)
    keep = ((keep + quantum - 1) // quantum) * quantum
    return min(keep, rect), rect


def _survivor_counts(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    pairs_per_gaussian: int,
    rect_candidates: int,
) -> np.ndarray:
    """Per-gaussian post-ellipse-test survivor counts of one view (the
    histogram both tier-sizing helpers work from). Host-side, slab-wise."""
    counts, _ = _probe_pair_stats(
        proj, width, height, pairs_per_gaussian, rect_candidates
    )
    return counts


def auto_heavy_budget(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    pairs_per_gaussian: int,
    rect_candidates: int,
    tier_split: int,
    margin: float = 1.6,
    quantum: int = 1024,
) -> int:
    """Size `heavy_budget` for a FIXED `tier_split` from one view's
    survivor histogram (margin + quantum as in auto_tier_caps). Multi-view
    callers that pick one global split must size the heavy capacity from
    EVERY view at that split — a view where tiering was locally
    unprofitable still has heavy gaussians whose overflow would silently
    drop if only the profitable views sized the cap (advisor r4)."""
    counts = _survivor_counts(
        proj, width, height, pairs_per_gaussian, rect_candidates
    )
    heavy = int((counts > tier_split).sum())
    hb = int(heavy * margin) + quantum
    return ((hb + quantum - 1) // quantum) * quantum


def auto_tier_caps(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    pairs_per_gaussian: int,
    rect_candidates: int,
    margin: float = 1.6,
    quantum: int = 1024,
) -> tuple[int, int]:
    """Measure the tiered-bin capacities `(tier_split, heavy_budget)` for
    `bin_gaussians` from one view's per-gaussian survivor-count histogram:
    pick the split c1 minimizing the flat candidate count
    N*c1 + heavy(c1)*margin*(c - c1), and size the heavy capacity with
    margin (the heavy SET shifts as an attack perturbs the scene).
    Returns (0, 0) when tiering isn't profitable (best cut < 20%) or not
    applicable (no row compaction). Host-side; call at setup, max over
    cameras (each distinct value is a recompile)."""
    c = pairs_per_gaussian
    if not (0 < c <= rect_candidates):
        return 0, 0
    n = proj.mean2d.shape[0]
    counts = _survivor_counts(
        proj, width, height, c, rect_candidates
    )
    best = (n * c, 0, 0)
    for c1 in range(1, c):
        heavy = int((counts > c1).sum())
        hb = int(heavy * margin) + quantum
        hb = ((hb + quantum - 1) // quantum) * quantum
        flat = n * c1 + hb * (c - c1)
        if flat < best[0]:
            best = (flat, c1, hb)
    if best[0] > 0.8 * n * c:
        return 0, 0
    return best[1], best[2]


def auto_caps(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    margin: float = 1.0,
) -> tuple[int, int, int, int, tuple[int, int]]:
    """One-call static-cap resolution for a single-view workload:
    (pairs_per_gaussian, rect_candidates, pairs_budget, compact_budget,
    (tier_split, heavy_budget)). Keeps rect == pairs when the tiered bin
    is profitable (the left-pack alone enables tiering — the 1M regime
    hits max-survivors == max-footprint), zeroes rect otherwise. Host-side
    setup cost; every distinct value is a recompile."""
    pairs, rect = auto_pair_caps(proj, width, height)
    tier = auto_tier_caps(proj, width, height, pairs, rect)
    if tier == (0, 0) and rect <= pairs:
        rect = 0  # identity left-pack with no tier: skip it
    budget = auto_pairs_budget(
        proj, width, height, pairs, margin=margin, rect_candidates=rect
    )
    compact = auto_compact_budget(
        proj, width, height, pairs, margin=margin, rect_candidates=rect
    )
    return pairs, rect, budget, compact, tier


def _blend_tiles(
    bins: TileBins,
    mean2d: jnp.ndarray,
    conic: jnp.ndarray,
    opacity: jnp.ndarray,
    channels: jnp.ndarray,  # (N, CH) rgb + obj
    width: int,
    height: int,
    chunk: int,
    max_chunks: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """vmap-over-tiles chunked blend. Returns (image (H, W, CH), T (H, W))."""
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    num_tiles = tiles_x * tiles_y
    n_ch = channels.shape[-1]
    p = TILE * TILE

    # Pre-gather per-pair data ONCE in sorted-pair order: the blend loop then
    # reads contiguous slices instead of doing 4 scattered row-gathers per
    # chunk per tile (a major TPU win; the backward turns into one
    # scatter-add through this gather).
    gidx_pad = jnp.concatenate(
        [bins.gauss_idx, jnp.zeros(chunk, jnp.int32)], axis=0
    )
    pair_geom = jnp.concatenate(
        [mean2d, conic, opacity[:, None]], axis=-1
    )[gidx_pad]  # (P+chunk, 6)
    pair_col = channels[gidx_pad]  # (P+chunk, CH)

    def tile_fn(tile_id, start, end):
        t_y = tile_id // tiles_x
        t_x = tile_id % tiles_x
        px = (t_x * TILE + jnp.arange(TILE, dtype=jnp.int32))[None, :]
        py = (t_y * TILE + jnp.arange(TILE, dtype=jnp.int32))[:, None]
        pxf = jnp.broadcast_to(px, (TILE, TILE)).reshape(p).astype(jnp.float32)
        pyf = jnp.broadcast_to(py, (TILE, TILE)).reshape(p).astype(jnp.float32)

        @jax.checkpoint
        def chunk_step(carry, k):
            accum, T, done = carry
            base = start + k * chunk
            pair_valid = (base + jnp.arange(chunk, dtype=jnp.int32)) < end

            geom = jax.lax.dynamic_slice(pair_geom, (base, 0), (chunk, 6))
            m = geom[:, 0:2]  # (K, 2)
            con = geom[:, 2:5]  # (K, 3)
            op = geom[:, 5]  # (K,)
            col = jax.lax.dynamic_slice(
                pair_col, (base, 0), (chunk, n_ch)
            )  # (K, CH)

            dx = pxf[None, :] - m[:, 0:1]  # (K, P)
            dy = pyf[None, :] - m[:, 1:2]
            power = (
                -0.5 * (con[:, 0:1] * dx * dx + con[:, 2:3] * dy * dy)
                - con[:, 1:2] * dx * dy
            )
            # power > 0 is masked out below; clamp before exp so overflowing
            # lanes can't poison the VJP with inf * 0 = NaN.
            alpha = jnp.minimum(
                ALPHA_MAX, op[:, None] * jnp.exp(jnp.minimum(power, 0.0))
            )
            use = (power <= 0.0) & (alpha >= ALPHA_MIN) & pair_valid[:, None]
            alpha = jnp.where(use, alpha, 0.0)

            # Inclusive within-chunk transmittance (log-space cumprod).
            log1m = jnp.log1p(-alpha)
            t_incl = T[None, :] * jnp.exp(jnp.cumsum(log1m, axis=0))
            frozen = (t_incl < T_EPS) | done[None, :]
            alpha_eff = jnp.where(frozen, 0.0, alpha)

            log1m_eff = jnp.log1p(-alpha_eff)
            cum_eff = jnp.cumsum(log1m_eff, axis=0)
            t_exc = T[None, :] * jnp.exp(cum_eff - log1m_eff)
            w = alpha_eff * t_exc  # (K, P)

            # HIGHEST precision: on TPU the default f32 matmul runs in
            # bf16 passes (~1e-3 error) which would break oracle parity;
            # this (P, K) @ (K, CH) accumulation is tiny vs the VPU work.
            accum = accum + jnp.dot(
                w.T,
                col,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (P, CH)
            T = T * jnp.exp(cum_eff[-1])
            done = done | jnp.any((t_incl < T_EPS) & use, axis=0)
            return (accum, T, done), None

        init = (
            jnp.zeros((p, n_ch), jnp.float32),
            jnp.ones((p,), jnp.float32),
            jnp.zeros((p,), bool),
        )
        (accum, T, _), _ = jax.lax.scan(
            chunk_step, init, jnp.arange(max_chunks, dtype=jnp.int32)
        )
        return accum, T

    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    accum, T = jax.vmap(tile_fn)(tids, bins.tile_start, bins.tile_end)
    # (num_tiles, P, CH) -> (H_pad, W_pad, CH) -> crop
    img = accum.reshape(tiles_y, tiles_x, TILE, TILE, n_ch)
    img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * TILE, tiles_x * TILE, n_ch)
    Tm = T.reshape(tiles_y, tiles_x, TILE, TILE)
    Tm = Tm.transpose(0, 2, 1, 3).reshape(tiles_y * TILE, tiles_x * TILE)
    return img[:height, :width], Tm[:height, :width]


def _blend_tiles_pallas(
    bins: TileBins,
    proj: ProjectedGaussians,
    channels: jnp.ndarray,
    width: int,
    height: int,
    chunk: int,
    max_chunks: int,
    interpret: bool,
    pairs_budget: int = 0,
    compact_budget: int = 0,
    tier_split: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas-kernel blend path (ops/pallas_blend.py). The per-pair gather +
    aligned re-pack here are differentiable; their transpose scatter-adds
    the kernel's per-pair gradients back onto the gaussians."""
    from .pallas_blend import GEOM_W, pack_pairs, pallas_blend

    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    n_ch = channels.shape[-1]
    geom_all = jnp.concatenate(
        [
            proj.mean2d,
            proj.conic,
            proj.opacity[:, None],
            jnp.zeros((proj.mean2d.shape[0], GEOM_W - 6), jnp.float32),
        ],
        axis=-1,
    )
    # bin_gaussians structurally emits EXACTLY pairs_per_gaussian
    # candidates per gaussian (valid or sentinel-tiled) — the multiplicity
    # guarantee behind pack_pairs's large-scene table backward. With the
    # tiered bin the per-TIER multiplicities are exact instead and ride
    # table_idx/heavy_list.
    mult = (
        0
        if bins.table_idx is not None
        else bins.gauss_idx.shape[0] // geom_all.shape[0]
    )
    pair_packed, p_start, p_end, ch_pad, n_budget_dropped = pack_pairs(
        geom_all, channels, bins.gauss_idx, bins.tile_start, bins.tile_end,
        budget=pairs_budget, compact_budget=compact_budget,
        gauss_multiplicity=mult,
        table_idx=bins.table_idx, heavy_list=bins.heavy_list,
        tier_split=tier_split,
    )
    packed = pallas_blend(
        pair_packed, p_start, p_end, tiles_x, tiles_y, max_chunks, interpret,
    )  # (num_tiles, CH_pad+1, P_PIX); T is the last row
    img_t = jnp.swapaxes(packed[:, :n_ch, :], 1, 2)  # (tiles, P, CH)
    T_t = packed[:, ch_pad, :]
    img = img_t.reshape(tiles_y, tiles_x, TILE, TILE, n_ch)
    img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * TILE, tiles_x * TILE, n_ch)
    Tm = T_t.reshape(tiles_y, tiles_x, TILE, TILE)
    Tm = Tm.transpose(0, 2, 1, 3).reshape(tiles_y * TILE, tiles_x * TILE)
    # max_chunks clips hot tiles at max_chunks*CHUNK pairs (fwd and bwd see
    # the same truncated set, so grads stay consistent — but the drop must
    # be observable).
    from .pallas_blend import CHUNK as P_CHUNK

    n_clipped = jnp.sum(
        jnp.maximum((p_end - p_start) - max_chunks * P_CHUNK, 0)
    ).astype(jnp.int32)
    return (
        img[:height, :width],
        Tm[:height, :width],
        n_budget_dropped + n_clipped,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "pairs_per_gaussian", "chunk", "max_chunks",
        "backend", "interpret", "pairs_budget", "with_objects",
        "rect_candidates", "compact_budget", "tier_split", "heavy_budget",
    ),
)
def rasterize(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    bg: jnp.ndarray,
    pairs_per_gaussian: int = 32,
    chunk: int = 64,
    max_chunks: int = 16,
    backend: str = "xla",
    interpret: bool = False,
    pairs_budget: int = 0,
    with_objects: bool = True,
    rect_candidates: int = 0,
    compact_budget: int = 0,
    tier_split: int = 0,
    heavy_budget: int = 0,
) -> dict:
    """Full tile rasterization of projected Gaussians.

    `with_objects=False` skips blending the 16 grouping-feature channels
    (2/3 of the blend bandwidth) — `render_object` comes back zero-filled;
    use when the loss only consumes RGB.

    `backend`: "xla" (vmapped masked-chunk blend, JAX-AD differentiable) or
    "pallas" (TPU kernels with hand-written VJP, dynamic per-tile work).
    `chunk` sizes the XLA path's blend chunks only; the pallas kernels use
    the fixed DMA-alignment quantum (pallas_blend.CHUNK = 128).
    `pairs_budget` (pallas only) statically caps the packed pair list —
    ~4x the point count is a safe default for trained scenes.
    `tier_split`/`heavy_budget` (pallas only) enable the tiered bin for
    large scenes — size them with `auto_tier_caps`.

    Returns dict with `render` (H, W, 3), `render_object` (H, W, C_obj),
    `final_transmittance` (H, W) and `num_culled_pairs` (static-capacity
    overflow diagnostic).
    """
    # The tiered bin changes the flat emission ORDER, so quantized-depth
    # TIES can resolve differently than untiered (semantically arbitrary,
    # like the reference's radix sort — but pointwise visible when two
    # high-alpha splats share a depth bin). Both backends consume the same
    # tiered bin (XLA ignores the table fields) so pallas-vs-xla parity
    # compares identical pair orders.
    bins = bin_gaussians(
        proj.mean2d, proj.depth, proj.radius_tight, width, height,
        pairs_per_gaussian, conic=proj.conic, opacity=proj.opacity,
        rect_candidates=rect_candidates,
        tier_split=tier_split, heavy_budget=heavy_budget,
    )
    channels = (
        jnp.concatenate([proj.color, proj.obj], axis=-1)
        if with_objects
        else proj.color
    )
    if backend == "pallas":
        img, T, num_truncated = _blend_tiles_pallas(
            bins, proj, channels, width, height, chunk, max_chunks, interpret,
            pairs_budget, compact_budget, tier_split,
        )
    else:
        img, T = _blend_tiles(
            bins,
            proj.mean2d,
            proj.conic,
            proj.opacity,
            channels,
            width,
            height,
            chunk,
            max_chunks,
        )
        # The XLA path's per-tile work cap is chunk * max_chunks pairs.
        num_truncated = jnp.sum(
            jnp.maximum(
                (bins.tile_end - bins.tile_start) - chunk * max_chunks, 0
            )
        ).astype(jnp.int32)
    n_ch = channels.shape[-1]
    bg_full = jnp.concatenate([bg, jnp.zeros(n_ch - bg.shape[0], bg.dtype)])
    img = img + T[..., None] * bg_full[None, None, :]
    obj_img = (
        img[..., 3:]
        if with_objects
        else jnp.zeros(img.shape[:2] + (proj.obj.shape[-1],), img.dtype)
    )
    return {
        "render": img[..., :3],
        "render_object": obj_img,
        "final_transmittance": T,
        "num_culled_pairs": bins.num_culled_pairs,
        # Valid pairs dropped past the static work caps (pairs_budget clamp
        # + per-tile max_chunks clipping). Nonzero => the image is missing
        # contributions; raise pairs_budget / max_chunks.
        "num_truncated_pairs": num_truncated,
    }


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "pairs_per_gaussian", "chunk", "max_chunks",
        "backend", "interpret", "pairs_budget", "with_objects",
        "rect_candidates", "compact_budget", "tier_split", "heavy_budget",
    ),
)
def rasterize_views(
    proj: ProjectedGaussians,  # leading views dim on every array (V, N, ...)
    width: int,
    height: int,
    bg: jnp.ndarray,
    pairs_per_gaussian: int = 32,
    chunk: int = 64,
    max_chunks: int = 16,
    backend: str = "pallas",
    interpret: bool = False,
    pairs_budget: int = 0,
    with_objects: bool = True,
    rect_candidates: int = 0,
    compact_budget: int = 0,
    tier_split: int = 0,
    heavy_budget: int = 0,
) -> dict:
    """Multi-view batched rasterization.

    The pallas path bins and packs per view (vmapped XLA) then blends the
    WHOLE batch in one kernel launch with grid (views, tiles) — killing the
    per-view `lax.map` serialization and its repeated grid overhead
    (VERDICT r2 item 2; the reference launches its CUDA rasterizer once per
    view, `attack.py:481-484`). The xla backend simply vmaps `rasterize`.

    Returns the `rasterize` dict with a leading view dim on the images and
    scalar diagnostics summed over views.
    """
    if backend != "pallas":
        fn = lambda p: rasterize(
            p, width, height, bg, pairs_per_gaussian, chunk, max_chunks,
            backend, interpret, pairs_budget, with_objects, rect_candidates,
        )
        return jax.vmap(fn)(proj)

    from .pallas_blend import CHUNK as P_CHUNK
    from .pallas_blend import GEOM_W, pack_pairs, pallas_blend_views

    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE

    channels = (
        jnp.concatenate([proj.color, proj.obj], axis=-1)
        if with_objects
        else proj.color
    )
    n_ch = channels.shape[-1]
    geom_all = jnp.concatenate(
        [
            proj.mean2d,
            proj.conic,
            proj.opacity[..., None],
            jnp.zeros(proj.mean2d.shape[:2] + (GEOM_W - 6,), jnp.float32),
        ],
        axis=-1,
    )  # (V, N, GEOM_W)
    # Per-view bin + pack as an UNROLLED loop (V is small and static):
    # vmapping lax.sort and the pack gather knocks both off their TPU fast
    # paths (measured 113ms/view batched vs 70ms unbatched at 100k/800^2);
    # unrolled they perform exactly like the single-view path, and only
    # the blend kernel launch is batched.
    v = geom_all.shape[0]
    per_view = []
    for vi in range(v):
        bins = bin_gaussians(
            proj.mean2d[vi], proj.depth[vi], proj.radius_tight[vi], width,
            height, pairs_per_gaussian, conic=proj.conic[vi],
            opacity=proj.opacity[vi], rect_candidates=rect_candidates,
            tier_split=tier_split, heavy_budget=heavy_budget,
        )
        per_view.append(
            pack_pairs(
                geom_all[vi], channels[vi], bins.gauss_idx, bins.tile_start,
                bins.tile_end, budget=pairs_budget,
                compact_budget=compact_budget,
                gauss_multiplicity=(
                    0 if bins.table_idx is not None
                    else bins.gauss_idx.shape[0] // geom_all[vi].shape[0]
                ),
                table_idx=bins.table_idx, heavy_list=bins.heavy_list,
                tier_split=tier_split,
            )
            + (bins.num_culled_pairs,)
        )
    packed = jnp.stack([pv[0] for pv in per_view])
    p_start = jnp.stack([pv[1] for pv in per_view])
    p_end = jnp.stack([pv[2] for pv in per_view])
    n_dropped = jnp.stack([pv[4] for pv in per_view])
    n_culled = jnp.stack([pv[5] for pv in per_view])
    ch_pad = ((n_ch + 7) // 8) * 8  # static (pack_pairs' sublane padding)
    out = pallas_blend_views(
        packed, p_start, p_end, tiles_x, tiles_y, max_chunks, interpret,
    )  # (V, T, CH_pad+1, P_PIX)
    v = out.shape[0]
    img_t = jnp.swapaxes(out[:, :, :n_ch, :], 2, 3)  # (V, T, P, CH)
    T_t = out[:, :, ch_pad, :]
    img = img_t.reshape(v, tiles_y, tiles_x, TILE, TILE, n_ch)
    img = img.transpose(0, 1, 3, 2, 4, 5).reshape(
        v, tiles_y * TILE, tiles_x * TILE, n_ch
    )
    Tm = T_t.reshape(v, tiles_y, tiles_x, TILE, TILE)
    Tm = Tm.transpose(0, 1, 3, 2, 4).reshape(
        v, tiles_y * TILE, tiles_x * TILE
    )
    img = img[:, :height, :width]
    Tm = Tm[:, :height, :width]
    n_clipped = jnp.sum(
        jnp.maximum((p_end - p_start) - max_chunks * P_CHUNK, 0)
    ).astype(jnp.int32)
    bg_full = jnp.concatenate([bg, jnp.zeros(n_ch - bg.shape[0], bg.dtype)])
    img = img + Tm[..., None] * bg_full[None, None, None, :]
    obj_img = (
        img[..., 3:]
        if with_objects
        else jnp.zeros(img.shape[:3] + (proj.obj.shape[-1],), img.dtype)
    )
    return {
        "render": img[..., :3],
        "render_object": obj_img,
        "final_transmittance": Tm,
        "num_culled_pairs": jnp.sum(n_culled),
        "num_truncated_pairs": jnp.sum(n_dropped) + n_clipped,
    }
