"""Pallas TPU kernels for the tile blend — the hot core of the rasterizer.

Replaces the XLA `_blend_tiles` path (ops/raster.py) for the per-tile
front-to-back compositing. Why a kernel: the XLA path must run the static
`max_chunks` worth of work for EVERY tile (masked), while the TPU grid is
sequential per core, so a kernel can loop exactly `ceil(n_tile / K)` chunks
per tile and skip all-done tiles early; chunk loads are explicit HBM->VMEM
DMAs of contiguous sorted-pair slices.

TPU layout constraints shape the data model (Mosaic requires DMA slices to
be 128-aligned in the minor dimension):
  * per-pair data is stored FIELD-MAJOR: geometry (8, P_pad) rows
    [mx, my, A, B, C, opacity, 0, 0] and colors (CH, P_pad), with every
    tile's pair range padded to a 128 multiple so chunk slices
    [:, base:base+K] are aligned (base % 128 == 0, K == 128);
  * kernel math runs in (pixels, pairs) = (256, 128) orientation — pixels
    on sublanes, the chunk on lanes; within-chunk cumulative transmittance
    is an MXU matmul with a triangular ones matrix.

Alpha saturation matches the reference CUDA blend exactly (0.99 clamp,
1/255 skip, positive-power skip, 1e-4 transmittance stop); parity is tested
against the oracle-validated XLA path.

The forward saves the chunk-boundary transmittance record (done flag in
the sign bit; ~1KB per occupied chunk) so the backward needs NO replay: it
walks chunks back-to-front maintaining the suffix accumulator
S_i = sum_{j>i} w_j (c_j . gC) — the standard 3DGS backward — emitting
per-pair gradients in the same packed layout; the caller's
(differentiable) scatter transpose routes them back to the gaussians.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
P_PIX = TILE * TILE
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
GEOM_W = 8  # packed geometry rows per pair
CHUNK = 128  # pairs per chunk == DMA alignment quantum

_HIGH = jax.lax.Precision.HIGHEST  # Mosaic supports only DEFAULT | HIGHEST; DEFAULT (1-pass bf16) breaks the 1e-3 parity gate


def _tri_lanes(k: int, strict: bool):
    """(K, K) ones matrix for lane-direction cumulative sums: out[:, i] =
    sum_{j <= i} in[:, j] via in @ M, with M[j, i] = 1 for j <= i (strict:
    j < i). Built from iota (kernels cannot capture constants)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return ((row < col) if strict else (row <= col)).astype(jnp.float32)


def _pixel_coords(tile_id, tiles_x):
    """Pixel centers of the 16x16 tile as (P_PIX, 1) columns."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (P_PIX, 1), 0)
    t_y = tile_id // tiles_x
    t_x = tile_id % tiles_x
    px = (t_x * TILE + idx % TILE).astype(jnp.float32)
    py = (t_y * TILE + idx // TILE).astype(jnp.float32)
    return px, py


def _chunk_alpha(geom, valid_row, pxf, pyf):
    """geom (GEOM_W, K) field-major -> per (pixel, pair) quantities.

    Returns (alpha (P,K), alpha_pre, clamped, dx, dy, power)."""
    mx = geom[0:1, :]  # (1, K)
    my = geom[1:2, :]
    A = geom[2:3, :]
    B = geom[3:4, :]
    C = geom[4:5, :]
    op = geom[5:6, :]
    dx = pxf - mx  # (P, K)
    dy = pyf - my
    power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
    alpha_pre = op * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(ALPHA_MAX, alpha_pre)
    clamped = alpha_pre > ALPHA_MAX
    use = (power <= 0.0) & (alpha >= ALPHA_MIN) & valid_row
    alpha = jnp.where(use, alpha, 0.0)
    return alpha, alpha_pre, clamped, dx, dy, power


def _exact_bf16_dot(x, m):
    """x @ m where m is EXACT in bf16 (0/1 entries): a 3-way bf16 split of
    x (24 mantissa bits total, f32-grade) costs 3 single-pass MXU matmuls
    where precision=HIGHEST costs 6 — and Mosaic has no HIGH (3-pass)
    lowering to reach for instead."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    mb = m.astype(jnp.bfloat16)
    out = jnp.dot(hi, mb, preferred_element_type=jnp.float32)
    out = out + jnp.dot(mid, mb, preferred_element_type=jnp.float32)
    return out + jnp.dot(lo, mb, preferred_element_type=jnp.float32)


def _forward_chunk_blend(alpha, T_in, done_in, want_state: bool = True):
    """Forward compositing for one chunk, (P, K) orientation.

    T_in/done_in are (P, 1) columns. Returns (w, T_out, done_out).

    ONE tri matmul: frozen lanes form a SUFFIX of the chunk (t_incl is
    nonincreasing lane-to-lane since alpha <= 0.99, and done_in freezes
    every lane), so at every non-frozen lane the exclusive cumsum of
    EFFECTIVE log-transmittances equals the raw one — the old second
    (effective) tri matmul was redundant, as were the exp(cum_incl) and
    exp(sum) passes: t_incl = t_exc * (1 - alpha) elementwise, and the
    chunk-exit T is t_incl at the last non-frozen lane (the min over
    non-frozen lanes, by monotonicity).

    `want_state=False` (backward replay) skips the chunk-exit (T, done)
    reductions — the backward reloads the saved boundary record instead,
    so computing them is pure wasted VPU work."""
    k = alpha.shape[1]
    lg = jnp.log1p(-alpha)
    cum_exc = _exact_bf16_dot(lg, _tri_lanes(k, True))
    t_exc = T_in * jnp.exp(cum_exc)
    t_incl = t_exc * (1.0 - alpha)
    frozen = (t_incl < T_EPS) | (done_in > 0.5)
    alpha_eff = jnp.where(frozen, 0.0, alpha)
    w = alpha_eff * t_exc  # (P, K)
    if not want_state:
        return w, None, None, alpha_eff, t_exc
    T_out = jnp.min(jnp.where(frozen, T_in, t_incl), axis=1, keepdims=True)
    # Crossing detection as ONE tiny MXU pass instead of a log-step VPU
    # lane max: count sub-epsilon lanes with indicator @ ones — exact in
    # bf16 (0/1 entries, counts <= K < 256). The reference's `alpha > 0`
    # guard is redundant: t_incl is nonincreasing along lanes and equals
    # its predecessor wherever alpha == 0, so the FIRST sub-epsilon lane
    # always has alpha > 0 (T_in >= T_EPS whenever done_in == 0).
    ind = jnp.where(t_incl < T_EPS, 1.0, 0.0).astype(jnp.bfloat16)
    ones_col = (
        jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0) >= 0
    ).astype(jnp.bfloat16)
    cnt = jnp.dot(ind, ones_col, preferred_element_type=jnp.float32)
    done_out = jnp.maximum(done_in, jnp.where(cnt > 0.5, 1.0, 0.0))
    return w, T_out, done_out, alpha_eff, t_exc


def _valid_row(base, e):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    return (base + lane) < e


def _fwd_kernel(
    starts_ref, ends_ref, packed_hbm, out_ref, tchk_out, packed_s, sem,
    *, n_ch: int, tiles_x: int, max_chunks: int, early_exit: bool = True,
):
    # grid = (views, tiles): one launch blends a whole batch of views,
    # amortizing the grid overhead the reference pays per CUDA launch and
    # enabling views-axis data parallelism on the fast path (VERDICT r2 #2).
    v = pl.program_id(0)
    i = pl.program_id(1)
    s = starts_ref[v, i]
    e = ends_ref[v, i]
    pxf, pyf = _pixel_coords(i, tiles_x)
    # Cap identically to the backward kernel: fwd/bwd must see the same
    # pair set or gradients on overloaded tiles would be inconsistent.
    nchunks = jnp.minimum(
        jax.lax.div(e - s + CHUNK - 1, CHUNK), max_chunks
    )

    # Double-buffered chunk loads: start chunk k+1's DMA before computing
    # chunk k, so HBM latency hides behind the blend math. Prefetching past
    # the tile's padded range is safe-by-construction within nchunks.
    def dma(k, slot):
        base = pl.multiple_of(s + k * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            packed_hbm.at[v, :, pl.ds(base, CHUNK)], packed_s.at[slot],
            sem.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    def body(state):
        k, T, done, acc = state
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < nchunks)
        def _():
            dma(k + 1, jax.lax.rem(k + 1, 2)).start()

        # Chunk-BOUNDARY state, saved for the backward (which walks the
        # chunks in reverse and needs (T, done) entering each chunk): the
        # done flag rides T's sign bit (T > 0 always).
        tchk_out[0, 0, k] = (T * (1.0 - 2.0 * done))[:, 0]
        dma(k, slot).wait()
        base = pl.multiple_of(s + k * CHUNK, CHUNK)
        chunk_data = packed_s[slot]
        alpha, _, _, _, _, _ = _chunk_alpha(
            chunk_data[:GEOM_W], _valid_row(base, e), pxf, pyf
        )
        col = chunk_data[GEOM_W:]
        w, T, done, _, _ = _forward_chunk_blend(alpha, T, done)
        # acc (CH, P) += col (CH, K) . w^T (K, P): contract over lanes K
        acc = acc + jax.lax.dot_general(
            col, w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_HIGH,
        )
        return k + 1, T, done, acc

    T0 = jnp.ones((P_PIX, 1), jnp.float32)
    done0 = jnp.zeros((P_PIX, 1), jnp.float32)
    acc0 = jnp.zeros((n_ch, P_PIX), jnp.float32)
    # NOTE: early exit on all-done would leave the k+1 prefetch DMA in
    # flight with no wait (undefined); with double buffering we always run
    # all nchunks (the early-exit win was minor vs hidden DMA latency).
    del early_exit

    def fbody(k, st):
        return body((k, st[0], st[1], st[2]))[1:]

    T, _, acc = jax.lax.fori_loop(0, nchunks, fbody, (T0, done0, acc0))
    out_ref[0, 0] = jnp.concatenate([acc, T.T], axis=0)  # (CH+1, P)


def _bwd_kernel(
    starts_ref, ends_ref, packed_hbm, gout_ref, out_ref, tchk_ref,
    dpacked_hbm, packed_s, dpacked_s, sem, osem,
    *, n_ch: int, tiles_x: int, max_chunks: int,
):
    v = pl.program_id(0)
    i = pl.program_id(1)
    s = starts_ref[v, i]
    e = ends_ref[v, i]
    pxf, pyf = _pixel_coords(i, tiles_x)
    nchunks = jnp.minimum(jax.lax.div(e - s + CHUNK - 1, CHUNK), max_chunks)

    def dma_in(k, slot):
        base = pl.multiple_of(s + k * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            packed_hbm.at[v, :, pl.ds(base, CHUNK)], packed_s.at[slot],
            sem.at[slot],
        )

    def dma_out(k, slot):
        base = pl.multiple_of(s + k * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            dpacked_s.at[slot], dpacked_hbm.at[v, :, pl.ds(base, CHUNK)],
            osem.at[slot],
        )

    # No forward replay: the forward saved the chunk-boundary (T, done)
    # state (done in T's sign bit) and the final transmittance is the last
    # channel row of the primal output — the backward goes straight into
    # the back-to-front walk, roughly halving its chunk work.
    gC = gout_ref[0, 0][:n_ch, :]  # (CH, P)
    gT = gout_ref[0, 0][n_ch, :].reshape(P_PIX, 1)  # (P, 1)
    T_final = out_ref[0, 0][n_ch, :].reshape(P_PIX, 1)
    gT_term = T_final * gT  # (P, 1)

    # phase 2 walks chunks descending: prefetch k-1 while computing k.
    @pl.when(nchunks > 0)
    def _():
        dma_in(nchunks - 1, jax.lax.rem(nchunks - 1, 2)).start()

    def bwd_body(kk, S):
        # S: (P, 1) suffix sum over later chunks of w * cg
        k = nchunks - 1 - kk
        slot = jax.lax.rem(k, 2)

        # Double-buffered OUTPUT: before overwriting this iteration's
        # dpacked slot, drain the copy issued from it two chunks ago
        # (start-then-immediate-wait serialized ~1us of DMA latency per
        # chunk across the whole grid).
        @pl.when(kk >= 2)
        def _():
            dma_out(k + 2, slot).wait()

        @pl.when(k - 1 >= 0)
        def _():
            dma_in(k - 1, jax.lax.rem(k - 1, 2)).start()

        dma_in(k, slot).wait()
        base = pl.multiple_of(s + k * CHUNK, CHUNK)
        chunk_data = packed_s[slot]
        geom = chunk_data[:GEOM_W]
        col = chunk_data[GEOM_W:]
        t_signed = tchk_ref[0, 0, k].reshape(P_PIX, 1)
        T_in = jnp.abs(t_signed)
        done_in = jnp.where(t_signed < 0.0, 1.0, 0.0)
        alpha, alpha_pre, clamped, dx, dy, _ = _chunk_alpha(
            geom, _valid_row(base, e), pxf, pyf
        )
        w, _, _, alpha_eff, t_exc = _forward_chunk_blend(
            alpha, T_in, done_in, want_state=False
        )

        # cg[p, j] = col[:, j] . gC[:, p]  -> contract channel dim
        cg = jax.lax.dot_general(
            gC, col,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_HIGH,
        )  # (P, K)
        wcg = w * cg
        # within-chunk suffix: suffix[:, i] = sum_{j > i} wcg[:, j]
        suffix = _exact_bf16_dot(wcg, _tri_lanes(CHUNK, True).T)
        # S was seeded with gT_term (the T_final * gT gradient-through-
        # transmittance term enters dalpha exactly like a suffix weight),
        # so one S_after covers both terms of the old
        # `- S*inv - gT_term*inv`.
        S_after = suffix + S  # (P, K) + (P, 1)
        one_m = 1.0 - alpha_eff
        live = alpha_eff > 0.0
        inv_one_m = jnp.where(live, 1.0 / jnp.maximum(one_m, 1e-3), 0.0)
        dalpha = t_exc * cg - S_after * inv_one_m
        dalpha = jnp.where(live, dalpha, 0.0)
        # dpower = dz * alpha_pre needs no power<=0 mask: live (hence
        # dalpha, hence dz) is already zero wherever power > 0. And
        # d/d_opacity = dz * exp(min(power,0)) = dpower / op — the (P, K)
        # exp map is redundant; divide the REDUCED (K,) row instead.
        dpower = jnp.where(clamped, 0.0, dalpha) * alpha_pre  # (P, K)

        A = geom[2:3, :]
        B = geom[3:4, :]
        Cc = geom[4:5, :]
        # reduce over pixels (sublane axis 0) -> (K,) rows of dgeom
        dmx = jnp.sum(dpower * (A * dx + B * dy), axis=0)
        dmy = jnp.sum(dpower * (Cc * dy + B * dx), axis=0)
        dA = jnp.sum(dpower * (-0.5 * dx * dx), axis=0)
        dB = jnp.sum(dpower * (-dx * dy), axis=0)
        dC = jnp.sum(dpower * (-0.5 * dy * dy), axis=0)
        op_row = geom[5, :]
        dop = jnp.sum(dpower, axis=0) * jnp.where(
            op_row > 0.0, 1.0 / jnp.maximum(op_row, 1e-12), 0.0
        )
        zero = jnp.zeros_like(dop)
        dgeom = jnp.stack([dmx, dmy, dA, dB, dC, dop, zero, zero], axis=0)
        # dcol (CH, K) = gC (CH, P) @ w (P, K)
        dcol = jnp.dot(
            gC, w, preferred_element_type=jnp.float32, precision=_HIGH
        )
        dpacked_s[slot] = jnp.concatenate([dgeom, dcol], axis=0)
        dma_out(k, slot).start()
        return S + jnp.sum(wcg, axis=1, keepdims=True)

    # Seed the suffix accumulator with the transmittance-gradient term:
    # dalpha's `- (sum_{j>i} w_j cg_j + T_final gT) / (1 - alpha_i)` treats
    # gT_term exactly like a weight contributed past the last pair.
    jax.lax.fori_loop(0, nchunks, bwd_body, gT_term)

    # Drain the last (up to two) outstanding output copies: chunks 1 and 0.
    @pl.when(nchunks >= 2)
    def _():
        dma_out(1, 1).wait()

    @pl.when(nchunks >= 1)
    def _():
        dma_out(0, 0).wait()

    # Tiles whose pair count exceeds max_chunks*CHUNK have truncated chunks
    # in [nchunks, padded_chunks) that the walk never writes — zero them in
    # HBM here (they contain VALID gaussian slots whose fwd contribution
    # was clipped, so zero gradient is the semantically correct value; left
    # unwritten they would scatter-add uninitialized memory into the
    # parameter grads). Slots outside every tile's valid range map to the
    # sacrificial gather row and are discarded by the pack transpose, so
    # only this rare overloaded-tile case needs work.
    padded_chunks = jax.lax.div(e - s + CHUNK - 1, CHUNK)

    @pl.when(padded_chunks > nchunks)
    def _():
        dpacked_s[0] = jnp.zeros((dpacked_s.shape[1], CHUNK), jnp.float32)

    def zero_body(k, _):
        cp = dma_out(k, 0)
        cp.start()
        cp.wait()
        return 0

    jax.lax.fori_loop(nchunks, padded_chunks, zero_body, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def pallas_blend_views(
    packed: jnp.ndarray,  # (V, GEOM_W + CH_pad, P_pad) field-major pairs
    tile_start: jnp.ndarray,  # (V, num_tiles) 128-aligned packed offsets
    tile_end: jnp.ndarray,  # (V, num_tiles) start + count (unpadded)
    tiles_x: int,
    tiles_y: int,
    max_chunks: int = 64,
    interpret: bool = False,
    early_exit: bool = True,
) -> jnp.ndarray:
    """Multi-view batched blend: ONE kernel launch with grid (V, tiles),
    amortizing the per-launch grid overhead across the whole camera batch
    (the reference invokes its CUDA rasterizer once per view). Returns
    (V, num_tiles, CH+1, P_PIX): blended channels + final transmittance as
    the last channel row."""
    out, _ = _fwd_impl(
        packed, tile_start, tile_end, tiles_x, tiles_y,
        max_chunks, interpret, early_exit,
    )
    return out


def pallas_blend(packed, tile_start, tile_end, tiles_x, tiles_y,
                 max_chunks=64, interpret=False, early_exit=True):
    """Single-view convenience wrapper over the batched kernel (V=1)."""
    out = pallas_blend_views(
        packed[None], tile_start[None], tile_end[None], tiles_x, tiles_y,
        max_chunks, interpret, early_exit,
    )
    return out[0]


def _fwd_impl(packed, tile_start, tile_end, tiles_x, tiles_y,
              max_chunks, interpret, early_exit=True):
    """Returns (out, tchk): the blended output and the chunk-boundary
    transmittance record ((V, T, max_chunks, P_PIX), done flag in the sign
    bit) that lets the backward skip its forward replay."""
    num_tiles = tiles_x * tiles_y
    v, rows, _ = packed.shape
    n_ch = rows - GEOM_W
    kernel = functools.partial(
        _fwd_kernel, n_ch=n_ch, tiles_x=tiles_x, max_chunks=max_chunks,
        early_exit=early_exit,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(v, num_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec(
                (1, 1, n_ch + 1, P_PIX), lambda vi, i, s, e: (vi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, max_chunks, P_PIX), lambda vi, i, s, e: (vi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, rows, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((v, num_tiles, n_ch + 1, P_PIX), jnp.float32),
            jax.ShapeDtypeStruct((v, num_tiles, max_chunks, P_PIX), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_start, tile_end, packed)


def _blend_fwd(packed, tile_start, tile_end, tiles_x,
               tiles_y, max_chunks, interpret, early_exit):
    out, tchk = _fwd_impl(
        packed, tile_start, tile_end, tiles_x, tiles_y,
        max_chunks, interpret, early_exit,
    )
    return out, (packed, tile_start, tile_end, out, tchk)


def _blend_bwd(tiles_x, tiles_y, max_chunks, interpret, early_exit, res, g_out):
    packed, tile_start, tile_end, out, tchk = res
    num_tiles = tiles_x * tiles_y
    v, rows, _ = packed.shape
    n_ch = rows - GEOM_W
    kernel = functools.partial(
        _bwd_kernel, n_ch=n_ch, tiles_x=tiles_x, max_chunks=max_chunks
    )
    blk = lambda rows_: pl.BlockSpec(
        (1, 1, rows_, P_PIX), lambda vi, i, s, e: (vi, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(v, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            blk(n_ch + 1),   # g_out
            blk(n_ch + 1),   # primal out (final transmittance row)
            blk(max_chunks), # chunk-boundary T/done record
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, rows, CHUNK), jnp.float32),
            pltpu.VMEM((2, rows, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dpacked = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(packed.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, tile_end, packed, g_out, out, tchk)
    # Every slot the kernel leaves unwritten is safe by construction: the
    # bwd kernel zeroes truncated chunks of overloaded tiles itself, and
    # all remaining unwritten slots (inter-tile padding, the global tail)
    # carry src_gauss == n in pack_pairs' gather, so their cotangents land
    # in the sacrificial zero row and are discarded by the transpose.
    return dpacked, None, None


pallas_blend_views.defvjp(_blend_fwd, _blend_bwd)


# XLA TPU row gathers run ~5-6 ns/row at <=16 f32 columns but fall off a
# width cliff beyond: 30.4 ns/row at 24 columns, 37.1 at 32, 51.9 at 48
# (measured r5, scripts/micro_gather.py sweep_w — source layout and
# source size are irrelevant above ~19MB). The 19-channel unified row is
# 32 wide, so every wide gather here is split into <=16-column pieces.
# The pieces must stay UNFUSED — a concat fused over the gathers
# re-serializes to ~29 ns/row (sweep_w split2) — hence the barriers.
# Env knobs for A/B on hardware; 0 disables splitting at that site. The
# 500k objects profile (r5): splitting WINS in the backward table gathers
# (tier-A 57.8 -> 44.4 ms, tier-B 17.2 -> 12.4) but LOSES in the forward
# pack gather (17.6 -> 38.5 — its fused transposed-output form already
# runs at 10.6 ns/row unsplit), so the sites split independently.
_GATHER_PIECE_FWD = int(os.environ.get("GSATTACK_GATHER_PIECE_FWD", 0))
_GATHER_PIECE_BWD = int(os.environ.get("GSATTACK_GATHER_PIECE_BWD", 16))
# Splitting is per-SITE, matching every r5 A/B: the table backwards only
# run above the 1M-pair gate (large scenes), where splitting won at both
# tier-A (2M rows, 57.8 -> 40 ms) and tier-B (348k rows, 17.2 -> 12.0);
# the compact backward only runs BELOW that gate (small scenes), where
# the same split cost ~5 Mpix/s off the 100k with-objects headline
# (24.6 vs 29.4, r5 A/B) — so the compact site never splits.
_GATHER_PIECE_COMPACT = int(
    os.environ.get("GSATTACK_GATHER_PIECE_COMPACT", 0)
)


def _col_pieces(w: int, p: int):
    if p <= 0 or w <= p:
        return [(0, w)]
    return [(a, min(a + p, w)) for a in range(0, w, p)]


def _gather_rows_T(unified, idx, valid):
    """rows = unified[idx] -> field-major transpose with invalid lanes
    zeroed, gathered in width pieces (see _GATHER_PIECE note). The
    transpose rides INSIDE each piece's barrier so XLA keeps fusing the
    gather with its transposed-output layout (it does — the in-context
    fwd gather emits {0,1}-layout directly), and the field-major piece
    concat along axis 0 is a contiguous block copy."""
    pieces = _col_pieces(unified.shape[1], _GATHER_PIECE_FWD)
    if len(pieces) == 1:
        return jnp.where(valid[None, :], unified[idx].T, 0.0)
    chain = os.environ.get("GSATTACK_GATHER_CHAIN", "1") == "1"
    parts = []
    for a, b in pieces:
        i = idx
        if chain and parts:
            i, _ = jax.lax.optimization_barrier((idx, parts[-1]))
        parts.append(
            jax.lax.optimization_barrier(unified[:, a:b][i].T)
        )
    return jnp.where(valid[None, :], jnp.concatenate(parts, axis=0), 0.0)


def _gather_sum_rows(gT, idx, c, after=None):
    """Table-backward core: gT[max(idx, 0)] masked to zero where idx < 0,
    then a non-overlapping (c, 1) window sum — in width pieces (see
    _GATHER_PIECE note; the mask and window sum fuse per piece).

    GSATTACK_GATHER_CHAIN=1 serializes the pieces through a zero-copy
    barrier on the (small) index vector, so the pieces' big live ranges
    do not overlap — probing whether the slow-twin effect (one piece at
    the 6.4 ns/row floor, its sibling at 2-3x) is scoped-memory
    pressure from adjacent scheduling."""
    safe = jnp.maximum(idx, 0)
    ok = (idx >= 0)[:, None]
    chain = os.environ.get("GSATTACK_GATHER_CHAIN", "1") == "1"
    outs = []
    for a, b in _col_pieces(gT.shape[1], _GATHER_PIECE_BWD):
        s = safe
        if chain and (outs or after is not None):
            s, _ = jax.lax.optimization_barrier(
                (safe, outs[-1] if outs else after)
            )
        rows = jax.lax.optimization_barrier(gT[:, a:b][s])
        rows = jnp.where(ok, rows, 0.0)
        outs.append(jax.lax.reduce_window(
            rows, 0.0, jax.lax.add, (c, 1), (c, 1), "VALID"
        ))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


@jax.custom_vjp
def _gather_pack_T(unified, src_gauss):
    """The differentiable core of pack_pairs: row-gather the unified
    per-gaussian array through the slot->gaussian map and transpose to the
    field-major kernel layout. Slots mapping to the sacrificial row n read
    zeros (and discard their cotangents).

    custom_vjp rather than plain AD for a measured in-context cost: under
    jax.grad inside the full render graph, XLA's scheduling of the AD-
    generated transpose+scatter (and its freedom to rematerialize the
    index-construction chain) costs several ms that the isolated gather
    does not; pinning src_gauss as the only residual and hand-writing the
    scatter keeps the backward at its isolated cost.

    Invalid slots (src == n) are clamped to row 0 and masked AFTER the
    transpose: concatenating a sacrificial zero row would rewrite the
    whole lane-padded (N+1, W) table (~0.3 ms of pure pad at 100k splats,
    HLO-measured) where the (W, P_pad) mask is a compact fused pass."""
    n = unified.shape[0]
    valid = src_gauss < n
    return _gather_rows_T(unified, jnp.where(valid, src_gauss, 0), valid)


def _gather_pack_T_fwd(unified, src_gauss):
    return _gather_pack_T(unified, src_gauss), (src_gauss, unified.shape[0])


def _gather_pack_T_bwd(res, g):
    src_gauss, n = res
    # g: (W, P_pad) field-major cotangent from the blend kernel's VJP.
    # ~half the slots are chunk padding; clamping them all to one shared
    # row makes that row a 170k-deep scatter-collision hotspot. Spread
    # them over a dummy block (sliced off afterwards) so collision depth
    # stays O(pairs_per_gaussian); dummy rows also absorb any kernel-
    # unwritten garbage lanes, so no masking pass is needed.
    extra = 8192
    valid = src_gauss < n
    q = jnp.arange(src_gauss.shape[0], dtype=jnp.int32)
    idx = jnp.where(valid, src_gauss, n + (q & (extra - 1)))
    gT = jax.lax.optimization_barrier(g.T)  # see compact bwd: one copy,
    dunified = jnp.zeros((n + extra, g.shape[0]), g.dtype).at[idx].add(gT)
    return dunified[:n], np.zeros(src_gauss.shape, jax.dtypes.float0)


_gather_pack_T.defvjp(_gather_pack_T_fwd, _gather_pack_T_bwd)


@jax.custom_vjp
def _gather_pack_T_compact(unified, src_gauss, pair_slot, pair_gauss):
    """_gather_pack_T with a PAIR-indexed backward: the TPU scatter-add is
    a serial per-update loop (~13 ns/row — profiled at 4.4 ms for 338k
    slot-major updates, the single most expensive op in the render f+b),
    so scattering the ~50% padding slots is pure serial waste. The
    backward instead gathers each VALID pair's cotangent row through
    `pair_slot` (pair k -> packed slot) and scatters only those
    `compact_budget` rows onto `pair_gauss`."""
    n = unified.shape[0]
    valid = src_gauss < n
    return _gather_rows_T(unified, jnp.where(valid, src_gauss, 0), valid)


def _gather_pack_T_compact_fwd(unified, src_gauss, pair_slot, pair_gauss):
    return (
        _gather_pack_T_compact(unified, src_gauss, pair_slot, pair_gauss),
        (pair_slot, pair_gauss, unified.shape[0], src_gauss.shape),
    )


def _gather_pack_T_compact_bwd(res, g):
    pair_slot, pair_gauss, n, src_shape = res
    gT = jax.lax.optimization_barrier(g.T)
    # (B, W): only in-budget pairs' cotangents; width-split past the
    # gather width cliff (W=32 in objects mode), re-joined before the
    # single scatter (two scatters would double the serial per-row cost).
    pieces = _col_pieces(gT.shape[1], _GATHER_PIECE_COMPACT)
    if len(pieces) == 1:
        upd = gT[pair_slot]
    else:
        upd = jnp.concatenate(
            [
                jax.lax.optimization_barrier(gT[:, a:b][pair_slot])
                for a, b in pieces
            ],
            axis=1,
        )
    # (A row-major layout constraint on `upd` changes nothing: the 77
    # ns/row scatter at 1.5M pairs is HBM-latency-bound on the
    # destination — 33 MB of rows no longer fit VMEM — not a strided-
    # update problem. Measured, r4; the table backward handles that
    # regime instead.)
    extra = _DUMMY_ROWS
    dunified = jnp.zeros((n + extra, g.shape[0]), g.dtype).at[
        pair_gauss
    ].add(upd)
    f0 = lambda s: np.zeros(s, jax.dtypes.float0)
    return (
        dunified[:n],
        f0(src_shape),
        f0(pair_slot.shape),
        f0(pair_gauss.shape),
    )


_DUMMY_ROWS = 8192

_gather_pack_T_compact.defvjp(
    _gather_pack_T_compact_fwd, _gather_pack_T_compact_bwd
)


# Compact-budget size above which the TABLE backward replaces the
# compact scatter. The serial scatter costs ~13 ns/row at small sizes
# (2.2 ms at the 100k bench scene's 166k valid pairs) but 77 ns/row once
# XLA stops materializing the update operand row-major (115 ms at a
# 500k@1600x1200 scene's 1.5M-pair budget — 60% of the whole frame, r4
# profile). The table path costs one extra (gauss, slot) sort in the
# forward plus an (N*c)-row gather-sum in the backward — worse below
# ~1M pairs (measured 16.9 vs 15.4 ms device at 100k), far better above.
# Env override for A/B tuning on real hardware.
_TABLE_MIN_PAIRS = int(os.environ.get("GSATTACK_TABLE_MIN_PAIRS", 1_000_000))


def _fill_cummax(z: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cummax of a 1-D nonnegative i32 vector, hand-blocked.

    lax.cummax's TPU lowering left a 10.7 ms fusion at 1.5M elements (a
    {0,1}-layout blocked reduce_window, r4 large-scene profile). This is
    the same two-level scan in explicitly ROW-MAJOR (rows, 128) blocks:
    7 masked lane shifts for the intra-row scan, recursion on the (rows,)
    row totals, one exclusive row-carry max — all full-lane VPU passes,
    ~40 MB of traffic at 1.5M elements instead of 10.7 ms."""
    n = z.shape[0]
    if n <= 256:
        pad = 256 - n
        x = jnp.pad(z, (0, pad))[None, :]
        for s in (1, 2, 4, 8, 16, 32, 64, 128):
            x = jnp.maximum(x, jnp.pad(x, ((0, 0), (s, 0)))[:, :-s])
        return x[0, :n]
    rows = (n + 127) // 128
    x = jnp.pad(z, (0, rows * 128 - n)).reshape(rows, 128)
    for s in (1, 2, 4, 8, 16, 32, 64):
        x = jnp.maximum(x, jnp.pad(x, ((0, 0), (s, 0)))[:, :-s])
    carry = _fill_cummax(x[:, -1])  # inclusive row totals
    carry = jnp.pad(carry, (1, 0))[:-1]  # exclusive (values nonneg, id 0)
    return jnp.maximum(x, carry[:, None]).reshape(-1)[:n]


@jax.custom_vjp
def _gather_pack_T_table(unified, src_gauss, slot_table):
    """_gather_pack_T with a TABLE-indexed backward for LARGE scenes.
    `slot_table` (N, c) maps each gaussian's c bin candidates to their
    packed slot (-1 = invalid/out-of-budget), so the backward is one row
    gather plus a per-gaussian sum over c — no serial scatter. The gather
    reads the field-major cotangent strided (XLA cannot be made to
    relayout first: optimization_barrier passes layouts through, dot(X,
    I) is algebraically simplified away, with_layout_constraint's copy is
    re-sunk after the gather) — acceptable here because the scatter it
    replaces is ~10x slower at multi-million-pair scenes."""
    n = unified.shape[0]
    valid = src_gauss < n
    return _gather_rows_T(unified, jnp.where(valid, src_gauss, 0), valid)


def _gather_pack_T_table_fwd(unified, src_gauss, slot_table):
    return (
        _gather_pack_T_table(unified, src_gauss, slot_table),
        (slot_table, src_gauss.shape),
    )


def _gather_pack_T_table_bwd(res, g):
    slot_table, src_shape = res
    gT = g.T  # (P_pad, W)
    c = slot_table.shape[1]
    idx = slot_table.reshape(-1)
    # FLAT (N*c, W) gather + non-overlapping reduce_window: the 3-D
    # (N, c, W) gather form left ~25 ms of relayout (a (6,16)->(8,128)
    # tile-padded intermediate + a 16-step while loop) at 7M candidates.
    # Width-split per _GATHER_PIECE (the W=32 objects row is past the
    # gather width cliff).
    dunified = _gather_sum_rows(gT, idx, c)
    f0 = lambda s: np.zeros(s, jax.dtypes.float0)
    return dunified, f0(src_shape), f0(slot_table.shape)


_gather_pack_T_table.defvjp(
    _gather_pack_T_table_fwd, _gather_pack_T_table_bwd
)


@jax.custom_vjp
def _gather_pack_T_table2(unified, src_gauss, table1, table2, heavy_list):
    """_gather_pack_T with the TWO-TIER table backward (tiered bin):
    `table1` (N, c1) maps every gaussian's tier-A candidates to packed
    slots, `table2` (H, c-c1) the heavy gaussians' overflow candidates
    (rows index the heavy rank; `heavy_list` (H,) maps rank -> gaussian,
    padded with N). The backward is two flat row gathers + windowed sums
    plus one H-row scatter-add merge — the candidate count (and so the
    dominant gather) shrinks with the tiered bin's flat pair list (3.2x
    at the 500k probe scene vs the single (N, c_max) table)."""
    n = unified.shape[0]
    valid = src_gauss < n
    return _gather_rows_T(unified, jnp.where(valid, src_gauss, 0), valid)


def _gather_pack_T_table2_fwd(unified, src_gauss, table1, table2, heavy_list):
    return (
        _gather_pack_T_table2(unified, src_gauss, table1, table2, heavy_list),
        (table1, table2, heavy_list, src_gauss.shape),
    )


def _gather_pack_T_table2_bwd(res, g):
    table1, table2, heavy_list, src_shape = res
    gT = g.T  # (P_pad, W)

    # flat gather + window sum per tier, width-split (see the single-
    # table backward for why NOT the 3-D (N, c, W) gather form); tier B
    # chains after tier A so no two piece live-ranges overlap (the
    # scoped-memory slow-twin effect, r5 dev notes).
    d1 = _gather_sum_rows(gT, table1.reshape(-1), table1.shape[1])
    d2 = _gather_sum_rows(
        gT, table2.reshape(-1), table2.shape[1], after=d1
    )
    # Merge the heavy overflow sums at their real rows; the N padding
    # entries of heavy_list are out of bounds and drop.
    dunified = d1.at[heavy_list].add(d2, mode="drop")
    f0 = lambda s: np.zeros(s, jax.dtypes.float0)
    return (
        dunified,
        f0(src_shape),
        f0(table1.shape),
        f0(table2.shape),
        f0(heavy_list.shape),
    )


_gather_pack_T_table2.defvjp(
    _gather_pack_T_table2_fwd, _gather_pack_T_table2_bwd
)


def pack_pairs(
    geom_all: jnp.ndarray,  # (N, GEOM_W) per-GAUSSIAN geometry
    channels: jnp.ndarray,  # (N, CH) per-gaussian colors
    gauss_idx: jnp.ndarray,  # (P,) sorted pair -> gaussian index
    tile_start: jnp.ndarray,  # (num_tiles,) offsets into the sorted pairs
    tile_end: jnp.ndarray,
    budget: int = 0,  # static capacity of the packed layout in SLOTS,
    # including each tile's round-up-to-CHUNK padding (0 = no cap: capacity
    # is len(gauss_idx) + num_tiles * CHUNK). The raw pair list is
    # N * pairs_per_gaussian with invalid entries sorted to the tail and
    # typically only a small fraction valid, so a measured capacity
    # (ops/raster.py auto_pairs_budget) removes most of the pack work —
    # every per-slot op below scales with the capacity. Tiles (or tile
    # tails) past the capacity are dropped and counted.
    compact_budget: int = 0,  # static capacity for the PAIR-indexed
    # backward (ops/raster.py auto_compact_budget): the TPU scatter-add is
    # serial per update, so the backward scatters only the valid pairs
    # (~half the padded slots) when this cap is set. Valid pairs beyond it
    # lose their gradient contribution (counted in num_budget_dropped) —
    # size it with margin. 0 = scatter every padded slot (always exact).
    gauss_multiplicity: int = 0,  # the caller's guarantee that gauss_idx
    # contains EVERY gaussian exactly this many times (bin_gaussians
    # emits pairs_per_gaussian candidates per gaussian, valid or not) —
    # unlocks the large-scene TABLE backward; 0 = no guarantee.
    table_idx: jnp.ndarray | None = None,  # (P,) tiered-bin TABLE ids of
    # the sorted pairs (bin_gaussians tier_split/heavy_budget): real id
    # for tier-A pairs, n + heavy_rank for tier-B overflow pairs — every
    # real id appears exactly tier_split times and every virtual id
    # exactly (c - tier_split) times, so one (id, slot) sort + two
    # reshapes give both backward tables.
    heavy_list: jnp.ndarray | None = None,  # (heavy_budget,) rank -> id
    tier_split: int = 0,
):
    """Lay out the sorted pairs field-major with every tile's range padded
    to a CHUNK multiple (the DMA alignment quantum).

    Formulated as ONE row-gather + transpose (destination-indexed): for
    each packed slot q we compute the source pair, compose with gauss_idx,
    and gather straight from the per-gaussian arrays. A source-indexed
    scatter along the lane axis was ~40x slower on TPU. Differentiable:
    the gather's transpose scatter-adds per-pair grads onto the gaussians.

    The slot -> tile metadata (tile's packed start / packed end / first
    sorted-pair index) is reconstructed with scatter-max + cummax
    forward-fills instead of per-slot table gathers: all three scattered
    values are nondecreasing in tile order, so the fill is exact, and on
    TPU a cummax is a handful of log-shift passes while a P_pad-sized
    gather is latency-bound per row (~3ms per 500k lookups — the fills
    cut the composed pack from ~16ms to the gather-limited floor).

    Returns (packed (GEOM_W + CH_pad, P_pad), packed_start, packed_end,
    ch_pad, num_budget_dropped): the last is a () int32 count of valid
    pairs silently dropped by the capacity clamp — a nonzero value means
    the image is missing whole tiles' tails and the budget must be
    raised."""
    n = geom_all.shape[0]
    p = gauss_idx.shape[0]
    num_tiles = tile_start.shape[0]
    # Sublane alignment: channel (row) counts must be multiples of 8.
    ch = channels.shape[1]
    ch_pad = ((ch + 7) // 8) * 8
    counts = (tile_end - tile_start).astype(jnp.int32)
    padded = ((counts + CHUNK - 1) // CHUNK) * CHUNK
    start_raw = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)]
    )
    if budget:
        # DMA alignment: every in-capacity tile start stays 128-aligned iff
        # the capacity itself is a CHUNK multiple.
        p_pad = ((budget + CHUNK - 1) // CHUNK) * CHUNK
    else:
        # chunk-multiple capacity keeps the chunk->tile map exact below
        p_pad = ((p + CHUNK - 1) // CHUNK) * CHUNK + num_tiles * CHUNK
    packed_start = jnp.minimum(start_raw, p_pad)
    packed_end = jnp.minimum(start_raw + counts, p_pad)
    num_budget_dropped = (
        jnp.sum(counts) - jnp.sum(packed_end - packed_start)
    ).astype(jnp.int32)

    # ---- slot -> gaussian WITHOUT a P_pad-sized random gather. A flat
    # gidx_pad[p_of_q] lookup is latency-bound per ELEMENT (~2.6 ms for
    # 340k slots — as slow as the wide row gather below). But tile packed
    # starts are CHUNK-aligned by construction, so every CHUNK-slot chunk
    # belongs to ONE tile and reads CONSECUTIVE sorted pairs: per chunk the
    # lookup is two aligned 128-wide rows of gauss_idx plus a lane shift.
    # That is 2*(P_pad/128) row fetches + 8 VPU roll passes instead of
    # P_pad scalar fetches (~50x less latency-bound traffic).
    n_chunks = p_pad // CHUNK
    c_start = jnp.arange(n_chunks, dtype=jnp.int32) * CHUNK

    def cfill(vals):
        # Scatter each tile's value at its packed start CHUNK (OOB
        # == n_chunks dropped), forward-fill: nondecreasing -> exact.
        # Zero-count tiles share a chunk with the next real tile; max
        # picks the real (largest-index) one, matching the slot fill.
        z = jnp.zeros(n_chunks, jnp.int32).at[packed_start // CHUNK].max(vals)
        return _fill_cummax(z)

    start_c = cfill(packed_start)  # chunk -> its tile's packed start (slots)
    end_c = cfill(packed_end)  # chunk -> its tile's packed end (slots)
    src0_c = cfill(tile_start.astype(jnp.int32))  # -> tile's first pair
    pq0 = src0_c + (c_start - start_c)  # chunk's first sorted-pair index

    p_round = ((p + CHUNK - 1) // CHUNK) * CHUNK
    g_pad = jnp.concatenate(
        [gauss_idx.astype(jnp.int32),
         jnp.full((p_round - p + CHUNK,), n, jnp.int32)]
    ).reshape(-1, CHUNK)
    row0 = jnp.clip(pq0 // CHUNK, 0, g_pad.shape[0] - 2)
    pair_rows = jnp.concatenate([g_pad[row0], g_pad[row0 + 1]], axis=1)
    # Barrel shift each 256-lane row left by off (invalid chunks past the
    # data run may clip; their lanes are masked below).
    off = jnp.clip(pq0 - row0 * CHUNK, 0, 2 * CHUNK - 1)
    for k in range(8):  # 2*CHUNK == 256 == 2^8
        bit = ((off >> k) & 1).astype(bool)[:, None]
        pair_rows = jnp.where(
            bit, jnp.roll(pair_rows, -(1 << k), axis=1), pair_rows
        )
    sg0 = pair_rows[:, :CHUNK].reshape(-1)

    q = jnp.arange(p_pad, dtype=jnp.int32)
    end_of_q = jnp.broadcast_to(end_c[:, None], (n_chunks, CHUNK)).reshape(-1)
    valid_q = q < end_of_q
    # padding slots hit the sacrificial gaussian n
    src_gauss = jnp.where(valid_q, sg0, n)  # (P_pad,)

    # ONE gather of unified (GEOM_W + CH_pad)-wide rows + ONE transpose:
    # separate geometry/color gathers cost a full extra gather pass (row
    # gathers are latency-bound per row, not width-bound) and an extra DMA
    # per chunk inside the kernels.
    #
    # Built FIELD-MAJOR first ((W, N) stack of 1-D columns: each row is one
    # contiguous write, and slice-of-concat forwarding lets XLA read the
    # callers' original 1-D fields directly) then transposed in ONE layout
    # copy behind an optimization_barrier. The direct (N, k)-piece concat
    # materialized ~9 lane-padded operand copies + a 0.54 ms concatenate
    # (~1.3 ms total at 100k splats, r4 HLO profile); the barrier keeps XLA
    # from re-fusing the transpose into the row gather below (strided
    # column reads were exactly the bwd-gather disease, fusion.4).
    z = jnp.zeros((n,), geom_all.dtype)
    cols = [geom_all[:, i] for i in range(geom_all.shape[1])]
    cols += [channels[:, i] for i in range(ch)]
    cols += [z] * (ch_pad - ch)
    unified = jax.lax.optimization_barrier(jnp.stack(cols, axis=0).T)
    if not compact_budget:
        packed = _gather_pack_T(unified, src_gauss)
        return packed, packed_start, packed_end, ch_pad, num_budget_dropped

    # ---- pair-indexed backward machinery: for sorted pair k, its packed
    # slot is k + delta(tile of k) where delta = packed_start - tile_start
    # (the accumulated chunk padding) is NONDECREASING over tiles, so a
    # scatter at each tile's first pair index + cummax forward-fill
    # reconstructs it without per-pair table gathers. Validity rides a
    # second fill of tile_start + capped_count (also nondecreasing:
    # tile_start[t+1] = tile_start[t] + count[t] >= tile_start[t] +
    # capped_count[t]); pairs at or past the fill value are padding,
    # budget-clamped, or beyond the last tile.
    b = ((compact_budget + CHUNK - 1) // CHUNK) * CHUNK
    ts = tile_start.astype(jnp.int32)
    kk = jnp.arange(b, dtype=jnp.int32)

    def pfill(vals):
        # OOB tile starts (>= b) drop; co-located zero-count tiles max to
        # the latest (owning) tile, matching cfill above.
        z = jnp.zeros(b, jnp.int32).at[ts].max(vals, mode="drop")
        return _fill_cummax(z)

    delta_f = pfill(packed_start - ts)
    end_f = pfill(ts + (packed_end - packed_start))
    valid_k = kk < end_f
    # In-slot-capacity pairs whose index exceeds the compact budget lose
    # their backward contribution — count them with the other drops.
    n_in_capacity = jnp.sum(packed_end - packed_start)
    num_budget_dropped = num_budget_dropped + jnp.maximum(
        n_in_capacity - jnp.sum(valid_k.astype(jnp.int32)), 0
    ).astype(jnp.int32)

    # The table gather's cost scales with the flat CANDIDATE count times
    # the unified row WIDTH (~6 ns/row at W=16); the scatter's serial
    # per-row cost turns HBM-bound (13 -> 77 ns/row) once the compact
    # budget passes ~1M rows. One cost-model gate reproduces every r4
    # A/B: 100k -> scatter (2.2 ms, b < 1M), 500k RGB -> table (13.0 vs
    # 10.2 Mpix/s), 500k objects untiered -> scatter (4.7 vs 7.4 — the
    # 7M-candidate gather at W=32 loses), 500k tiered -> table (the
    # tiered bin cuts the candidates 3.2x).
    unified_w = geom_all.shape[1] + ch_pad
    tiered = (
        table_idx is not None and heavy_list is not None and tier_split > 0
    )
    mult_ok = tiered or (gauss_multiplicity and p == n * gauss_multiplicity)
    if mult_ok and b >= _TABLE_MIN_PAIRS and p * unified_w < 112 * b:
        # LARGE scenes: re-key the slot vector by (possibly virtual)
        # GAUSSIAN id. Every id appears an exact static number of times
        # (valid or not), so one unstable (id, slot) sort groups the
        # slots into exact-size blocks and reshapes give the inverse
        # table(s) — replacing the serial scatter (XLA drops the
        # row-major copy of the update operand at this size and reads it
        # strided; 115 ms at 1.5M pairs, 60% of the whole frame).
        slot_k = jnp.where(valid_k, kk + delta_f, -1)
        slot_full = slot_k[:p] if b >= p else jnp.concatenate(
            [slot_k, jnp.full((p - b,), -1, jnp.int32)]
        )
        if tiered:
            hb = heavy_list.shape[0]
            c1 = tier_split
            assert (p - n * c1) % hb == 0, (p, n, c1, hb)
            _, table_flat = jax.lax.sort(
                (table_idx.astype(jnp.uint32), slot_full),
                num_keys=1, is_stable=False,
            )
            table1 = table_flat[: n * c1].reshape(n, c1)
            table2 = table_flat[n * c1 :].reshape(hb, (p - n * c1) // hb)
            packed = _gather_pack_T_table2(
                unified, src_gauss, table1, table2, heavy_list
            )
        else:
            _, table_flat = jax.lax.sort(
                (gauss_idx.astype(jnp.uint32), slot_full),
                num_keys=1, is_stable=False,
            )
            slot_table = table_flat.reshape(n, gauss_multiplicity)
            packed = _gather_pack_T_table(unified, src_gauss, slot_table)
        return packed, packed_start, packed_end, ch_pad, num_budget_dropped

    pair_slot = jnp.where(valid_k, kk + delta_f, p_pad - 1)
    g_b = gauss_idx.astype(jnp.int32)[:b]
    if b > p:
        g_b = jnp.concatenate([g_b, jnp.full((b - p,), n, jnp.int32)])
    # Invalid pairs spread over dummy rows (sliced off by the VJP): a
    # single shared row would serialize their collisions.
    pair_gauss = jnp.where(
        valid_k, g_b, n + (kk & (_DUMMY_ROWS - 1))
    )
    packed = _gather_pack_T_compact(unified, src_gauss, pair_slot, pair_gauss)
    return packed, packed_start, packed_end, ch_pad, num_budget_dropped
