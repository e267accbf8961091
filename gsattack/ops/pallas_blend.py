"""Pallas TPU kernels for the tile blend — the hot core of the rasterizer.

Replaces the XLA `_blend_tiles` path (ops/raster.py) for the per-tile
front-to-back compositing. Why a kernel: the XLA path must run the static
`max_chunks` worth of work for EVERY tile (masked), while the TPU grid is
sequential per core, so a kernel can loop exactly `ceil(n_tile / K)` chunks
per tile and skip empty tiles outright; chunk loads are explicit HBM->VMEM
DMAs of contiguous sorted-pair slices.

Within a chunk the compositing is the same associative formulation as the
XLA path (and therefore the oracle, `render/oracle.py`): log-space
cumulative transmittance, computed with lower-triangular ones-matrix
matmuls on the MXU (a (K,K) @ (K,P) matmul is far cheaper than a serial
scan); alpha saturation rules match the reference CUDA blend exactly.

The backward kernel replays the forward per tile (storing chunk-boundary
transmittance/done flags in VMEM) then walks chunks back-to-front
maintaining the suffix accumulator S_i = sum_{j>i} w_j (c_j . gC) — the
standard 3DGS backward — emitting per-PAIR gradients; the caller's gather
transpose (scatter-add over gaussian ids) accumulates them per gaussian.

Geometry is packed per pair as 8 floats: [mx, my, A, B, C, opacity, 0, 0].
"""

from __future__ import annotations

import functools
from typing import Any

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
GEOM_W = 8  # packed geometry floats per pair

_HIGH = jax.lax.Precision.HIGHEST


def _tri_matrices(k: int):
    """Lower-triangular (inclusive) and strictly-lower ones matrices used to
    compute within-chunk cumulative sums on the MXU. Built with iota so they
    are traced values, not captured constants (pallas kernels cannot close
    over device arrays)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    incl = (col <= row).astype(jnp.float32)
    excl = (col < row).astype(jnp.float32)
    return incl, excl


def _pixel_coords(tile_id, tiles_x):
    # Integer iota at lane-friendly (1, P_PIX); row-major pixel order within
    # the 16x16 tile (y = idx // 16, x = idx % 16).
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, P_PIX), 1)
    t_y = tile_id // tiles_x
    t_x = tile_id % tiles_x
    px = (t_x * TILE + idx % TILE).astype(jnp.float32)
    py = (t_y * TILE + idx // TILE).astype(jnp.float32)
    return px, py


def _chunk_alpha(geom, valid, pxf, pyf):
    """(K, GEOM_W) packed geometry -> (alpha (K,P), alpha_pre, clamped, use,
    dx, dy)."""
    mx = geom[:, 0:1]
    my = geom[:, 1:2]
    A = geom[:, 2:3]
    B = geom[:, 3:4]
    C = geom[:, 4:5]
    op = geom[:, 5:6]
    dx = pxf - mx  # (K, P)
    dy = pyf - my
    power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
    alpha_pre = op * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(ALPHA_MAX, alpha_pre)
    clamped = alpha_pre > ALPHA_MAX
    use = (power <= 0.0) & (alpha >= ALPHA_MIN) & valid
    alpha = jnp.where(use, alpha, 0.0)
    return alpha, alpha_pre, clamped, use, dx, dy, power


def _forward_chunk_blend(alpha, T_in, done_in, tri_incl, tri_excl):
    """Shared forward compositing for one chunk.

    Returns (w (K,P), T_out (1,P), done_out (1,P), alpha_eff)."""
    lg = jnp.log1p(-alpha)
    cum_incl = jnp.dot(tri_incl, lg, preferred_element_type=jnp.float32,
                       precision=_HIGH)
    t_incl = T_in * jnp.exp(cum_incl)
    frozen = (t_incl < T_EPS) | (done_in > 0.5)
    alpha_eff = jnp.where(frozen, 0.0, alpha)
    lg_eff = jnp.log1p(-alpha_eff)
    cum_exc = jnp.dot(tri_excl, lg_eff, preferred_element_type=jnp.float32,
                      precision=_HIGH)
    t_exc = T_in * jnp.exp(cum_exc)
    w = alpha_eff * t_exc
    T_out = T_in * jnp.exp(jnp.sum(lg_eff, axis=0, keepdims=True))
    crossed = jnp.max(
        jnp.where((t_incl < T_EPS) & (alpha > 0.0), 1.0, 0.0), axis=0, keepdims=True
    )
    done_out = jnp.maximum(done_in, crossed)
    return w, T_out, done_out, alpha_eff


def _fwd_kernel(
    starts_ref,
    ends_ref,
    geom_hbm,
    col_hbm,
    img_ref,
    geom_s,
    col_s,
    sem,
    *,
    chunk: int,
    n_ch: int,
    tiles_x: int,
):
    i = pl.program_id(0)
    s = starts_ref[i]
    e = ends_ref[i]
    pxf, pyf = _pixel_coords(i, tiles_x)
    tri_incl, tri_excl = _tri_matrices(chunk)

    nchunks = jax.lax.div(e - s + chunk - 1, chunk)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    def body(state):
        k, T, done, acc = state
        base = s + k * chunk
        cp_g = pltpu.make_async_copy(
            geom_hbm.at[pl.ds(base, chunk)], geom_s, sem
        )
        cp_g.start()
        cp_g.wait()
        cp_c = pltpu.make_async_copy(col_hbm.at[pl.ds(base, chunk)], col_s, sem)
        cp_c.start()
        cp_c.wait()
        valid = (base + k_iota) < e
        alpha, _, _, _, _, _, _ = _chunk_alpha(geom_s[:], valid, pxf, pyf)
        w, T, done, _ = _forward_chunk_blend(alpha, T, done, tri_incl, tri_excl)
        acc = acc + jnp.dot(
            w.T, col_s[:], preferred_element_type=jnp.float32, precision=_HIGH
        )
        return k + 1, T, done, acc

    def cond(state):
        k, T, done, _ = state
        # stop early once every pixel is done (block-level vote)
        return (k < nchunks) & (jnp.min(done) < 0.5)

    T0 = jnp.ones((1, P_PIX), jnp.float32)
    done0 = jnp.zeros((1, P_PIX), jnp.float32)
    acc0 = jnp.zeros((P_PIX, n_ch), jnp.float32)
    _, T, _, acc = jax.lax.while_loop(cond, body, (0, T0, done0, acc0))
    # Output packs T as the last channel: TPU block shapes need the last two
    # dims (divisible by 8, divisible by 128) OR equal to the array dims, so
    # a separate (1, P_PIX) T output block would be unlowerable.
    img_ref[0] = jnp.concatenate([acc, T.T], axis=-1)


def _bwd_kernel(
    starts_ref,
    ends_ref,
    geom_hbm,
    col_hbm,
    gimg_ref,  # (1, P_PIX, CH+1): image cotangent + T cotangent channel
    dgeom_hbm,
    dcol_hbm,
    geom_s,
    col_s,
    tchk_ref,
    donechk_ref,
    dgeom_s,
    dcol_s,
    sem,
    osem,
    *,
    chunk: int,
    n_ch: int,
    tiles_x: int,
    max_chunks: int,
):
    i = pl.program_id(0)
    s = starts_ref[i]
    e = ends_ref[i]
    pxf, pyf = _pixel_coords(i, tiles_x)
    tri_incl, tri_excl = _tri_matrices(chunk)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    nchunks = jnp.minimum(jax.lax.div(e - s + chunk - 1, chunk), max_chunks)

    def load_chunk(base):
        cp_g = pltpu.make_async_copy(geom_hbm.at[pl.ds(base, chunk)], geom_s, sem)
        cp_g.start()
        cp_g.wait()
        cp_c = pltpu.make_async_copy(col_hbm.at[pl.ds(base, chunk)], col_s, sem)
        cp_c.start()
        cp_c.wait()

    # ---- phase 1: forward replay, store chunk-boundary T / done ----------
    def fwd_body(k, state):
        T, done = state
        tchk_ref[k, :] = T[0, :]
        donechk_ref[k, :] = done[0, :]
        base = s + k * chunk
        load_chunk(base)
        valid = (base + k_iota) < e
        alpha, _, _, _, _, _, _ = _chunk_alpha(geom_s[:], valid, pxf, pyf)
        _, T, done, _ = _forward_chunk_blend(alpha, T, done, tri_incl, tri_excl)
        return T, done

    T0 = jnp.ones((1, P_PIX), jnp.float32)
    done0 = jnp.zeros((1, P_PIX), jnp.float32)
    T_final, _ = jax.lax.fori_loop(0, nchunks, fwd_body, (T0, done0))

    # ---- phase 2: back-to-front gradient walk ----------------------------
    gC = gimg_ref[0][:, :n_ch]  # (P, CH)
    gT = gimg_ref[0][:, n_ch].reshape(1, P_PIX)  # (1, P)
    gT_term = T_final * gT  # d(T_out)/d alpha chain shares T_out/(1-a)

    def bwd_body(kk, S):
        k = nchunks - 1 - kk
        base = s + k * chunk
        load_chunk(base)
        valid = (base + k_iota) < e
        T_in = tchk_ref[k, :].reshape(1, P_PIX)
        done_in = donechk_ref[k, :].reshape(1, P_PIX)
        alpha, alpha_pre, clamped, use, dx, dy, power = _chunk_alpha(
            geom_s[:], valid, pxf, pyf
        )
        lg = jnp.log1p(-alpha)
        cum_incl = jnp.dot(tri_incl, lg, preferred_element_type=jnp.float32,
                           precision=_HIGH)
        t_incl = T_in * jnp.exp(cum_incl)
        frozen = (t_incl < T_EPS) | (done_in > 0.5)
        alpha_eff = jnp.where(frozen, 0.0, alpha)
        lg_eff = jnp.log1p(-alpha_eff)
        cum_exc = jnp.dot(tri_excl, lg_eff, preferred_element_type=jnp.float32,
                          precision=_HIGH)
        t_exc = T_in * jnp.exp(cum_exc)
        w = alpha_eff * t_exc  # (K, P)

        cg = jnp.dot(col_s[:], gC.T, preferred_element_type=jnp.float32,
                     precision=_HIGH)  # (K, P)
        wcg = w * cg
        # suffix within chunk: S_after_i = S_later + sum_{j>i} wcg_j
        suffix = jnp.dot(
            tri_excl.T, wcg, preferred_element_type=jnp.float32, precision=_HIGH
        )
        S_after = suffix + S  # (K, P) + (1, P)
        one_m = 1.0 - alpha_eff
        live = alpha_eff > 0.0
        inv_one_m = jnp.where(live, 1.0 / jnp.maximum(one_m, 1e-3), 0.0)
        dalpha = t_exc * cg - S_after * inv_one_m
        # transmittance-output gradient: T_out = prod(1-a) * T_in
        dalpha = dalpha - gT_term * inv_one_m
        dalpha = jnp.where(live, dalpha, 0.0)
        # chain into pre-clamp alpha: alpha_pre = op * exp(min(power, 0))
        dz = jnp.where(clamped, 0.0, dalpha)
        dop_map = dz * jnp.exp(jnp.minimum(power, 0.0))
        dpower = jnp.where(power <= 0.0, dz * alpha_pre, 0.0)  # (K, P)

        dA = jnp.sum(dpower * (-0.5 * dx * dx), axis=1)
        dB = jnp.sum(dpower * (-dx * dy), axis=1)
        dC = jnp.sum(dpower * (-0.5 * dy * dy), axis=1)
        A = geom_s[:][:, 2:3]
        B = geom_s[:][:, 3:4]
        Cc = geom_s[:][:, 4:5]
        dmx = jnp.sum(dpower * (A * dx + B * dy), axis=1)
        dmy = jnp.sum(dpower * (Cc * dy + B * dx), axis=1)
        dop = jnp.sum(dop_map, axis=1)
        zero = jnp.zeros_like(dop)
        dgeom = jnp.stack([dmx, dmy, dA, dB, dC, dop, zero, zero], axis=1)
        dgeom_s[:] = dgeom
        dcol_s[:] = jnp.dot(
            w, gC, preferred_element_type=jnp.float32, precision=_HIGH
        )  # (K, CH)

        cp_g = pltpu.make_async_copy(dgeom_s, dgeom_hbm.at[pl.ds(base, chunk)], osem)
        cp_g.start()
        cp_g.wait()
        cp_c = pltpu.make_async_copy(dcol_s, dcol_hbm.at[pl.ds(base, chunk)], osem)
        cp_c.start()
        cp_c.wait()
        return S + jnp.sum(wcg, axis=0, keepdims=True)

    jax.lax.fori_loop(0, nchunks, bwd_body, jnp.zeros((1, P_PIX), jnp.float32))


def _pad_pairs(x: jnp.ndarray, chunk: int) -> jnp.ndarray:
    return jnp.concatenate(
        [x, jnp.zeros((chunk,) + x.shape[1:], x.dtype)], axis=0
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8)
)
def pallas_blend(
    pair_geom: jnp.ndarray,  # (P_pairs, 8)
    pair_col: jnp.ndarray,  # (P_pairs, CH)
    tile_start: jnp.ndarray,  # (num_tiles,)
    tile_end: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    chunk: int = 128,
    max_chunks: int = 64,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (img (num_tiles, P_PIX, CH), T (num_tiles, P_PIX))."""
    return _pallas_blend_fwd_impl(
        pair_geom, pair_col, tile_start, tile_end, tiles_x, tiles_y, chunk,
        max_chunks, interpret,
    )


def _pallas_blend_fwd_impl(
    pair_geom, pair_col, tile_start, tile_end, tiles_x, tiles_y, chunk,
    max_chunks, interpret,
):
    num_tiles = tiles_x * tiles_y
    n_ch = pair_col.shape[-1]
    geom_p = _pad_pairs(pair_geom, chunk)
    col_p = _pad_pairs(pair_col, chunk)
    kernel = functools.partial(
        _fwd_kernel, chunk=chunk, n_ch=n_ch, tiles_x=tiles_x
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, P_PIX, n_ch + 1), lambda i, s, e: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((chunk, GEOM_W), jnp.float32),
            pltpu.VMEM((chunk, n_ch), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    packed = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_tiles, P_PIX, n_ch + 1), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_start, tile_end, geom_p, col_p)
    return packed[..., :n_ch], packed[..., n_ch]


def _blend_fwd(pair_geom, pair_col, tile_start, tile_end, tiles_x, tiles_y,
               chunk, max_chunks, interpret):
    out = _pallas_blend_fwd_impl(
        pair_geom, pair_col, tile_start, tile_end, tiles_x, tiles_y, chunk,
        max_chunks, interpret,
    )
    return out, (pair_geom, pair_col, tile_start, tile_end)


def _blend_bwd(tiles_x, tiles_y, chunk, max_chunks, interpret, res, g):
    pair_geom, pair_col, tile_start, tile_end = res
    g_img, g_t = g
    num_tiles = tiles_x * tiles_y
    n_ch = pair_col.shape[-1]
    n_pairs = pair_geom.shape[0]
    geom_p = _pad_pairs(pair_geom, chunk)
    col_p = _pad_pairs(pair_col, chunk)
    kernel = functools.partial(
        _bwd_kernel, chunk=chunk, n_ch=n_ch, tiles_x=tiles_x,
        max_chunks=max_chunks,
    )
    # One flat kernel iteration per tile; per-pair grad arrays are written by
    # disjoint [start, end) slices, zero elsewhere (pairs are tile-unique).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # geom
            pl.BlockSpec(memory_space=pltpu.ANY),  # col
            pl.BlockSpec((1, P_PIX, n_ch + 1), lambda i, s, e: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # g_img (+ g_T channel)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),  # dgeom (written via DMA)
            pl.BlockSpec(memory_space=pltpu.ANY),  # dcol
        ),
        scratch_shapes=[
            pltpu.VMEM((chunk, GEOM_W), jnp.float32),
            pltpu.VMEM((chunk, n_ch), jnp.float32),
            pltpu.VMEM((max_chunks, P_PIX), jnp.float32),  # T at chunk starts
            pltpu.VMEM((max_chunks, P_PIX), jnp.float32),  # done flags
            pltpu.VMEM((chunk, GEOM_W), jnp.float32),  # dgeom staging
            pltpu.VMEM((chunk, n_ch), jnp.float32),  # dcol staging
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    n_pad = geom_p.shape[0]
    dgeom, dcol = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, GEOM_W), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, n_ch), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        input_output_aliases={},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        tile_start,
        tile_end,
        geom_p,
        col_p,
        jnp.concatenate(
            [
                g_img.reshape(num_tiles, P_PIX, n_ch),
                g_t.reshape(num_tiles, P_PIX, 1),
            ],
            axis=-1,
        ),
    )
    # Pairs past the last tile's end are the sentinel (invalid) pairs: no
    # tile owns them, so the kernel never writes their grads — zero them
    # (valid pairs occupy [0, tile_end[-1]) because the sort is by tile id).
    covered = jnp.arange(geom_p.shape[0]) < tile_end[-1]
    dgeom = jnp.where(covered[:, None], dgeom, 0.0)
    dcol = jnp.where(covered[:, None], dcol, 0.0)
    return dgeom[:n_pairs], dcol[:n_pairs], None, None


pallas_blend.defvjp(_blend_fwd, _blend_bwd)
