"""Time the REAL pack_pairs (and its grad) in isolation on the bench scene.

Compares against the in-pipeline bisect deltas to decide whether the pack
cost is intrinsic (index machinery / gather) or an XLA fusion/remat
pathology that only appears inside the full render graph.

Usage: python scripts/micro_pack2.py [--iters 20]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/gsattack_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    print("devices:", jax.devices())

    from bench import build_problem
    from gsattack.ops.pallas_blend import GEOM_W, pack_pairs
    from gsattack.ops.project import project
    from gsattack.ops.raster import auto_pair_caps, auto_pairs_budget, bin_gaussians

    scene, cam = build_problem(100_000, 800, 800, 3)
    proj = jax.jit(lambda s: project(s, cam))(scene)
    pairs, rect = auto_pair_caps(proj, cam.width, cam.height)
    if rect <= pairs:
        rect = 0
    budget = auto_pairs_budget(proj, cam.width, cam.height, pairs,
                               margin=1.0, rect_candidates=rect)
    print(f"pairs={pairs} rect={rect} budget={budget}")

    bins = jax.jit(lambda m, d, r, c, o: bin_gaussians(
        m, d, r, cam.width, cam.height, pairs, conic=c, opacity=o,
        rect_candidates=rect))(
        proj.mean2d, proj.depth, proj.radius_tight, proj.conic, proj.opacity)
    gauss_idx, tile_start, tile_end = map(
        jax.block_until_ready, (bins.gauss_idx, bins.tile_start, bins.tile_end))

    geom = jnp.concatenate(
        [proj.mean2d, proj.conic, proj.opacity[:, None],
         jnp.zeros((proj.mean2d.shape[0], GEOM_W - 6), jnp.float32)], axis=-1)
    channels = proj.color
    geom, channels = map(jax.block_until_ready, (geom, channels))

    def timed(name, fn, *fargs):
        # Chained timing (see micro_pack.py): next eps derives from this
        # call's output — no relay cache hit, no overlap, true serial time.
        def wrapped(eps, *a):
            out = fn(eps, *a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            probe = leaf.reshape(-1)[0].astype(jnp.float32)
            return out, eps * 0.5 + probe * 1e-36 + 1e-30
        jfn = jax.jit(wrapped)
        out, nxt = jfn(jnp.float32(0.0), *fargs)
        jax.block_until_ready((out, nxt))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out, nxt = jfn(nxt, *fargs)
        jax.block_until_ready(nxt)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name}: {dt:.3f} ms")
        return dt

    # 0. dispatch floor: a trivial jit call in the same timing harness —
    # every absolute number below includes this constant.
    timed("dispatch floor (noop)", lambda e, g: g[0, 0] + e, geom)

    # 1. pack fwd alone (device-resident integer metadata)
    timed("pack fwd alone", lambda e, g, c: pack_pairs(
        g + e, c, gauss_idx, tile_start, tile_end, budget=budget)[0],
        geom, channels)

    # 2. pack fwd+bwd alone
    timed("pack f+b alone", lambda e, g, c: jax.grad(
        lambda gg, cc: jnp.sum(pack_pairs(
            gg, cc, gauss_idx, tile_start, tile_end, budget=budget)[0]
            * 1e-6), argnums=(0, 1))(g + e, c),
        geom, channels)

    # 3. index machinery only (everything up to src_gauss, no data gather)
    def src_only(e, d):
        # recompute what pack_pairs does for src_gauss, keyed on a float
        # input so the cache can't replay it
        from gsattack.ops.pallas_blend import CHUNK
        n = geom.shape[0]
        counts = (tile_end - tile_start).astype(jnp.int32)
        counts = counts + (d.reshape(-1)[0] * 0).astype(jnp.int32)
        padded = ((counts + CHUNK - 1) // CHUNK) * CHUNK
        start_raw = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)])
        p_pad = ((budget + CHUNK - 1) // CHUNK) * CHUNK
        packed_start = jnp.minimum(start_raw, p_pad)
        packed_end = jnp.minimum(start_raw + counts, p_pad)
        n_chunks = p_pad // CHUNK
        c_start = jnp.arange(n_chunks, dtype=jnp.int32) * CHUNK

        def cfill(vals):
            z = jnp.zeros(n_chunks, jnp.int32).at[packed_start // CHUNK].max(vals)
            return jax.lax.cummax(z)

        start_c = cfill(packed_start)
        end_c = cfill(packed_end)
        src0_c = cfill(tile_start.astype(jnp.int32))
        pq0 = src0_c + (c_start - start_c)
        p = gauss_idx.shape[0]
        p_round = ((p + CHUNK - 1) // CHUNK) * CHUNK
        g_pad = jnp.concatenate(
            [gauss_idx.astype(jnp.int32),
             jnp.full((p_round - p + CHUNK,), n, jnp.int32)]).reshape(-1, CHUNK)
        row0 = jnp.clip(pq0 // CHUNK, 0, g_pad.shape[0] - 2)
        pair_rows = jnp.concatenate([g_pad[row0], g_pad[row0 + 1]], axis=1)
        off = jnp.clip(pq0 - row0 * CHUNK, 0, 2 * CHUNK - 1)
        for k in range(8):
            bit = ((off >> k) & 1).astype(bool)[:, None]
            pair_rows = jnp.where(
                bit, jnp.roll(pair_rows, -(1 << k), axis=1), pair_rows)
        sg0 = pair_rows[:, :CHUNK].reshape(-1)
        q = jnp.arange(p_pad, dtype=jnp.int32)
        end_of_q = jnp.broadcast_to(end_c[:, None], (n_chunks, CHUNK)).reshape(-1)
        return jnp.where(q < end_of_q, sg0, n)

    timed("src_gauss machinery only", src_only, geom)

    # 4. gather + transpose with PRECOMPUTED indices
    src = jax.block_until_ready(jax.jit(src_only)(jnp.float32(0.0), geom))
    unified = jnp.concatenate([geom, channels], axis=1)
    n = geom.shape[0]

    def gat(e, u, s):
        zero_row = jnp.zeros((1, u.shape[1]), u.dtype)
        return jnp.concatenate([u + e, zero_row])[s].T

    timed("gather+T precomputed idx", gat, unified, src)

    # scatter with the REAL slot->gaussian index distribution: ~50% of
    # slots are padding that clamp to one shared row — a collision
    # hotspot absent from uniform-random microbenches.
    import numpy as _np
    rng = _np.random.default_rng(0)
    src_np = _np.asarray(src)
    print("invalid frac:", (src_np >= n).mean())
    cot = jnp.asarray(rng.normal(size=(src_np.shape[0], 16)).astype(_np.float32))
    idx_hot = jnp.asarray(_np.minimum(src_np, n).astype(_np.int32))  # all pad -> row n
    timed("scatter REAL idx (hotspot row)", lambda e, c, i: jnp.zeros(
        (n + 1, 16), jnp.float32).at[i].add(c + e), cot, idx_hot)
    extra = 8192
    q = _np.arange(src_np.shape[0])
    idx_spread = jnp.asarray(_np.where(
        src_np < n, src_np, n + (q & (extra - 1))).astype(_np.int32))
    timed("scatter REAL idx (spread dummies)", lambda e, c, i: jnp.zeros(
        (n + extra, 16), jnp.float32).at[i].add(c + e), cot, idx_spread)
    idx_unif = jnp.asarray(rng.integers(0, n, size=src_np.shape[0]).astype(_np.int32))
    timed("scatter uniform idx (control)", lambda e, c, i: jnp.zeros(
        (n + 1, 16), jnp.float32).at[i].add(c + e), cot, idx_unif)
    timed("gather+T f+b precomputed idx",
          lambda e, u, s: jax.grad(
              lambda uu: jnp.sum(gat(jnp.float32(0.0), uu, s) * 1e-6))(u + e),
          unified, src)


if __name__ == "__main__":
    main()
