"""Microbenchmark the pack-pairs primitives on the TPU.

Isolates the candidate costs of the packed-pair layout rebuild:
  * row gather at padded (338k) vs compact (192k) slot counts
  * the field-major transpose (.T) after the gather
  * the backward (transpose + scatter-add) at both sizes

Each timing threads an inert per-iteration epsilon through the float
operand (CLAUDE.md: the axon result cache returns repeated identical
calls instantly and fakes constant-input timing loops).

Usage: python scripts/micro_pack.py [--iters 20]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--w", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/gsattack_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    print("devices:", jax.devices())

    rng = np.random.default_rng(0)
    n, w = args.n, args.w
    unified = jnp.asarray(rng.normal(size=(n + 1, w)).astype(np.float32))

    def timed(name, fn, *fargs):
        # CHAINED timing: each call's eps derives from the previous call's
        # OUTPUT, so (a) the axon relay cannot satisfy any call from a
        # result cache and (b) calls cannot overlap/reorder — the loop
        # measures true serialized device time. A varying-eps-only loop
        # measured 338k-row scatters at 0.017 ms, below the HBM read
        # floor: provably faked.
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

    for p in (192_000 // 128 * 128, 338_432):
        idx = jnp.asarray(
            rng.integers(0, n + 1, size=(p,)).astype(np.int32))
        cot_sm = jnp.asarray(rng.normal(size=(p, w)).astype(np.float32))
        cot_fm = cot_sm.T

        timed(f"gather {p} slot-major (P,{w})",
              lambda e, u, i: (u + e)[i], unified, idx)
        timed(f"gather+T {p} field-major ({w},P)",
              lambda e, u, i: (u + e)[i].T, unified, idx)
        timed(f"transpose ({w},{p}) -> ({p},{w})",
              lambda e, c: (c + e).T, cot_fm)
        timed(f"scatter-add {p} rows",
              lambda e, c, i: jnp.zeros((n + 1, w), jnp.float32).at[i].add(
                  c + e), cot_sm, idx)
        timed(f"T+scatter-add {p} (bwd of gather+T)",
              lambda e, c, i: jnp.zeros((n + 1, w), jnp.float32).at[i].add(
                  (c + e).T), cot_fm, idx)
        # the real composition: grad of sum(packed * cot) wrt unified
        timed(f"AD bwd of gather+T {p}",
              lambda e, c, i: jax.grad(
                  lambda u: jnp.vdot((u + e)[i].T, c))(unified), cot_fm, idx)

        # --- r3 scatter design levers ---
        for wv in (16, 9, 4, 1):
            cot_w = jnp.asarray(
                rng.normal(size=(p, wv)).astype(np.float32))
            timed(f"scatter-add {p} rows W={wv}",
                  lambda e, c, i: jnp.zeros((n + 1, c.shape[1]), jnp.float32)
                  .at[i].add(c + e), cot_w, idx)
        # unique destinations (iota indices): the no-collision ceiling
        uidx = jnp.asarray(
            np.random.default_rng(1).permutation(p).astype(np.int32))
        cot16 = jnp.asarray(rng.normal(size=(p, 16)).astype(np.float32))
        timed(f"scatter-add {p} rows W=16 UNIQUE perm",
              lambda e, c, i: jnp.zeros((p, 16), jnp.float32)
              .at[i].add(c + e, unique_indices=True), cot16, uidx)
        timed(f"scatter-add {p} rows W=16 perm (non-unique flag)",
              lambda e, c, i: jnp.zeros((p, 16), jnp.float32)
              .at[i].add(c + e), cot16, uidx)
        # inverse-design cost driver: gather 6*n rows + reduce
        gidx6 = jnp.asarray(
            rng.integers(0, p, size=(n * 6,)).astype(np.int32))
        timed(f"gather {n*6} rows W=16 + segsum6",
              lambda e, c, i: jnp.sum(
                  (c + e)[i].reshape(n, 6, 16), axis=1), cot16, gidx6)


if __name__ == "__main__":
    main()
# (extended r3) scatter design levers — run with --variants
