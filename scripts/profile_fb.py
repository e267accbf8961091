"""Profile the flagship fwd+bwd step on the TPU with the XLA profiler.

The ONLY trustworthy per-op timing on the axon relay: wall-clock micro
loops are distorted per-process (result caching / RPC pipelining vary),
but device trace durations come from the chip itself. Prints the top
device ops and the mean per-iteration device time.

Usage: python scripts/profile_fb.py [--objects] [--iters 3]
"""
import argparse
import collections
import glob
import gzip
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--objects", action="store_true")
    ap.add_argument("--out", default="/tmp/jax_trace_fb")
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=800)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/gsattack_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from bench import build_problem
    from gsattack.ops.project import project
    from gsattack.ops.raster import (
        auto_compact_budget, auto_pair_caps, auto_pairs_budget)
    from gsattack.render import render

    scene, cam = build_problem(args.n, args.width, args.height, 3)
    proj = jax.jit(lambda s: project(s, cam))(scene)
    from gsattack.ops.raster import auto_caps

    pairs, rect, budget, compact, tier = auto_caps(
        proj, cam.width, cam.height)
    print(f"caps: pairs={pairs} rect={rect} budget={budget} "
          f"compact={compact} tier={tier}")
    bg = jnp.zeros(3)
    target = jnp.zeros((args.height, args.width, 3))

    def loss_fn(p):
        out = render(scene.with_params(p), cam, bg, pairs_per_gaussian=pairs,
                     chunk=128, max_chunks=16, backend="pallas",
                     pairs_budget=budget, with_objects=args.objects,
                     rect_candidates=rect, compact_budget=compact,
                     tier_split=tier[0], heavy_budget=tier[1])
        return jnp.mean((out["render"] - target) ** 2)

    vg = jax.jit(lambda p, eps: jax.value_and_grad(loss_fn)(
        {**p, "xyz": p["xyz"] + eps}))
    params = scene.params()
    _, g = vg(params, jnp.float32(0.0))
    jax.block_until_ready(g)

    with jax.profiler.trace(args.out):
        for i in range(args.iters):
            _, g = vg(params, jnp.float32((i + 1) * 1e-30))
        jax.block_until_ready(g)

    path = sorted(glob.glob(args.out + "/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.load(gzip.open(path))
    ev = d.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg = collections.defaultdict(float)
    cnt = collections.Counter()
    dev_total = 0.0
    for e in ev:
        if e.get("ph") != "X":
            continue
        pname = pids.get(e["pid"], "")
        if "TPU" not in str(pname):
            continue
        name = e.get("name", "?")
        if name.startswith("jit__lambda"):
            dev_total += e.get("dur", 0)
            continue
        if name.isdigit():
            continue
        agg[name] += e.get("dur", 0)
        cnt[name] += 1
    print(f"device total: {dev_total/1000/args.iters:.3f} ms/iter")
    for n, v in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{v/1000/args.iters:9.3f} ms/iter x{cnt[n]//args.iters:<3} {n[:80]}")


if __name__ == "__main__":
    main()
