"""Dump the optimized HLO of the flagship fwd+bwd step and map the
profiler's hot op names (fusion.N / copy.N / while.N) back to source ops.

Usage: python scripts/dump_hlo.py [--objects] [--ops fusion.10,fusion.4,...]
"""
import argparse
import re
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--objects", action="store_true")
    ap.add_argument("--ops", default="")
    ap.add_argument("--full", action="store_true", help="print whole HLO")
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
          f"compact={compact} tier={tier}", file=sys.stderr)
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
    txt = vg.lower(params, jnp.float32(0.0)).compile().as_text()
    if args.full:
        print(txt)
        return
    wanted = [w for w in args.ops.split(",") if w]
    lines = txt.splitlines()
    # Print the definition line (and for fusions, the called computation).
    for w in wanted:
        pat = re.compile(r"%?" + re.escape(w) + r"\b\s*=")
        hits = [ln for ln in lines if pat.search(ln)]
        print(f"==== {w} ====")
        for h in hits[:4]:
            print(h.strip()[:2000])
        # if it's a fusion with calls=..., print that computation body
        for h in hits:
            m = re.search(r"calls=([%\w.\-]+)", h)
            if m:
                cname = m.group(1).lstrip("%")
                inbody = False
                count = 0
                for ln in lines:
                    if re.match(rf"%?{re.escape(cname)}\b", ln.strip()):
                        inbody = True
                    if inbody:
                        print("   |", ln.rstrip()[:240])
                        count += 1
                        if ln.strip().startswith("ROOT") or count > 80:
                            break
        print()


if __name__ == "__main__":
    main()
