"""HBM footprint of the flagship fwd+bwd step at a given scale.

AOT-compiles the bench loss (same caps resolution as bench.py) and prints
XLA's memory analysis — argument/output/temp/alias bytes — plus the
analytic footprint of the big per-run arrays (unified rows, packed pairs,
sort buffers), so the capacity formula in PARITY.md stays checkable.

Usage: python scripts/memory_probe.py [--n 1000000] [--width 1600]
       [--height 1200] [--objects]

Compiles over the axon tunnel (minutes cold, seconds warm via the
persistent cache); nothing is executed.
"""
import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1600)
    ap.add_argument("--height", type=int, default=1200)
    ap.add_argument("--objects", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/gsattack_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from bench import build_problem
    from gsattack.ops.project import project
    from gsattack.ops.raster import auto_caps
    from gsattack.render import render

    scene, cam = build_problem(args.n, args.width, args.height, 3)
    proj = jax.jit(lambda s: project(s, cam))(scene)
    pairs, rect, budget, compact, tier = auto_caps(proj, cam.width,
                                                   cam.height)
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

    params = scene.params()
    lowered = jax.jit(lambda p, eps: jax.value_and_grad(loss_fn)(
        {**p, "xyz": p["xyz"] + eps})).lower(params, jnp.float32(0.0))
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gib = 1024.0 ** 3

    def f(x):
        return f"{x / gib:.3f} GiB"

    print(f"argument_size:  {f(ma.argument_size_in_bytes)}")
    print(f"output_size:    {f(ma.output_size_in_bytes)}")
    print(f"temp_size:      {f(ma.temp_size_in_bytes)}")
    print(f"generated_code: {f(ma.generated_code_size_in_bytes)}")
    print(f"alias_size:     {f(ma.alias_size_in_bytes)}")
    total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
             + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
    print(f"peak (arg+out+temp-alias): {f(total)}")

    # Analytic inventory of the scale-dependent arrays (f32 unless noted):
    n = args.n
    n_ch = 19 if args.objects else 3
    unified_w = 9 + n_ch  # mean2d(2) conic(3) opacity(1) pad(3) + channels
    flat = n * tier[0] + tier[1] * (pairs - tier[0]) if tier[0] else n * pairs
    rows = {
        "unified per-gaussian rows (N x ~{}):".format(unified_w):
            n * unified_w * 4,
        "packed pair slots (budget x {}):".format(unified_w):
            budget * unified_w * 4,
        "flat sort keys+payloads ({} x ~3 u32/i32):".format(flat): flat * 12,
        "bwd pair grads (budget x {}):".format(unified_w):
            budget * unified_w * 4,
        "compact bwd buffers ({} x ~{}):".format(compact, unified_w):
            compact * unified_w * 4,
    }
    print("analytic (per array, not simultaneous):")
    for k, v in rows.items():
        print(f"  {k} {f(v)}")


if __name__ == "__main__":
    main()
