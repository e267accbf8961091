"""A/B the Pallas DMA row-gather against the XLA gather floor (r5 #1).

Measures DEVICE time via the XLA profiler trace (the only trustworthy
per-op timing on the axon relay — CLAUDE.md r3 ground rules). Sizes mimic
the 500k-scene gathers: source ~1.8M x W rows, ~2.2M indices.

Usage: python scripts/micro_gather.py [--w 16] [--m 2217984] [--s 1787904]
       [--blocks 512,1024] [--sems 8,16] [--iters 4]
"""
import argparse
import collections
import fcntl
import glob
import gzip
import json
import sys
import time

sys.path.insert(0, ".")


def device_ms(trace_dir, iters):
    path = sorted(
        glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.load(gzip.open(path))
    ev = d.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg = collections.defaultdict(float)
    for e in ev:
        if e.get("ph") != "X":
            continue
        if "TPU" not in str(pids.get(e["pid"], "")):
            continue
        name = e.get("name", "?")
        if name.isdigit():
            continue
        agg[name] += e.get("dur", 0)
    return {n: v / 1000.0 / iters for n, v in agg.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=16)
    ap.add_argument("--m", type=int, default=2_217_984)  # ~2.2M, 1024-mult
    ap.add_argument("--s", type=int, default=1_787_904)
    ap.add_argument("--blocks", default="512,1024,2048")
    ap.add_argument("--sems", default="16")
    ap.add_argument("--unrolls", default="8")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--out", default="/tmp/jax_trace_gather")
    args = ap.parse_args()

    lockf = open("/tmp/gsattack_tpu.lock", "w")
    fcntl.flock(lockf, fcntl.LOCK_EX)

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/gsattack_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from gsattack.ops.pallas_gather import gather_rows

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(args.s, args.w)).astype(np.float32))
    idx = jnp.asarray(
        rng.integers(0, args.s, size=args.m).astype(np.int32))

    def run(tag, fn):
        # salt defeats the cross-process axon result cache; the perturbed
        # index arrays are prepared BEFORE the trace so only the gather
        # under test shows up in the device timeline.
        salt = jnp.int32(time.time_ns() % 977)
        idx_seq = [
            jax.block_until_ready((idx + salt + i) % args.s)
            for i in range(args.iters + 1)
        ]
        out = jax.block_until_ready(fn(src, idx_seq[0]))
        tdir = f"{args.out}_{tag}"
        with jax.profiler.trace(tdir):
            for i in range(args.iters):
                out = fn(src, idx_seq[i + 1])
            jax.block_until_ready(out)
        ops = device_ms(tdir, args.iters)
        total = sum(v for n, v in ops.items()
                    if not n.startswith("jit_"))
        top = sorted(ops.items(), key=lambda kv: -kv[1])[:4]
        print(f"{tag:28s} {total:8.3f} ms "
              f"({total * 1e6 / args.m:.2f} ns/row) | "
              + " ".join(f"{n[:28]}={v:.2f}" for n, v in top), flush=True)
        return out, total

    xla_fn = jax.jit(lambda s, i: s[i])
    ref, xla_ms = run("xla_gather", xla_fn)

    # Mosaic refuses sub-128 minor-dim HBM slices (the (S, W) array is
    # lane-padded to 128 in HBM anyway), so the pallas variants gather
    # full 128-wide padded rows and the comparison slices [:, :W].
    if args.w < 128:
        src = jnp.pad(src, ((0, 0), (0, 128 - args.w)))
        src = jax.block_until_ready(src)

    for b in map(int, args.blocks.split(",")):
        for ns in map(int, args.sems.split(",")):
            for ur in map(int, args.unrolls.split(",")):
                tag = f"pallas_b{b}_s{ns}_u{ur}"
                try:
                    fn = jax.jit(mk_pallas(b, ns, ur))
                    out, ms = run(tag, fn)
                    err = float(jnp.abs(out[:, :args.w] - ref).max())
                    if err != 0.0:
                        print(f"  !! {tag} MISMATCH {err}")
                except Exception as e:
                    msg = str(e).split("\n")[0][:200]
                    print(f"  {tag} FAILED: {type(e).__name__}: {msg}")


def mk_pallas(b, ns, ur):
    from gsattack.ops.pallas_gather import gather_rows

    def fn(s, i):
        return gather_rows(s, i, block=b, n_sem=ns, unroll=ur)

    return fn




def sweep():
    """XLA gather ns/row vs SOURCE row count (fixed M): locate the fast-
    regime cliff (r4 saw 1.3 ns/row at a 100k-row/6.4MB source vs ~6 at
    340k+ — if it is a VMEM-residency threshold, splitting big gather
    sources re-enters the fast regime)."""
    import fcntl
    lockf = open("/tmp/gsattack_tpu.lock", "w")
    fcntl.flock(lockf, fcntl.LOCK_EX)
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/gsattack_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    M, W, iters = 2_217_984, 16, 4
    fn = jax.jit(lambda s, i: s[i])
    for S in (50_000, 100_000, 200_000, 300_000, 400_000, 600_000,
              900_000, 1_400_000, 1_800_000):
        src = jnp.asarray(rng.normal(size=(S, W)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, S, size=M).astype(np.int32))
        salt = jnp.int32(time.time_ns() % 977)
        idx_seq = [jax.block_until_ready((idx + salt + i) % S)
                   for i in range(iters + 1)]
        out = jax.block_until_ready(fn(src, idx_seq[0]))
        tdir = f"/tmp/jax_trace_sweep_{S}"
        with jax.profiler.trace(tdir):
            for i in range(iters):
                out = fn(src, idx_seq[i + 1])
            jax.block_until_ready(out)
        ops = device_ms(tdir, iters)
        total = sum(v for n, v in ops.items() if not n.startswith("jit_"))
        mb = S * W * 4 / 1e6
        print(f"S={S:9d} ({mb:7.1f} MB src) {total:8.3f} ms "
              f"({total * 1e6 / M:.2f} ns/row)", flush=True)




def sweep_w():
    """Gather cost vs ROW WIDTH and source layout at the 500k-scene shape:
    the objects-mode profile shows the W=32 candidate gather at ~29 ns/row
    vs ~6 at W=16 — is it width itself, the strided (transposed) source,
    or fusion context?"""
    import fcntl
    lockf = open("/tmp/gsattack_tpu.lock", "w")
    fcntl.flock(lockf, fcntl.LOCK_EX)
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/gsattack_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    M, S, iters = 2_217_984, 1_787_904, 4
    idx = jnp.asarray(rng.integers(0, S, size=M).astype(np.int32))

    def timed(tag, fn, *arrs):
        salt = jnp.int32(time.time_ns() % 977)
        idx_seq = [jax.block_until_ready((idx + salt + i) % S)
                   for i in range(iters + 1)]
        out = jax.block_until_ready(fn(*arrs, idx_seq[0]))
        tdir = f"/tmp/jax_trace_sw_{tag}"
        with jax.profiler.trace(tdir):
            for i in range(iters):
                out = fn(*arrs, idx_seq[i + 1])
            jax.block_until_ready(out)
        ops = device_ms(tdir, iters)
        total = sum(v for n, v in ops.items() if not n.startswith("jit_"))
        print(f"{tag:24s} {total:8.3f} ms ({total * 1e6 / M:.2f} ns/row)",
              flush=True)

    for W in (8, 16, 24, 32, 48):
        src = jnp.asarray(rng.normal(size=(S, W)).astype(np.float32))
        srcT = jax.block_until_ready(jnp.asarray(np.asarray(src).T.copy()))
        timed(f"direct_w{W}", jax.jit(lambda s, i: s[i]), src)
        # transposed source: the table backward gathers rows of g.T where
        # g is the field-major (W, P_pad) kernel output
        timed(f"fromT_w{W}", jax.jit(lambda s, i: s.T[i]), srcT)
        if W >= 16:
            # split into two half-width gathers (fused back by concat)
            h = W // 2
            timed(
                f"split2_w{W}",
                jax.jit(lambda a, b, i: jnp.concatenate(
                    [a[i], b[i]], axis=1)),
                jax.block_until_ready(src[:, :h].copy()),
                jax.block_until_ready(src[:, h:].copy()),
            )




def sweep_split():
    """Why did the in-context width split leave the offset piece at ~15-19
    ns/row? Compare source materializations for the hi 16 columns of a
    W=32 gather: fused column slice of a row-major source, transposed
    view of a field-major source, and a separately materialized compact
    (S, 16) source."""
    import fcntl
    lockf = open("/tmp/gsattack_tpu.lock", "w")
    fcntl.flock(lockf, fcntl.LOCK_EX)
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/gsattack_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    M, S, iters = 2_217_984, 1_787_904, 4
    idx = jnp.asarray(rng.integers(0, S, size=M).astype(np.int32))
    src = jnp.asarray(rng.normal(size=(S, 32)).astype(np.float32))
    fm = jax.block_until_ready(jnp.asarray(np.asarray(src).T.copy()))
    hi = jax.block_until_ready(jnp.asarray(np.asarray(src)[:, 16:].copy()))

    def timed(tag, fn, *arrs):
        salt = jnp.int32(time.time_ns() % 977)
        idx_seq = [jax.block_until_ready((idx + salt + i) % S)
                   for i in range(iters + 1)]
        out = jax.block_until_ready(fn(*arrs, idx_seq[0]))
        tdir = f"/tmp/jax_trace_sp_{tag}"
        with jax.profiler.trace(tdir):
            for i in range(iters):
                out = fn(*arrs, idx_seq[i + 1])
            jax.block_until_ready(out)
        ops = device_ms(tdir, iters)
        total = sum(v for n, v in ops.items() if not n.startswith("jit_"))
        print(f"{tag:22s} {total:8.3f} ms ({total * 1e6 / M:.2f} ns/row)",
              flush=True)

    bar = jax.lax.optimization_barrier
    timed("slice_lo", jax.jit(lambda s, i: s[:, 0:16][i]), src)
    timed("slice_hi", jax.jit(lambda s, i: s[:, 16:32][i]), src)
    timed("fmT_hi", jax.jit(lambda f, i: f[16:32].T[i]), fm)
    timed("sep_hi", jax.jit(lambda b, i: b[i]), hi)
    timed("slice_hi_T", jax.jit(lambda s, i: s[:, 16:32][i].T), src)
    timed("sep_hi_T", jax.jit(lambda b, i: b[i].T), hi)
    timed("fmT_hi_T", jax.jit(lambda f, i: f[16:32].T[i].T), fm)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        sweep()
    elif len(sys.argv) > 1 and sys.argv[1] == "sweep_w":
        sweep_w()
    elif len(sys.argv) > 1 and sys.argv[1] == "sweep_split":
        sweep_split()
    else:
        main()
