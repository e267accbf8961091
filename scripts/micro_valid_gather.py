"""r6 de-risk: device rate of the VALID-only pair gather.

(a) W=12 (RGB): 1.2M rows from a 1.67M x 12 source — the segmented-
    reduction backward's input gather.
(b) W=28 (objects) as chained 16+12 pieces.
"""
import sys, time, fcntl
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
lockf = open("/tmp/gsattack_tpu.lock", "w"); fcntl.flock(lockf, fcntl.LOCK_EX)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/gsattack_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from micro_gather import device_ms

M, S = 1_200_000, 1_666_560
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, S, size=M).astype(np.int32))
iters = 4

def run(tag, fn, *arrs):
    salt = jnp.int32(time.time_ns() % 977)
    idx_seq = [jax.block_until_ready((idx + salt + i) % S)
               for i in range(iters + 1)]
    out = jax.block_until_ready(fn(*arrs, idx_seq[0]))
    tdir = f"/tmp/jax_trace_valid_{tag}"
    with jax.profiler.trace(tdir):
        for i in range(iters):
            out = fn(*arrs, idx_seq[i + 1])
        jax.block_until_ready(out)
    ops = device_ms(tdir, iters)
    total = sum(v for n, v in ops.items() if not n.startswith("jit_"))
    print(f"{tag:24s} {total:7.3f} ms ({total*1e6/M:.2f} ns/row)", flush=True)

src12 = jnp.asarray(rng.normal(size=(S, 12)).astype(np.float32))
run("w12_plain", jax.jit(lambda s, i: s[i]), src12)

src28 = jnp.asarray(rng.normal(size=(S, 28)).astype(np.float32))
def split_chain(s, i):
    a = jax.lax.optimization_barrier(s[:, :16][i])
    i2, _ = jax.lax.optimization_barrier((i, a))
    b = jax.lax.optimization_barrier(s[:, 16:][i2])
    return jnp.concatenate([a, b], axis=1)
run("w28_split_chain", jax.jit(split_chain), src28)
run("w28_plain", jax.jit(lambda s, i: s[i]), src28)
