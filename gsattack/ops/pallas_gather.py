"""Pallas TPU row-gather kernels — attacking the XLA gather floor.

The r3/r4 profiles put the remaining non-kernel frame time in two XLA row
gathers (the fwd pack gather and the table backward's candidate gather),
both pinned at XLA's ~6 ns/row serial-gather floor regardless of source
layout or row width (CLAUDE.md r4 notes). The only way past a per-row
*instruction* floor is issuing the row fetches as asynchronous DMAs with
many outstanding — HBM can sustain hundreds of concurrent line fetches,
and the per-descriptor issue cost on the scalar core is the open
question this kernel exists to measure (VERDICT r5 item #1).

Design:
  * grid over index blocks; each program issues BLOCK row DMAs
    (HBM (1, W) slices -> VMEM output rows) back-to-back, then drains.
  * the index block rides in SMEM (pipelined BlockSpec) so the scalar
    core reads each row id without VMEM->SMEM staging.
  * `n_sem` semaphores round-robin so waits don't serialize issues.

Row slices take the FULL minor dimension (no minor-dim slicing), which
sidesteps Mosaic's 128-aligned-minor-dim DMA rule; W itself may be any
multiple of 8 sublane-compatible width (the callers' unified row widths
are 16/32/40).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_rows_kernel(idx_ref, src_hbm, out_ref, sem, *, block, n_sem,
                        unroll):
    # Mosaic's fori_loop lowers only unroll=1 or full — partial unroll is
    # done by hand (u is a Python int, so the semaphore pick and the u
    # offset fold to constants in each unrolled copy).
    assert block % unroll == 0

    def issue(o, _):
        for u in range(unroll):
            j = o * unroll + u
            r = idx_ref[j]
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(r, 1), :],
                out_ref.at[pl.ds(j, 1), :],
                sem.at[jax.lax.rem(j, n_sem)],
            ).start()
        return 0

    jax.lax.fori_loop(0, block // unroll, issue, 0)

    def drain(o, _):
        for u in range(unroll):
            j = o * unroll + u
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(0, 1), :],
                out_ref.at[pl.ds(j, 1), :],
                sem.at[jax.lax.rem(j, n_sem)],
            ).wait()
        return 0

    jax.lax.fori_loop(0, block // unroll, drain, 0)


@functools.partial(
    jax.jit, static_argnames=("block", "n_sem", "unroll", "interpret")
)
def gather_rows(
    src: jnp.ndarray,  # (S, W) f32
    idx: jnp.ndarray,  # (M,) int32, in [0, S)
    block: int = 1024,
    n_sem: int = 16,
    unroll: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[k] = src[idx[k]] via per-row async DMAs. M must be a multiple
    of `block` (callers pad; padded lanes should carry a valid index,
    e.g. 0)."""
    m = idx.shape[0]
    assert m % block == 0, (m, block)
    kernel = functools.partial(
        _gather_rows_kernel, block=block, n_sem=n_sem, unroll=unroll
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(m // block,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (block, src.shape[1]), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_sem,))],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, src.shape[1]), src.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx, src)
