"""Device mesh construction + multi-host initialization.

The scaling layer the reference entirely lacks (SURVEY.md §2.4: no
NCCL/MPI/torch.distributed anywhere — single-GPU only). TPU-native design:
a `jax.sharding.Mesh` over ("views", "splats") — data parallelism over
attacked camera views rides the outer axis (DCN-friendly, gradients are
one psum per step), splat/model parallelism rides the inner axis
(ICI-friendly, projection math is embarrassingly parallel over points and
the blend gather is the only cross-shard traffic).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

VIEWS_AXIS = "views"
SPLATS_AXIS = "splats"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    expect_devices: Optional[int] = None,
) -> dict:
    """Multi-host bring-up (`jax.distributed.initialize`) — the TPU-native
    replacement for the NCCL/MPI layer the reference never had.

    Topology mapping (how the two mesh axes ride the fabric): `make_mesh`
    lays devices out C-order over ("views", "splats"), so the **splats**
    axis (the inner, fastest-varying one) lands on neighboring devices —
    intra-slice ICI — which carries the heavy collectives (the projected-
    array all_gather + grad reduce-scatter of parallel/pallas_shard.py).
    The **views** axis is the outer one and crosses hosts/DCN; it only
    carries the one per-step gradient psum for views-replicated params,
    which is latency-tolerant. Multi-host view-DP therefore scales over
    DCN while splat model-parallelism stays on ICI.

    Validation: explicit args must be complete and consistent; after
    bring-up the global device count must match `expect_devices` (when
    given) and be divisible into a (views, splats) grid. Returns a summary
    dict {distributed, process_id, num_processes, devices, local_devices}.
    """
    explicit = [coordinator_address, num_processes, process_id]
    if any(a is not None for a in explicit):
        if any(a is None for a in explicit):
            raise ValueError(
                "coordinator_address, num_processes and process_id must be "
                "given together for explicit multi-host init"
            )
        if not (0 <= process_id < num_processes):
            raise ValueError(
                f"process_id {process_id} out of range for "
                f"{num_processes} processes"
            )
        jax.distributed.initialize(
            coordinator_address, num_processes, process_id
        )
        distributed = True
    else:
        try:  # env auto-detection (TPU pod metadata); no-op single-process
            jax.distributed.initialize()
            distributed = jax.process_count() > 1
        except Exception:
            distributed = False
    n_dev = len(jax.devices())
    if expect_devices is not None and n_dev != expect_devices:
        raise RuntimeError(
            f"expected {expect_devices} global devices after init, "
            f"found {n_dev} (processes up: {jax.process_count()})"
        )
    return {
        "distributed": distributed,
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "devices": n_dev,
        "local_devices": len(jax.local_devices()),
    }


def local_mesh_shape(
    n_devices: Optional[int] = None, views: Optional[int] = None
) -> tuple[int, int]:
    """Pick a (views, splats) mesh shape: prefer the requested view-DP
    degree, fill the rest with splat sharding."""
    n = n_devices or len(jax.devices())
    if views is None:
        # Default: as much view-DP as divides the device count, capped at 8.
        views = 1
        for cand in (8, 4, 2):
            if n % cand == 0 and cand <= n:
                views = cand
                break
    assert n % views == 0, f"{n} devices not divisible by views={views}"
    return views, n // views


def make_mesh(
    shape: Optional[tuple[int, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: tuple[str, str] = (VIEWS_AXIS, SPLATS_AXIS),
) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = local_mesh_shape(len(devices))
    arr = np.array(devices[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(arr, axis_names)
