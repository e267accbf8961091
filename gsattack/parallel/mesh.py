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
) -> None:
    """Multi-host bring-up (`jax.distributed.initialize`) — the TPU-native
    replacement for the NCCL/MPI layer the reference never had. No-op when
    args are absent and env auto-detection finds nothing."""
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except Exception:
        pass  # single-process


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
