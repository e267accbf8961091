"""Offline weight conversion: ultralytics checkpoints -> flax params.

The environment has torch (CPU) but not the ultralytics package, and
ultralytics ``.pt`` files pickle model *objects* (not loadable without the
package). The supported interchange is therefore a flat tensor archive:

  1. elsewhere (any machine with ultralytics):
       m = YOLO("yolov8n.pt").model
       torch.save({k: v.cpu() for k, v in m.state_dict().items()}, "sd.pt")
     or export the same dict as .npz / .safetensors.
  2. here: `convert_state_dict(sd)` maps ultralytics module paths
     (model.0.conv.weight, ...) onto our flax tree by walking both in
     topological order per block kind, and `load_converted_npz` merges the
     result into an initialized params tree.

Round-1 scope: the plumbing + name-order mapping for Conv/BN pairs; a
recorded-activation parity test belongs with real weights (none are
shippable in this image — the reference's own weights are git-LFS stubs,
`pretrained-models/`).
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np


def _natural_key(s: str):
    """Sort 'model.10.x' after 'model.2.x' (numeric-aware)."""
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]


def _flatten(tree: Any, prefix=()) -> dict[tuple, Any]:
    out = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: dict[tuple, Any]) -> dict:
    root: dict = {}
    for path, v in flat.items():
        cur = root
        for p in path[:-1]:
            cur = cur.setdefault(p, {})
        cur[path[-1]] = v
    return root


def convert_state_dict(sd: Mapping[str, np.ndarray], params: dict) -> dict:
    """Pour a flat ultralytics state_dict into a flax params/batch_stats
    tree by matching tensors in traversal order within each kind.

    Kinds matched: conv kernels (OIHW -> HWIO), BN (weight/bias/mean/var),
    plain conv biases. Raises if counts/shapes mismatch.
    """
    flat = _flatten(params)

    def order_key(path):
        # natural order so ConvBnSiLU_10 follows ConvBnSiLU_9, not _1
        return _natural_key("/".join(str(p) for p in path))

    conv_w = [
        (k, v) for k, v in sorted(sd.items(), key=lambda kv: _natural_key(kv[0])) if k.endswith(".conv.weight")
        or (k.endswith(".weight") and getattr(v, "ndim", 0) == 4)
    ]
    conv_b = [
        (k, v)
        for k, v in sorted(sd.items(), key=lambda kv: _natural_key(kv[0]))
        if k.endswith(".bias") and k.replace(".bias", ".weight") in sd
        and getattr(sd[k.replace(".bias", ".weight")], "ndim", 0) == 4
    ]
    bn = {
        suffix: [
            (k, v) for k, v in sorted(sd.items(), key=lambda kv: _natural_key(kv[0])) if k.endswith(f".bn.{suffix}")
        ]
        for suffix in ("weight", "bias", "running_mean", "running_var")
    }

    targets_kernel = sorted(
        [p for p in flat if p[-1] == "kernel"], key=order_key
    )
    if len(targets_kernel) != len(conv_w):
        raise ValueError(
            f"conv count mismatch: {len(targets_kernel)} flax vs {len(conv_w)} torch"
        )
    for path, (_, w) in zip(targets_kernel, conv_w):
        w = np.asarray(w)
        whwio = np.transpose(w, (2, 3, 1, 0))
        if whwio.shape != flat[path].shape:
            raise ValueError(f"shape mismatch at {path}: {whwio.shape} vs {flat[path].shape}")
        flat[path] = jnp.asarray(whwio)

    for suffix, flax_name, coll in (
        ("weight", "scale", "params"),
        ("bias", "bias", "params"),
        ("running_mean", "mean", "batch_stats"),
        ("running_var", "var", "batch_stats"),
    ):
        targets = sorted(
            [
                p
                for p in flat
                if p[-1] == flax_name and p[0] == coll and "BatchNorm" in str(p)
            ],
            key=order_key,
        )
        src = bn[suffix]
        if len(targets) != len(src):
            raise ValueError(
                f"bn {suffix} count mismatch: {len(targets)} vs {len(src)}"
            )
        for path, (_, v) in zip(targets, src):
            flat[path] = jnp.asarray(np.asarray(v))

    bias_targets = sorted(
        [p for p in flat if p[-1] == "bias" and "BatchNorm" not in str(p)],
        key=order_key,
    )
    if conv_b and len(bias_targets) == len(conv_b):
        for path, (_, v) in zip(bias_targets, conv_b):
            flat[path] = jnp.asarray(np.asarray(v))
    return _unflatten(flat)


def load_converted_npz(path: str, params: dict) -> dict:
    """Load a flat .npz of ultralytics tensors and pour into params."""
    with np.load(path) as z:
        sd = {k: z[k] for k in z.files}
    return convert_state_dict(sd, params)
