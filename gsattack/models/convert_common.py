"""Shared torch-state_dict -> flax conversion machinery.

gsattack's detector flax modules name their submodules to mirror the torch
module tree of the models the reference wraps (ultralytics YOLO,
detectron2 Faster R-CNN, torch-hub DETR). Conversion is then a mechanical
per-key rename:

  * drop an optional top prefix (e.g. ``model.``),
  * merge numeric path tokens onto their predecessor
    (``res2.0.conv1`` -> ``res2_0/conv1``; ``cv2.0.2`` -> ``cv2_0_2``),
  * map leaves: conv ``weight`` (4D, OIHW->HWIO) / linear ``weight``
    (2D, transposed) -> ``kernel``; norm stats -> FrozenBN/BatchNorm
    scale/bias + batch_stats mean/var.

Strictness: every flax leaf must be covered and every mapped tensor must
match shapes — partial/silent loads raise.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Optional

import jax.numpy as jnp
import numpy as np

NORM_LEAVES = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}


def merge_numeric_tokens(mods: list[str]) -> list[str]:
    merged: list[str] = []
    for t in mods:
        if t.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{t}"
        else:
            merged.append(t)
    return merged


def default_key_mapper(
    key: str,
    norm_names: tuple[str, ...] = ("bn", "norm"),
    skip: Callable[[str], bool] = lambda k: False,
    rename_first: Optional[Callable[[str], str]] = None,
):
    """Map one torch key to (collection, flax path) or None to skip."""
    if skip(key):
        return None
    toks = key.split(".")
    leaf = toks[-1]
    mods = toks[:-1]
    if leaf == "num_batches_tracked":
        return None
    if rename_first is not None and mods:
        mods = [rename_first(mods[0])] + mods[1:]
    merged = merge_numeric_tokens(mods)
    if merged and merged[-1] in norm_names:
        coll, name = NORM_LEAVES[leaf]
        return coll, (*merged, name)
    if leaf == "weight":
        return "params", (*merged, "kernel")
    if leaf == "bias":
        return "params", (*merged, "bias")
    raise ValueError(f"unrecognized torch key {key!r}")


def to_flax_array(leaf_name: str, v: np.ndarray) -> jnp.ndarray:
    v = np.asarray(v)
    if leaf_name == "kernel":
        if v.ndim == 4:  # OIHW -> HWIO
            v = np.transpose(v, (2, 3, 1, 0))
        elif v.ndim == 2:  # (out, in) -> (in, out)
            v = v.T
    return jnp.asarray(v)


def flatten(tree: Any, prefix=()) -> dict[tuple, Any]:
    out = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            out.update(flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def unflatten(flat: dict[tuple, Any]) -> dict:
    root: dict = {}
    for path, v in flat.items():
        cur = root
        for p in path[:-1]:
            cur = cur.setdefault(p, {})
        cur[path[-1]] = v
    return root


def pour_state_dict(
    sd: Mapping[str, np.ndarray],
    variables: dict,
    key_mapper: Callable[[str], Optional[tuple]],
) -> dict:
    """Strict conversion of a torch state_dict into an initialized flax
    variables tree."""
    import inspect

    takes_array = len(inspect.signature(key_mapper).parameters) >= 2
    flat_init = flatten(variables)
    converted: dict[tuple, jnp.ndarray] = {}
    for k, v in sd.items():
        m = key_mapper(k, np.asarray(v)) if takes_array else key_mapper(k)
        if m is None:
            continue
        coll, path = m
        full = (coll, *path)
        arr = to_flax_array(path[-1], v)
        if full not in flat_init:
            raise ValueError(f"torch key {k} -> {full} not in flax tree")
        if tuple(arr.shape) != tuple(flat_init[full].shape):
            raise ValueError(
                f"shape mismatch for {k}: torch {arr.shape} vs flax "
                f"{flat_init[full].shape}"
            )
        converted[full] = arr
    missing = set(flat_init) - set(converted)
    if missing:
        raise ValueError(
            f"{len(missing)} flax leaves not covered by the checkpoint, "
            f"e.g. {sorted(missing)[:5]}"
        )
    return unflatten(converted)


def load_flat_archive(path: str) -> dict[str, np.ndarray]:
    """Read a flat tensor archive: .npz, or a torch-saved plain dict."""
    if path.endswith((".pt", ".pth")):
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(obj, dict) and "model" in obj and isinstance(
            obj["model"], dict
        ):
            obj = obj["model"]  # detectron2 Checkpointer layout
        return {k: np.asarray(v) for k, v in obj.items()}
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
