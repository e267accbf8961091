"""DETR demo checkpoint -> flax conversion.

The reference pulls `detr_demo-da2a99e9.pth` from torch hub
(`detectors/detr_detector.py:67-70`) — a flat state_dict of the colab demo
model. gsattack's flax module tree (models/detr.py) mirrors its names:

  backbone.conv1.weight            -> params/backbone/conv1/kernel
  backbone.layer1.0.bn1.weight     -> params/backbone/layer1_0/bn1/scale
  backbone.layer1.0.downsample.1.running_mean
                                   -> batch_stats/.../downsample_1/mean
  conv.weight / conv.bias          -> params/conv/{kernel,bias}
  transformer.encoder.layers.0.self_attn.in_proj_weight
                                   -> kept packed (3d, d), torch layout
  transformer.decoder.norm.weight  -> params/transformer/decoder/norm/scale
  linear_class.weight              -> params/linear_class/kernel (transposed)
  query_pos / row_embed / col_embed -> top-level params, verbatim

Norm-vs-conv disambiguation is by tensor rank (torchvision BN modules are
named bn1/bn2/bn3/downsample.1 — not a fixed suffix): a 1-D `weight` is a
norm scale, 4-D a conv kernel, 2-D a linear kernel.

Proven by the torch-executed parity test in tests/test_detr_parity.py
(torch's own nn.Transformer is the mirror).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from .convert_common import (
    load_flat_archive,
    merge_numeric_tokens,
    pour_state_dict,
)

_RAW_LEAVES = {
    "in_proj_weight", "in_proj_bias", "query_pos", "row_embed", "col_embed"
}


def _mapper(key: str, arr: np.ndarray):
    toks = key.split(".")
    leaf = toks[-1]
    mods = merge_numeric_tokens(toks[:-1])
    if leaf == "num_batches_tracked":
        return None
    if leaf in _RAW_LEAVES:
        return "params", (*mods, leaf)
    if leaf == "running_mean":
        return "batch_stats", (*mods, "mean")
    if leaf == "running_var":
        return "batch_stats", (*mods, "var")
    if leaf == "weight":
        if arr.ndim == 1:  # norm scale (BN or LayerNorm)
            return "params", (*mods, "scale")
        return "params", (*mods, "kernel")
    if leaf == "bias":
        return "params", (*mods, "bias")
    raise ValueError(f"unrecognized torch key {key!r}")


def convert_state_dict(sd: Mapping[str, np.ndarray], variables: dict) -> dict:
    """Pour the DETR demo state_dict into an initialized flax variables
    tree; strict (see convert_common)."""
    return pour_state_dict(sd, variables, _mapper)


def load_converted(path: str, variables: dict) -> dict:
    return convert_state_dict(load_flat_archive(path), variables)
