"""Ultralytics checkpoint -> flax conversion (mechanical, key-by-key).

The reference loads ultralytics ``.pt`` checkpoints directly
(`detectors/yolov3_detector.py:20-25`, `yolov8_detector.py:22-39`); those
pickle model *objects* and need the ultralytics package. The interchange
here is a flat tensor archive of the state_dict (torch .pt of a plain dict,
or .npz):

    # on any machine with ultralytics:
    m = YOLO("yolov8n.pt").model
    torch.save(dict(m.state_dict()), "yolov8n_sd.pt")   # or np.savez(...)

Because gsattack's flax graphs (models/yolo_blocks.py) name their modules
to mirror the torch tree, conversion is a per-key rename + layout
transpose — no traversal-order guessing:

    model.0.conv.weight        -> params/m0/conv/kernel        (OIHW->HWIO)
    model.2.m.0.cv1.bn.weight  -> params/m2/m_0/cv1/bn/scale
    model.2.m.0.cv1.bn.running_mean -> batch_stats/.../bn/mean
    model.22.cv2.0.2.bias      -> params/m22/cv2_0_2/bias

Proven by torch-executed activation parity in tests/test_yolo_parity.py
(per variant: random torch mirror -> state_dict -> convert -> flax forward
matches torch forward to <=1e-4).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from .convert_common import (
    default_key_mapper,
    load_flat_archive,
    pour_state_dict,
)


def _mapper(key: str):
    if ".dfl." in key:
        return None
    k = key
    if k.startswith("model."):
        k = "m" + k[len("model."):]
    elif k[0].isdigit():
        k = "m" + k
    return default_key_mapper(k, norm_names=("bn",))


def convert_state_dict(sd: Mapping[str, np.ndarray], variables: dict) -> dict:
    """Pour an ultralytics state_dict into an initialized flax variables
    tree ({'params', 'batch_stats'}); strict (see convert_common)."""
    return pour_state_dict(sd, variables, _mapper)


def load_converted_npz(path: str, variables: dict) -> dict:
    """Load a flat .npz (or torch-saved plain dict .pt) of ultralytics
    tensors and pour into the variables tree."""
    return convert_state_dict(load_flat_archive(path), variables)
