"""detectron2 Faster R-CNN checkpoint -> flax conversion.

The reference loads `pretrained-models/faster_rcnn_R_50_FPN_3x/model_final.pth`
(`detectors/detectron2_detector.py:29-53`). That file is a detectron2
Checkpointer archive: a dict with a "model" entry holding the flat module
state_dict. gsattack's flax module tree (models/frcnn.py) mirrors those
module names, so conversion is the shared mechanical rename
(convert_common.py):

  backbone.bottom_up.res2.0.conv1.weight -> params/backbone/bottom_up/
      res2_0/conv1/kernel (OIHW->HWIO)
  ...conv1.norm.{weight,bias} -> .../conv1/norm/{scale,bias}
  ...conv1.norm.running_{mean,var} -> batch_stats/.../norm/{mean,var}
  roi_heads.box_head.fc1.weight -> params/roi_heads/box_head/fc1/kernel
      (transposed; the flax box head flattens channel-first so the fc1
      input ordering matches torch)

Skipped keys: pixel_mean/pixel_std buffers and anchor generator cell
anchors (constants rebuilt natively).

Proven by the torch-executed parity test in tests/test_frcnn_parity.py.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from .convert_common import (
    default_key_mapper,
    load_flat_archive,
    pour_state_dict,
)

_SKIP_PREFIXES = ("pixel_mean", "pixel_std", "anchor_generator")


def _mapper(key: str):
    if key.startswith(_SKIP_PREFIXES):
        return None
    return default_key_mapper(key, norm_names=("norm",))


def convert_state_dict(sd: Mapping[str, np.ndarray], variables: dict) -> dict:
    """Pour a detectron2 GeneralizedRCNN state_dict into an initialized
    flax variables tree; strict (see convert_common)."""
    return pour_state_dict(sd, variables, _mapper)


def load_converted(path: str, variables: dict) -> dict:
    """Load a detectron2 checkpoint (.pth Checkpointer archive or flat
    .npz) and pour into the variables tree."""
    return convert_state_dict(load_flat_archive(path), variables)
