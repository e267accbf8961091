#!/usr/bin/env python
"""Export ultralytics YOLO weights to the flat .npz that
`gsattack.models.convert_yolo.load_converted_npz` consumes.

Run this on any machine that has the `ultralytics` package (this repo's
image does not — its checkpoints pickle model objects and cannot be read
without it):

    python scripts/export_yolo_weights.py yolov8n.pt yolov8n_sd.npz

Then point the detector at the archive:

    YoloDetector(variant="yolov8", weights="yolov8n_sd.npz")
"""

import sys

import numpy as np


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    src, dst = sys.argv[1], sys.argv[2]
    from ultralytics import YOLO  # noqa: import guarded by docstring

    model = YOLO(src).model
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    np.savez(dst, **sd)
    print(f"wrote {len(sd)} tensors -> {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
