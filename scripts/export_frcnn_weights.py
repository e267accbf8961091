#!/usr/bin/env python
"""Export a detectron2 Faster R-CNN checkpoint to the flat .npz that
`gsattack.models.convert_frcnn.load_converted` consumes.

The reference's checkpoint (`pretrained-models/faster_rcnn_R_50_FPN_3x/
model_final.pth`, load contract `detectors/detectron2_detector.py:29-53`)
is a detectron2 Checkpointer archive: `{"model": {flat state_dict}, ...}`.
This image has no detectron2 and no network, so run this wherever the
checkpoint lives — plain torch is enough, detectron2 itself is NOT needed
(the archive is torch-picklable without it):

    python scripts/export_frcnn_weights.py model_final.pth frcnn_r50_sd.npz

Then point the detector at the archive:

    Detectron2Detector(weights="frcnn_r50_sd.npz")
"""

import sys

import numpy as np


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    src, dst = sys.argv[1], sys.argv[2]
    import torch

    ckpt = torch.load(src, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    out = {}
    for k, v in sd.items():
        out[k] = v.detach().cpu().numpy() if torch.is_tensor(v) else np.asarray(v)
    np.savez(dst, **out)
    print(f"wrote {len(out)} tensors -> {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
