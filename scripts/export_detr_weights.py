#!/usr/bin/env python
"""Export the DETR demo checkpoint to the flat .npz that
`gsattack.models.convert_detr.load_converted` consumes.

The reference pulls `detr_demo-da2a99e9.pth` from torch hub
(`detectors/detr_detector.py:67-70`) — a flat state_dict of the colab demo
model. This image has no network, so run this wherever torch hub works:

    python scripts/export_detr_weights.py detr_demo.npz
    # or from a local file:
    python scripts/export_detr_weights.py detr_demo-da2a99e9.pth detr_demo.npz

Then point the detector at the archive:

    DetrDetector(weights="detr_demo.npz")
"""

import sys

import numpy as np

_HUB_URL = (
    "https://dl.fbaipublicfiles.com/detr/detr_demo-da2a99e9.pth"
)


def main():
    if len(sys.argv) not in (2, 3):
        print(__doc__)
        return 2
    import torch

    if len(sys.argv) == 3:
        sd = torch.load(sys.argv[1], map_location="cpu", weights_only=False)
        dst = sys.argv[2]
    else:
        sd = torch.hub.load_state_dict_from_url(
            _HUB_URL, map_location="cpu", check_hash=True
        )
        dst = sys.argv[1]
    if isinstance(sd, dict) and "model" in sd and not torch.is_tensor(sd["model"]):
        sd = sd["model"]
    out = {
        k: (v.detach().cpu().numpy() if torch.is_tensor(v) else np.asarray(v))
        for k, v in sd.items()
    }
    np.savez(dst, **out)
    print(f"wrote {len(out)} tensors -> {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
