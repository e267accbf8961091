"""gsattack — TPU-native 3D Gaussian Splatting attack framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
poloclub/3d-gaussian-splat-attack (CVPR-W 2025 "3D Gaussian Splat
Vulnerabilities"): a differentiable 3DGS rasterizer, the DAGGER PGD attack
through frozen object-detector losses, CLOAK poisoned-view training, scene
I/O and editing, and ASR/COCO evaluation tooling.

Layout:
  core/     GaussianScene pytree, Camera, SH / quaternion / covariance math
  ops/      rasterization ops: projection, tile binning, blending (XLA + Pallas)
  render/   high-level render() API + slow per-pixel oracle renderer
  io/       PLY (byte-compatible), COLMAP, Blender loaders; checkpointing
  models/   frozen object-detector scoring heads (YOLO family, FRCNN, DETR)
  attack/   DAGGER PGD step library + orchestration; CLOAK poisoning
  train/    3DGS training loop (densify / prune / opacity reset)
  parallel/ device mesh, sharding specs, collectives
  evals/    ASR, COCO AP@0.5, render CLI with structured logs
  utils/    config system, image metrics, logging
"""

__version__ = "0.1.0"
