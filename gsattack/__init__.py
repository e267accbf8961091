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


def __getattr__(name):
    """Lazy convenience re-exports (kept lazy so `import gsattack` stays
    cheap and platform-neutral)."""
    lazy = {
        "GaussianScene": ("gsattack.core", "GaussianScene"),
        "Camera": ("gsattack.core", "Camera"),
        "scene_from_points": ("gsattack.core", "scene_from_points"),
        "make_camera": ("gsattack.core", "make_camera"),
        "render": ("gsattack.render", "render"),
        "render_oracle": ("gsattack.render", "render_oracle"),
        "load_detector": ("gsattack.models", "load_detector"),
        "run_dagger": ("gsattack.attack", "run_dagger"),
        "AttackConfig": ("gsattack.attack", "AttackConfig"),
        "Trainer": ("gsattack.train", "Trainer"),
        "TrainConfig": ("gsattack.train", "TrainConfig"),
        "load_scene_ply": ("gsattack.io", "load_scene_ply"),
        "save_scene_ply": ("gsattack.io", "save_scene_ply"),
        "load_scene_info": ("gsattack.io", "load_scene_info"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'gsattack' has no attribute {name!r}")
