"""Checkpoint / resume — the reference's three persistence mechanisms
(SURVEY.md §5) rebuilt TPU-native:

  1. PLY persistence stays in io/ply.py (byte-compatible interop format).
  2. Full training-state capture/restore — the reference's pickle tuples of
     parameters + Adam state (`scene/gaussian_model.py:61-95`) — become
     orbax checkpoints of the TrainState pytree (sharded-array aware).
  3. The `point_cloud/iteration_N/` directory convention +
     `searchForMaxIteration` (`scene/__init__.py:33-38,96-98`).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def save_checkpoint(path: str, state, step: Optional[int] = None) -> str:
    """Save a pytree (e.g. TrainState) with orbax. Returns the final path."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, f"step_{step}")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, target):
    """Restore into the structure of `target` (an abstract or concrete
    pytree of the same shape)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=target)


def latest_step_dir(root: str) -> Optional[str]:
    if not os.path.isdir(root):
        return None
    steps = [
        (int(d.split("_")[-1]), d)
        for d in os.listdir(root)
        if d.startswith("step_") and d.split("_")[-1].isdigit()
    ]
    if not steps:
        return None
    return os.path.join(root, max(steps)[1])


def save_scene_iteration(scene, model_path: str, iteration: int) -> str:
    """Write `point_cloud/iteration_N/point_cloud.ply` (the reference's
    scene-save convention, `scene/__init__.py:96-98`)."""
    from .ply import save_scene_ply

    out = os.path.join(
        model_path, "point_cloud", f"iteration_{iteration}", "point_cloud.ply"
    )
    save_scene_ply(scene, out)
    return out


def load_scene_iteration(model_path: str, iteration: int = -1, max_sh_degree: int = 3):
    """Load a scene by iteration; -1 finds the max
    (`searchForMaxIteration`)."""
    from .dataset import search_max_iteration
    from .ply import load_scene_ply

    pc_dir = os.path.join(model_path, "point_cloud")
    if iteration == -1:
        iteration = search_max_iteration(pc_dir)
    return (
        load_scene_ply(
            os.path.join(pc_dir, f"iteration_{iteration}", "point_cloud.ply"),
            max_sh_degree=max_sh_degree,
        ),
        iteration,
    )


def capture(trainer_state) -> dict:
    """The reference `capture()` tuple as a dict pytree
    (`scene/gaussian_model.py:61-75`): parameters + densification stats +
    optimizer state + step."""
    return {
        "scene": trainer_state.scene,
        "opt_state": trainer_state.opt_state,
        "stats": trainer_state.stats,
        "step": trainer_state.step,
    }


def restore(target_state, captured: dict):
    """Inverse of `capture` (`scene/gaussian_model.py:77-95`)."""
    return target_state.replace(
        scene=captured["scene"],
        opt_state=captured["opt_state"],
        stats=captured["stats"],
        step=captured["step"],
    )
