from .dataset import (
    SceneInfo,
    load_scene_info,
    read_blender_scene,
    read_colmap_scene,
    scene_load_callbacks,
    search_max_iteration,
    sniff_scene_type,
)
from .ply import (
    load_scene_ply,
    read_points_ply,
    save_scene_ply,
    store_points_ply,
)

__all__ = [
    "SceneInfo",
    "load_scene_info",
    "read_blender_scene",
    "read_colmap_scene",
    "scene_load_callbacks",
    "search_max_iteration",
    "sniff_scene_type",
    "load_scene_ply",
    "save_scene_ply",
    "read_points_ply",
    "store_points_ply",
]
