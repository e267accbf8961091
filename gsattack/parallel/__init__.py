from .mesh import make_mesh, local_mesh_shape, initialize_distributed
from .shardings import (
    camera_batch_spec,
    image_batch_spec,
    replicated,
    scene_spec,
    shard_scene,
    shard_camera_batch,
)

__all__ = [
    "make_mesh",
    "local_mesh_shape",
    "initialize_distributed",
    "scene_spec",
    "camera_batch_spec",
    "image_batch_spec",
    "replicated",
    "shard_scene",
    "shard_camera_batch",
]
