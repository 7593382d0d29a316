from .gltf import (
    DracoTranscoder,
    GltfError,
    load_gltf,
    load_gltf_to_scene,
    save_scene_glb,
)
from .obj import load_obj, save_obj
from .ply import PlyError, load_ply, save_ply

__all__ = [
    "DracoTranscoder", "GltfError", "load_gltf", "load_gltf_to_scene",
    "save_scene_glb", "load_obj", "save_obj",
    "PlyError", "load_ply", "save_ply",
]
