from skyfall_gs_tpu.io.ply import read_ply, write_ply
from skyfall_gs_tpu.io.scene import SceneData, load_scene

__all__ = ["read_ply", "write_ply", "SceneData", "load_scene"]
