from skyfall_gs_tpu.core.sh import eval_sh, rgb_to_sh, sh_to_rgb, SH_C0
from skyfall_gs_tpu.core.transforms import (
    quat_to_rotmat,
    build_scaling_rotation,
    covariance_from_scaling_rotation,
    world_to_view,
    projection_matrix,
    fov_to_focal,
    focal_to_fov,
)
from skyfall_gs_tpu.core.camera import Camera, make_camera, look_at_c2w, orbit_cameras

__all__ = [
    "eval_sh",
    "rgb_to_sh",
    "sh_to_rgb",
    "SH_C0",
    "quat_to_rotmat",
    "build_scaling_rotation",
    "covariance_from_scaling_rotation",
    "world_to_view",
    "projection_matrix",
    "fov_to_focal",
    "focal_to_fov",
    "Camera",
    "make_camera",
    "look_at_c2w",
    "orbit_cameras",
]
