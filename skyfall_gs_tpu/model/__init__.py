from skyfall_gs_tpu.model.gaussians import (
    GaussianParams,
    GaussianAux,
    GaussianModelState,
    create_from_points,
    scaling_with_3d_filter,
    opacity_with_3d_filter,
    compute_3d_filter,
    reset_opacity,
)
from skyfall_gs_tpu.model.appearance import AppearanceConfig, init_appearance, apply_appearance
from skyfall_gs_tpu.model.render import render

__all__ = [
    "GaussianParams",
    "GaussianAux",
    "GaussianModelState",
    "create_from_points",
    "scaling_with_3d_filter",
    "opacity_with_3d_filter",
    "compute_3d_filter",
    "reset_opacity",
    "AppearanceConfig",
    "init_appearance",
    "apply_appearance",
    "render",
]
