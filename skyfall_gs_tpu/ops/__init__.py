from skyfall_gs_tpu.ops.projection import project_gaussians, ProjectedGaussians
from skyfall_gs_tpu.ops.rasterize import rasterize, RenderOutput

__all__ = [
    "project_gaussians",
    "ProjectedGaussians",
    "rasterize",
    "RenderOutput",
]
