from skyfall_gs_tpu.priors.interface import (
    DepthPredictor,
    Refiner,
    IdentityRefiner,
    RenderDepthPredictor,
    get_refiner,
    get_depth_predictor,
    REFINER_REGISTRY,
    DEPTH_REGISTRY,
)

__all__ = [
    "DepthPredictor",
    "Refiner",
    "IdentityRefiner",
    "RenderDepthPredictor",
    "get_refiner",
    "get_depth_predictor",
    "REFINER_REGISTRY",
    "DEPTH_REGISTRY",
]
