"""Depth colorization (Spectral disparity colormap).

Capability parity: reference train.py:1001-1041 (colorize_depth_torch):
disparity = 1/depth, percentile [2, 98] normalization over the masked
region, matplotlib 'Spectral' colormap.
"""

from __future__ import annotations

import numpy as np


def colorize_depth(depth: np.ndarray, mask: np.ndarray | None = None,
                   normalize: bool = True, cmap: str = "Spectral") -> np.ndarray:
    """(H, W) depth -> (H, W, 3) float RGB in [0, 1]."""
    import matplotlib

    depth = np.asarray(depth, np.float64)
    disp = 1.0 / np.maximum(depth, 1e-8)
    valid = np.isfinite(disp)
    if mask is not None:
        valid &= np.asarray(mask) > 0
    if normalize and valid.any():
        lo, hi = np.percentile(disp[valid], [2, 98])
        disp = (disp - lo) / max(hi - lo, 1e-12)
    disp = np.clip(np.where(valid, disp, 0.0), 0.0, 1.0)
    colored = matplotlib.colormaps[cmap](disp)[..., :3]
    if mask is not None:
        colored = colored * (np.asarray(mask) > 0)[..., None]
    return colored.astype(np.float32)
