"""EXR depth-map reading without the OpenEXR python package.

Capability parity: reference scene/dataset_readers.py:572-596 (read_exr for
``depths_moge/*.exr``).  Primary path is OpenCV (built with OpenEXR support);
``.npy`` depth files are accepted transparently as a fallback format this
framework also writes.
"""

from __future__ import annotations

import os

import numpy as np

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")


def read_depth(path: str) -> np.ndarray:
    """Read a single-channel float depth map from .exr or .npy."""
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    import cv2

    img = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_ANYCOLOR)
    if img is None:
        raise IOError(f"could not read depth file: {path}")
    if img.ndim == 3:
        img = img[..., 0]
    return np.asarray(img, np.float32)


def write_depth_exr(path: str, depth: np.ndarray) -> None:
    import cv2

    ok = cv2.imwrite(path, np.asarray(depth, np.float32))
    if not ok:
        raise IOError(f"could not write depth file: {path}")
