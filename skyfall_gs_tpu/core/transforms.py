"""Rigid/projective transforms and Gaussian covariance construction.

Capability parity: reference ``utils/graphics_utils.py`` (getWorld2View2:38-103,
getProjectionMatrix:106-126 with principal-point shift, fov2focal/focal2fov:
128-132) and ``utils/general_utils.py`` (build_rotation:78-99,
build_scaling_rotation:101-110, strip_symmetric:64-76).

Convention: this framework uses **column-vector** math everywhere on device
(``x_cam = W @ [x; 1]``).  The reference keeps row-major transposed matrices
for its CUDA/glm kernels; the IO layer converts when reading reference-format
scene data.  All functions are shape-polymorphic over leading batch dims and
safe under ``vmap``/``jit``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Convert (possibly unnormalized) quaternions (..., 4) wxyz to rotation
    matrices (..., 3, 3)."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def build_scaling_rotation(scaling: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s): the Cholesky-like factor of the 3D covariance.

    Args:
        scaling: (..., 3) positive scales.
        rotation: (..., 4) wxyz quaternions.
    """
    r = quat_to_rotmat(rotation)
    return r * scaling[..., None, :]


def covariance_from_scaling_rotation(
    scaling: jnp.ndarray, rotation: jnp.ndarray, scaling_modifier: float = 1.0
) -> jnp.ndarray:
    """Full 3D covariance Σ = L Lᵀ, (..., 3, 3) symmetric PSD."""
    l = build_scaling_rotation(scaling_modifier * scaling, rotation)
    return l @ jnp.swapaxes(l, -1, -2)


def covariance_to_symm6(cov: jnp.ndarray) -> jnp.ndarray:
    """Pack a symmetric (..., 3, 3) covariance into its 6 upper-tri entries
    (xx, xy, xz, yy, yz, zz) — the compact layout fed to rasterizers."""
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]],
        axis=-1,
    )


def symm6_to_covariance(s: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`covariance_to_symm6`."""
    xx, xy, xz, yy, yz, zz = (s[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate: np.ndarray | None = None, scale: float = 1.0) -> np.ndarray:
    """Build the 4x4 world→camera matrix (column-vector convention).

    Args:
        R: (3, 3) the **camera-to-world rotation** (i.e. the transpose of the
           world-to-camera rotation) — this matches how COLMAP-style loaders
           hand back ``R`` in 3DGS pipelines (stored transposed, reference
           scene/dataset_readers.py:523).
        t: (3,) world-to-camera translation.
        translate/scale: optional recentering applied to the camera center.
    """
    Rt = np.eye(4, dtype=np.float64)
    Rt[:3, :3] = np.asarray(R, np.float64).T
    Rt[:3, 3] = np.asarray(t, np.float64).reshape(3)
    if translate is not None or scale != 1.0:
        tr = np.zeros(3) if translate is None else np.asarray(translate, np.float64)
        c2w = np.linalg.inv(Rt)
        c2w[:3, 3] = (c2w[:3, 3] + tr) * scale
        Rt = np.linalg.inv(c2w)
    return Rt.astype(np.float32)


def projection_matrix(znear: float, zfar: float, fov_x: float, fov_y: float,
                      cx: float = 0.0, cy: float = 0.0) -> np.ndarray:
    """Perspective projection (column-vector convention) with a normalized
    principal-point shift.

    ``cx``/``cy`` are in NDC units: ``cx = (cx_px - W/2) / W * 2`` (reference
    scene/dataset_readers.py:553-554, utils/graphics_utils.py:121-122).
    Positive z is in front of the camera; depth maps to [0, 1] over
    [znear, zfar] with w = z.
    """
    tan_half_fov_x = math.tan(fov_x / 2.0)
    tan_half_fov_y = math.tan(fov_y / 2.0)
    p = np.zeros((4, 4), dtype=np.float32)
    p[0, 0] = 1.0 / tan_half_fov_x
    p[1, 1] = 1.0 / tan_half_fov_y
    p[0, 2] = cx
    p[1, 2] = cy
    p[2, 2] = zfar / (zfar - znear)
    p[2, 3] = -(zfar * znear) / (zfar - znear)
    p[3, 2] = 1.0
    return p


def fov_to_focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal_to_fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))
