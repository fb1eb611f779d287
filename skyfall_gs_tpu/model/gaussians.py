"""Gaussian scene state: padded struct-of-arrays pytree + Mip-Splatting filters.

Capability parity: reference scene/gaussian_model.py (GaussianModel state and
activations:74-252, compute_3D_filter:254-308, create_from_pcd:314-348,
reset_opacity:483-501, prune_by_radius:752-790).  Adaptive density control
lives in model/densify.py; the optimizer in model/optim.py; PLY I/O in
io/ply.py.

TPU re-design: the reference reallocates CUDA tensors whenever points are
cloned/split/pruned.  Under XLA every shape must be static, so state arrays
have a fixed **capacity** with an ``alive`` mask; densification writes
children into dead slots and capacity growth happens host-side (one
recompile per growth, amortized by doubling).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from skyfall_gs_tpu.core.sh import rgb_to_sh
from skyfall_gs_tpu.model.appearance import (
    AppearanceConfig,
    fourier_position_features,
    init_appearance,
)
from skyfall_gs_tpu.ops.knn import mean_sq_dist_3nn_host
from skyfall_gs_tpu.utils.general import inverse_sigmoid


@struct.dataclass
class GaussianParams:
    """Optimizable leaves.  Per-Gaussian arrays are padded to capacity C."""

    xyz: jnp.ndarray            # (C, 3)
    features_dc: jnp.ndarray    # (C, 1, 3)
    features_rest: jnp.ndarray  # (C, K-1, 3)
    scaling: jnp.ndarray        # (C, 3) log-scales
    rotation: jnp.ndarray       # (C, 4) wxyz quaternions
    opacity: jnp.ndarray        # (C, 1) logits
    embeddings: Optional[jnp.ndarray] = None            # (C, 6F)
    appearance_embeddings: Optional[jnp.ndarray] = None  # (M, D)
    appearance_mlp: Optional[Any] = None                 # dict pytree

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def features(self) -> jnp.ndarray:
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)


@struct.dataclass
class GaussianAux:
    """Non-optimized per-Gaussian state."""

    alive: jnp.ndarray               # (C,) bool
    filter_3d: jnp.ndarray           # (C,) Mip-Splatting 3D filter stddev
    max_radii2d: jnp.ndarray         # (C,) float32
    grad_accum: jnp.ndarray          # (C,) sum ||d mean2d||
    grad_accum_abs: jnp.ndarray      # (C,) sum ||abs d mean2d||
    grad_accum_abs_max: jnp.ndarray  # (C,) max ||abs d mean2d||
    denom: jnp.ndarray               # (C,) visibility counts


@struct.dataclass
class GaussianModelState:
    params: GaussianParams
    aux: GaussianAux
    active_sh_degree: int = struct.field(pytree_node=False, default=0)
    max_sh_degree: int = struct.field(pytree_node=False, default=3)
    appearance: AppearanceConfig = struct.field(
        pytree_node=False, default=AppearanceConfig()
    )
    spatial_lr_scale: float = struct.field(pytree_node=False, default=1.0)

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.aux.alive)

    def one_up_sh_degree(self) -> "GaussianModelState":
        if self.active_sh_degree < self.max_sh_degree:
            return self.replace(active_sh_degree=self.active_sh_degree + 1)
        return self


# ----------------------------------------------------------------------------
# Activations (Mip-Splatting 3D filter variants)
# ----------------------------------------------------------------------------

def get_scaling(params: GaussianParams) -> jnp.ndarray:
    return jnp.exp(params.scaling)


def get_opacity(params: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(params.opacity[:, 0])


def scaling_with_3d_filter(params: GaussianParams, filter_3d: jnp.ndarray) -> jnp.ndarray:
    """sqrt(s^2 + f^2): band-limit each Gaussian by its 3D filter
    (reference scene/gaussian_model.py:207-213)."""
    s = get_scaling(params)
    return jnp.sqrt(jnp.square(s) + jnp.square(filter_3d)[:, None])


def _safe_det_ratio_sqrt(det1: jnp.ndarray, det2: jnp.ndarray) -> jnp.ndarray:
    """sqrt(det1 / det2) with a bounded gradient.

    det1 = prod(s^2) underflows to exactly 0 for tiny transient scales, and
    sqrt'(0) = inf turns a live cotangent into NaN parameters through Adam
    (same failure as the projection compensation — see ops/projection.py).
    Floor the argument at 1e-12 (gradient <= 5e5) and zero the forward
    below it: a coefficient < 1e-6 is far below visibility either way.
    """
    ratio = det1 / jnp.maximum(det2, 1e-30)
    return jnp.where(ratio > 1e-12, jnp.sqrt(jnp.maximum(ratio, 1e-12)), 0.0)


def opacity_with_3d_filter(params: GaussianParams, filter_3d: jnp.ndarray) -> jnp.ndarray:
    """Opacity compensation sqrt(det(s^2) / det(s^2 + f^2))
    (reference scene/gaussian_model.py:237-249)."""
    o = get_opacity(params)
    s2 = jnp.square(get_scaling(params))
    det1 = jnp.prod(s2, axis=1)
    det2 = jnp.prod(s2 + jnp.square(filter_3d)[:, None], axis=1)
    return o * _safe_det_ratio_sqrt(det1, det2)


def _filter_coef(params: GaussianParams, filter_3d: jnp.ndarray) -> jnp.ndarray:
    s2 = jnp.square(get_scaling(params))
    det1 = jnp.prod(s2, axis=1)
    det2 = jnp.prod(s2 + jnp.square(filter_3d)[:, None], axis=1)
    return _safe_det_ratio_sqrt(det1, det2)


# ----------------------------------------------------------------------------
# 3D filter
# ----------------------------------------------------------------------------

def compute_3d_filter(
    xyz: jnp.ndarray,
    alive: jnp.ndarray,
    world_views: jnp.ndarray,   # (M, 4, 4) world->camera
    focal_x: jnp.ndarray,       # (M,)
    focal_y: jnp.ndarray,       # (M,)
    cx_pix: jnp.ndarray,        # (M,) principal point in pixels
    cy_pix: jnp.ndarray,        # (M,)
    widths: jnp.ndarray,        # (M,) float
    heights: jnp.ndarray,       # (M,) float
) -> jnp.ndarray:
    """Per-Gaussian 3D low-pass filter size (Mip-Splatting).

    filter = (min over covering cameras of camera-space z) / max_focal *
    sqrt(0.2); points covered by no camera inherit the max distance
    (reference scene/gaussian_model.py:254-308, +-15% screen margin).
    Camera intrinsics are dynamic values, so cameras of different
    resolutions batch together without recompilation.
    """

    def per_cam(wv, fx, fy, cx, cy, w, h):
        t = xyz @ wv[:3, :3].T + wv[:3, 3]
        z = t[:, 2]
        valid_depth = z > 0.2
        zc = jnp.maximum(z, 0.001)
        x = t[:, 0] / zc * fx + cx
        y = t[:, 1] / zc * fy + cy
        in_screen = (
            (x >= -0.15 * w) & (x <= 1.15 * w) & (y >= -0.15 * h) & (y <= 1.15 * h)
        )
        valid = valid_depth & in_screen
        return jnp.where(valid, zc, jnp.inf), valid

    dists, valids = jax.vmap(per_cam)(
        world_views, focal_x, focal_y, cx_pix, cy_pix, widths, heights
    )
    distance = jnp.min(dists, axis=0)                     # (N,)
    covered = jnp.any(valids, axis=0)
    max_dist = jnp.max(jnp.where(covered & alive, distance, -jnp.inf))
    max_dist = jnp.where(jnp.isfinite(max_dist), max_dist, 1.0)
    distance = jnp.where(covered, distance, max_dist)
    focal = jnp.max(focal_x)
    return distance / focal * (0.2 ** 0.5)


def camera_filter_arrays(cameras) -> tuple:
    """Stack per-camera scalars needed by compute_3d_filter from a list of
    (Camera, ...) views."""
    wv = jnp.stack([c.world_view for c in cameras])
    fx = jnp.stack([c.focal_x for c in cameras])
    fy = jnp.stack([c.focal_y for c in cameras])
    w = jnp.asarray([float(c.width) for c in cameras], jnp.float32)
    h = jnp.asarray([float(c.height) for c in cameras], jnp.float32)
    cx = jnp.stack([c.cx for c in cameras]) / 2.0 * w + w / 2.0
    cy = jnp.stack([c.cy for c in cameras]) / 2.0 * h + h / 2.0
    return wv, fx, fy, cx, cy, w, h


# ----------------------------------------------------------------------------
# Construction
# ----------------------------------------------------------------------------

def _round_capacity(n: int, multiple: int = 1024) -> int:
    return max(multiple, -(-n // multiple) * multiple)


def create_from_points(
    points: np.ndarray,
    colors: np.ndarray,
    max_sh_degree: int = 3,
    appearance: AppearanceConfig = AppearanceConfig(),
    num_cameras: int = 0,
    spatial_lr_scale: float = 1.0,
    init_opacity: float = 0.5,
    capacity: Optional[int] = None,
    seed: int = 0,
) -> GaussianModelState:
    """Initialize the model from a colored point cloud.

    Parity with reference scene/gaussian_model.py:314-348: log-scale from
    3-NN mean squared distance, identity rotations, opacity 0.5 (satellite
    default), DC features from RGB.
    """
    points = np.asarray(points, np.float32)
    colors = np.asarray(colors, np.float32)
    n = points.shape[0]
    cap = capacity if capacity is not None else _round_capacity(int(n * 1.5))
    k = (max_sh_degree + 1) ** 2

    dist2 = np.maximum(mean_sq_dist_3nn_host(points), 1e-7)
    log_scales = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1)

    def pad(x, fill=0.0):
        shape = (cap,) + x.shape[1:]
        out = np.full(shape, fill, x.dtype)
        out[:n] = x
        return jnp.asarray(out)

    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    opac = np.full((n, 1), inverse_sigmoid(jnp.float32(init_opacity)).item(), np.float32)
    f_dc = np.asarray(rgb_to_sh(colors)).reshape(n, 1, 3).astype(np.float32)
    f_rest = np.zeros((n, k - 1, 3), np.float32)

    emb = mlp = cam_emb = None
    if appearance.enabled:
        feat = fourier_position_features(points, appearance.n_fourier_freqs)
        rng = np.random.default_rng(seed)
        feat = feat + rng.normal(0, 1e-4, feat.shape).astype(np.float32)
        emb = pad(feat)
        mlp, cam_emb = init_appearance(
            jax.random.PRNGKey(seed), appearance, max(num_cameras, 1)
        )

    params = GaussianParams(
        xyz=pad(points),
        features_dc=pad(f_dc),
        features_rest=pad(f_rest),
        scaling=pad(log_scales.astype(np.float32)),
        # Padding quaternions stay identity so activations remain finite.
        rotation=jnp.asarray(
            np.concatenate([rots, np.tile(np.array([[1, 0, 0, 0]], np.float32),
                                          (cap - n, 1))], axis=0)
        ),
        opacity=pad(opac, fill=-10.0),
        embeddings=emb,
        appearance_embeddings=cam_emb,
        appearance_mlp=mlp,
    )
    alive = np.zeros(cap, bool)
    alive[:n] = True
    aux = GaussianAux(
        alive=jnp.asarray(alive),
        filter_3d=jnp.zeros(cap),
        max_radii2d=jnp.zeros(cap),
        grad_accum=jnp.zeros(cap),
        grad_accum_abs=jnp.zeros(cap),
        grad_accum_abs_max=jnp.zeros(cap),
        denom=jnp.zeros(cap),
    )
    return GaussianModelState(
        params=params,
        aux=aux,
        active_sh_degree=0,
        max_sh_degree=max_sh_degree,
        appearance=appearance,
        spatial_lr_scale=float(spatial_lr_scale),
    )


# ----------------------------------------------------------------------------
# Opacity reset & radius prune
# ----------------------------------------------------------------------------

def reset_opacity(params: GaussianParams, filter_3d: jnp.ndarray) -> jnp.ndarray:
    """New opacity logits: clamp filtered opacity to <= 0.01, then undo the
    3D-filter compensation (reference scene/gaussian_model.py:483-501)."""
    with_filter = opacity_with_3d_filter(params, filter_3d)
    new = jnp.minimum(with_filter, 0.01)
    coef = _filter_coef(params, filter_3d)
    new = new / jnp.maximum(coef, 1e-12)
    new = jnp.clip(new, 1e-7, 1.0 - 1e-7)
    return inverse_sigmoid(new)[:, None]


def prune_by_radius(params: GaussianParams, radius: float) -> jnp.ndarray:
    """Opacity logits with points outside ``radius`` (from the origin) made
    invisible (reference scene/gaussian_model.py:752-790)."""
    dist = jnp.linalg.norm(params.xyz, axis=1)
    low = inverse_sigmoid(jnp.float32(1e-8))
    return jnp.where((dist > radius)[:, None], low, params.opacity)
