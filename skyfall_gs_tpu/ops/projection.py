"""EWA projection of 3D Gaussians to screen space (Mip-Splatting variant).

This is the shared, pure-JAX front-end of both rasterizer backends: it turns
per-Gaussian 3D state into screen-space means, 2D conics, depths and radii.
XLA fuses the whole stage into elementwise VPU work; gradients come from
autodiff, so the Pallas compositing kernel only needs a custom VJP for the
per-pixel blend.

Capability parity: the preprocess stage of the reference's CUDA rasterizer
(`diff-gaussian-rasterization-depth`, configured in
gaussian_renderer/__init__.py:40-55): perspective projection through the
full projection matrix (including the principal-point shift columns), EWA
Jacobian with frustum-clamped focal terms, the Mip-Splatting screen-space
dilation ``cov2d += kernel_size * I`` with the ``sqrt(det0/det1)`` opacity
compensation, 3-sigma screen radius, and near-plane culling at z > 0.2.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from skyfall_gs_tpu.core.camera import Camera
from skyfall_gs_tpu.core.transforms import covariance_from_scaling_rotation, quat_to_rotmat

NEAR_CULL_Z = 0.2
FRUSTUM_CLAMP = 1.3  # EWA Jacobian focal clamp, in multiples of tan(fov/2)


@struct.dataclass
class ProjectedGaussians:
    """Screen-space quantities for one camera view (all (N,) or (N, k))."""

    mean2d: jnp.ndarray        # (N, 2) pixel coordinates of the center
    conic: jnp.ndarray         # (N, 3) inverse 2D covariance (a, b, c)
    depth: jnp.ndarray         # (N,) camera-space z
    radius: jnp.ndarray        # (N,) int32 3-sigma screen radius; 0 = culled
    opacity: jnp.ndarray       # (N,) opacity incl. mip 2D compensation
    compensation: jnp.ndarray  # (N,) the sqrt(det0/det1) factor itself
    # Exact axis-aligned half-extents of the alpha>=1/255 cutoff ellipse:
    # rx = sm_exact * sqrt(cov_xx) + 0.5px (and sqrt(cov_yy) for ry), where
    # sm_exact = sqrt(2 ln(255 opacity)) is UNCAPPED (up to ~3.33 sigma), so
    # rx/ry can exceed `radius` (whose sigma multiplier caps at 3.0) for
    # near-opaque splats.  Binning uses these for the touched-tile rect —
    # anisotropic splats duplicate into far fewer tiles than the
    # circumscribed square, with zero output change (any pixel above the
    # alpha threshold lies inside the AABB).
    radius_xy: jnp.ndarray = None  # (N, 2) int32


def perspective_project(means3d: jnp.ndarray, camera: Camera) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project world points to pixel coordinates.

    Returns:
        (pix (N, 2), z_view (N,)).
    """
    n = means3d.shape[0]
    ones = jnp.ones((n, 1), means3d.dtype)
    hom = jnp.concatenate([means3d, ones], axis=-1)
    clip = hom @ camera.full_proj.T                      # (N, 4)
    w = 1.0 / (clip[:, 3] + 1e-7)
    ndc = clip[:, :2] * w[:, None]
    width = jnp.float32(camera.width)
    height = jnp.float32(camera.height)
    pix_x = ((ndc[:, 0] + 1.0) * width - 1.0) * 0.5
    pix_y = ((ndc[:, 1] + 1.0) * height - 1.0) * 0.5
    z_view = hom @ camera.world_view[2].T                # row 2 of W: view z
    return jnp.stack([pix_x, pix_y], axis=-1), z_view


def compute_cov2d(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    camera: Camera,
    kernel_size: float,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """EWA: splat 3D covariances to dilated 2D screen covariances.

    Returns:
        (cov2d (N, 2, 2) after dilation, det_dilated (N,), compensation (N,)).
    """
    wv = camera.world_view
    t = means3d @ wv[:3, :3].T + wv[:3, 3]               # (N, 3) view space
    tz = jnp.maximum(t[:, 2], 1e-6)
    # Clamp the in-plane coordinates to the (expanded) view cone, as EWA
    # does.  The cone is principal-point aware: ndc = x/(z tan) + c covers
    # [-1, 1], so x/z is visible on tan*(-1-c) .. tan*(1-c) — for c = 0 this
    # reduces to the classic symmetric +-1.3 tan clamp.
    m = FRUSTUM_CLAMP
    lo_x = camera.tan_fovx * (-m - camera.cx)
    hi_x = camera.tan_fovx * (m - camera.cx)
    lo_y = camera.tan_fovy * (-m - camera.cy)
    hi_y = camera.tan_fovy * (m - camera.cy)
    tx = jnp.clip(t[:, 0] / tz, lo_x, hi_x) * tz
    ty = jnp.clip(t[:, 1] / tz, lo_y, hi_y) * tz

    fx, fy = camera.focal_x, camera.focal_y
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J is the 2x3 Jacobian of the perspective map; build its rows.
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    r = wv[:3, :3]                                       # world->view rotation
    m = jnp.einsum("ij,njk->nik", r, cov3d)              # R Σ
    v = jnp.einsum("nij,kj->nik", m, r)                  # R Σ Rᵀ  (N, 3, 3)

    # cov2d = J V Jᵀ with J = [[j00, 0, j02], [0, j11, j12]]
    c00 = j00 * j00 * v[:, 0, 0] + 2.0 * j00 * j02 * v[:, 0, 2] + j02 * j02 * v[:, 2, 2]
    c01 = (j00 * j11 * v[:, 0, 1] + j00 * j12 * v[:, 0, 2]
           + j02 * j11 * v[:, 1, 2] + j02 * j12 * v[:, 2, 2])
    c11 = j11 * j11 * v[:, 1, 1] + 2.0 * j11 * j12 * v[:, 1, 2] + j12 * j12 * v[:, 2, 2]

    det0 = c00 * c11 - c01 * c01
    c00d = c00 + kernel_size
    c11d = c11 + kernel_size
    det1 = c00d * c11d - c01 * c01
    # Gradient-safe sqrt: for thin splats det0 suffers catastrophic
    # cancellation and lands anywhere in [-eps, +eps] depending on how XLA
    # fuses the products; sqrt'(x) = 0.5/sqrt(x) is ~1e6 at x = 1e-12 and
    # INF at the x = 0 clamp boundary — on a LIVE splat that inf reaches
    # Adam and NaNs xyz/scaling/rotation/opacity (the 256px quality run
    # died this way, window-phase-dependent).  Floor the sqrt argument at
    # 1e-6 (gradient <= 500) and zero the forward for ratios below it:
    # comp < 1e-3 makes op_eff < 1/255, i.e. such splats are invisible
    # either way, so the forward change is null on composited output.
    ratio = det0 / jnp.maximum(det1, 1e-12)
    compensation = jnp.where(
        ratio > 1e-6, jnp.sqrt(jnp.maximum(ratio, 1e-6)), 0.0)
    cov2d = jnp.stack(
        [jnp.stack([c00d, c01], axis=-1), jnp.stack([c01, c11d], axis=-1)], axis=-2
    )
    return cov2d, det1, compensation


def project_gaussians(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    camera: Camera,
    kernel_size: float = 0.1,
    mask: jnp.ndarray | None = None,
    scaling_modifier: float = 1.0,
    cov3d: jnp.ndarray | None = None,
) -> ProjectedGaussians:
    """Full projection stage: 3D Gaussian state -> screen-space splats.

    Args:
        means3d: (N, 3) world positions.
        scales: (N, 3) positive scales (already activated, incl. 3D filter).
        quats: (N, 4) wxyz rotations (not necessarily normalized).
        opacities: (N,) opacities in [0, 1] (already incl. 3D-filter comp.).
        camera: the view.
        kernel_size: Mip-Splatting 2D dilation (reference default 0.1).
        mask: (N,) optional alive mask — dead/padding entries get radius 0.
        cov3d: optional precomputed (N, 3, 3) covariances (overrides
            scales/quats — parity with pipe.compute_cov3D_python).
    """
    # --- input sanitization (the NaN-gradient guard) -----------------------
    # Culled splats (dead padding slots, behind-camera points, z ~ 0) can
    # produce inf in the projective divisions and covariance determinants.
    # Even though their outputs are masked, a zero cotangent times inf is
    # NaN — the gradients would corrupt live parameters through Adam (the
    # CUDA reference never executes culled threads, so it cannot hit this).
    # Replace culled inputs with a benign splat one unit in front of the
    # camera before any division; culling itself still uses the real depth.
    wv = camera.world_view
    depth_true = means3d @ wv[2, :3] + wv[2, 3]
    keep = depth_true > NEAR_CULL_Z
    if mask is not None:
        keep = keep & mask
    safe_point = camera.cam_center + wv[2, :3]           # z = 1 in view space
    means3d = jnp.where(keep[:, None], means3d, safe_point[None, :])
    # Extreme transient scales overflow f32 determinants; clamp far beyond
    # any surviving splat (world-space prune fires at 0.1 * scene extent).
    scales = jnp.minimum(scales, 1e4)
    if cov3d is None:
        cov3d = covariance_from_scaling_rotation(scales, quats, scaling_modifier)
    mean2d, depth = perspective_project(means3d, camera)
    cov2d, det, compensation = compute_cov2d(means3d, cov3d, camera, kernel_size)
    depth = jnp.where(keep, depth_true, depth)

    det_safe = jnp.maximum(det, 1e-12)
    inv_det = 1.0 / det_safe
    conic = jnp.stack(
        [cov2d[:, 1, 1] * inv_det, -cov2d[:, 0, 1] * inv_det, cov2d[:, 0, 0] * inv_det],
        axis=-1,
    )

    mid = 0.5 * (cov2d[:, 0, 0] + cov2d[:, 1, 1])
    lam1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    # Opacity-adaptive extent (exact): per pixel the compositor skips
    # contributions with alpha = op * exp(power) < 1/255, so beyond
    # sigma * sqrt(2 ln(255 op)) every pixel provably fails the test.  The
    # classic 3-sigma radius is the op ~= 1 limit; low-opacity splats get a
    # tighter rect, which cuts duplicated entries without changing output.
    op_eff = jnp.clip(opacities * compensation, 1e-12, 1.0)
    log_term = jnp.maximum(2.0 * jnp.log(255.0 * op_eff), 1e-6)
    # Stats/visibility radius keeps the classic 3-sigma cap (the reference
    # CUDA convention; feeds max_radii2D and size pruning).
    sigma_mult = jnp.minimum(jnp.sqrt(log_term), 3.0)
    radius = jnp.ceil(sigma_mult * jnp.sqrt(lam1))
    # Exact AABB of the alpha >= 1/255 cutoff ellipse: half-extent along x
    # is sqrt(2 ln(255 op) * cov_xx) (cov_yy along y) — much smaller than
    # the eigenvalue square for anisotropic splats.  UNcapped (up to 3.33
    # sigma at op = 1) so every pixel the compositor's alpha test passes is
    # inside a binned tile — required for exact oracle parity; +0.5 px
    # margin covers ray-jitter sampling offsets.
    sm_exact = jnp.sqrt(log_term)
    rx = jnp.ceil(sm_exact * jnp.sqrt(jnp.maximum(cov2d[:, 0, 0], 0.0)) + 0.5)
    ry = jnp.ceil(sm_exact * jnp.sqrt(jnp.maximum(cov2d[:, 1, 1], 0.0)) + 0.5)

    # Splats whose peak alpha is already below 1/255 never composite.
    visible = keep & (det > 0.0) & (op_eff >= 1.0 / 255.0)
    # Cull splats whose cutoff AABB misses the image entirely.
    width = jnp.float32(camera.width)
    height = jnp.float32(camera.height)
    on_screen = (
        (mean2d[:, 0] + rx >= 0.0)
        & (mean2d[:, 0] - rx < width)
        & (mean2d[:, 1] + ry >= 0.0)
        & (mean2d[:, 1] - ry < height)
    )
    visible = visible & on_screen
    if mask is not None:
        visible = visible & mask
    radius_i = jnp.where(visible, radius, 0.0).astype(jnp.int32)
    radius_xy = jnp.where(
        visible[:, None], jnp.stack([rx, ry], axis=1), 0.0).astype(jnp.int32)

    return ProjectedGaussians(
        mean2d=mean2d,
        conic=conic,
        depth=depth,
        radius=radius_i,
        opacity=opacities * compensation,
        compensation=compensation,
        radius_xy=radius_xy,
    )


def smallest_axis_normals(scales: jnp.ndarray, quats: jnp.ndarray,
                          means3d: jnp.ndarray, cam_center: jnp.ndarray) -> jnp.ndarray:
    """Per-Gaussian normal: the principal axis with the smallest scale,
    sign-flipped to face the camera.  Composited into the ``render_norm``
    output (parity with the diff_gauss fork's normal channel)."""
    r = quat_to_rotmat(quats)                 # (N, 3, 3) columns are axes
    idx = jnp.argmin(scales, axis=-1)         # (N,)
    axes = jnp.take_along_axis(r, idx[:, None, None], axis=2)[..., 0]  # (N, 3)
    to_cam = cam_center[None, :] - means3d
    sign = jnp.sign(jnp.sum(axes * to_cam, axis=-1, keepdims=True))
    sign = jnp.where(sign == 0.0, 1.0, sign)
    return axes * sign
