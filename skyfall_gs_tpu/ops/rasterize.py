"""Differentiable 3DGS rasterization: public API and backend dispatch.

Replaces the reference's CUDA ``diff_gauss.GaussianRasterizer`` 6-tuple call
(gaussian_renderer/__init__.py:132-140).  The per-pixel compositing rules are
shared by both backends:

  * ``power = -0.5 (a dx^2 + c dy^2) - b dx dy``; skip if ``power > 0``
  * ``alpha = min(0.99, opacity * exp(power))``; skip if ``alpha < 1/255``
  * front-to-back in view-depth order; stop when transmittance would fall
    below ``1e-4`` (the stopping splat is not composited)
  * ``color_out = sum(c_i a_i T_i) + T_final * bg``

Backends:
  * ``"reference"`` — pure-JAX O(H*W*N) oracle (tests / tiny scenes).
  * ``"tiled"`` — XLA tile binning + Pallas per-tile compositing kernel
    (the production TPU path).

The screen-space gradient needed by adaptive density control is exposed the
JAX way: ``rasterize`` accepts ``mean2d_dummy`` (N, 2) zeros that are added
to the projected means, so ``jax.grad`` w.r.t. it yields d(loss)/d(mean2d)
(parity with the reference's ``screenspace_points`` trick,
gaussian_renderer/__init__.py:27-31).  The tiled backend additionally
returns per-Gaussian *absolute* screen gradients (AbsGS-style, reference
scene/gaussian_model.py:744-749) through ``mean2d_abs_dummy``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from skyfall_gs_tpu.core.camera import Camera
from skyfall_gs_tpu.ops.projection import (
    project_gaussians,
    smallest_axis_normals,
)
from skyfall_gs_tpu.ops.rasterize_ref import composite_reference


@struct.dataclass
class RenderOutput:
    """Everything the training loop and tools consume from one render."""

    color: jnp.ndarray    # (H, W, 3), background composited
    depth: jnp.ndarray    # (H, W) alpha-normalized expected view-space depth
    normal: jnp.ndarray   # (H, W, 3) premultiplied blended normals
    alpha: jnp.ndarray    # (H, W) 1 - final transmittance
    radii: jnp.ndarray    # (N,) int32 screen radii, 0 = culled/invisible
    # () int32: duplicated entries dropped by an undersized bin capacity
    # (tiled backend only; 0 = everything composited). Nonzero means the
    # highest-index splats silently vanished from the render AND their
    # gradients — surface it, don't ignore it.
    overflow: Optional[jnp.ndarray] = None

    @property
    def visibility(self) -> jnp.ndarray:
        return self.radii > 0

    @property
    def color_chw(self) -> jnp.ndarray:
        return jnp.transpose(self.color, (2, 0, 1))


def _apply_entry_budget(proj, camera: Camera, budget: int):
    """Greedy entry-budgeted LOD: keep splats by contribution-per-entry.

    Render time scales with duplicated (splat, tile) entries (the binning
    gathers and both Pallas kernels are per-entry), so the honest LOD axis
    is an ENTRY budget, not a splat count.  Value = opacity x cutoff-AABB
    pixel area (an integrated-alpha-mass proxy); cost = touched tiles.
    Greedy knapsack on value/cost, two passes: each pass first drops splats
    whose individual cost exceeds the remaining budget (so one oversized
    splat cannot block the cheap tail behind it — a plain prefix-cumsum
    keep rule has exactly that failure), then keeps the eligible prefix.
    One sort + two cumsums cost ~1 ms at 150k splats and buy back multiple
    ms per dropped megaentry at 1080p.
    """
    from skyfall_gs_tpu.ops.binning import per_splat_entries

    counts = per_splat_entries(proj.mean2d, proj.radius,
                               int(camera.height), int(camera.width),
                               radius_xy=proj.radius_xy)
    area = (proj.radius_xy[:, 0] * proj.radius_xy[:, 1]).astype(jnp.float32)
    value = proj.opacity * area
    ratio = jnp.where(counts > 0, value / jnp.maximum(counts, 1), -1.0)
    order = jnp.argsort(-ratio)
    c_sorted = counts[order]
    keep_sorted = jnp.zeros(c_sorted.shape, bool)
    rem = jnp.asarray(budget, c_sorted.dtype)
    for _ in range(2):
        elig = (~keep_sorted) & (c_sorted > 0) & (c_sorted <= rem)
        cum = jnp.cumsum(jnp.where(elig, c_sorted, 0))
        keep_sorted = keep_sorted | (elig & (cum <= rem))
        rem = budget - jnp.sum(jnp.where(keep_sorted, c_sorted, 0))
    keep = jnp.zeros(proj.radius.shape[0], bool).at[order].set(keep_sorted)
    return proj.replace(
        radius=jnp.where(keep, proj.radius, 0),
        radius_xy=jnp.where(keep[:, None], proj.radius_xy, 0),
    )


def rasterize(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    camera: Camera,
    bg: jnp.ndarray,
    kernel_size: float = 0.1,
    mask: Optional[jnp.ndarray] = None,
    subpixel_offset: Optional[jnp.ndarray] = None,
    scaling_modifier: float = 1.0,
    mean2d_dummy: Optional[jnp.ndarray] = None,
    mean2d_abs_dummy: Optional[jnp.ndarray] = None,
    with_normals: bool = True,
    backend: str = "tiled",
    bin_capacity: Optional[int] = None,
    inference: bool = False,
    entry_budget: Optional[int] = None,
) -> RenderOutput:
    """Render one view.

    Args:
        means3d/scales/quats/opacities: activated Gaussian state — scales and
            opacities should already include the Mip-Splatting 3D filter.
        colors: (N, 3) precomputed RGB (SH/appearance handled by the caller).
        bg: (3,) background color.
        mask: (N,) alive mask for padded state.
        mean2d_dummy: (N, 2) zeros; grad w.r.t. it = screen-space gradient.
        mean2d_abs_dummy: (N, 2) zeros; tiled backend routes the AbsGS
            absolute screen-space gradient into its cotangent.
        backend: "tiled" (Pallas, production) or "reference" (oracle).
        entry_budget: inference-only LOD cap on duplicated (splat, tile)
            entries — the quantity render time actually scales with.  Splats
            are kept greedily by contribution-per-entry (opacity x cutoff
            AABB area / touched tiles) until the budget is spent; the rest
            are culled.  A lossy, MEASURED speed/quality trade (see
            scripts/bench_entry_budget.py); with ``bin_capacity=None`` the
            capacity becomes the budget itself, so nothing silently
            overflows.
    """
    proj = project_gaussians(
        means3d, scales, quats, opacities, camera,
        kernel_size=kernel_size, mask=mask, scaling_modifier=scaling_modifier,
    )

    if entry_budget is not None:
        if not inference:
            raise ValueError("entry_budget is an inference-only LOD mode; "
                             "training must composite every live splat")
        proj = _apply_entry_budget(proj, camera, entry_budget)
        if bin_capacity is None:
            bin_capacity = -(-entry_budget // 256) * 256
    mean2d = proj.mean2d
    if mean2d_dummy is not None:
        mean2d = mean2d + mean2d_dummy

    if with_normals:
        normals = smallest_axis_normals(scales, quats, means3d, camera.cam_center)
    else:
        normals = jnp.zeros_like(means3d)

    # Blend channels: [r, g, b, depth, nx, ny, nz]
    channels = jnp.concatenate([colors, proj.depth[:, None], normals], axis=-1)

    overflow = None
    if backend == "reference":
        out, t_final = composite_reference(
            mean2d, proj.conic, proj.depth, proj.radius, proj.opacity,
            channels, camera.height, camera.width, subpixel_offset,
        )
    elif backend == "tiled":
        from skyfall_gs_tpu.ops.rasterize_tiled import composite_tiled

        out, t_final, overflow = composite_tiled(
            mean2d, proj.conic, proj.depth, proj.radius, proj.opacity,
            channels, camera.height, camera.width,
            subpixel_offset=subpixel_offset,
            mean2d_abs_dummy=mean2d_abs_dummy,
            cap=bin_capacity,
            inference=inference,
            radius_xy=proj.radius_xy,
        )
    else:
        raise ValueError(f"unknown rasterize backend: {backend}")

    color = out[..., :3] + t_final[..., None] * bg[None, None, :]
    alpha = 1.0 - t_final
    # Alpha-normalized expected depth: Sum(w_i d_i) / Sum(w_i).  This is the
    # metric depth the reference consumes downstream (its geometric eval
    # backprojects render_depth directly, evaluate_gs_geometry.py:132-215)
    # and what the Pearson depth loss is calibrated against; the raw
    # premultiplied sum couples depth supervision to opacity and
    # destabilizes training.
    depth = out[..., 3] / jnp.maximum(alpha, 1e-8)
    return RenderOutput(
        color=color,
        depth=depth,
        normal=out[..., 4:7],
        alpha=alpha,
        radii=proj.radius,
        overflow=overflow,
    )
