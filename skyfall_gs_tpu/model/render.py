"""Model-level render front-end: appearance/SH color, filters, rasterize.

Capability parity: reference gaussian_renderer/__init__.py:19-164 (render):
  * opacity/scales with the Mip-Splatting 3D filter;
  * appearance path: camera embedding by uid during training, embedding
    uid min(6, M-1) at test time (reference :95-104), MLP-toned SH -> eval_sh
    -> clamped colors;
  * plain path: SH evaluated at the active degree (convert_SHs_python
    semantics — on TPU colors are always precomputed in XLA; the CUDA
    "SH in the kernel" split is a GPU artifact with no TPU benefit);
  * override_color passthrough;
  * returns color/depth/normal/alpha images, radii, visibility.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from skyfall_gs_tpu.core.camera import Camera
from skyfall_gs_tpu.core.sh import eval_sh
from skyfall_gs_tpu.model.appearance import apply_appearance
from skyfall_gs_tpu.model.gaussians import (
    GaussianModelState,
    get_opacity,
    get_scaling,
    opacity_with_3d_filter,
    scaling_with_3d_filter,
)
from skyfall_gs_tpu.ops.rasterize import RenderOutput, rasterize


def measure_bin_capacity(
    state: GaussianModelState,
    cameras,
    kernel_size: float = 0.1,
    with_3d_filter: bool = True,
) -> int:
    """Production binning capacity for rendering ``cameras``: the worst
    view's measured duplicated-entry count through the shared
    capacity_for_entries formula.

    The library's shape-only default (4 entries/splat) undershoots badly at
    high resolution — a 125k-splat scene at 1080p produces ~2.5M entries vs
    the 500k default, silently dropping 80% of them from the render.  Every
    offline render path (trajectory video, eval, report renders) must
    measure; only throwaway interactive previews may skip it.
    """
    import jax

    from skyfall_gs_tpu.ops.binning import capacity_for_entries, count_entries
    from skyfall_gs_tpu.ops.projection import project_gaussians

    counters = {}

    def counter_for(h, w):
        if (h, w) not in counters:
            def f(params, filter_3d, alive, cam):
                if with_3d_filter:
                    scales = scaling_with_3d_filter(params, filter_3d)
                    opac = opacity_with_3d_filter(params, filter_3d)
                else:
                    scales = get_scaling(params)
                    opac = get_opacity(params)
                proj = project_gaussians(
                    params.xyz, scales, params.rotation, opac, cam,
                    kernel_size=kernel_size, mask=alive)
                return count_entries(proj.mean2d, proj.radius, h, w,
                                     radius_xy=proj.radius_xy)
            counters[(h, w)] = jax.jit(f)
        return counters[(h, w)]

    worst = 0
    for cam in cameras:
        f = counter_for(int(cam.height), int(cam.width))
        worst = max(worst, int(f(state.params, state.aux.filter_3d,
                                 state.aux.alive, cam)))
    return capacity_for_entries(worst)


def compute_colors(
    state: GaussianModelState,
    camera: Camera,
    testing: bool = False,
    appearance_embedding: Optional[jnp.ndarray] = None,
    override_color: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-Gaussian RGB for one view (appearance + SH evaluation)."""
    params = state.params
    if override_color is not None:
        return override_color

    dirs = params.xyz - camera.cam_center[None, :]
    dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)

    if state.appearance.enabled and params.appearance_mlp is not None:
        emb_table = params.appearance_embeddings
        if appearance_embedding is not None:
            emb = appearance_embedding
        elif testing:
            # Test views use a fixed reference embedding (uid min(6, M-1)).
            uid = min(6, emb_table.shape[0] - 1)
            emb = jnp.asarray(emb_table[uid])
        else:
            uid = jnp.clip(camera.uid, 0, emb_table.shape[0] - 1)
            emb = emb_table[uid]
        toned = apply_appearance(
            params.appearance_mlp, params.embeddings, emb, params.features
        )                                        # (N, K, 3)
        sh = jnp.swapaxes(toned, 1, 2)           # (N, 3, K)
        rgb = eval_sh(state.active_sh_degree, sh, dirs) + 0.5
        return jnp.maximum(rgb, 0.0)

    sh = jnp.swapaxes(params.features, 1, 2)     # (N, 3, K)
    rgb = eval_sh(state.active_sh_degree, sh, dirs) + 0.5
    return jnp.maximum(rgb, 0.0)


def render(
    state: GaussianModelState,
    camera: Camera,
    bg: jnp.ndarray,
    kernel_size: float = 0.1,
    scaling_modifier: float = 1.0,
    subpixel_offset: Optional[jnp.ndarray] = None,
    testing: bool = False,
    appearance_embedding: Optional[jnp.ndarray] = None,
    override_color: Optional[jnp.ndarray] = None,
    mean2d_dummy: Optional[jnp.ndarray] = None,
    mean2d_abs_dummy: Optional[jnp.ndarray] = None,
    backend: str = "tiled",
    with_3d_filter: bool = True,
    bin_capacity: Optional[int] = None,
    inference: bool = False,
    with_normals: bool = True,
    entry_budget: Optional[int] = None,
) -> RenderOutput:
    """Render one view from the model state."""
    params = state.params
    if with_3d_filter:
        scales = scaling_with_3d_filter(params, state.aux.filter_3d)
        opac = opacity_with_3d_filter(params, state.aux.filter_3d)
    else:
        scales = get_scaling(params)
        opac = get_opacity(params)
    colors = compute_colors(
        state, camera, testing=testing,
        appearance_embedding=appearance_embedding, override_color=override_color,
    )
    return rasterize(
        params.xyz,
        scales,
        params.rotation,
        opac,
        colors,
        camera,
        bg=bg,
        kernel_size=kernel_size,
        mask=state.aux.alive,
        subpixel_offset=subpixel_offset,
        scaling_modifier=scaling_modifier,
        mean2d_dummy=mean2d_dummy,
        mean2d_abs_dummy=mean2d_abs_dummy,
        backend=backend,
        bin_capacity=bin_capacity,
        inference=inference,
        with_normals=with_normals,
        entry_budget=entry_budget,
    )
