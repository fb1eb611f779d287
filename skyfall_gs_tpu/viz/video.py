"""Trajectory rendering: the fly-through / FPS benchmark path.

Capability parity: reference render_video.py (render_set:172-183,
render_sets:186-272 — checkpoint or PLY load, per-frame render of a JSON
trajectory, RGB or colorized-depth output, MP4 writing) and
render_video_from_ply.py (standalone PLY render with 3D-filter recompute
from the trajectory cameras, :289-303).

MP4s are written with OpenCV (mediapy is not available in this image);
frames can also be dumped as PNGs.
"""

from __future__ import annotations

import os
import time
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from skyfall_gs_tpu.core.camera import Camera
from skyfall_gs_tpu.model.gaussians import (
    GaussianModelState,
    camera_filter_arrays,
    compute_3d_filter,
)
from skyfall_gs_tpu.model.render import render
from skyfall_gs_tpu.viz.colormap import colorize_depth


def write_video(path: str, frames: List[np.ndarray], fps: int = 24) -> None:
    """Write (H, W, 3) float [0,1] frames to an MP4 (fallback: PNG dir)."""
    import cv2

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not writer.isOpened():
        base = os.path.splitext(path)[0]
        os.makedirs(base, exist_ok=True)
        for i, f in enumerate(frames):
            cv2.imwrite(os.path.join(base, f"{i:05d}.png"),
                        (np.clip(f[..., ::-1], 0, 1) * 255).astype(np.uint8))
        return
    for f in frames:
        writer.write((np.clip(f[..., ::-1], 0, 1) * 255).astype(np.uint8))
    writer.release()


def recompute_filter_for_trajectory(state: GaussianModelState,
                                    cameras: List[Camera]) -> GaussianModelState:
    """Refresh the 3D filter from the trajectory cameras (needed when
    rendering a standalone PLY with no training cameras around,
    reference render_video_from_ply.py:289-292)."""
    f = compute_3d_filter(state.params.xyz, state.aux.alive,
                          *camera_filter_arrays(cameras))
    return state.replace(aux=state.aux.replace(filter_3d=f))


def render_trajectory(
    state: GaussianModelState,
    cameras: List[Camera],
    bg: Optional[jnp.ndarray] = None,
    kernel_size: float = 0.1,
    mode: str = "rgb",                    # "rgb" | "depth"
    backend: str = "tiled",
    with_3d_filter: bool = True,
    report_fps: bool = True,
    entry_budget: Optional[int] = None,
) -> tuple[List[np.ndarray], float]:
    """Render every camera; returns (frames, frames_per_second measured).

    entry_budget: optional inference LOD cap on duplicated (splat, tile)
    entries per frame (see ops/rasterize.py); the binning capacity then
    equals the budget, so dense scenes render at a bounded, predictable
    cost instead of at the measured worst-view capacity.
    """
    if bg is None:
        bg = jnp.zeros(3)

    # Right-size the binning capacity for the trajectory: the shape-only
    # default silently drops entries at high resolutions (80% at 1080p on
    # a 125k-splat scene) — frames would render with missing splats.
    # Under an entry budget the budget IS the capacity (rasterize() wires
    # it), so the measuring pass is skipped.
    cap = None
    if entry_budget is None:
        from skyfall_gs_tpu.model.render import measure_bin_capacity

        cap = measure_bin_capacity(state, cameras, kernel_size=kernel_size,
                                   with_3d_filter=with_3d_filter)

    @jax.jit
    def rfn(model, camera):
        out = render(model, camera, bg, kernel_size=kernel_size,
                     testing=True, backend=backend,
                     with_3d_filter=with_3d_filter,
                     bin_capacity=cap,
                     inference=(backend == "tiled"),
                     entry_budget=entry_budget)
        return jnp.clip(out.color, 0.0, 1.0), out.depth, out.alpha

    # warm-up/compile on the first camera
    c0, d0, a0 = rfn(state, cameras[0])
    jax.block_until_ready(c0)

    frames: List[np.ndarray] = []
    t0 = time.perf_counter()
    outs = []
    for cam in cameras:
        outs.append(rfn(state, cam))
    jax.block_until_ready(outs[-1][0])
    dt = time.perf_counter() - t0
    fps = len(cameras) / max(dt, 1e-9)

    for color, depth, alpha in outs:
        if mode == "depth":
            frames.append(colorize_depth(np.asarray(depth),
                                         mask=np.asarray(alpha) > 0.01))
        else:
            frames.append(np.asarray(color))
    if report_fps:
        print(f"rendered {len(cameras)} frames @ {fps:.1f} FPS "
              f"({cameras[0].width}x{cameras[0].height})", flush=True)
    return frames, fps
