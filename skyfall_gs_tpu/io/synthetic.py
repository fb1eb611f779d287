"""In-memory synthetic scenes for smoke tests and the quality benchmark.

The build environment ships no real capture data (the reference's
`data/` holds only a README), so regression anchoring happens on procedural
scenes: ground-truth Gaussians render the "captures", and training must
recover them from a corrupted initialization.  Used by scripts/smoke_train.py
and the quality phase of bench.py; scripts/make_synthetic_satellite.py
writes the on-disk satellite-format variant for reader-path integration.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from skyfall_gs_tpu.core.camera import orbit_cameras
from skyfall_gs_tpu.io.scene import SceneData, View


def make_city_scene(
    tmpdir: str,
    n_views: int = 12,
    size: int = 64,
    n_points: int = 400,
    seed: int = 0,
    n_test: int = 2,
) -> SceneData:
    """Procedural city block: GT splats render views; init is a noisy
    half-density subsample with gray colors (what a degraded SfM cloud
    looks like)."""
    rng = np.random.default_rng(seed)
    ground = np.stack([
        rng.uniform(-1.5, 1.5, n_points // 2),
        rng.uniform(-1.5, 1.5, n_points // 2),
        np.zeros(n_points // 2),
    ], axis=1)
    towers = np.stack([
        rng.choice([-0.7, 0.0, 0.8], n_points // 2)
        + rng.normal(0, 0.05, n_points // 2),
        rng.choice([-0.6, 0.3, 0.9], n_points // 2)
        + rng.normal(0, 0.05, n_points // 2),
        rng.uniform(0, 0.8, n_points // 2),
    ], axis=1)
    pts = np.concatenate([ground, towers]).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (n_points, 3)).astype(np.float32)

    from skyfall_gs_tpu.model.gaussians import create_from_points
    from skyfall_gs_tpu.model.render import render as model_render

    cap = -(-n_points // 1024) * 1024
    gt_state = create_from_points(pts, cols, capacity=cap, init_opacity=0.9)

    cams = orbit_cameras([0, 0, 0.2], 40.0, 4.0, num_cams=n_views,
                         width=size, height=size, fov_deg=60.0, uid_base=0)
    bg = jnp.zeros(3)
    views = []
    rfn = jax.jit(lambda m, c: model_render(m, c, bg, with_3d_filter=False))
    for i, cam in enumerate(cams):
        out = rfn(gt_state, cam)
        img = np.asarray(jnp.clip(out.color, 0, 1))
        dep = np.asarray(out.depth)
        cam = cam.replace(uid=jnp.int32(i))
        views.append(View(camera=cam, image=img,
                          mask=np.ones((size, size), np.float32),
                          depth=dep, image_name=f"v{i}"))

    sub = rng.choice(n_points, n_points // 2, replace=False)
    init_pts = pts[sub] + rng.normal(0, 0.05, (len(sub), 3)).astype(np.float32)
    init_cols = np.full((len(sub), 3), 0.5, np.float32)

    scene = SceneData(
        source_path=tmpdir, scene_type="synthetic",
        points=init_pts, colors=init_cols,
        train_views=views[:-n_test], test_views=views[-n_test:],
        cameras_extent=4.4,
    )
    scene.build_groups()
    return scene


def test_psnr(trainer, scene: SceneData, state) -> float:
    """Mean test-view PSNR under the trainer's eval render."""
    vals = []
    for v in scene.test_views:
        out = trainer._eval_render(state.model, v.camera, trainer.bg)
        img = jnp.clip(out.color, 0, 1)
        mse = jnp.mean((img - jnp.asarray(v.image)) ** 2)
        vals.append(float(-10 * jnp.log10(jnp.maximum(mse, 1e-10))))
    return float(np.mean(vals))
