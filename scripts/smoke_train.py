"""End-to-end training smoke: synthetic scene -> Stage-1 trainer -> loss drop.

Builds a small synthetic "city block" (colored boxes on a ground plane),
renders ground-truth views with a dense oracle model, then trains a model
from a sparse noisy point cloud and verifies PSNR improves, densification
runs, and checkpoints/PLY export work.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from skyfall_gs_tpu.config import ModelConfig, OptimizationConfig, PipelineConfig
from skyfall_gs_tpu.core.camera import orbit_cameras
from skyfall_gs_tpu.io.scene import SceneData, View
from skyfall_gs_tpu.train.loop import Trainer


def make_synthetic_scene(tmpdir, n_views=12, size=64, n_points=400, seed=0):
    rng = np.random.default_rng(seed)
    # ground-truth point cloud: a plane + some "buildings"
    ground = np.stack([
        rng.uniform(-1.5, 1.5, n_points // 2),
        rng.uniform(-1.5, 1.5, n_points // 2),
        np.zeros(n_points // 2),
    ], axis=1)
    towers = np.stack([
        rng.choice([-0.7, 0.0, 0.8], n_points // 2) + rng.normal(0, 0.05, n_points // 2),
        rng.choice([-0.6, 0.3, 0.9], n_points // 2) + rng.normal(0, 0.05, n_points // 2),
        rng.uniform(0, 0.8, n_points // 2),
    ], axis=1)
    pts = np.concatenate([ground, towers]).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (n_points, 3)).astype(np.float32)

    # GT model: the true points with small isotropic splats
    from skyfall_gs_tpu.model.gaussians import create_from_points
    from skyfall_gs_tpu.model.render import render as model_render

    gt_state = create_from_points(pts, cols, capacity=1024, init_opacity=0.9)

    cams = orbit_cameras([0, 0, 0.2], 40.0, 4.0, num_cams=n_views,
                         width=size, height=size, fov_deg=60.0, uid_base=0)
    bg = jnp.zeros(3)
    views = []
    rfn = jax.jit(lambda m, c: model_render(m, c, bg, with_3d_filter=False))
    for i, cam in enumerate(cams):
        out = rfn(gt_state, cam)
        img = np.asarray(jnp.clip(out.color, 0, 1))
        dep = np.asarray(out.depth)
        cam = jax.tree.map(lambda x: x, cam)
        cam = cam.replace(uid=jnp.int32(i))
        views.append(View(camera=cam, image=img,
                          mask=np.ones((size, size), np.float32),
                          depth=dep, image_name=f"v{i}"))

    # training initialization: noisy sparse subsample
    sub = rng.choice(n_points, n_points // 2, replace=False)
    init_pts = pts[sub] + rng.normal(0, 0.05, (len(sub), 3)).astype(np.float32)
    init_cols = np.full((len(sub), 3), 0.5, np.float32)

    scene = SceneData(
        source_path=tmpdir, scene_type="synthetic",
        points=init_pts, colors=init_cols,
        train_views=views[:-2], test_views=views[-2:],
        cameras_extent=4.4,
    )
    scene.build_groups()
    return scene


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skyfall_smoke"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    os.makedirs(out_dir, exist_ok=True)

    scene = make_synthetic_scene(out_dir)
    model_cfg = ModelConfig(model_path=out_dir, kernel_size=0.1)
    opt_cfg = OptimizationConfig(
        iterations=iters,
        densify_from_iter=100,
        densification_interval=150,
        densify_until_iter=int(iters * 0.8),
        opacity_reset_interval=10 ** 9,  # keep the smoke focused
        lambda_depth=0.0,
        lambda_opacity=0.01,
        position_lr_max_steps=iters,
    )
    pipe_cfg = PipelineConfig()

    trainer = Trainer(model_cfg, opt_cfg, pipe_cfg, scene)
    state = trainer.init_state()

    # initial test PSNR
    bg = trainer.bg
    def test_psnr(st):
        vals = []
        for v in scene.test_views:
            out = trainer._eval_render(st.model, v.camera, bg)
            img = jnp.clip(out.color, 0, 1)
            mse = jnp.mean((img - jnp.asarray(v.image)) ** 2)
            vals.append(float(-10 * jnp.log10(jnp.maximum(mse, 1e-10))))
        return float(np.mean(vals))

    p0 = test_psnr(state)
    t0 = time.time()
    state = trainer.train(state, iterations=iters,
                          save_iterations=(iters,),
                          checkpoint_iterations=(iters,))
    dt = time.time() - t0
    p1 = test_psnr(state)

    n0 = len(scene.points)
    n1 = int(state.model.num_alive)
    print(f"PSNR {p0:.2f} -> {p1:.2f} dB   points {n0} -> {n1}   "
          f"{iters / dt:.2f} it/s", flush=True)
    ply = os.path.join(out_dir, "point_cloud", f"iteration_{iters}",
                       "point_cloud.ply")
    ckpt = os.path.join(out_dir, f"chkpnt{iters}.npz")
    print("ply exists:", os.path.exists(ply), " ckpt exists:",
          os.path.exists(ckpt), flush=True)
    assert p1 > p0 + 2.0, "training did not improve PSNR by 2dB"
    print("SMOKE TRAIN OK", flush=True)


if __name__ == "__main__":
    main()
