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
from skyfall_gs_tpu.io.synthetic import make_city_scene as make_synthetic_scene
from skyfall_gs_tpu.train.loop import Trainer


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
