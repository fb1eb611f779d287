"""Stage-2 IDU smoke on real hardware: refine -> depth -> retrain episode.

Round-2 verdict gap: IDU had only ever run in CPU interpret-mode tests.
This script drives ONE full IDU episode on the TPU with the real moving
parts at tiny widths:

  * the FLUX FlowEdit refiner (tiny-config DiT + VAE, random weights,
    idu_refine=True so the refined frames feed the photometric loss);
  * a random-weight MoGe ViT depth predictor on the refined frames;
  * the episode train loop (mixed IDU/original sampling, densification,
    episode LR schedule, per-episode checkpoint + PLY).

It proves the refine -> depth -> retrain graph compiles through the axon
tunnel and records the episode-regime throughput (which pays per-dispatch
overhead that Stage-1's fused windows amortize — quote THIS number for
Stage-2, not the Stage-1 it/s).

Usage: timeout 900 python -u scripts/smoke_idu.py [out_dir] [episode_iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from skyfall_gs_tpu.config import ModelConfig, OptimizationConfig, PipelineConfig
from skyfall_gs_tpu.io.synthetic import make_city_scene
from skyfall_gs_tpu.train.loop import Trainer


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skyfall_smoke_idu"
    ep_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    os.makedirs(out_dir, exist_ok=True)

    render_size = 64

    scene = make_city_scene(out_dir)
    model_cfg = ModelConfig(model_path=out_dir, kernel_size=0.1)
    opt_cfg = OptimizationConfig(
        iterations=ep_iters,
        idu_episode_iterations=ep_iters,
        idu_densify_until_iter=int(ep_iters * 0.6),
        idu_opacity_reset_interval=10 ** 9,
        idu_testing_interval=10 ** 9,
        idu_num_cams=4,
        idu_num_samples_per_view=1,
        idu_render_size=render_size,
        idu_train_ratio=0.5,
        idu_refine=True,
        idu_flow_edit_n_min=0,
        idu_flow_edit_n_max=3,
        idu_flow_edit_n_avg=1,
        densify_from_iter=20,
        densification_interval=60,
        lambda_depth=0.2,
        lambda_pseudo_depth=0.0,
        lambda_opacity=0.01,
        position_lr_max_steps=ep_iters,
        idu_position_lr_max_steps=ep_iters,
    )
    pipe_cfg = PipelineConfig()

    trainer = Trainer(model_cfg, opt_cfg, pipe_cfg, scene)
    state = trainer.init_state()

    # --- tiny-FLUX FlowEdit refiner (random weights; exercises the real
    # encode -> batched ODE -> decode graph) ---------------------------------
    from skyfall_gs_tpu.priors.flux import FluxConfig, init_flux_params
    from skyfall_gs_tpu.priors.flux_refiner import build_flux_refiner
    from skyfall_gs_tpu.priors.flux_vae import VAEConfig, init_vae_params

    fcfg = FluxConfig.tiny()
    vcfg = VAEConfig.tiny()
    refiner = build_flux_refiner(
        transformer_params=init_flux_params(jax.random.PRNGKey(0), fcfg),
        vae_params=init_vae_params(jax.random.PRNGKey(1), vcfg),
        cfg=fcfg, vae_cfg=vcfg, num_steps=4, batch_size=4)

    # --- random-weight MoGe depth predictor ---------------------------------
    from skyfall_gs_tpu.priors.moge import MoGePredictor, ViTConfig, init_vit_params

    mcfg = ViTConfig(patch_size=8, width=64, depth=2, heads=2,
                     img_size=render_size, out_layers=(0, 1), head_width=32)
    predictor = MoGePredictor(
        fov_x=60.0, cfg=mcfg,
        params=init_vit_params(jax.random.PRNGKey(2), mcfg))

    from skyfall_gs_tpu.train.idu import IDUOrchestrator

    orch = IDUOrchestrator(trainer=trainer, refiner=refiner,
                           depth_predictor=predictor)

    t0 = time.time()
    state = orch.train_episode(state, 0, [[0.0, 0.0, 0.0]], 60.0, 4.0, 60.0)
    dt = time.time() - t0

    n1 = int(state.model.num_alive)
    print(f"episode: {ep_iters} iters in {dt:.1f}s "
          f"({ep_iters / dt:.2f} it/s episode-regime, incl. generation) "
          f"points -> {n1}", flush=True)

    tag = "e60.0_r4.0"
    idu_dir = os.path.join(out_dir, "idu", tag)
    for artifact in ("render/00000.png", "render_refine/00000.png",
                     "render_depth.npy"):
        p = os.path.join(idu_dir, artifact)
        assert os.path.exists(p), f"missing episode artifact {p}"
    ckpt = os.path.join(out_dir, f"chkpnt{ep_iters}.npz")
    assert os.path.exists(ckpt), "missing episode checkpoint"
    assert int(state.step) == ep_iters
    print("SMOKE IDU OK", flush=True)


if __name__ == "__main__":
    main()
