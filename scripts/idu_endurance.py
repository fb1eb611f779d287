"""Stage-2 endurance: a MULTI-episode IDU curriculum on real hardware.

smoke_idu.py proves one episode's mechanics; this drives the real
curriculum driver (IDUOrchestrator.run == reference training_idu,
train.py:918-967) for >= 3 episodes x >= 1k iterations with tiny-FLUX
refine + a random-weight MoGe depth predictor, recording per-episode wall
time, throughput, splat growth, and held-out PSNR — curriculum endurance,
not just mechanics (round-3 verdict item 6).

Writes ``<out_dir>/endurance.json`` with the per-episode curve and prints
one summary line per episode.

Usage:
  timeout 5400 python -u scripts/idu_endurance.py \
      [out_dir] [episodes] [episode_iters]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from skyfall_gs_tpu.config import (
    IDU_CURRICULA,
    IDUCurriculum,
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
)
from skyfall_gs_tpu.io.synthetic import make_city_scene, test_psnr
from skyfall_gs_tpu.train.loop import Trainer


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skyfall_idu_endurance"
    episodes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    ep_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    os.makedirs(out_dir, exist_ok=True)
    render_size = 64

    # Toy curriculum scaled to the synthetic city scene's geometry,
    # registered in the real per-dataset registry so IDUOrchestrator.run
    # (the reference training_idu driver) picks it up by datasets_type.
    IDU_CURRICULA["toy_endurance"] = IDUCurriculum(
        elevation_list=tuple(
            np.linspace(75.0, 45.0, episodes).round(1).tolist()),
        radius_list=tuple(
            np.linspace(4.5, 3.5, episodes).round(2).tolist()),
        fov=60.0,
    )

    scene = make_city_scene(out_dir, n_views=16, size=128, n_points=2000,
                            n_test=2)
    model_cfg = ModelConfig(model_path=out_dir, kernel_size=0.1)
    opt_cfg = OptimizationConfig(
        iterations=ep_iters,
        datasets_type="toy_endurance",
        idu_episode_iterations=ep_iters,
        idu_densify_until_iter=int(ep_iters * 0.75),
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
        idu_grid_size=1,
        idu_grid_width=2,
        idu_grid_height=2,
        densify_from_iter=50,
        densification_interval=150,
        lambda_depth=0.2,
        lambda_pseudo_depth=0.0,
        lambda_opacity=0.01,
        position_lr_max_steps=ep_iters,
        idu_position_lr_max_steps=ep_iters,
    )
    trainer = Trainer(model_cfg, opt_cfg, PipelineConfig(), scene)
    state = trainer.init_state()

    # Stage-1 warm start so episodes refine a real reconstruction.
    warm = min(500, ep_iters)
    t0 = time.time()
    state = trainer.train(state, iterations=warm, save_iterations=(),
                          checkpoint_iterations=())
    warm_dt = time.time() - t0
    psnr0 = test_psnr(trainer, scene, state)
    print(f"stage-1 warm start: {warm} iters in {warm_dt:.1f}s, "
          f"PSNR {psnr0:.2f} dB, n={int(state.model.num_alive)}", flush=True)

    from skyfall_gs_tpu.priors.flux import FluxConfig, init_flux_params
    from skyfall_gs_tpu.priors.flux_refiner import build_flux_refiner
    from skyfall_gs_tpu.priors.flux_vae import VAEConfig, init_vae_params
    from skyfall_gs_tpu.priors.moge import (
        MoGePredictor,
        ViTConfig,
        init_vit_params,
    )

    fcfg = FluxConfig.tiny()
    vcfg = VAEConfig.tiny()
    refiner = build_flux_refiner(
        transformer_params=init_flux_params(jax.random.PRNGKey(0), fcfg),
        vae_params=init_vae_params(jax.random.PRNGKey(1), vcfg),
        cfg=fcfg, vae_cfg=vcfg, num_steps=4, batch_size=4)
    mcfg = ViTConfig(patch_size=8, width=64, depth=2, heads=2,
                     img_size=render_size, out_layers=(0, 1), head_width=32)
    predictor = MoGePredictor(
        fov_x=60.0, cfg=mcfg,
        params=init_vit_params(jax.random.PRNGKey(2), mcfg))

    from skyfall_gs_tpu.train.idu import IDUOrchestrator

    orch = IDUOrchestrator(trainer=trainer, refiner=refiner,
                           depth_predictor=predictor)

    # Per-episode curve, hooked through the real curriculum driver.
    curve = []
    real_episode = orch.train_episode

    def instrumented(state, first_iter, targets, elevation, radius, fov):
        t0 = time.time()
        new_state = real_episode(state, first_iter, targets, elevation,
                                 radius, fov)
        dt = time.time() - t0
        rec = {
            "episode": len(curve) + 1,
            "elevation": elevation,
            "radius": radius,
            "first_iter": first_iter,
            "iters": ep_iters,
            "wall_s": round(dt, 1),
            "it_per_s": round(ep_iters / dt, 2),
            "n_alive": int(new_state.model.num_alive),
            "psnr_db": round(test_psnr(trainer, scene, new_state), 2),
        }
        curve.append(rec)
        print(f"[episode {rec['episode']}/{episodes}] ele={elevation} "
              f"rad={radius} {rec['wall_s']}s ({rec['it_per_s']} it/s "
              f"incl. generation) n={rec['n_alive']} "
              f"PSNR={rec['psnr_db']} dB", flush=True)
        return new_state

    orch.train_episode = instrumented
    t0 = time.time()
    state = orch.run(state, warm)
    total = time.time() - t0

    result = {
        "episodes": episodes,
        "episode_iters": ep_iters,
        "final_iteration": warm + episodes * ep_iters,
        "total_wall_s": round(total, 1),
        "warm_psnr_db": round(psnr0, 2),
        "curve": curve,
    }
    with open(os.path.join(out_dir, "endurance.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result), flush=True)
    assert int(state.step) == warm + episodes * ep_iters
    assert all(np.isfinite(r["psnr_db"]) for r in curve)
    print("IDU ENDURANCE OK", flush=True)


if __name__ == "__main__":
    main()
