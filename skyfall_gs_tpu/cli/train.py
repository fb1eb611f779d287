"""Training CLI: Stage-1 and Stage-2 (IDU) entry point.

Capability parity: reference train.py:1104-1137 (__main__): flags for test/
save/checkpoint iterations, --start_checkpoint, --iterative_datasets_update;
plus the ParamGroup-derived model/pipeline/optimization flags.

Usage:
    python -m skyfall_gs_tpu.cli.train -s <scene> -m <out> [--eval] ...
    python -m skyfall_gs_tpu.cli.train -s <scene> -m <out> \
        --iterative_datasets_update --start_checkpoint <ckpt.npz>
"""

from __future__ import annotations

import argparse

from skyfall_gs_tpu.config import (
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
    add_config_args,
    extract_config,
    save_config,
)
from skyfall_gs_tpu.utils.general import seed_everything


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="skyfall_gs_tpu trainer")
    add_config_args(parser, ModelConfig())
    add_config_args(parser, PipelineConfig())
    add_config_args(parser, OptimizationConfig())
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7_000, 15_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7_000, 15_000, 30_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[30_000])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--iterative_datasets_update", action="store_true")
    parser.add_argument("--refiner", type=str, default="identity",
                        help="IDU refine backend (identity|flowedit)")
    parser.add_argument("--depth_model", type=str, default="render",
                        help="monodepth backend (render|moge)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace of ~20 steps here")
    parser.add_argument("--gui_ip", type=str, default="127.0.0.1")
    parser.add_argument("--gui_port", type=int, default=0,
                        help="enable the SIBR viewer bridge on this port")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--detect_anomaly", action="store_true",
                        help="enable jax_debug_nans: error at the first "
                             "NaN-producing computation (reference "
                             "train.py:1113,1130 torch detect_anomaly; "
                             "under fused windows the error localizes to "
                             "the window, so also consider --fuse_steps 1)")
    return parser


def main(argv=None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv)
    model_cfg = extract_config(args, ModelConfig)
    pipe_cfg = extract_config(args, PipelineConfig)
    opt_cfg = extract_config(args, OptimizationConfig)

    if not model_cfg.source_path or not model_cfg.model_path:
        parser.error("--source_path/-s and --model_path/-m are required")

    seed_everything(args.seed)

    if args.detect_anomaly:
        import jax

        jax.config.update("jax_debug_nans", True)

    # Multi-host pods: joins the jax.distributed runtime when the
    # SKYFALL_COORDINATOR/... environment is set (parallel/mesh.py emits it
    # per host); a silent no-op for single-process runs.
    from skyfall_gs_tpu.parallel.mesh import initialize_distributed

    initialize_distributed()
    save_config(model_cfg.model_path, model_cfg, pipe_cfg, opt_cfg)

    from skyfall_gs_tpu.io.scene import load_scene
    from skyfall_gs_tpu.priors import get_depth_predictor, get_refiner
    from skyfall_gs_tpu.train.loop import Trainer

    scene = load_scene(
        model_cfg.source_path,
        resolution=model_cfg.resolution,
        eval_split=model_cfg.eval,
        white_background=model_cfg.white_background,
        load_allres=model_cfg.load_allres,
        model_path=model_cfg.model_path,
        seed=args.seed,
    )
    print(f"Loaded {scene.scene_type} scene: {scene.num_train} train / "
          f"{len(scene.test_views)} test views, "
          f"{len(scene.points)} points, extent {scene.cameras_extent:.1f}")

    depth_pred = None
    if opt_cfg.lambda_pseudo_depth > 0:
        depth_pred = get_depth_predictor(args.depth_model)

    gui = None
    if args.gui_port:
        from skyfall_gs_tpu.viz.network_gui import NetworkGUI

        gui = NetworkGUI(args.gui_ip, args.gui_port)

    mesh = None
    mesh_mode = "view"
    if pipe_cfg.data_parallel and pipe_cfg.shard_gaussians:
        raise SystemExit("--data_parallel and --shard_gaussians are "
                         "mutually exclusive (use parallel.gauss_shard."
                         "make_grid_train_step for the 2D grid)")
    if pipe_cfg.data_parallel:
        from skyfall_gs_tpu.parallel.mesh import make_mesh

        n = pipe_cfg.data_parallel
        mesh = make_mesh(None if n < 0 else n)
        print(f"view-parallel training over {mesh.shape['data']} devices")
    elif pipe_cfg.shard_gaussians:
        import jax
        import numpy as np
        from jax.sharding import Mesh

        n = pipe_cfg.shard_gaussians
        devs = jax.devices()
        if n > 0:
            devs = devs[:n]
        mesh = Mesh(np.array(devs), ("gauss",))
        mesh_mode = "gauss"
        print(f"gaussian-sharded training over {len(devs)} devices")

    trainer = Trainer(model_cfg, opt_cfg, pipe_cfg, scene,
                      depth_predictor=depth_pred, rng_seed=args.seed,
                      gui=gui, profile_dir=args.profile_dir, mesh=mesh,
                      mesh_mode=mesh_mode)

    if args.iterative_datasets_update:
        if not args.start_checkpoint:
            parser.error("--start_checkpoint is required for IDU")
        from skyfall_gs_tpu.priors import get_depth_predictor as gdp
        from skyfall_gs_tpu.train.idu import IDUOrchestrator

        state = trainer.init_state(args.start_checkpoint)
        first_iter = trainer.start_iteration
        orch = IDUOrchestrator(
            trainer=trainer,
            refiner=get_refiner(
                "flowedit" if opt_cfg.idu_use_flow_edit else args.refiner),
            depth_predictor=gdp(args.depth_model),
        )
        orch.run(state, first_iter)
    else:
        state = trainer.init_state(args.start_checkpoint)
        trainer.train(
            state,
            test_iterations=tuple(args.test_iterations),
            save_iterations=tuple(args.save_iterations),
            checkpoint_iterations=tuple(args.checkpoint_iterations),
        )
    print("Training complete.")


if __name__ == "__main__":
    main()
