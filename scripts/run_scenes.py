"""Scene-batch runner with the canonical Skyfall-GS training configurations.

Capability parity: reference scripts/run_jax.py / run_jax_idu.py /
run_nyc*.py — dispatches one training job per scene (Stage 1 or Stage 2)
with the paper's hyperparameters, over the scene-parallel launcher (logged,
failure-isolated).

Usage:
    python scripts/run_scenes.py --dataset jax --data_root data/JAX \
        --output_root outputs/JAX [--idu] [--scenes JAX_004 ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from skyfall_gs_tpu.parallel.launcher import SceneJob, run_scene_jobs

SCENES = {
    "jax": ["JAX_004", "JAX_068", "JAX_214", "JAX_260"],
    "nyc": ["NYC_004", "NYC_010", "NYC_219", "NYC_336"],
}

# Canonical Stage-1 flags (reference scripts/run_jax.py:22).
STAGE1_ARGS = [
    "--eval", "--kernel_size", "0.1", "--resolution", "1",
    "--sh_degree", "1", "--appearance_enabled",
    "--lambda_depth", "0", "--lambda_opacity", "10",
    "--densify_until_iter", "21000",
    "--densify_grad_threshold", "0.0001",
    "--lambda_pseudo_depth", "0.5",
    "--start_sample_pseudo", "1000", "--end_sample_pseudo", "21000",
    "--size_threshold", "20",
    "--scaling_lr", "0.001", "--rotation_lr", "0.001",
    "--opacity_reset_interval", "3000",
    "--sample_pseudo_interval", "10",
    "--depth_model", "moge",
]

# Canonical Stage-2 flags (reference scripts/run_jax_idu.py:29-63).
STAGE2_ARGS = [
    "--iterative_datasets_update", "--eval",
    "--kernel_size", "0.1", "--resolution", "1",
    "--sh_degree", "1", "--appearance_enabled",
    "--lambda_depth", "0.0", "--lambda_opacity", "0.0",
    "--opacity_reset_interval", "10000000",
    "--idu_opacity_reset_interval", "5000",
    "--idu_refine", "--idu_use_flow_edit",
    "--idu_num_samples_per_view", "2", "--idu_num_cams", "6",
    "--densify_grad_threshold", "0.0002",
    "--idu_render_size", "1024",
    "--idu_flow_edit_n_min", "4", "--idu_flow_edit_n_max", "10",
    "--idu_flow_edit_n_max_end", "10",
    "--idu_grid_size", "3", "--idu_grid_width", "512",
    "--idu_grid_height", "512",
    "--idu_episode_iterations", "10000",
    "--idu_iter_full_train", "0",
    "--idu_opacity_cooling_iterations", "500",
    "--lambda_pseudo_depth", "0.5",
    "--idu_densify_until_iter", "9000",
    "--idu_train_ratio", "0.75",
    "--depth_model", "moge",
]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", choices=list(SCENES), default="jax")
    parser.add_argument("--scenes", nargs="*", default=None)
    parser.add_argument("--data_root", required=True)
    parser.add_argument("--output_root", required=True)
    parser.add_argument("--idu", action="store_true")
    parser.add_argument("--num_workers", type=int, default=1)
    parser.add_argument("--extra", nargs="*", default=[])
    parser.add_argument("--dry_run", action="store_true")
    args = parser.parse_args()

    scenes = args.scenes or SCENES[args.dataset]
    stage_args = list(STAGE2_ARGS if args.idu else STAGE1_ARGS)
    if args.idu:
        stage_args += ["--datasets_type", f"{args.dataset}_v1"]
    jobs = []
    for scene in scenes:
        argv = [sys.executable, "-m", "skyfall_gs_tpu.cli.train",
                "-s", os.path.join(args.data_root, scene),
                "-m", os.path.join(args.output_root, scene)]
        argv += stage_args + list(args.extra)
        if args.idu:
            argv += ["--start_checkpoint",
                     os.path.join(args.output_root, scene, "chkpnt30000.npz")]
        jobs.append(SceneJob(name=scene, argv=argv))

    if args.dry_run:
        for j in jobs:
            print(" ".join(j.argv))
        return
    run_scene_jobs(jobs, os.path.join(args.output_root, "logs"),
                   num_workers=args.num_workers)


if __name__ == "__main__":
    main()
