"""Trajectory video rendering CLI (checkpoint- or PLY-sourced).

Capability parity: reference render_video.py (checkpoint + scene render of a
JSON trajectory, scale-histogram diagnostics, MP4 output) and
render_video_from_ply.py (standalone PLY — mip or fused format — with the 3D
filter recomputed from the trajectory cameras).

Usage:
    python -m skyfall_gs_tpu.cli.render_video \
        --checkpoint out/chkpnt30000.npz --camera_path path.json --out fly.mp4
    python -m skyfall_gs_tpu.cli.render_video \
        --ply out/point_cloud/iteration_30000/point_cloud.ply \
        --camera_path path.json --out fly.mp4 --mode depth
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def load_state_from_ply(ply_path: str):
    """Build a render-ready GaussianModelState from a gaussian PLY."""
    import jax.numpy as jnp

    from skyfall_gs_tpu.io.gaussian_ply import load_gaussian_ply
    from skyfall_gs_tpu.model.gaussians import (
        GaussianAux,
        GaussianModelState,
        GaussianParams,
    )

    d = load_gaussian_ply(ply_path)
    n = d["xyz"].shape[0]
    params = GaussianParams(
        xyz=jnp.asarray(d["xyz"]),
        features_dc=jnp.asarray(d["features_dc"]),
        features_rest=jnp.asarray(d["features_rest"]),
        scaling=jnp.asarray(d["scaling"]),
        rotation=jnp.asarray(d["rotation"]),
        opacity=jnp.asarray(d["opacity"]),
    )
    has_filter = d["filter_3d"] is not None
    aux = GaussianAux(
        alive=jnp.ones(n, bool),
        filter_3d=(jnp.asarray(d["filter_3d"]) if has_filter else jnp.zeros(n)),
        max_radii2d=jnp.zeros(n),
        grad_accum=jnp.zeros(n),
        grad_accum_abs=jnp.zeros(n),
        grad_accum_abs_max=jnp.zeros(n),
        denom=jnp.zeros(n),
    )
    state = GaussianModelState(
        params=params, aux=aux,
        active_sh_degree=d["sh_degree"], max_sh_degree=d["sh_degree"],
    )
    return state, has_filter


def load_state_from_checkpoint(ckpt_path: str):
    from skyfall_gs_tpu.model.appearance import AppearanceConfig
    from skyfall_gs_tpu.model.gaussians import create_from_points
    from skyfall_gs_tpu.train.checkpoint import (
        load_checkpoint,
        peek_checkpoint_meta,
    )
    from skyfall_gs_tpu.train.step import init_train_state

    meta = peek_checkpoint_meta(ckpt_path)
    app = AppearanceConfig(*meta["appearance"])
    rng = np.random.default_rng(0)
    dummy_pts = rng.normal(size=(8, 3)).astype(np.float32)
    dummy_cols = np.zeros((8, 3), np.float32)
    template = init_train_state(create_from_points(
        dummy_pts, dummy_cols, max_sh_degree=meta["max_sh_degree"],
        appearance=app, num_cameras=max(meta.get("num_cameras", 1), 1),
        capacity=meta["capacity"]))
    state, it = load_checkpoint(ckpt_path, template)
    return state.model, it


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", type=str)
    parser.add_argument("--ply", type=str)
    parser.add_argument("--camera_path", type=str, required=True)
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--mode", choices=["rgb", "depth"], default="rgb")
    parser.add_argument("--kernel_size", type=float, default=0.1)
    parser.add_argument("--white_background", action="store_true")
    parser.add_argument("--scale_histogram", action="store_true")
    parser.add_argument(
        "--entry_budget", type=int, default=None,
        help="LOD cap on duplicated (splat, tile) entries per frame; splats "
             "are kept greedily by contribution-per-entry. Bounds render "
             "cost on dense scenes (see scripts/bench_entry_budget.py for "
             "the measured speed/quality curve).")
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from skyfall_gs_tpu.viz.paths import load_trajectory
    from skyfall_gs_tpu.viz.video import (
        recompute_filter_for_trajectory,
        render_trajectory,
        write_video,
    )

    cams, radius, fps = load_trajectory(args.camera_path)
    if args.ply:
        state, has_filter = load_state_from_ply(args.ply)
        if not has_filter:
            state = recompute_filter_for_trajectory(state, cams)
    elif args.checkpoint:
        state, it = load_state_from_checkpoint(args.checkpoint)
        print(f"loaded checkpoint at iteration {it}")
        state = recompute_filter_for_trajectory(state, cams)
    else:
        parser.error("need --checkpoint or --ply")

    if args.scale_histogram:
        # Gaussian scale diagnostics (reference render_video.py:199-223):
        # per-splat max scale statistics + a histogram PNG next to the video.
        from skyfall_gs_tpu.model.gaussians import get_scaling

        s = np.asarray(get_scaling(state.params)).max(axis=1)
        s = s[np.asarray(state.aux.alive)]
        print(f"splats: {s.shape[0]}")
        print(f"Min:    {s.min():.6f}")
        print(f"Max:    {s.max():.6f}")
        print(f"Mean:   {s.mean():.6f}")
        print(f"Std:    {s.std():.6f}")
        print(f"Median: {np.median(s):.6f}")
        print(f"Q99:    {np.percentile(s, 99):.6f}")
        try:
            import os

            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.figure(figsize=(10, 6))
            plt.hist(s, bins=480, range=(0, 30), edgecolor="black")
            plt.title("Gaussian max-scale histogram")
            plt.xlabel("scale")
            plt.ylabel("frequency")
            plt.grid(True, alpha=0.3)
            hist_path = os.path.splitext(args.out)[0] + "_scale_hist.png"
            plt.savefig(hist_path, dpi=150, bbox_inches="tight")
            plt.close()
            print(f"histogram saved to {hist_path}")
        except Exception as e:  # matplotlib optional in minimal images
            print(f"(histogram PNG skipped: {e})")

    bg = jnp.ones(3) if args.white_background else jnp.zeros(3)
    frames, fps_measured = render_trajectory(
        state, cams, bg=bg, kernel_size=args.kernel_size, mode=args.mode,
        entry_budget=args.entry_budget)
    write_video(args.out, frames, fps=fps)
    print(f"wrote {args.out}: {len(frames)} frames, render {fps_measured:.1f} FPS")


if __name__ == "__main__":
    main()
