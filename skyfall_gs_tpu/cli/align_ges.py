"""Google-Earth-Studio alignment: search the orbit target altitude that best
matches reference GES frames.

Capability parity: reference align_ges.py — binary-search the look-at
altitude: for each candidate, render the orbit trajectory and score SSIM
against the GES reference frames; emit the best-aligned camera path.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _load_frames(folder: str, limit: int) -> list:
    import cv2

    names = sorted(os.listdir(folder))[:limit]
    out = []
    for n in names:
        img = cv2.imread(os.path.join(folder, n))
        if img is not None:
            out.append(img[..., ::-1].astype(np.float32) / 255.0)
    return out


def score_alignment(state, target_alt: float, args, ref_frames) -> float:
    import jax.numpy as jnp

    from skyfall_gs_tpu.ops.ssim import ssim
    from skyfall_gs_tpu.viz.paths import gen_orbit_path, parse_trajectory_json
    from skyfall_gs_tpu.viz.video import render_trajectory

    path = {
        "_target": [args.target_x, args.target_y, target_alt],
        "_radius": args.radius,
        "_elevation": args.elevation,
        "render_height": ref_frames[0].shape[0],
        "render_width": ref_frames[0].shape[1],
        "fps": 24,
        "camera_path": [
            {"camera_to_world": c.flatten().tolist(), "fov": args.fov,
             "aspect": 1}
            for c in gen_orbit_path([args.target_x, args.target_y, target_alt],
                                    args.elevation, args.radius,
                                    len(ref_frames))
        ],
    }
    cams, _ = parse_trajectory_json(path)
    frames, _ = render_trajectory(state, cams, report_fps=False)
    scores = [
        float(ssim(jnp.transpose(jnp.asarray(f), (2, 0, 1)),
                   jnp.transpose(jnp.asarray(r), (2, 0, 1))))
        for f, r in zip(frames, ref_frames)
    ]
    return float(np.mean(scores))


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--ges_frames", required=True)
    parser.add_argument("--target_x", type=float, default=0.0)
    parser.add_argument("--target_y", type=float, default=0.0)
    parser.add_argument("--alt_lo", type=float, default=-50.0)
    parser.add_argument("--alt_hi", type=float, default=150.0)
    parser.add_argument("--elevation", type=float, default=45.0)
    parser.add_argument("--radius", type=float, default=200.0)
    parser.add_argument("--fov", type=float, default=60.0)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--num_frames", type=int, default=8)
    parser.add_argument("--out_path", default="aligned_path.json")
    args = parser.parse_args(argv)

    from skyfall_gs_tpu.cli.render_video import load_state_from_checkpoint
    from skyfall_gs_tpu.viz.paths import save_orbit_path

    state, _ = load_state_from_checkpoint(args.checkpoint)
    ref = _load_frames(args.ges_frames, args.num_frames)
    if not ref:
        parser.error("no reference frames found")

    lo, hi = args.alt_lo, args.alt_hi
    # golden-section-ish ternary search on SSIM(altitude)
    for it in range(args.iters):
        m1 = lo + (hi - lo) / 3.0
        m2 = hi - (hi - lo) / 3.0
        s1 = score_alignment(state, m1, args, ref)
        s2 = score_alignment(state, m2, args, ref)
        print(f"[{it}] alt {m1:.2f}: ssim {s1:.4f} | alt {m2:.2f}: ssim {s2:.4f}")
        if s1 < s2:
            lo = m1
        else:
            hi = m2
    best = 0.5 * (lo + hi)
    print(f"best target altitude: {best:.2f}")
    save_orbit_path(args.out_path, [args.target_x, args.target_y, best],
                    args.elevation, args.radius, 240, args.fov,
                    ref[0].shape[1], ref[0].shape[0])
    print("wrote", args.out_path)


if __name__ == "__main__":
    main()
