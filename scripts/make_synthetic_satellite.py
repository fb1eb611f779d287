"""Generate a synthetic satellite-format scene on disk for integration runs.

Produces the exact on-disk layout the satellite reader consumes
(transforms_train/test.json with fl/cx/cy and the global R/T normalization
fix, points3D.txt, images, masks/*.npy, depths_moge/*.npy) from a procedural
city block rendered with the oracle-quality tiled renderer.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--n_points", type=int, default=40_000)
    parser.add_argument("--n_views", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from skyfall_gs_tpu.core.camera import orbit_cameras
    from skyfall_gs_tpu.io.colmap import write_points3d_text
    from skyfall_gs_tpu.model.gaussians import create_from_points
    from skyfall_gs_tpu.model.render import render as model_render

    rng = np.random.default_rng(args.seed)
    n = args.n_points
    # city block: ground disk + boxes ("buildings") with height
    r = 220 * np.sqrt(rng.uniform(0, 1, n // 2))
    th = rng.uniform(0, 2 * np.pi, n // 2)
    ground = np.stack([r * np.cos(th), r * np.sin(th),
                       rng.normal(0, 0.5, n // 2)], 1)
    n_bld = 30
    centers = rng.uniform(-180, 180, (n_bld, 2))
    heights = rng.uniform(10, 60, n_bld)
    bidx = rng.integers(0, n_bld, n - n // 2)
    bld = np.stack([
        centers[bidx, 0] + rng.normal(0, 8, n - n // 2),
        centers[bidx, 1] + rng.normal(0, 8, n - n // 2),
        heights[bidx] * rng.uniform(0, 1, n - n // 2),
    ], 1)
    pts = np.concatenate([ground, bld]).astype(np.float32)
    cols = rng.uniform(0.15, 0.85, (n, 3)).astype(np.float32)

    gt = create_from_points(pts, cols, capacity=-(-n // 1024) * 1024,
                            init_opacity=0.9)
    gt = gt.replace(aux=gt.aux.replace(
        filter_3d=jnp.full(gt.params.capacity, 0.5)))

    cams = orbit_cameras([0, 0, 0], 70.0, 600.0, num_cams=args.n_views,
                         width=args.size, height=args.size, fov_deg=45.0,
                         uid_base=0)
    bg = jnp.zeros(3)
    rfn = jax.jit(lambda m, c: model_render(m, c, bg, inference=True,
                                            testing=True))

    os.makedirs(args.out, exist_ok=True)
    os.makedirs(os.path.join(args.out, "masks"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "depths_moge"), exist_ok=True)
    frames = []
    focal = args.size / (2 * np.tan(np.radians(45.0) / 2))
    for i, cam in enumerate(cams):
        out = rfn(gt, cam)
        img = np.clip(np.asarray(out.color), 0, 1)
        alpha = np.asarray(out.alpha)
        depth = np.asarray(out.depth) / np.maximum(alpha, 1e-6)
        name = f"img_{i:03d}"
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(args.out, name + ".png"))
        np.save(os.path.join(args.out, "masks", name + ".npy"),
                (alpha > 0.5).astype(np.uint8))
        np.save(os.path.join(args.out, "depths_moge", name + ".npy"),
                depth.astype(np.float32))
        c2w = np.linalg.inv(np.asarray(cam.world_view, np.float64))
        frames.append({
            "file_path": name + ".png",
            "transform_matrix_rotated": c2w.tolist(),
            "fl_x": focal, "fl_y": focal,
            "cx": args.size / 2, "cy": args.size / 2,
        })

    n_test = max(args.n_views // 8, 1)
    base = {"R": np.eye(3).tolist(), "T": [0.0, 0.0, 0.0]}
    with open(os.path.join(args.out, "transforms_train.json"), "w") as f:
        json.dump({**base, "frames": frames[n_test:]}, f)
    with open(os.path.join(args.out, "transforms_test.json"), "w") as f:
        json.dump({**base, "frames": frames[:n_test]}, f)

    # noisy sparse init cloud
    sub = rng.choice(n, n // 3, replace=False)
    noisy = pts[sub] + rng.normal(0, 1.0, (len(sub), 3)).astype(np.float32)
    write_points3d_text(os.path.join(args.out, "points3D.txt"),
                        noisy, cols[sub] * 255)
    print(f"wrote synthetic satellite scene to {args.out}: "
          f"{args.n_views} views @ {args.size}px, {len(sub)} init points")


if __name__ == "__main__":
    main()
