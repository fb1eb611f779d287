"""End-to-end tests of the evaluation CLIs on synthetic artifacts."""

import json
import os

import numpy as np
import pytest


def _write_video(path, frames, fps=24):
    import cv2

    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps,
                         (w, h))
    assert vw.isOpened()
    for f in frames:
        vw.write((np.clip(f[..., ::-1], 0, 1) * 255).astype(np.uint8))
    vw.release()


class TestPhotometricCLI:
    def test_full_run(self, tmp_path, rng):
        from skyfall_gs_tpu.cli.eval_photometric import main

        frames = [rng.uniform(0.2, 0.8, (64, 64, 3)).astype(np.float32)
                  for _ in range(6)]
        noisy = [np.clip(f + rng.normal(0, 0.05, f.shape), 0, 1)
                 .astype(np.float32) for f in frames]
        os.makedirs(tmp_path / "gt")
        os.makedirs(tmp_path / "ours")
        _write_video(tmp_path / "gt" / "S1.mp4", frames)
        _write_video(tmp_path / "ours" / "S1.mp4", noisy)

        csv_path = tmp_path / "res.csv"
        main(["--root", str(tmp_path), "--methods", "ours",
              "--scenes", "S1", "--num_frames", "4", "--no_resize",
              "--out_csv", str(csv_path)])
        text = open(csv_path).read()
        assert "psnr" in text and "ours" in text
        # mp4 encoding adds noise; psnr should still be high-ish
        import csv as csvmod

        rows = list(csvmod.DictReader(open(csv_path)))
        assert float(rows[0]["psnr"]) > 15


class TestGeometryCLI:
    def test_full_scene_eval(self, tmp_path, rng):
        """Checkpoint -> depth render -> DSM -> registration -> MAE."""
        import jax
        import jax.numpy as jnp

        from skyfall_gs_tpu.cli.eval_geometry import evaluate_scene
        from skyfall_gs_tpu.eval.geometry import rasterize_dsm
        from skyfall_gs_tpu.model.gaussians import create_from_points
        from skyfall_gs_tpu.train.checkpoint import save_checkpoint
        from skyfall_gs_tpu.train.step import init_train_state

        # scene: flat-ish plane of splats around z=10
        n = 400
        pts = np.stack([
            rng.uniform(-40, 40, n), rng.uniform(-40, 40, n),
            10.0 + rng.normal(0, 0.2, n)], 1).astype(np.float32)
        cols = rng.uniform(0.3, 0.7, (n, 3)).astype(np.float32)
        st = init_train_state(create_from_points(pts, cols, capacity=512,
                                                 init_opacity=0.95))
        ckpt = str(tmp_path / "ck.npz")
        save_checkpoint(ckpt, st, 1)

        # source scene dir: a satellite fixture so load_scene works
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from test_io import _make_satellite_fixture

        scene_dir = str(tmp_path / "scene")
        _make_satellite_fixture(scene_dir, rng, n_frames=2, size=32)

        # GT DSM on a 64x64 ROI grid covering the plane, truth = 10
        gt_dir = str(tmp_path / "gt")
        os.makedirs(gt_dir)
        np.savetxt(os.path.join(gt_dir, "TEST_DSM.txt"),
                   [-50.0, -50.0, 64, 1.5625])
        gt = np.full((64, 64), 10.0, np.float32)
        import cv2

        cv2.imwrite(os.path.join(gt_dir, "TEST_DSM.tif"), gt)

        m = evaluate_scene(ckpt, scene_dir, gt_dir, "TEST")
        assert np.isfinite(m["mae"])
        assert m["completeness"] > 0.05
        # the fixture cameras look straight down at a z=10 plane from 500m;
        # registered MAE should be small
        assert m["mae"] < 2.0


class TestMergeImagesCLI:
    def test_wipe_and_side(self, tmp_path, rng):
        import cv2

        from skyfall_gs_tpu.cli.merge_images import main, merge_pair

        la, lb = tmp_path / "a", tmp_path / "b"
        os.makedirs(la), os.makedirs(lb)
        for i in range(3):
            cv2.imwrite(str(la / f"{i:03d}.png"),
                        np.full((32, 32, 3), 40, np.uint8))
            cv2.imwrite(str(lb / f"{i:03d}.png"),
                        np.full((32, 32, 3), 200, np.uint8))
        out = tmp_path / "out"
        main(["--left", str(la), "--right", str(lb), "--out", str(out)])
        m = cv2.imread(str(out / "001.png")).astype(np.float32) / 255.0
        # seam at 0.5: left half from a (dark), right half from b (bright)
        assert abs(m[0, 4, 0] - 40 / 255.0) < 0.02
        assert abs(m[0, 28, 0] - 200 / 255.0) < 0.02

        out2 = tmp_path / "out2"
        main(["--left", str(la), "--right", str(lb), "--out", str(out2),
              "--mode", "side"])
        s = cv2.imread(str(out2 / "000.png"))
        assert s.shape[1] == 64

        a = rng.uniform(size=(8, 8, 3)).astype(np.float32)
        b = rng.uniform(size=(8, 8, 3)).astype(np.float32)
        w = merge_pair(a, b, 0.0)
        np.testing.assert_allclose(w[:, 1:], b[:, 1:])


@pytest.mark.slow
class TestAlignGesCLI:
    def test_ternary_search_runs(self, tmp_path, rng):
        """align_ges end-to-end on a tiny checkpoint + fake GES frames."""
        import cv2

        from skyfall_gs_tpu.cli.align_ges import main
        from skyfall_gs_tpu.model.gaussians import create_from_points
        from skyfall_gs_tpu.train.checkpoint import save_checkpoint
        from skyfall_gs_tpu.train.step import init_train_state

        n = 64
        pts = np.stack([rng.uniform(-20, 20, n), rng.uniform(-20, 20, n),
                        rng.normal(0, 1, n)], 1).astype(np.float32)
        cols = rng.uniform(0.2, 0.9, (n, 3)).astype(np.float32)
        st = init_train_state(create_from_points(pts, cols, capacity=128,
                                                 init_opacity=0.9))
        ckpt = str(tmp_path / "ck.npz")
        save_checkpoint(ckpt, st, 1)

        ges = tmp_path / "ges"
        os.makedirs(ges)
        for i in range(2):
            cv2.imwrite(str(ges / f"f{i}.png"),
                        (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8))

        out_json = str(tmp_path / "path.json")
        main(["--checkpoint", ckpt, "--ges_frames", str(ges),
              "--iters", "1", "--num_frames", "2", "--radius", "60",
              "--out_path", out_json])
        path = json.load(open(out_json))
        assert "camera_path" in path and len(path["camera_path"]) == 240
        alt = path["_target"][2]
        assert -50.0 <= alt <= 150.0
