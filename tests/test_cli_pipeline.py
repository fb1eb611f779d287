"""End-to-end CLI pipeline smoke: the exact command chain a user runs.

Covers the glue no unit test sees: argparse -> config extraction -> scene
loading from disk -> Trainer wiring -> checkpoint/PLY artifact layout ->
the render tools reading those artifacts back.  Mirrors the reference's
operator workflow (train.py __main__ -> gen_render_path.py ->
render_video.py / create_fused_ply.py -> render_video_from_ply.py).

Everything runs in-process (each CLI main() takes argv) on a tiny
satellite-format scene written to disk by scripts/make_synthetic_satellite.
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_scene(out_dir, size=48, n_points=1200, n_views=6):
    spec = importlib.util.spec_from_file_location(
        "make_synthetic_satellite",
        os.path.join(REPO, "scripts", "make_synthetic_satellite.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv_save = sys.argv
    sys.argv = ["make_synthetic_satellite.py", "--out", str(out_dir),
                "--size", str(size), "--n_points", str(n_points),
                "--n_views", str(n_views)]
    try:
        mod.main()
    finally:
        sys.argv = argv_save


@pytest.mark.slow
def test_train_render_fuse_chain(tmp_path):
    scene_dir = tmp_path / "scene"
    model_dir = tmp_path / "model"
    _write_scene(scene_dir)

    from skyfall_gs_tpu.cli.train import main as train_main

    it = 24
    train_main([
        "-s", str(scene_dir), "-m", str(model_dir), "--eval",
        "--iterations", str(it),
        "--densify_from_iter", "8", "--densification_interval", "8",
        "--densify_until_iter", "20",
        "--test_iterations", str(it),
        "--save_iterations", str(it),
        "--checkpoint_iterations", str(it),
        "--quiet",
    ])
    ckpt = model_dir / f"chkpnt{it}.npz"
    assert ckpt.exists(), "training checkpoint not written"
    assert (model_dir / "cfg_args.json").exists(), "cfg_args dump missing"
    ply = model_dir / "point_cloud" / f"iteration_{it}" / "point_cloud.ply"
    assert ply.exists(), "PLY snapshot not written"

    # Orbit camera path (satellite scenes are normalized to radius 256).
    from skyfall_gs_tpu.cli.gen_render_path import main as path_main

    path_dir = tmp_path / "paths"
    path_main(["--output_folder", str(path_dir), "--elevation", "45",
               "--radius", "300", "--num_frame", "3", "--fov", "60",
               "--height", "48", "--width", "48"])
    paths = list(path_dir.glob("*.json"))
    assert len(paths) == 1
    traj = json.loads(paths[0].read_text())
    assert len(traj["camera_path"]) == 3

    from skyfall_gs_tpu.cli.render_video import main as render_main

    vid1 = tmp_path / "traj_ckpt.mp4"
    render_main(["--checkpoint", str(ckpt), "--camera_path", str(paths[0]),
                 "--out", str(vid1)])
    assert vid1.exists() and vid1.stat().st_size > 0

    # Fused PLY (filter baked into scale/opacity) -> checkpoint-free render.
    from skyfall_gs_tpu.cli.create_fused_ply import main as fuse_main

    fused = tmp_path / "fused.ply"
    fuse_main(["-c", str(ckpt), "-o", str(fused)])
    assert fused.exists() and fused.stat().st_size > 0

    vid2 = tmp_path / "traj_ply.mp4"
    render_main(["--ply", str(fused), "--camera_path", str(paths[0]),
                 "--out", str(vid2), "--mode", "depth"])
    assert vid2.exists() and vid2.stat().st_size > 0
