"""Infrastructure tests: viewer protocol, launcher, config system, native."""

import json
import os
import socket
import threading

import numpy as np
import pytest


class TestNetworkGUI:
    def test_wire_protocol_roundtrip(self):
        from skyfall_gs_tpu.viz.network_gui import NetworkGUI

        gui = NetworkGUI("127.0.0.1", 0)
        port = gui.listener.getsockname()[1]

        frames = []

        def viewer():
            c = socket.create_connection(("127.0.0.1", port))
            wv = np.eye(4, dtype=np.float32)
            # undo the server's sign flips so the identity survives:
            msg = {
                "resolution_x": 8, "resolution_y": 8,
                "train": True, "keep_alive": False,
                "scaling_modifier": 1.0,
                "fov_x": 1.0, "fov_y": 1.0,
                "z_near": 0.01, "z_far": 100.0,
                "shs_python": False, "rot_scale_python": False,
                "view_matrix": wv.flatten().tolist(),
                "view_projection_matrix": wv.flatten().tolist(),
            }
            raw = json.dumps(msg).encode()
            c.sendall(len(raw).to_bytes(4, "little") + raw)
            img = b""
            while len(img) < 8 * 8 * 3:
                img += c.recv(8 * 8 * 3 - len(img))
            frames.append(img)
            vlen = int.from_bytes(c.recv(4), "little")
            frames.append(c.recv(vlen).decode())
            c.close()

        t = threading.Thread(target=viewer)
        t.start()
        # server side
        import time

        for _ in range(100):
            gui.try_connect()
            if gui.conn is not None:
                break
            time.sleep(0.01)
        assert gui.conn is not None
        cam, toggles = gui.receive()
        assert cam is not None
        assert cam.width == 8 and cam.height == 8
        assert toggles["train"] is True
        gui.send(np.full((8, 8, 3), 0.5, np.float32), "verify-string")
        t.join()
        assert len(frames[0]) == 192
        assert frames[1] == "verify-string"

    def test_zero_resolution_returns_none(self):
        from skyfall_gs_tpu.viz.network_gui import NetworkGUI

        gui = NetworkGUI("127.0.0.1", 0)
        port = gui.listener.getsockname()[1]

        def viewer():
            c = socket.create_connection(("127.0.0.1", port))
            raw = json.dumps({"resolution_x": 0, "resolution_y": 0}).encode()
            c.sendall(len(raw).to_bytes(4, "little") + raw)
            c.close()

        t = threading.Thread(target=viewer)
        t.start()
        import time

        for _ in range(100):
            gui.try_connect()
            if gui.conn is not None:
                break
            time.sleep(0.01)
        cam, toggles = gui.receive()
        assert cam is None
        t.join()


class TestLauncher:
    def test_runs_jobs_and_isolates_failures(self, tmp_path):
        import sys

        from skyfall_gs_tpu.parallel.launcher import SceneJob, run_scene_jobs

        jobs = [
            SceneJob("ok", [sys.executable, "-c", "print('fine')"]),
            SceneJob("bad", [sys.executable, "-c", "raise SystemExit(3)"]),
            SceneJob("ok2", [sys.executable, "-c", "print('fine2')"]),
        ]
        out = run_scene_jobs(jobs, str(tmp_path), num_workers=2)
        codes = {j.name: j.returncode for j in out}
        assert codes == {"ok": 0, "bad": 3, "ok2": 0}
        assert "fine" in open(tmp_path / "ok.log").read()

    def test_make_training_jobs(self):
        from skyfall_gs_tpu.parallel.launcher import make_training_jobs

        jobs = make_training_jobs(["JAX_004"], "/data", "/out", idu=True)
        assert "--iterative_datasets_update" in jobs[0].argv
        assert any("chkpnt30000" in a for a in jobs[0].argv)


class TestConfig:
    def test_cli_roundtrip(self):
        from skyfall_gs_tpu.cli.train import build_parser
        from skyfall_gs_tpu.config import ModelConfig, OptimizationConfig, extract_config

        parser = build_parser()
        args = parser.parse_args([
            "-s", "scene", "-m", "out", "--iterations", "123",
            "--kernel_size", "0.3", "-w", "--lambda_depth", "0.7",
        ])
        mc = extract_config(args, ModelConfig)
        oc = extract_config(args, OptimizationConfig)
        assert mc.source_path == "scene"
        assert mc.kernel_size == 0.3
        assert mc.white_background is True
        assert oc.iterations == 123
        assert oc.lambda_depth == 0.7
        # defaults preserved
        assert oc.densify_until_iter == 20_000

    def test_saved_config_merge(self, tmp_path):
        from skyfall_gs_tpu.cli.train import build_parser
        from skyfall_gs_tpu.config import (
            ModelConfig,
            OptimizationConfig,
            PipelineConfig,
            get_combined_config,
            save_config,
        )

        save_config(str(tmp_path), ModelConfig(kernel_size=0.5),
                    OptimizationConfig(iterations=999), PipelineConfig())
        parser = build_parser()
        (mc, oc), _ = get_combined_config(
            parser, [ModelConfig, OptimizationConfig],
            argv=["-m", str(tmp_path), "--iterations", "111"])
        assert mc.kernel_size == 0.5      # from saved config
        assert oc.iterations == 111       # CLI overrides


class TestNative:
    def test_native_knn_matches_scipy(self, rng):
        from skyfall_gs_tpu import native

        if not native.available():
            pytest.skip("no g++ toolchain")
        from scipy.spatial import cKDTree

        pts = rng.normal(0, 10, (5000, 3)).astype(np.float32)
        a = native.mean_sq_dist_3nn(pts)
        d, _ = cKDTree(pts).query(pts, k=4, workers=-1)
        b = np.mean(d[:, 1:] ** 2, axis=1)
        np.testing.assert_allclose(a, b, rtol=1e-5)
