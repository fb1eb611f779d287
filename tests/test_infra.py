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
        # debugging flag (reference train.py:1113 --detect_anomaly)
        assert args.detect_anomaly is False
        assert parser.parse_args(
            ["-s", "s", "-m", "m", "--detect_anomaly"]).detect_anomaly

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


class TestMultiHost:
    """Multi-host bootstrap (SURVEY §5.8): env plumbing + a real two-process
    jax.distributed pod over local TCP (DCN-style env vars)."""

    def test_slot_envs(self):
        from skyfall_gs_tpu.parallel.mesh import (
            ENV_COORDINATOR, ENV_NUM_PROCESSES, ENV_PROCESS_ID,
            multihost_slot_envs)

        envs = multihost_slot_envs(["host-a", "host-b", "host-c"], 9000)
        assert len(envs) == 3
        for i, e in enumerate(envs):
            assert e[ENV_COORDINATOR] == "host-a:9000"
            assert e[ENV_NUM_PROCESSES] == "3"
            assert e[ENV_PROCESS_ID] == str(i)

    def test_single_process_noop(self, monkeypatch):
        from skyfall_gs_tpu.parallel import mesh

        for v in (mesh.ENV_COORDINATOR, mesh.ENV_NUM_PROCESSES,
                  mesh.ENV_PROCESS_ID):
            monkeypatch.delenv(v, raising=False)
        assert mesh.initialize_distributed() is False
        # configured but single process: still a no-op
        monkeypatch.setenv(mesh.ENV_COORDINATOR, "localhost:1")
        monkeypatch.setenv(mesh.ENV_NUM_PROCESSES, "1")
        assert mesh.initialize_distributed() is False

    def test_partial_config_fails_loudly(self, monkeypatch):
        """A host with half a pod config must error, not silently train as
        an independent single process while the pod waits for it."""
        from skyfall_gs_tpu.parallel import mesh

        for v in (mesh.ENV_COORDINATOR, mesh.ENV_NUM_PROCESSES,
                  mesh.ENV_PROCESS_ID):
            monkeypatch.delenv(v, raising=False)
        monkeypatch.setenv(mesh.ENV_COORDINATOR, "host-a:9000")
        monkeypatch.setenv(mesh.ENV_PROCESS_ID, "1")
        with pytest.raises(RuntimeError, match="partial multi-host"):
            mesh.initialize_distributed()

    def test_two_process_pod(self, tmp_path):
        """Two local processes join one pod: each sees the pod-global CPU
        device set (2 local + 2 remote) after initialize_distributed()."""
        import subprocess
        import sys

        worker = tmp_path / "worker.py"
        worker.write_text(
            "import os, sys\n"
            "pid, port = int(sys.argv[1]), sys.argv[2]\n"
            "os.environ['SKYFALL_COORDINATOR'] = f'127.0.0.1:{port}'\n"
            "os.environ['SKYFALL_NUM_PROCESSES'] = '2'\n"
            "os.environ['SKYFALL_PROCESS_ID'] = str(pid)\n"
            "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
            "os.environ['XLA_FLAGS'] = "
            "'--xla_force_host_platform_device_count=2'\n"
            "os.environ['JAX_CPU_COLLECTIVES_IMPLEMENTATION'] = 'gloo'\n"
            f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
            "from skyfall_gs_tpu.parallel.mesh import initialize_distributed\n"
            "import jax\n"
            "assert initialize_distributed()\n"
            "assert jax.process_count('cpu') == 2\n"
            "assert len(jax.devices('cpu')) == 4\n"
            "assert len(jax.local_devices(backend='cpu')) == 2\n"
            "from jax.experimental import multihost_utils\n"
            "multihost_utils.sync_global_devices('pod-smoke')\n"
            "print(f'proc {pid} OK', flush=True)\n"
            # jax.distributed.shutdown() can hang on heartbeat teardown for
            # short-lived pods; the bootstrap itself is what's under test.
            "os._exit(0)\n")

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        env = {k: v for k, v in os.environ.items()
               if not k.startswith(("SKYFALL_", "JAX_", "XLA_"))}
        procs = [subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
            for i in range(2)]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=120)
                outs.append(out.decode())
        finally:
            for p in procs:
                p.kill()
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert f"proc {i} OK" in out, out
