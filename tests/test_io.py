"""IO tests: PLY roundtrips, COLMAP parsing, scene readers on fixtures."""

import json
import os

import numpy as np
import pytest

from skyfall_gs_tpu.io.colmap import (
    qvec_to_rotmat,
    read_points3d_text,
    rotmat_to_qvec,
    write_points3d_text,
)
from skyfall_gs_tpu.io.ply import read_ply, write_ply
from skyfall_gs_tpu.io.readers import (
    detect_scene_type,
    read_blender_scene,
    read_satellite_scene,
)
from skyfall_gs_tpu.io.scene import load_scene, resolve_resolution


class TestPly:
    def test_roundtrip(self, rng, tmp_path):
        n = 37
        props = {
            "x": rng.normal(size=n).astype(np.float32),
            "y": rng.normal(size=n).astype(np.float32),
            "red": rng.integers(0, 255, n).astype(np.uint8),
        }
        p = str(tmp_path / "t.ply")
        write_ply(p, props, order=["x", "y", "red"])
        back = read_ply(p)
        np.testing.assert_allclose(back["x"], props["x"])
        np.testing.assert_array_equal(back["red"], props["red"])

    def test_ascii_read(self, tmp_path):
        p = tmp_path / "a.ply"
        p.write_text(
            "ply\nformat ascii 1.0\nelement vertex 2\n"
            "property float x\nproperty float y\nend_header\n"
            "1.0 2.0\n3.0 4.0\n")
        v = read_ply(str(p))
        np.testing.assert_allclose(v["x"], [1.0, 3.0])


class TestColmap:
    def test_qvec_roundtrip(self, rng):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        r = qvec_to_rotmat(q)
        np.testing.assert_allclose(rotmat_to_qvec(r), q, atol=1e-6)

    def test_points3d_text_roundtrip(self, rng, tmp_path):
        xyz = rng.normal(size=(10, 3))
        rgb = rng.integers(0, 255, (10, 3)).astype(float)
        p = str(tmp_path / "points3D.txt")
        write_points3d_text(p, xyz, rgb)
        x2, r2, _ = read_points3d_text(p)
        np.testing.assert_allclose(x2, xyz, atol=1e-6)
        np.testing.assert_allclose(r2, rgb)


def _make_blender_fixture(root, rng, n_frames=3, size=32):
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    frames = []
    for i in range(n_frames):
        theta = 2 * np.pi * i / n_frames
        c2w = np.eye(4)
        c2w[:3, 3] = [4 * np.cos(theta), 4 * np.sin(theta), 2.0]
        # simple look-at rotation not needed for reader tests
        frames.append({"file_path": f"r_{i}", "transform_matrix": c2w.tolist()})
        img = (rng.uniform(0, 255, (size, size, 4))).astype(np.uint8)
        Image.fromarray(img, "RGBA").save(os.path.join(root, f"r_{i}.png"))
    for split in ("train", "test"):
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
    return root


def _make_satellite_fixture(root, rng, n_frames=3, size=32):
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    xyz = rng.normal(0, 50, (200, 3))
    rgb = rng.integers(0, 255, (200, 3)).astype(float)
    write_points3d_text(os.path.join(root, "points3D.txt"), xyz, rgb)
    frames = []
    for i in range(n_frames):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.0, 0.0, 500.0 + i]
        c2w[:3, :3] = np.diag([1.0, -1.0, -1.0])  # looking down
        frames.append({
            "file_path": f"img_{i}.png",
            "transform_matrix": c2w.tolist(),
            "fl_x": 100.0, "fl_y": 100.0,
            "cx": size / 2 + 1.0, "cy": size / 2 - 1.0,
        })
        img = rng.uniform(1, 255, (size, size, 3)).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, f"img_{i}.png"))
    for split in ("train", "test"):
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"frames": frames}, f)
    return root


class TestReaders:
    def test_detect_types(self, tmp_path, rng):
        b = _make_blender_fixture(str(tmp_path / "blender"), rng)
        s = _make_satellite_fixture(str(tmp_path / "sat"), rng)
        assert detect_scene_type(b) == "blender"
        assert detect_scene_type(s) == "satellite"

    def test_blender_reader(self, tmp_path, rng):
        root = _make_blender_fixture(str(tmp_path / "b"), rng)
        raw = read_blender_scene(root, eval_split=True)
        assert len(raw.train_cameras) == 3
        assert len(raw.test_cameras) == 3
        assert raw.points.shape[1] == 3
        cam = raw.train_cameras[0]
        assert cam.image.shape == (32, 32, 3)
        assert cam.fov_x == pytest.approx(0.7)

    def test_satellite_reader_normalization(self, tmp_path, rng):
        root = _make_satellite_fixture(str(tmp_path / "s"), rng)
        # add a global R/T fix to trigger normalization
        for split in ("train", "test"):
            p = os.path.join(root, f"transforms_{split}.json")
            with open(p) as f:
                d = json.load(f)
            d["R"] = np.eye(3).tolist()
            d["T"] = [0.0, 0.0, 0.0]
            for fr in d["frames"]:
                fr["transform_matrix_rotated"] = fr["transform_matrix"]
            with open(p, "w") as f:
                json.dump(d, f)
        raw = read_satellite_scene(root, eval_split=True)
        r99 = np.percentile(np.linalg.norm(raw.points, axis=1), 99)
        # cloud normalized to ~256 radius... (z-shift moves it slightly)
        assert 200 < r99 < 400
        assert np.percentile(raw.points[:, 2], 1) == pytest.approx(0.0, abs=1e-3)
        assert raw.radius == pytest.approx(128.0)
        # masks present (non-black heuristic)
        assert raw.train_cameras[0].mask is not None

    def test_load_scene_groups(self, tmp_path, rng):
        root = _make_blender_fixture(str(tmp_path / "g"), rng)
        scene = load_scene(root, eval_split=False,
                           model_path=str(tmp_path / "out"))
        assert scene.num_train == 6
        assert len(scene.train_groups) == 1
        g = next(iter(scene.train_groups.values()))
        assert g.images.shape == (6, 32, 32, 3)
        assert os.path.exists(tmp_path / "out" / "cameras.json")
        assert os.path.exists(tmp_path / "out" / "input.ply")


class TestResolution:
    def test_divisors(self):
        assert resolve_resolution(1600, 1200, 2) == (800, 600)
        assert resolve_resolution(1600, 1200, 1) == (1600, 1200)

    def test_cap_1600(self):
        w, h = resolve_resolution(3200, 2400, -1)
        assert w == 1600 and h == 1200

    def test_explicit_width(self):
        w, h = resolve_resolution(1000, 500, 250)
        assert w == 250 and h == 125


class TestGaussianPly:
    def test_roundtrip(self, rng, tmp_path):
        from skyfall_gs_tpu.io.gaussian_ply import (
            load_gaussian_ply,
            save_fused_ply,
            save_gaussian_ply,
        )
        from skyfall_gs_tpu.model.gaussians import create_from_points
        import jax.numpy as jnp

        pts = rng.normal(size=(30, 3)).astype(np.float32)
        cols = rng.uniform(size=(30, 3)).astype(np.float32)
        st = create_from_points(pts, cols, capacity=64)
        st = st.replace(aux=st.aux.replace(filter_3d=jnp.full(64, 0.3)))
        p = str(tmp_path / "gs.ply")
        save_gaussian_ply(st, p)
        back = load_gaussian_ply(p)
        assert back["sh_degree"] == 3
        np.testing.assert_allclose(back["xyz"], pts, atol=1e-6)
        np.testing.assert_allclose(back["filter_3d"], 0.3)
        np.testing.assert_allclose(
            back["features_dc"], np.asarray(st.params.features_dc)[:30],
            atol=1e-6)

        pf = str(tmp_path / "fused.ply")
        save_fused_ply(st, pf)
        fused = load_gaussian_ply(pf)
        assert fused["filter_3d"] is None
        # fused scales include the filter: strictly larger
        assert (fused["scaling"] >= back["scaling"] - 1e-5).all()

    def test_splat_roundtrip(self, rng, tmp_path):
        from skyfall_gs_tpu.io.gaussian_ply import (
            SH_C0,
            load_splat,
            save_splat,
        )
        from skyfall_gs_tpu.model.gaussians import (
            create_from_points,
            opacity_with_3d_filter,
            scaling_with_3d_filter,
        )
        import jax.numpy as jnp

        pts = rng.normal(size=(30, 3)).astype(np.float32)
        cols = rng.uniform(size=(30, 3)).astype(np.float32)
        st = create_from_points(pts, cols, capacity=64)
        st = st.replace(aux=st.aux.replace(filter_3d=jnp.full(64, 0.3)))
        path = str(tmp_path / "scene.splat")
        save_splat(st, path)
        assert os.path.getsize(path) == 30 * 32

        back = load_splat(path)
        # positions are exact f32; order is importance-sorted, so match sets
        lex = lambda a: np.lexsort(a.T)  # noqa: E731
        np.testing.assert_array_equal(back["xyz"][lex(back["xyz"])],
                                      pts[lex(pts)])
        order = lex(back["xyz"])
        src = lex(pts)
        # scales carry the baked 3D filter (exact f32)
        want_scale = np.asarray(
            scaling_with_3d_filter(st.params, st.aux.filter_3d))[:30]
        np.testing.assert_allclose(back["scale"][order], want_scale[src],
                                   rtol=1e-6)
        # color/alpha/rotation are u8-quantized
        want_rgb = np.clip(
            0.5 + SH_C0 * np.asarray(st.params.features_dc)[:30, 0], 0, 1)
        np.testing.assert_allclose(back["rgb"][order], want_rgb[src],
                                   atol=1.0 / 255)
        want_op = np.asarray(
            opacity_with_3d_filter(st.params, st.aux.filter_3d))[:30]
        np.testing.assert_allclose(back["opacity"][order], want_op[src],
                                   atol=1.0 / 255)
        q = back["rotation"]
        np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=0.05)
        # importance-sorted for progressive web loading
        imp = back["opacity"] * back["scale"].prod(axis=1)
        assert (np.diff(imp) <= 1e-6).all()


class TestCheckpoint:
    def test_roundtrip(self, rng, tmp_path):
        from skyfall_gs_tpu.model.gaussians import create_from_points
        from skyfall_gs_tpu.train.checkpoint import load_checkpoint, save_checkpoint
        from skyfall_gs_tpu.train.step import init_train_state
        import jax
        import jax.numpy as jnp

        pts = rng.normal(size=(30, 3)).astype(np.float32)
        cols = rng.uniform(size=(30, 3)).astype(np.float32)
        st = init_train_state(create_from_points(pts, cols, capacity=64))
        st = st.replace(step=jnp.int32(123))
        mu = jax.tree.map(lambda x: x + 0.5, st.opt.mu)
        st = st.replace(opt=st.opt.replace(mu=mu))
        path = str(tmp_path / "ck.npz")
        save_checkpoint(path, st, 123)

        template = init_train_state(create_from_points(pts * 0, cols, capacity=64))
        back, it = load_checkpoint(path, template)
        assert it == 123
        np.testing.assert_allclose(np.asarray(back.model.params.xyz),
                                   np.asarray(st.model.params.xyz))
        np.testing.assert_allclose(np.asarray(back.opt.mu.xyz),
                                   np.asarray(st.opt.mu.xyz))
        assert int(back.step) == 123


def _make_multiscale_fixture(root, rng, size=32):
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    meta = {"train": {"file_path": [], "cam2world": [], "focal": []},
            "test": {"file_path": [], "cam2world": [], "focal": []}}
    for split, n in (("train", 3), ("test", 2)):
        for i in range(n):
            for d, div in ((0, 1), (1, 2)):
                name = f"{split}_{i}_d{d}.png"
                s = size // div
                img = rng.uniform(0, 255, (s, s, 4)).astype(np.uint8)
                Image.fromarray(img, "RGBA").save(os.path.join(root, name))
                c2w = np.eye(4)
                c2w[:3, 3] = [3.0 + i, 0.0, 1.0]
                meta[split]["file_path"].append(name)
                meta[split]["cam2world"].append(c2w.tolist())
                meta[split]["focal"].append(40.0 / div)
    with open(os.path.join(root, "metadata.json"), "w") as f:
        json.dump(meta, f)
    return root


class TestMultiScale:
    def test_reader_highres_filtering(self, tmp_path, rng):
        from skyfall_gs_tpu.io.readers import read_multiscale_scene

        root = _make_multiscale_fixture(str(tmp_path / "ms"), rng)
        raw = read_multiscale_scene(root, eval_split=True)
        # only d0 images for train, all scales for test
        assert len(raw.train_cameras) == 3
        assert len(raw.test_cameras) == 4
        assert raw.train_cameras[0].image.shape == (32, 32, 3)

        raw_all = read_multiscale_scene(root, eval_split=True,
                                        load_allres=True)
        assert len(raw_all.train_cameras) == 6

    def test_detect(self, tmp_path, rng):
        from skyfall_gs_tpu.io.readers import detect_scene_type

        root = _make_multiscale_fixture(str(tmp_path / "ms2"), rng)
        assert detect_scene_type(root) == "multiscale"
