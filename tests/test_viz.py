"""Viz-layer tests: trajectory JSON roundtrip, colormap, video writing."""

import json
import os

import numpy as np
import pytest


class TestPaths:
    def test_orbit_path_roundtrip(self, tmp_path):
        from skyfall_gs_tpu.viz.paths import load_trajectory, save_orbit_path

        p = str(tmp_path / "path.json")
        save_orbit_path(p, [1.0, 2.0, 0.5], elevation_deg=45.0, radius=100.0,
                        num_frames=12, fov_deg=60.0, width=64, height=48,
                        fps=30)
        cams, radius, fps = load_trajectory(p)
        assert len(cams) == 12 and fps == 30
        assert radius == pytest.approx(100.0)
        for cam in cams:
            center = np.asarray(cam.cam_center)
            d = np.linalg.norm(center - np.array([1.0, 2.0, 0.5]))
            assert d == pytest.approx(100.0, rel=1e-4)
            assert cam.width == 64 and cam.height == 48
        # cameras look at the target: the view-space position of the target
        # is on the optical axis
        cam = cams[3]
        wv = np.asarray(cam.world_view)
        t = wv[:3, :3] @ np.array([1.0, 2.0, 0.5]) + wv[:3, 3]
        assert abs(t[0]) < 1e-3 and abs(t[1]) < 1e-3 and t[2] > 0

    def test_ges_conversion(self):
        from skyfall_gs_tpu.viz.paths import ges_to_orbit

        ele, rad = ges_to_orbit(100.0, alt_target=0.0, alt_camera=100.0)
        assert ele == pytest.approx(45.0)
        assert rad == pytest.approx(100.0 * np.sqrt(2))


class TestColormap:
    def test_colorize_depth(self, rng):
        from skyfall_gs_tpu.viz.colormap import colorize_depth

        d = rng.uniform(1, 10, (16, 16)).astype(np.float32)
        out = colorize_depth(d)
        assert out.shape == (16, 16, 3)
        assert out.min() >= 0 and out.max() <= 1

    def test_mask_zeroes(self, rng):
        from skyfall_gs_tpu.viz.colormap import colorize_depth

        d = rng.uniform(1, 10, (8, 8)).astype(np.float32)
        mask = np.zeros((8, 8))
        mask[:4] = 1
        out = colorize_depth(d, mask=mask)
        assert (out[4:] == 0).all()


class TestVideo:
    def test_write_video_roundtrip(self, tmp_path, rng):
        from skyfall_gs_tpu.viz.video import write_video
        from skyfall_gs_tpu.eval.photometric import extract_frames

        # smooth gradients (codecs butcher pure noise at tiny resolutions)
        g = np.linspace(0.2, 0.8, 32, dtype=np.float32)
        base = np.stack([np.tile(g, (32, 1))] * 3, -1)
        frames = [np.clip(base + 0.02 * i, 0, 1) for i in range(5)]
        p = str(tmp_path / "v.mp4")
        write_video(p, frames, fps=10)
        assert os.path.exists(p)
        back = extract_frames(p, 5)
        assert len(back) == 5
        assert np.abs(back[0] - frames[0]).mean() < 0.05


class TestColmapBinary:
    def test_read_binary_formats(self, tmp_path, rng):
        """Hand-craft COLMAP binary files and parse them."""
        import struct

        from skyfall_gs_tpu.io.colmap import (
            read_cameras_binary,
            read_images_binary,
            read_points3d_binary,
        )

        cp = tmp_path / "cameras.bin"
        with open(cp, "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<iiQQ", 1, 1, 640, 480))  # PINHOLE
            f.write(struct.pack("<dddd", 500.0, 510.0, 320.0, 240.0))
        cams = read_cameras_binary(str(cp))
        assert cams[1].model == "PINHOLE"
        assert cams[1].params[1] == 510.0

        ip = tmp_path / "images.bin"
        with open(ip, "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<idddddddi", 7, 1.0, 0.0, 0.0, 0.0,
                                1.0, 2.0, 3.0, 1))
            f.write(b"img0.png\x00")
            f.write(struct.pack("<Q", 2))           # two 2D points
            f.write(struct.pack("<ddq", 1.0, 2.0, -1))
            f.write(struct.pack("<ddq", 3.0, 4.0, 5))
        imgs = read_images_binary(str(ip))
        assert imgs[7].name == "img0.png"
        np.testing.assert_allclose(imgs[7].tvec, [1.0, 2.0, 3.0])

        pp = tmp_path / "points3D.bin"
        with open(pp, "wb") as f:
            f.write(struct.pack("<Q", 2))
            for i in range(2):
                f.write(struct.pack("<QdddBBBd", i, 1.0 * i, 2.0, 3.0,
                                    10, 20, 30, 0.5))
                f.write(struct.pack("<Q", 1))
                f.write(struct.pack("<ii", 7, 0))
        xyz, rgb, err = read_points3d_binary(str(pp))
        assert xyz.shape == (2, 3)
        np.testing.assert_allclose(rgb[0], [10, 20, 30])
