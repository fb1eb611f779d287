"""Evaluation-suite tests: DSMR registration, DSM metrics, patchify, MMD."""

import numpy as np
import pytest

import jax.numpy as jnp

from skyfall_gs_tpu.eval import dsmr
from skyfall_gs_tpu.eval.cmmd import mmd
from skyfall_gs_tpu.eval.geometry import (
    compute_dsm_metrics,
    depth_to_point_cloud,
    enu_to_utm,
    latlon_to_utm,
    rasterize_dsm,
    register_dsms,
)
from skyfall_gs_tpu.eval.photometric import (
    frechet_distance,
    paired_metrics,
    patchify,
    summarize,
)


class TestDSMR:
    def test_recovers_known_shift(self, rng):
        base = rng.normal(0, 1, (160, 160)).astype(np.float64)
        import scipy.ndimage as ndi

        base = ndi.gaussian_filter(base, 3)
        # v shifted so that v[j+dy, i+dx] == u[j, i]
        dx, dy = 4, -3
        v = np.full_like(base, np.nan)
        u = base
        vsrc = np.roll(np.roll(base, dy, axis=0), dx, axis=1)
        v = vsrc * 2.0 + 5.0  # affine z transform
        got = dsmr.compute_shift_arrays(u, v, scaling=True)
        assert (got[0], got[1]) == (dx, dy)
        assert got[2] == pytest.approx(0.5, rel=0.05)

    def test_apply_shift_inverts(self, rng):
        import scipy.ndimage as ndi

        u = ndi.gaussian_filter(rng.normal(0, 1, (64, 64)), 2)
        v = np.roll(u, 2, axis=1) * 3.0 - 1.0
        dx, dy, a, b = dsmr.compute_shift_arrays(u, v)
        reg = dsmr.apply_shift_arrays(v, dx, dy, a, b)
        m = np.isfinite(reg)
        assert np.abs(reg[m] - u[m]).mean() < 0.05

    def test_downsample_nan_aware(self):
        u = np.ones((1, 4, 4))
        u[0, 0, 0] = np.nan
        d = dsmr.downsample2x(u)
        assert d.shape == (1, 2, 2)
        np.testing.assert_allclose(d[0], 1.0)


class TestGeometry:
    def test_latlon_to_utm_known_points(self):
        # published test vectors
        e, n, zone, letter = latlon_to_utm(40.71435, -74.00597)  # NYC
        assert (zone, letter) == (18, "T")
        assert e == pytest.approx(583960, abs=2)
        assert n == pytest.approx(4507523, abs=2)
        e, n, zone, letter = latlon_to_utm(47.9941214, 7.8509671)  # Freiburg
        assert (zone, letter) == (32, "T")
        assert e == pytest.approx(414278, abs=2)
        assert n == pytest.approx(5316286, abs=2)
        # central-meridian sanity
        e, n, zone, _ = latlon_to_utm(0.0, 3.0)
        assert (e, n, zone) == (500000.0, 0.0, 31)

    def test_backprojection_roundtrip(self):
        # a flat plane at depth 10, identity camera
        h = w = 16
        depth = np.full((h, w), 10.0)
        pts = depth_to_point_cloud(depth, np.eye(3), np.zeros(3),
                                   focal_x=20.0, focal_y=20.0)
        assert pts.shape == (h * w, 3)
        np.testing.assert_allclose(pts[:, 2], 10.0)
        # center pixel maps near the optical axis
        center = pts.reshape(h, w, 3)[h // 2, w // 2]
        assert abs(center[0]) < 10 / 20 * 1.1

    def test_dsm_rasterize_max(self):
        pts = np.array([[0.5, 0.5, 1.0], [0.5, 0.5, 3.0], [2.5, 1.5, 2.0]])
        # roi: xoff=0, yoff=0 (pre-shift), size 4, res 1
        dsm = rasterize_dsm(pts, 0.0, 0.0, 4, 1.0)
        # yoff becomes 4; row = 4 - north
        assert dsm[3, 0] == 3.0  # max of the two stacked points
        assert dsm[2, 2] == 2.0
        assert np.isnan(dsm[0, 0])

    def test_metrics(self):
        gt = np.array([[1.0, 2.0], [3.0, np.nan]])
        pred = np.array([[1.5, 2.0], [np.nan, 4.0]])
        m = compute_dsm_metrics(pred, gt)
        assert m["mae"] == pytest.approx(0.25)
        assert m["completeness"] == pytest.approx(2 / 3)

    def test_register_and_score(self, rng):
        import scipy.ndimage as ndi

        gt = ndi.gaussian_filter(rng.normal(0, 5, (128, 128)), 4) + 100
        pred = np.roll(gt, 2, axis=1) + 7.0  # shifted + offset
        reg, shift = register_dsms(pred, gt)
        m = compute_dsm_metrics(reg, gt)
        assert m["mae"] < 0.2
        assert abs(shift["b"] + 7.0) < 0.5

    def test_enu_to_utm_shift(self):
        pts = np.array([[10.0, 20.0, 5.0]])
        out = enu_to_utm(pts, [30.0, -81.0, 2.0])
        e, n, _, _ = latlon_to_utm(30.0, -81.0)
        np.testing.assert_allclose(out[0], [e + 10, n + 20, 7.0])


class TestPhotometric:
    def test_patchify_min_grid(self, rng):
        img = rng.uniform(size=(1024, 1024, 3)).astype(np.float32)
        patches = patchify(img, 512, (9, 16))
        assert len(patches) >= 9 * 16
        assert patches[0].shape == (512, 512, 3)

    def test_patchify_small_image_empty(self, rng):
        assert patchify(rng.uniform(size=(100, 100, 3)), 512) == []

    def test_paired_metrics_identical(self, rng):
        f = [rng.uniform(size=(32, 32, 3)).astype(np.float32)]
        m = paired_metrics(f, f)
        assert m["psnr"] > 50
        assert m["ssim"] == pytest.approx(1.0, abs=1e-4)

    def test_summarize(self):
        rows = [{"psnr": 20.0}, {"psnr": 22.0}]
        s = summarize(rows, ["psnr"])
        assert s["psnr"].startswith("21.0")


class TestMMD:
    def test_identical_sets_zero(self, rng):
        x = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
        assert float(mmd(x, x)) == pytest.approx(0.0, abs=1e-3)

    def test_separated_sets_positive(self, rng):
        x = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
        y = x + 3.0
        assert float(mmd(x, y)) > 10.0

    def test_matches_reference_formula(self, rng):
        x = rng.normal(size=(20, 8)).astype(np.float64)
        y = rng.normal(size=(20, 8)).astype(np.float64)
        gamma = 1.0 / 200.0

        def k(a, b):
            d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
            return np.exp(-gamma * d2).mean()

        ref = 1000.0 * (k(x, x) + k(y, y) - 2 * k(x, y))
        got = float(mmd(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)))
        assert got == pytest.approx(ref, rel=1e-3)

    def test_frechet_zero_for_same_distribution(self, rng):
        x = rng.normal(size=(500, 8))
        fd = frechet_distance(x, x)
        assert abs(fd) < 1e-6


class TestSatUtils:
    def test_ecef_roundtrip(self, rng):
        from skyfall_gs_tpu.eval.sat_utils import ecef_to_latlon, latlon_to_ecef

        lat, lon, alt = 30.35, -81.66, 25.0
        x, y, z = latlon_to_ecef(lat, lon, alt)
        la2, lo2, al2 = ecef_to_latlon(x, y, z)
        assert float(la2) == pytest.approx(lat, abs=1e-7)
        assert float(lo2) == pytest.approx(lon, abs=1e-7)
        assert float(al2) == pytest.approx(alt, abs=1e-3)

    def test_rpc_rescale(self):
        from skyfall_gs_tpu.eval.sat_utils import RPCModel, rescale_rpc, rpc_scaling_params

        rpc = RPCModel(row_scale=100.0, row_offset=50.0,
                       col_scale=200.0, col_offset=100.0)
        r2 = rescale_rpc(rpc, 0.5)
        assert r2.row_scale == 50.0 and r2.col_offset == 50.0
        assert rpc.row_scale == 100.0  # original untouched
        s, o = rpc_scaling_params([2.0, 10.0])
        assert (s, o) == (4.0, 6.0)

    def test_dsm_pointwise_diff(self, rng):
        import scipy.ndimage as ndi
        from skyfall_gs_tpu.eval.sat_utils import dsm_pointwise_diff

        gt = ndi.gaussian_filter(rng.normal(0, 5, (120, 120)), 4) + 30
        pred = np.roll(gt, 3, axis=1) - 2.0
        reg, err, info = dsm_pointwise_diff(pred, gt)
        assert info["mae"] < 0.2
        assert err.shape == gt.shape
