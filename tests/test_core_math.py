"""Golden tests for SH, transforms, and camera math."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skyfall_gs_tpu.core.sh import SH_C0, eval_sh, rgb_to_sh, sh_basis, sh_to_rgb
from skyfall_gs_tpu.core.transforms import (
    build_scaling_rotation,
    covariance_from_scaling_rotation,
    covariance_to_symm6,
    focal_to_fov,
    fov_to_focal,
    projection_matrix,
    quat_to_rotmat,
    symm6_to_covariance,
    world_to_view,
)
from skyfall_gs_tpu.core.camera import Camera, camera_from_c2w, look_at_c2w, make_camera, orbit_cameras


class TestSH:
    def test_dc_only(self, rng):
        sh = jnp.zeros((5, 3, 16))
        sh = sh.at[:, :, 0].set(jnp.asarray(rng.normal(size=(5, 3))))
        dirs = jnp.asarray(rng.normal(size=(5, 3)))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = eval_sh(3, sh, dirs)
        np.testing.assert_allclose(out, SH_C0 * sh[:, :, 0], rtol=1e-6)

    def test_orthonormality(self, rng):
        # Monte-Carlo: int Y_i Y_j dOmega = delta_ij (degree <= 3)
        n = 200_000
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        basis = np.asarray(sh_basis(3, jnp.asarray(v, jnp.float32)))
        gram = basis.T @ basis / n * (4 * math.pi)
        np.testing.assert_allclose(gram, np.eye(16), atol=0.15)

    def test_rgb_sh_roundtrip(self, rng):
        rgb = jnp.asarray(rng.uniform(size=(7, 3)).astype(np.float32))
        np.testing.assert_allclose(sh_to_rgb(rgb_to_sh(rgb)), rgb, atol=1e-6)

    def test_degree4_supported(self, rng):
        dirs = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        assert sh_basis(4, dirs).shape == (4, 25)


class TestQuaternions:
    def test_identity(self):
        r = quat_to_rotmat(jnp.asarray([[1.0, 0, 0, 0]]))
        np.testing.assert_allclose(r[0], np.eye(3), atol=1e-6)

    def test_orthogonal(self, rng):
        q = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
        r = np.asarray(quat_to_rotmat(q))
        for i in range(10):
            np.testing.assert_allclose(r[i] @ r[i].T, np.eye(3), atol=1e-5)
            assert np.linalg.det(r[i]) == pytest.approx(1.0, abs=1e-5)

    def test_z_rotation(self):
        # 90 deg about z: w = cos(45), z = sin(45)
        c = math.cos(math.pi / 4)
        r = np.asarray(quat_to_rotmat(jnp.asarray([[c, 0, 0, c]])))[0]
        np.testing.assert_allclose(r @ np.array([1.0, 0, 0]),
                                   np.array([0.0, 1, 0]), atol=1e-6)


class TestCovariance:
    def test_diagonal_for_identity_rotation(self):
        s = jnp.asarray([[1.0, 2.0, 3.0]])
        q = jnp.asarray([[1.0, 0, 0, 0]])
        cov = covariance_from_scaling_rotation(s, q)[0]
        np.testing.assert_allclose(cov, np.diag([1.0, 4.0, 9.0]), atol=1e-5)

    def test_psd_and_roundtrip(self, rng):
        s = jnp.asarray(np.exp(rng.normal(size=(20, 3))).astype(np.float32))
        q = jnp.asarray(rng.normal(size=(20, 4)).astype(np.float32))
        cov = covariance_from_scaling_rotation(s, q)
        eig = np.linalg.eigvalsh(np.asarray(cov))
        assert (eig > 0).all()
        np.testing.assert_allclose(
            symm6_to_covariance(covariance_to_symm6(cov)), cov, atol=1e-6)


class TestProjection:
    def test_fov_focal_roundtrip(self):
        assert focal_to_fov(fov_to_focal(1.0, 640), 640) == pytest.approx(1.0)

    def test_projection_center_point(self):
        # a point on the optical axis at depth d projects to ndc (cx, cy)
        p = projection_matrix(0.01, 100.0, 1.0, 1.0, cx=0.25, cy=-0.5)
        pt = p @ np.array([0.0, 0.0, 10.0, 1.0])
        ndc = pt[:3] / pt[3]
        assert ndc[0] == pytest.approx(0.25)
        assert ndc[1] == pytest.approx(-0.5)

    def test_world_to_view_roundtrip(self, rng):
        from scipy.spatial.transform import Rotation

        R_w2c = Rotation.random(random_state=0).as_matrix()
        t = rng.normal(size=3)
        w2c = world_to_view(R_w2c.T, t)  # loader convention: R transposed
        p = rng.normal(size=3)
        expected = R_w2c @ p + t
        got = (w2c @ np.append(p, 1.0))[:3]
        np.testing.assert_allclose(got, expected, atol=1e-5)


class TestCamera:
    def test_camera_center(self):
        cam = camera_from_c2w(look_at_c2w([3, 2, 1], [0, 0, 0]),
                              1.0, 1.0, 64, 64)
        np.testing.assert_allclose(np.asarray(cam.cam_center),
                                   [3, 2, 1], atol=1e-4)

    def test_look_at_forward(self):
        # COLMAP convention: +z camera axis points at the target
        c2w = look_at_c2w([5, 0, 0], [0, 0, 0])
        fwd = c2w[:3, 2]
        np.testing.assert_allclose(fwd, [-1, 0, 0], atol=1e-6)

    def test_orbit_cameras_ring(self):
        cams = orbit_cameras([0, 0, 0], 45.0, 100.0, num_cams=4,
                             num_samples=2, width=64, height=64)
        assert len(cams) == 8
        for c in cams:
            center = np.asarray(c.cam_center)
            assert np.linalg.norm(center) == pytest.approx(100.0, rel=1e-5)
            assert center[2] == pytest.approx(100.0 * math.sin(math.radians(45)),
                                              rel=1e-5)
        # uids are 1000 + flat index
        assert int(cams[0].uid) == 1000 and int(cams[7].uid) == 1007

    def test_stackable_pytree(self):
        cams = orbit_cameras([0, 0, 0], 45.0, 100.0, num_cams=3, width=32,
                             height=32)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
        assert stacked.world_view.shape == (3, 4, 4)
        one = jax.tree.map(lambda x: x[1], stacked)
        np.testing.assert_allclose(one.cam_center, cams[1].cam_center)
