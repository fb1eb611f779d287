"""Rasterizer tests: projection analytics, oracle sanity, tiled parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skyfall_gs_tpu.core.camera import camera_from_c2w, look_at_c2w
from skyfall_gs_tpu.ops.binning import bin_gaussians, num_tiles
from skyfall_gs_tpu.ops.projection import project_gaussians
from skyfall_gs_tpu.ops.rasterize import rasterize
from tests.conftest import make_random_splats, make_test_camera


def _splat_args(rng, n=80):
    d = make_random_splats(rng, n)
    return (d["means3d"], d["scales"], d["quats"], d["opacities"], d["colors"])


class TestProjection:
    def test_center_projects_to_image_center(self):
        cam = make_test_camera(64, 64, eye=(0.0, -5.0, 0.0))
        means = jnp.asarray([[0.0, 0.0, 0.0]])
        proj = project_gaussians(
            means, jnp.full((1, 3), 0.05), jnp.asarray([[1.0, 0, 0, 0]]),
            jnp.ones(1), cam)
        # target point is on the optical axis -> pixel center (W-1)/2
        np.testing.assert_allclose(proj.mean2d[0], [31.5, 31.5], atol=1e-3)
        assert float(proj.depth[0]) == pytest.approx(5.0, rel=1e-5)
        assert int(proj.radius[0]) > 0

    def test_behind_camera_culled(self):
        cam = make_test_camera(32, 32, eye=(0.0, -5.0, 0.0))
        means = jnp.asarray([[0.0, -10.0, 0.0]])  # behind the eye
        proj = project_gaussians(
            means, jnp.full((1, 3), 0.05), jnp.asarray([[1.0, 0, 0, 0]]),
            jnp.ones(1), cam)
        assert int(proj.radius[0]) == 0

    def test_mask_culls(self, rng):
        cam = make_test_camera()
        args = _splat_args(rng, 40)
        proj = project_gaussians(args[0], args[1], args[2], args[3], cam,
                                 mask=jnp.zeros(40, bool))
        assert int(jnp.sum(proj.radius)) == 0

    def test_mip_compensation_shrinks_small_splats(self):
        cam = make_test_camera(64, 64, eye=(0.0, -5.0, 0.0))
        tiny = project_gaussians(
            jnp.zeros((1, 3)), jnp.full((1, 3), 1e-4),
            jnp.asarray([[1.0, 0, 0, 0]]), jnp.ones(1), cam, kernel_size=0.1)
        big = project_gaussians(
            jnp.zeros((1, 3)), jnp.full((1, 3), 0.5),
            jnp.asarray([[1.0, 0, 0, 0]]), jnp.ones(1), cam, kernel_size=0.1)
        assert float(tiny.compensation[0]) < 0.1
        assert float(big.compensation[0]) > 0.9


class TestOracle:
    def test_opaque_splat_renders_its_color(self):
        cam = make_test_camera(32, 32, eye=(0.0, -3.0, 0.0))
        out = rasterize(
            jnp.zeros((1, 3)), jnp.full((1, 3), 0.5),
            jnp.asarray([[1.0, 0, 0, 0]]), jnp.asarray([4.0]),  # alpha clamped
            jnp.asarray([[0.2, 0.5, 0.9]]), cam, bg=jnp.zeros(3),
            backend="reference")
        center = np.asarray(out.color[16, 16])
        # alpha clamps at 0.99 -> color ~= 0.99 * c
        np.testing.assert_allclose(center, 0.99 * np.array([0.2, 0.5, 0.9]),
                                   atol=5e-3)
        assert float(out.alpha[16, 16]) == pytest.approx(0.99, abs=1e-3)
        assert float(out.depth[16, 16]) == pytest.approx(3.0, rel=1e-2)

    def test_background_composited(self, rng):
        cam = make_test_camera()
        out = rasterize(*_splat_args(rng, 5), cam, bg=jnp.asarray([1.0, 0, 0]),
                        backend="reference")
        # far corners should be mostly background
        corner = np.asarray(out.color[0, 0])
        assert corner[0] > corner[1]

    def test_front_to_back_order(self):
        cam = make_test_camera(32, 32, eye=(0.0, -5.0, 0.0))
        # red splat in front (y=-1), green behind (y=+1), both opaque-ish
        means = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]])
        out = rasterize(
            means, jnp.full((2, 3), 0.5), jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1)),
            jnp.asarray([0.9, 0.9]), jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]]),
            cam, bg=jnp.zeros(3), backend="reference")
        c = np.asarray(out.color[16, 16])
        assert c[0] > c[1]  # red (closer) dominates


class TestBinning:
    def test_counts_and_alignment(self, rng):
        cam = make_test_camera(64, 48)
        args = _splat_args(rng, 60)
        proj = project_gaussians(args[0], args[1], args[2], args[3], cam)
        binned = bin_gaussians(proj.mean2d, proj.depth, proj.radius,
                               48, 64, cap=4096, chunk=256)
        ty, tx = num_tiles(48, 64)
        assert binned.tile_start.shape == (ty * tx,)
        starts = np.asarray(binned.tile_start)
        counts = np.asarray(binned.tile_count)
        # contiguous runs in sorted order
        assert (starts[1:] == starts[:-1] + counts[:-1]).all()
        assert counts.sum() <= int(binned.num_entries)
        assert int(binned.overflow) == 0
        # training write plan: a tile's first chunk block is "fresh" iff no
        # earlier tile's chunk coverage reaches it (else the backward kernel
        # accumulates instead of overwriting)
        base = (starts // 256) * 256
        off0 = starts - base
        nchunks = np.where(counts > 0, -(-(off0 + counts) // 256), 0)
        cov_end = np.where(counts > 0, base + nchunks * 256, 0)
        cov_prev = np.concatenate([[0], np.maximum.accumulate(cov_end)[:-1]])
        fresh = np.asarray(binned.write_fresh)
        np.testing.assert_array_equal(fresh, (base >= cov_prev).astype(np.int32))
        # at least one shared boundary exists in this scene (the accumulate
        # path is exercised)
        assert (fresh == 0).any()

    def test_depth_sorted_within_tile(self, rng):
        cam = make_test_camera(32, 32)
        args = _splat_args(rng, 60)
        proj = project_gaussians(args[0], args[1], args[2], args[3], cam)
        binned = bin_gaussians(proj.mean2d, proj.depth, proj.radius,
                               32, 32, cap=4096, chunk=256)
        depth = np.asarray(proj.depth)
        gi = np.asarray(binned.gather_idx)
        for t in range(4):
            s, c = int(binned.tile_start[t]), int(binned.tile_count[t])
            d = depth[gi[s:s + c]]
            quant = (d.max() - d.min() + 1e-9) / (2 ** 18)
            assert (np.diff(d) >= -quant).all()


@pytest.mark.slow
class TestTiledParity:
    def test_forward_matches_oracle(self, rng):
        cam = make_test_camera(32, 32)
        args = _splat_args(rng, 80)
        a = rasterize(*args, cam, bg=jnp.zeros(3), backend="reference")
        b = rasterize(*args, cam, bg=jnp.zeros(3), backend="tiled")
        assert float(jnp.max(jnp.abs(a.color - b.color))) < 2e-2
        assert float(jnp.mean(jnp.abs(a.color - b.color))) < 1e-3
        assert float(jnp.max(jnp.abs(a.alpha - b.alpha))) < 2e-2
        assert float(jnp.max(jnp.abs(a.depth - b.depth))) < 5e-2

    def test_gradients_match_oracle(self, rng):
        cam = make_test_camera(32, 32)
        args = _splat_args(rng, 60)

        def loss(backend, *xs):
            out = rasterize(*xs, cam, bg=jnp.zeros(3), backend=backend)
            return jnp.sum(out.color ** 2) + jnp.sum(out.alpha)

        ga = jax.grad(lambda *xs: loss("reference", *xs), argnums=(0, 1, 2, 3, 4))(*args)
        gb = jax.grad(lambda *xs: loss("tiled", *xs), argnums=(0, 1, 2, 3, 4))(*args)
        for a, b in zip(ga, gb):
            scale = float(jnp.max(jnp.abs(a))) + 1e-6
            assert float(jnp.max(jnp.abs(a - b))) / scale < 3e-2

    def test_gradients_match_oracle_multichunk_mixed_sign(self, rng):
        """Regression: >CHUNK entries per tile with a mixed-sign cotangent.

        The backward kernel carries the prefix sum Q = cumsum(w * (c . dC))
        across chunk boundaries; Q is NOT monotone when dC has negative
        components, so any max-based carry corrupts geometry/opacity grads
        from the second chunk onward (color grads bypass Q and would still
        match).  Needs >128 entries in one tile to exercise the carry.
        """
        from skyfall_gs_tpu.ops.rasterize_tiled import CHUNK

        cam = make_test_camera(16, 16)  # single 16x16 tile
        n = 3 * CHUNK
        d = make_random_splats(rng, n, spread=0.35, scale_mu=-2.0)
        # low opacities so transmittance survives well past CHUNK entries
        opac = jnp.asarray(rng.uniform(0.02, 0.08, n).astype(np.float32))
        args = (d["means3d"], d["scales"], d["quats"], opac, d["colors"])
        signs = jnp.asarray(
            np.where(rng.uniform(size=(16, 16, 3)) < 0.5, -1.0, 1.0),
            jnp.float32)

        def loss(backend, *xs):
            out = rasterize(*xs, cam, bg=jnp.zeros(3), backend=backend)
            return jnp.sum(out.color * signs) + 0.5 * jnp.sum(out.alpha)

        # sanity: the tile really spans multiple chunks
        from skyfall_gs_tpu.ops.binning import bin_gaussians
        from skyfall_gs_tpu.ops.projection import project_gaussians
        proj = project_gaussians(args[0], args[1], args[2], args[3], cam)
        binned = bin_gaussians(proj.mean2d, proj.depth, proj.radius, 16, 16,
                               cap=4096, chunk=CHUNK)
        assert int(np.asarray(binned.tile_count).max()) > CHUNK

        ga = jax.grad(lambda *xs: loss("reference", *xs),
                      argnums=(0, 1, 2, 3, 4))(*args)
        gb = jax.grad(lambda *xs: loss("tiled", *xs),
                      argnums=(0, 1, 2, 3, 4))(*args)
        for a, b in zip(ga, gb):
            scale = float(jnp.max(jnp.abs(a))) + 1e-6
            assert float(jnp.max(jnp.abs(a - b))) / scale < 3e-2

    def test_no_resume_after_termination_at_chunk_boundary(self):
        """Regression: compositing must NOT resume past transmittance
        termination (reference CUDA sets a permanent done flag once
        T drops below T_EPS; the oracle's keep is a prefix property of the
        TRUE cumulative product, rasterize_ref.py:61-66).

        Adversarial layout: 127 fillers bring T to ~0.0099 inside chunk 0
        (all kept), lane 127 is an ALPHA_MAX blocker whose t_after ~9.9e-5
        < T_EPS (skipped -> terminated) — exactly at the chunk boundary.
        A frozen-only transmittance carry discards the blocker's factor,
        resumes compositing the bright chunk-1 entries (~1e-2 of weight,
        the worst case the ALPHA_MAX clamp allows) and reports the wrong
        T_final; the true-product carry matches the oracle to f32 noise.
        """
        from skyfall_gs_tpu.ops.rasterize_ref import composite_reference
        from skyfall_gs_tpu.ops.rasterize_tiled import CHUNK, composite_tiled

        h = w = 16  # single tile
        n_fill = CHUNK - 1
        alpha_fill = 1.0 - np.exp(np.log(0.0099) / n_fill)
        n_ghost = CHUNK
        n = n_fill + 1 + n_ghost
        mean2d = jnp.tile(jnp.asarray([[8.0, 8.0]], jnp.float32), (n, 1))
        conic = jnp.tile(jnp.asarray([[0.002, 0.0, 0.002]], jnp.float32),
                         (n, 1))
        depth = jnp.arange(1, n + 1, dtype=jnp.float32)
        radius = jnp.full((n,), 20.0, jnp.float32)
        opacity = jnp.asarray(np.concatenate([
            np.full((n_fill,), alpha_fill, np.float32),
            np.array([0.99], np.float32),
            np.full((n_ghost,), 0.5, np.float32),
        ]))
        channels = np.zeros((n, 7), np.float32)
        channels[:n_fill + 1, :3] = 0.1
        channels[n_fill + 1:, :3] = 1.0   # resumed entries would glow
        channels = jnp.asarray(channels)

        out_ref, t_ref = composite_reference(
            mean2d, conic, depth, radius, opacity, channels, h, w)
        out_t, t_t, ovf = composite_tiled(
            mean2d, conic, depth, radius, opacity, channels, h, w, cap=8192)
        assert int(ovf) == 0
        np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_ref),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t_t), np.asarray(t_ref),
                                   rtol=0, atol=1e-5)
        # the frozen T_final really is the interesting value here
        assert 0.009 < float(np.asarray(t_ref)[8, 8]) < 0.011

    def test_early_exit_zero_fills_skipped_gradient_blocks(self):
        """Early termination now actually fires (true-product carry): a
        tile whose every pixel saturates in block 0 must (a) match the
        oracle, and (b) write EXACT ZERO gradients for all post-
        termination entries — the backward kernel's zfill path writes the
        skipped blocks, previously dead code.  Uniform huge-conic splats
        make all 256 pixels saturate together, so the while cond goes
        false with several blocks left."""
        from skyfall_gs_tpu.ops.rasterize_ref import composite_reference
        from skyfall_gs_tpu.ops.rasterize_tiled import BLOCK, composite_tiled

        h = w = 16
        n_wall = 64           # alpha .5 wall: T < 1e-4 after ~45 entries
        n_tail = 3 * BLOCK    # several full blocks past termination
        n = n_wall + n_tail
        mean2d = jnp.tile(jnp.asarray([[8.0, 8.0]], jnp.float32), (n, 1))
        conic = jnp.tile(jnp.asarray([[1e-4, 0.0, 1e-4]], jnp.float32),
                         (n, 1))  # flat across the tile: alpha ~ opacity
        depth = jnp.arange(1, n + 1, dtype=jnp.float32)
        radius = jnp.full((n,), 30.0, jnp.float32)
        opacity = jnp.full((n,), 0.5, jnp.float32)
        channels = jnp.tile(
            jnp.asarray([[0.3, 0.6, 0.9, 1.0, 0.1, 0.2, 0.3]], jnp.float32),
            (n, 1))

        def run(backend_fn, m2, con, opa, chn):
            out, tfin, *_ = backend_fn(m2, con, depth, radius, opa, chn,
                                       h, w)
            return out, tfin

        out_ref, t_ref = run(composite_reference, mean2d, conic, opacity,
                             channels)
        tiled = lambda m2, con, opa, chn: composite_tiled(
            m2, con, depth, radius, opa, chn, h, w, cap=4096)[:2]
        out_t, t_t = tiled(mean2d, conic, opacity, channels)
        np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_ref),
                                   rtol=0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t_t), np.asarray(t_ref),
                                   rtol=0, atol=1e-6)

        def loss(m2, con, opa, chn):
            out, tfin = tiled(m2, con, opa, chn)
            return jnp.sum(out) + jnp.sum(tfin)

        g = jax.grad(loss, argnums=(0, 1, 2, 3))(mean2d, conic, opacity,
                                                 channels)
        for gi in g:
            assert np.isfinite(np.asarray(gi)).all()
        # entries far past termination: exactly zero gradient in every row
        for gi in g:
            tail = np.asarray(gi)[n_wall + BLOCK:]
            assert (tail == 0.0).all(), "post-termination grads must be 0"
        # live wall entries do carry gradient
        assert np.abs(np.asarray(g[3])[:16]).max() > 0.0

    def test_abs_gradients_nonnegative_and_bound_signed(self, rng):
        cam = make_test_camera(32, 32)
        args = _splat_args(rng, 60)
        n = 60

        def loss(dummies):
            out = rasterize(*args, cam, bg=jnp.zeros(3),
                            mean2d_dummy=dummies[0],
                            mean2d_abs_dummy=dummies[1], backend="tiled")
            return jnp.sum(out.color ** 2)

        g = jax.grad(loss)((jnp.zeros((n, 2)), jnp.zeros((n, 2))))
        signed, absd = np.asarray(g[0]), np.asarray(g[1])
        assert (absd >= -1e-6).all()
        # |sum of per-pixel grads| <= sum of |per-pixel grads|
        assert (np.abs(signed) <= absd + 1e-4).all()
        assert absd.sum() > 0.0

    def test_subpixel_offset_parity(self, rng):
        cam = make_test_camera(32, 32)
        args = _splat_args(rng, 40)
        off = jnp.asarray(rng.uniform(-0.5, 0.5, (32, 32, 2)).astype(np.float32))
        a = rasterize(*args, cam, bg=jnp.zeros(3), subpixel_offset=off,
                      backend="reference")
        b = rasterize(*args, cam, bg=jnp.zeros(3), subpixel_offset=off,
                      backend="tiled")
        assert float(jnp.max(jnp.abs(a.color - b.color))) < 2e-2

    def test_oracle_gradcheck_finite_differences(self, rng):
        # Finite-difference check of the oracle (the analytic spec).
        cam = make_test_camera(16, 16)
        args = _splat_args(rng, 8)

        def f(op):
            return jnp.sum(rasterize(args[0], args[1], args[2], op, args[4],
                                     cam, bg=jnp.zeros(3),
                                     backend="reference").color ** 2)

        op0 = args[3]
        g = jax.grad(f)(op0)
        eps = 1e-3
        for i in range(4):
            e = jnp.zeros_like(op0).at[i].set(eps)
            fd = (f(op0 + e) - f(op0 - e)) / (2 * eps)
            assert float(jnp.abs(fd - g[i])) < 2e-2 * max(1.0, abs(float(fd)))


class TestNaNGuards:
    def test_degenerate_dead_splats_give_finite_grads(self, rng):
        """Dead/culled splats at z ~ 0 or with huge scales must not leak NaN
        gradients into live parameters through zero cotangents."""
        cam = make_test_camera(32, 32, eye=(0.0, -3.0, 0.0))
        n = 16
        d = make_random_splats(rng, n)
        means = np.asarray(d["means3d"]).copy()
        scales = np.asarray(d["scales"]).copy()
        # splat 0: exactly at the camera center (z = 0 in view space)
        means[0] = [0.0, -3.0, 0.0]
        # splat 1: epsilon in front of the near plane
        means[1] = [0.0, -3.0 + 1e-7, 0.0]
        # splat 2: behind the camera with an enormous scale
        means[2] = [0.0, -10.0, 0.0]
        scales[2] = 1e9
        mask = jnp.ones(n, bool).at[3].set(False)  # a dead slot too

        def loss(m, s, o):
            out = rasterize(jnp.asarray(m), jnp.asarray(s), d["quats"],
                            o, d["colors"], cam, bg=jnp.zeros(3),
                            mask=mask, backend="tiled")
            return jnp.sum(out.color ** 2) + jnp.sum(out.depth ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(means, scales, d["opacities"])
        for arr in g:
            assert bool(jnp.all(jnp.isfinite(arr))), "NaN/inf gradient leaked"

    def test_thin_splat_compensation_grads_bounded(self):
        """Near-degenerate 2D covariances (det0 cancellation) must give
        FINITE, BOUNDED compensation gradients on LIVE splats.

        Regression: sqrt(max(det0/det1, 0)) has gradient 0.5/sqrt(x) —
        ~1e6 at x = 1e-12 and inf exactly at the clamp boundary.  Thin
        splats land on either side depending on how XLA fuses the det0
        products; a live splat hitting exact 0 NaN'd xyz/scaling/rotation/
        opacity through Adam (the 256px bench quality run died this way,
        fused-window-phase dependent)."""
        cam = make_test_camera(64, 64, eye=(0.0, -5.0, 0.0))
        # 45 degrees about the VIEW axis (y): the thin axis lies diagonally
        # in the screen plane, so c01 is large and det0 = c00 c11 - c01^2
        # cancels catastrophically as the thin scale shrinks.
        quat = jnp.asarray([[0.9238795, 0.0, 0.3826834, 0.0]])

        def comp_sum(log_thin):
            # extremely anisotropic: thin axis from ~1e-1 to ~1e-18
            scales = jnp.stack([jnp.full_like(log_thin, 0.5),
                                jnp.full_like(log_thin, 0.5),
                                jnp.exp(log_thin)], axis=-1)
            proj = project_gaussians(
                jnp.zeros((log_thin.shape[0], 3)), scales,
                jnp.tile(quat, (log_thin.shape[0], 1)),
                jnp.ones(log_thin.shape[0]), cam, kernel_size=0.1)
            return jnp.sum(proj.compensation), proj.compensation

        log_thin = jnp.asarray(
            [-2.0, -6.0, -10.0, -14.0, -20.0, -27.6, -40.0], jnp.float32)
        (s, comp), g = jax.value_and_grad(comp_sum, has_aux=True)(log_thin)
        g = np.asarray(g)
        assert np.isfinite(g).all(), f"non-finite compensation grads: {g}"
        # the bounded-sqrt floor caps d comp/d ratio at 500; through the
        # log-scale chain the bound is loose — assert a generous ceiling
        assert np.abs(g).max() < 1e4, f"compensation grads unbounded: {g}"
        assert float(comp[0]) > 0.5  # fat splats keep comp ~ 1

        # det0 == EXACT 0: the camera rotation is an exact signed
        # permutation, so a view-aligned rank-deficient covariance makes
        # c00 c11 - c01^2 cancel exactly — the old sqrt(max(x, 0)) clamp
        # boundary, where the gradient was NaN.
        wv = np.asarray(jax.device_get(cam.world_view))
        r = wv[:3, :3]
        v_view = np.array([[1.0, 1.0, 0.0], [1.0, 1.0, 0.0],
                           [0.0, 0.0, 1e-4]], np.float32)
        cov_world = (r.T @ v_view @ r).astype(np.float32)

        def comp_from_cov(cov):
            proj = project_gaussians(
                jnp.zeros((1, 3)), jnp.full((1, 3), 0.1),
                jnp.asarray([[1.0, 0, 0, 0]]), jnp.ones(1), cam,
                kernel_size=0.1, cov3d=cov[None])
            return jnp.sum(proj.compensation)

        gc = np.asarray(jax.grad(comp_from_cov)(jnp.asarray(cov_world)))
        assert np.isfinite(gc).all(), \
            f"NaN compensation grad at exact-singular cov2d: {gc}"

    def test_tiny_scale_filter_opacity_grads_finite(self):
        """prod(s^2) underflow in the 3D-filter compensation must not give
        inf/NaN gradients (same bounded-sqrt guard as projection)."""
        from skyfall_gs_tpu.model.gaussians import (
            GaussianParams, opacity_with_3d_filter)

        def loss(log_s):
            params = GaussianParams(
                xyz=jnp.zeros((log_s.shape[0], 3)),
                features_dc=jnp.zeros((log_s.shape[0], 1, 3)),
                features_rest=jnp.zeros((log_s.shape[0], 0, 3)),
                scaling=jnp.broadcast_to(log_s[:, None], (log_s.shape[0], 3)),
                rotation=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]),
                                  (log_s.shape[0], 1)),
                opacity=jnp.zeros((log_s.shape[0], 1)),
            )
            return jnp.sum(opacity_with_3d_filter(
                params, jnp.full(log_s.shape[0], 0.3)))

        log_s = jnp.asarray([-1.0, -10.0, -20.0, -30.0, -60.0], jnp.float32)
        g = np.asarray(jax.grad(loss)(log_s))
        assert np.isfinite(g).all(), f"non-finite filter-opacity grads: {g}"

    def test_reference_backend_also_finite(self, rng):
        cam = make_test_camera(16, 16, eye=(0.0, -3.0, 0.0))
        d = make_random_splats(rng, 8)
        means = np.asarray(d["means3d"]).copy()
        means[0] = [0.0, -3.0, 0.0]

        def loss(m):
            out = rasterize(jnp.asarray(m), d["scales"], d["quats"],
                            d["opacities"], d["colors"], cam,
                            bg=jnp.zeros(3), backend="reference")
            return jnp.sum(out.color ** 2)

        g = jax.grad(loss)(means)
        assert bool(jnp.all(jnp.isfinite(g)))


class TestCov3DPrecomp:
    def test_precomputed_covariance_matches(self, rng):
        """pipe.compute_cov3D_python parity: passing precomputed 3D
        covariances equals the scales/quats path."""
        from skyfall_gs_tpu.core.transforms import covariance_from_scaling_rotation
        from skyfall_gs_tpu.ops.projection import project_gaussians

        cam = make_test_camera(32, 32)
        d = make_random_splats(rng, 30)
        a = project_gaussians(d["means3d"], d["scales"], d["quats"],
                              d["opacities"], cam)
        cov3d = covariance_from_scaling_rotation(d["scales"], d["quats"])
        b = project_gaussians(d["means3d"], d["scales"], d["quats"],
                              d["opacities"], cam, cov3d=cov3d)
        np.testing.assert_allclose(np.asarray(a.conic), np.asarray(b.conic),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(a.opacity),
                                   np.asarray(b.opacity), rtol=1e-5)


class TestMeasuredCapacity:
    def test_measured_capacity_covers_entries(self, rng):
        """measure_bin_capacity must return at least the worst view's entry
        count (plus margin), so measured renders never overflow — the
        shape-only default drops 80% of entries at 1080p (regression)."""
        from skyfall_gs_tpu.model.gaussians import create_from_points
        from skyfall_gs_tpu.model.render import measure_bin_capacity, render
        from skyfall_gs_tpu.ops.binning import capacity_for_entries

        pts = rng.normal(0, 1.0, (256, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (256, 3)).astype(np.float32)
        state = create_from_points(pts, cols, capacity=256)
        state = state.replace(
            aux=state.aux.replace(filter_3d=jnp.full(256, 0.05)))
        cams = [make_test_camera(48, 64), make_test_camera(96, 128)]
        cap = measure_bin_capacity(state, cams, kernel_size=0.1)
        assert cap == capacity_for_entries(max(
            int(count_entries_for(state, c)) for c in cams))
        # a measured render reports zero overflow on the largest view
        out = render(state, cams[1], jnp.zeros(3), kernel_size=0.1,
                     testing=True, bin_capacity=cap)
        assert int(out.overflow) == 0


def count_entries_for(state, cam):
    from skyfall_gs_tpu.model.gaussians import (
        opacity_with_3d_filter, scaling_with_3d_filter)
    from skyfall_gs_tpu.ops.binning import count_entries

    proj = project_gaussians(
        state.params.xyz, scaling_with_3d_filter(state.params,
                                                 state.aux.filter_3d),
        state.params.rotation,
        opacity_with_3d_filter(state.params, state.aux.filter_3d),
        cam, kernel_size=0.1, mask=state.aux.alive)
    return count_entries(proj.mean2d, proj.radius, cam.height, cam.width,
                         radius_xy=proj.radius_xy)


class TestEntryBudget:
    """Inference-only LOD: cap duplicated (splat, tile) entries.

    Reference capability claim (real-time exploration,
    /root/reference/README.md:25); the TPU-honest LOD axis is entries, not
    splats, because binning gathers and both Pallas kernels price per entry.
    """

    def _render(self, rng, budget=None, n=60):
        cam = make_test_camera(48, 64)
        args = _splat_args(rng, n)
        return rasterize(*args, cam, jnp.zeros(3), inference=True,
                         entry_budget=budget)

    def test_generous_budget_is_lossless(self, rng):
        full = self._render(rng, budget=None)
        rng2 = np.random.default_rng(0)
        capped = self._render(rng2, budget=1 << 20)
        np.testing.assert_allclose(np.asarray(capped.color),
                                   np.asarray(full.color), atol=1e-5)

    def test_budget_is_a_hard_entry_cap(self, rng):
        from skyfall_gs_tpu.ops.binning import per_splat_entries
        from skyfall_gs_tpu.ops.rasterize import _apply_entry_budget

        cam = make_test_camera(48, 64)
        args = _splat_args(rng, 60)
        proj = project_gaussians(args[0], args[1], args[2], args[3], cam)
        total = int(jnp.sum(per_splat_entries(
            proj.mean2d, proj.radius, 48, 64, radius_xy=proj.radius_xy)))
        assert total > 16  # the stress premise: something to cut
        budget = total // 2
        capped = _apply_entry_budget(proj, cam, budget)
        kept = int(jnp.sum(per_splat_entries(
            capped.mean2d, capped.radius, 48, 64,
            radius_xy=capped.radius_xy)))
        assert 0 < kept <= budget

    def test_keeps_high_contribution_per_entry_first(self, rng):
        # One bright opaque splat + one huge faint one: under a budget that
        # cannot fit both, the faint many-tile splat must be the one culled.
        cam = make_test_camera(64, 64, eye=(0.0, -5.0, 0.0))
        means = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        scales = jnp.asarray([[0.05] * 3, [2.0] * 3])
        quats = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1))
        opac = jnp.asarray([0.95, 0.05])
        from skyfall_gs_tpu.ops.rasterize import _apply_entry_budget
        proj = project_gaussians(means, scales, quats, opac, cam)
        capped = _apply_entry_budget(proj, cam, 4)
        assert int(capped.radius[0]) > 0      # compact bright splat kept
        assert int(capped.radius[1]) == 0     # diffuse faint splat culled

    def test_training_mode_rejects_budget(self, rng):
        with pytest.raises(ValueError, match="inference-only"):
            cam = make_test_camera(32, 32)
            args = _splat_args(rng, 8)
            rasterize(*args, cam, jnp.zeros(3), inference=False,
                      entry_budget=128)

    def test_render_frontend_threads_budget(self, rng):
        from skyfall_gs_tpu.model.gaussians import create_from_points
        from skyfall_gs_tpu.model.render import render

        pts = rng.normal(0, 1.0, (64, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (64, 3)).astype(np.float32)
        state = create_from_points(pts, cols, capacity=64)
        state = state.replace(
            aux=state.aux.replace(filter_3d=jnp.full(64, 0.05)))
        cam = make_test_camera(48, 64)
        out = render(state, cam, jnp.zeros(3), kernel_size=0.1,
                     testing=True, inference=True, entry_budget=512)
        assert np.isfinite(np.asarray(out.color)).all()
