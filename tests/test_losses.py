"""Loss tests: SSIM vs the reference torch implementation, Pearson, entropy."""

import jax.numpy as jnp
import numpy as np
import pytest

from skyfall_gs_tpu.ops.losses import (
    depth_pearson_loss,
    l1_loss,
    opacity_entropy_loss,
    pearson_corr,
    photometric_loss,
    psnr,
)
from skyfall_gs_tpu.ops.ssim import ssim


def _torch_reference_ssim(a, b):
    """Independent torch implementation of the 11x11/sigma-1.5 SSIM spec
    (the semantics of the reference utils/loss_utils.py:23-63)."""
    import torch
    import torch.nn.functional as F

    window = torch.exp(
        -((torch.arange(11, dtype=torch.float64) - 5) ** 2) / (2 * 1.5 ** 2))
    window = window / window.sum()
    w2d = (window[:, None] @ window[None, :])[None, None]
    x = torch.tensor(a, dtype=torch.float64)[None]
    y = torch.tensor(b, dtype=torch.float64)[None]
    c = x.shape[1]
    w = w2d.expand(c, 1, 11, 11)
    mu1 = F.conv2d(x, w, padding=5, groups=c)
    mu2 = F.conv2d(y, w, padding=5, groups=c)
    s11 = F.conv2d(x * x, w, padding=5, groups=c) - mu1 ** 2
    s22 = F.conv2d(y * y, w, padding=5, groups=c) - mu2 ** 2
    s12 = F.conv2d(x * y, w, padding=5, groups=c) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s11 + s22 + c2))
    return float(m.mean())


class TestSSIM:
    def test_identical_images(self, rng):
        img = jnp.asarray(rng.uniform(size=(3, 24, 24)).astype(np.float32))
        assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)

    def test_matches_torch_reference(self, rng):
        a = rng.uniform(size=(3, 32, 32)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
        ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        ref = _torch_reference_ssim(a, b)
        assert ours == pytest.approx(ref, abs=2e-4)

    def test_decreases_with_noise(self, rng):
        a = rng.uniform(size=(3, 32, 32)).astype(np.float32)
        s1 = float(ssim(jnp.asarray(a),
                        jnp.asarray(np.clip(a + 0.05, 0, 1))))
        s2 = float(ssim(jnp.asarray(a),
                        jnp.asarray(rng.uniform(size=a.shape).astype(np.float32))))
        assert s2 < s1 < 1.0


class TestPearson:
    def test_perfect_correlation_any_scale(self, rng):
        d = rng.uniform(1, 10, size=(16, 16)).astype(np.float32)
        # scale-invariant: loss ~ 0 for affine-related depths
        loss = depth_pearson_loss(jnp.asarray(d), jnp.asarray(3.0 * d + 5.0))
        assert float(loss) == pytest.approx(0.0, abs=1e-4)

    def test_anticorrelation(self, rng):
        d = rng.uniform(1, 10, size=(16, 16)).astype(np.float32)
        loss = depth_pearson_loss(jnp.asarray(d), jnp.asarray(-d))
        assert float(loss) == pytest.approx(2.0, abs=1e-4)

    def test_nan_scrubbing(self, rng):
        d = rng.uniform(1, 10, size=(8, 8)).astype(np.float32)
        bad = d.copy()
        bad[0, 0] = np.nan
        bad[1, 1] = np.inf
        loss = depth_pearson_loss(jnp.asarray(bad), jnp.asarray(d))
        assert np.isfinite(float(loss))

    def test_matches_numpy_corrcoef(self, rng):
        a = rng.normal(size=100).astype(np.float32)
        b = (a * 2 + rng.normal(size=100)).astype(np.float32)
        ours = float(pearson_corr(jnp.asarray(a), jnp.asarray(b)))
        ref = float(np.corrcoef(a, b)[0, 1])
        assert ours == pytest.approx(ref, abs=1e-5)


class TestOpacityEntropy:
    def test_binary_extremes_low(self):
        o = jnp.asarray([0.001, 0.999, 0.0005])
        lo = float(opacity_entropy_loss(o))
        hi = float(opacity_entropy_loss(jnp.full(3, 0.5)))
        assert lo < 0.05 < hi

    def test_matches_torch_bce(self, rng):
        import torch
        import torch.nn.functional as F

        o = rng.uniform(0.01, 0.99, size=50).astype(np.float32)
        ours = float(opacity_entropy_loss(jnp.asarray(o)))
        t = torch.tensor(o)
        ref = float(F.binary_cross_entropy(t, t))
        assert ours == pytest.approx(ref, abs=1e-5)

    def test_alive_masking(self, rng):
        o = jnp.concatenate([jnp.full(10, 0.5), jnp.full(10, 0.001)])
        alive = jnp.arange(20) < 10
        masked = float(opacity_entropy_loss(o, alive))
        assert masked == pytest.approx(float(opacity_entropy_loss(o[:10])), abs=1e-6)


class TestMisc:
    def test_psnr_known_value(self):
        a = jnp.zeros((4, 4))
        b = jnp.full((4, 4), 0.1)
        assert float(psnr(a, b)) == pytest.approx(20.0, abs=1e-4)

    def test_photometric_combines(self, rng):
        a = jnp.asarray(rng.uniform(size=(3, 24, 24)).astype(np.float32))
        b = jnp.clip(a + 0.1, 0, 1)
        loss, ll1 = photometric_loss(a, b, lambda_dssim=0.2)
        assert float(ll1) == pytest.approx(float(l1_loss(a, b)), abs=1e-6)
        assert 0 < float(loss) < 1
