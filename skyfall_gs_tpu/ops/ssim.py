"""Differentiable SSIM with an 11x11 Gaussian window.

Capability parity: the reference's ``fused_ssim`` CUDA extension
(train.py:42,222) and the pure-torch spec in utils/loss_utils.py:23-63
(window size 11, sigma 1.5, C1=0.01^2, C2=0.03^2, per-channel depthwise
convolution, mean over the valid 'same' padding output).

On TPU the five blurs are depthwise convolutions that XLA fuses into a
handful of VPU passes — no custom kernel needed at these sizes.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax

_WINDOW = 11
_SIGMA = 1.5
_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


@functools.lru_cache(maxsize=None)
def _window_1d() -> tuple:
    import numpy as np

    xs = np.arange(_WINDOW) - _WINDOW // 2
    g = np.exp(-(xs ** 2) / (2.0 * _SIGMA ** 2))
    return tuple((g / g.sum()).astype("float32"))


def _blur(x: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise 11x11 Gaussian blur on (B, C, H, W)."""
    c = x.shape[1]
    w = jnp.asarray(_window_1d(), jnp.float32)
    kh = jnp.tile(w.reshape(1, 1, _WINDOW, 1), (c, 1, 1, 1))
    kw = jnp.tile(w.reshape(1, 1, 1, _WINDOW), (c, 1, 1, 1))
    dn = lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    pad_h = ((_WINDOW // 2, _WINDOW // 2), (0, 0))
    pad_w = ((0, 0), (_WINDOW // 2, _WINDOW // 2))
    x = lax.conv_general_dilated(x, kh, (1, 1), pad_h, dimension_numbers=dn,
                                 feature_group_count=c)
    x = lax.conv_general_dilated(x, kw, (1, 1), pad_w, dimension_numbers=dn,
                                 feature_group_count=c)
    return x


def ssim(img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """Mean SSIM between two images.

    Args:
        img0/img1: (C, H, W) or (B, C, H, W) in [0, 1].

    Returns:
        scalar mean SSIM.
    """
    if img0.ndim == 3:
        img0 = img0[None]
        img1 = img1[None]
    # NOTE: batching the five blurs into one stacked conv looks faster in
    # isolation (fixed per-conv cost) but regresses the fused train step —
    # the concat materializes the moment maps to HBM, whereas separate blurs
    # let XLA fuse each elementwise product into its conv input.
    mu0 = _blur(img0)
    mu1 = _blur(img1)
    mu00 = mu0 * mu0
    mu11 = mu1 * mu1
    mu01 = mu0 * mu1
    s00 = _blur(img0 * img0) - mu00
    s11 = _blur(img1 * img1) - mu11
    s01 = _blur(img0 * img1) - mu01
    num = (2.0 * mu01 + _C1) * (2.0 * s01 + _C2)
    den = (mu00 + mu11 + _C1) * (s00 + s11 + _C2)
    return jnp.mean(num / den)
