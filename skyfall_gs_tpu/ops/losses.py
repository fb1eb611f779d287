"""Training losses and in-loop metrics.

Capability parity: reference utils/loss_utils.py (l1/l2/ssim),
utils/image_utils.py (psnr), train.py:970-977 (depth_loss_func = 1 - Pearson),
train.py:206-242 (masked photometric + depth + opacity-entropy assembly).
"""

from __future__ import annotations

import jax.numpy as jnp

from skyfall_gs_tpu.ops.ssim import ssim


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def pearson_corr(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pearson correlation of two flattened signals."""
    x = x.reshape(-1)
    y = y.reshape(-1)
    xm = x - jnp.mean(x)
    ym = y - jnp.mean(y)
    num = jnp.sum(xm * ym)
    # eps inside the sqrt keeps the gradient finite when either signal is
    # constant (e.g. an untextured pseudo view).
    den = jnp.sqrt(jnp.sum(xm * xm) * jnp.sum(ym * ym) + 1e-12)
    return num / den


def depth_pearson_loss(gt_depth: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Scale-invariant depth supervision: 1 - Pearson(gt, pred), with
    NaN/Inf scrubbed to 0 (parity with train.py:226-234,970-977)."""
    bad = (jnp.isnan(depth) | jnp.isinf(depth)
           | jnp.isnan(gt_depth) | jnp.isinf(gt_depth))
    depth = jnp.where(bad, 0.0, depth)
    gt_depth = jnp.where(bad, 0.0, gt_depth)
    return 1.0 - pearson_corr(gt_depth, depth)


def opacity_entropy_loss(opacity: jnp.ndarray,
                         alive: jnp.ndarray | None = None) -> jnp.ndarray:
    """Binary entropy of the opacities — pushes them toward 0/1.

    Parity with train.py:236-242: ``BCE(sigma, sigma)`` with opacities
    clamped to [1e-3, 1 - 1e-3].  With padded state, only alive entries
    count toward the mean.
    """
    o = jnp.clip(opacity.reshape(-1), 1.0e-3, 1.0 - 1.0e-3)
    ent = -(o * jnp.log(o) + (1.0 - o) * jnp.log(1.0 - o))
    if alive is None:
        return jnp.mean(ent)
    alive = alive.reshape(-1)
    return jnp.sum(jnp.where(alive, ent, 0.0)) / jnp.maximum(jnp.sum(alive), 1)


def photometric_loss(
    image: jnp.ndarray,
    gt_image: jnp.ndarray,
    lambda_dssim: float = 0.2,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(1 - l) * L1 + l * (1 - SSIM) on (C, H, W) images.

    Returns:
        (loss, l1_value).
    """
    ll1 = l1_loss(image, gt_image)
    ssim_value = ssim(image, gt_image)
    return (1.0 - lambda_dssim) * ll1 + lambda_dssim * (1.0 - ssim_value), ll1
