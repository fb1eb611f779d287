"""Pure-JAX reference compositor: the correctness oracle.

Composites every projected Gaussian at every pixel (O(H*W*N) memory), so it
is only for tests, tiny scenes, and as the differentiable spec that the tiled
Pallas backend must match.  The per-pixel rules mirror the reference CUDA
rasterizer exactly (see ops/rasterize.py for the list), so parity tests can
compare outputs bitwise-tightly.
"""

from __future__ import annotations

import jax.numpy as jnp

ALPHA_EPS = 1.0 / 255.0   # contributions below this are skipped
ALPHA_MAX = 0.99          # per-splat alpha clamp
T_EPS = 1e-4              # front-to-back early-termination threshold


def composite_reference(
    mean2d: jnp.ndarray,      # (N, 2)
    conic: jnp.ndarray,       # (N, 3)
    depth: jnp.ndarray,       # (N,)
    radius: jnp.ndarray,      # (N,) int32, 0 = culled
    opacity: jnp.ndarray,     # (N,)
    channels: jnp.ndarray,    # (N, C) values to blend (premultiplied output)
    height: int,
    width: int,
    subpixel_offset: jnp.ndarray | None = None,  # (H, W, 2)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Depth-sorted front-to-back alpha blend at every pixel.

    Returns:
        (out (H, W, C) premultiplied blended channels, T_final (H, W)).
    """
    n = mean2d.shape[0]
    valid = radius > 0
    order = jnp.argsort(jnp.where(valid, depth, jnp.inf))
    m = mean2d[order]
    con = conic[order]
    op = opacity[order]
    ch = channels[order]
    v = valid[order]

    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    px = jnp.broadcast_to(xs[None, :], (height, width))
    py = jnp.broadcast_to(ys[:, None], (height, width))
    if subpixel_offset is not None:
        px = px + subpixel_offset[..., 0]
        py = py + subpixel_offset[..., 1]

    dx = px[:, :, None] - m[None, None, :, 0]            # (H, W, N)
    dy = py[:, :, None] - m[None, None, :, 1]
    power = (-0.5 * (con[None, None, :, 0] * dx * dx + con[None, None, :, 2] * dy * dy)
             - con[None, None, :, 1] * dx * dy)
    alpha = jnp.minimum(op[None, None, :] * jnp.exp(power), ALPHA_MAX)
    use = v[None, None, :] & (power <= 0.0) & (alpha >= ALPHA_EPS)
    alpha = jnp.where(use, alpha, 0.0)

    one_minus = 1.0 - alpha
    t_after = jnp.cumprod(one_minus, axis=-1)            # T after compositing i
    t_before = jnp.concatenate(
        [jnp.ones_like(t_after[..., :1]), t_after[..., :-1]], axis=-1
    )
    keep = t_after >= T_EPS                               # prefix property
    w = jnp.where(keep, alpha * t_before, 0.0)
    out = jnp.einsum("hwn,nc->hwc", w, ch)
    t_final = jnp.prod(jnp.where(keep, one_minus, 1.0), axis=-1)
    return out, t_final
