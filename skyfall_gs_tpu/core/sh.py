"""Real spherical-harmonics evaluation, degrees 0-4.

Capability parity: reference ``utils/sh_utils.py`` (eval_sh:57-112,
RGB2SH/SH2RGB:114-118).  The basis constants are the standard real-SH
normalization constants (identical in every 3DGS implementation); the
evaluation is re-written as a single vectorized polynomial so XLA fuses the
whole thing into elementwise VPU work.

Layout: SH coefficients are stored ``(..., C, K)`` with ``K = (deg_max+1)**2``
channel-major so the per-band contraction is one broadcasted multiply-add.
"""

from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)
_C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
       -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
       0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def sh_basis(deg: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the real SH basis functions at unit directions.

    Args:
        deg: active degree (0..4), static.
        dirs: (..., 3) unit direction vectors.

    Returns:
        (..., (deg+1)**2) basis values.
    """
    if not 0 <= deg <= 4:
        raise ValueError(f"SH degree must be in [0, 4], got {deg}")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    b = [SH_C0 * one]
    if deg >= 1:
        b += [-_C1 * y, _C1 * z, -_C1 * x]
    if deg >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        b += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if deg >= 3:
        b += [
            _C3[0] * y * (3.0 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4.0 * zz - xx - yy),
            _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * x * (4.0 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3.0 * yy),
        ]
    if deg >= 4:
        b += [
            _C4[0] * xy * (xx - yy),
            _C4[1] * yz * (3.0 * xx - yy),
            _C4[2] * xy * (7.0 * zz - 1.0),
            _C4[3] * yz * (7.0 * zz - 3.0),
            _C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
            _C4[5] * xz * (7.0 * zz - 3.0),
            _C4[6] * (xx - yy) * (7.0 * zz - 1.0),
            _C4[7] * xz * (xx - 3.0 * yy),
            _C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    return jnp.stack(b, axis=-1)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH-encoded colors at unit directions.

    Args:
        deg: active degree (0..4), static.  Coefficients beyond
            ``(deg+1)**2`` are ignored.
        sh: (..., C, K) coefficients with K >= (deg+1)**2.
        dirs: (..., 3) unit directions, broadcastable against sh[..., 0, 0].

    Returns:
        (..., C) colors (without the +0.5 DC shift, same as the reference).
    """
    k = (deg + 1) ** 2
    basis = sh_basis(deg, dirs)  # (..., k)
    return jnp.sum(sh[..., :, :k] * basis[..., None, :], axis=-1)


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """Convert an RGB color to its degree-0 SH coefficient."""
    return (rgb - 0.5) / SH_C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    """Convert a degree-0 SH coefficient back to RGB."""
    return sh * SH_C0 + 0.5
