"""Mean squared distance to the 3 nearest neighbors (scale initialization).

Capability parity: ``simple_knn._C.distCUDA2`` (reference
scene/gaussian_model.py:25,324) — used once per scene to initialize
log-scales from local point density.

Two paths:
  * host: scipy cKDTree (exact, fast, one-shot at scene load);
  * device: chunked brute-force top-k under jit (for fully on-device init
    or when scipy is unavailable) — O(N^2) but batched MXU/VPU work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mean_sq_dist_3nn_host(points: np.ndarray) -> np.ndarray:
    """Exact 3-NN mean squared distance on the host.

    Prefers the native grid-hashed C++ implementation
    (skyfall_gs_tpu.native); falls back to a scipy KD-tree."""
    from skyfall_gs_tpu import native

    if native.available():
        return native.mean_sq_dist_3nn(points)

    from scipy.spatial import cKDTree

    pts = np.asarray(points, np.float32)
    tree = cKDTree(pts)
    # k=4: the first neighbor is the point itself at distance 0.
    dist, _ = tree.query(pts, k=4, workers=-1)
    return np.mean(dist[:, 1:] ** 2, axis=1).astype(np.float32)


def mean_sq_dist_3nn(points: jnp.ndarray, chunk: int = 1024) -> jnp.ndarray:
    """Chunked brute-force 3-NN mean squared distance, jit-friendly.

    Args:
        points: (N, 3).
        chunk: query rows per step (padded internally).
    """
    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    sq = jnp.sum(pts * pts, axis=-1)

    def body(carry, q):
        q_pts, q_sq = q
        # d2 = |q|^2 + |p|^2 - 2 q.p  (MXU for the inner product)
        d2 = (
            q_sq[:, None]
            + sq[None, :]
            - 2.0 * jnp.dot(q_pts, pts.T, preferred_element_type=jnp.float32)
        )
        # Exclude self-distance (exact zeros) by pushing them to +inf;
        # duplicated points at distance 0 still count as neighbors once
        # the self match is removed via top-k of 4.
        top4 = -jax.lax.top_k(-d2, 4)[0]          # 4 smallest
        mean3 = jnp.mean(top4[:, 1:], axis=1)
        return carry, mean3

    queries = (pts.reshape(-1, chunk, 3), sq.reshape(-1, chunk))
    _, out = jax.lax.scan(body, None, queries)
    return jnp.maximum(out.reshape(-1)[:n], 1e-7)
