"""Per-image appearance modeling (WildGaussians-style).

Capability parity: reference scene/gaussian_model.py:31-69
(_get_fourier_features + EmbeddingModel).  Each Gaussian carries a learned
embedding initialized with Fourier position features; each training camera
carries an embedding; a small MLP maps (DC color, gaussian embedding, camera
embedding) to a per-channel multiply + offset applied to the full SH vector
(offset scaled by 1/C0 on the DC coefficients only).

Implemented as a plain functional pytree (no framework Module) so the MLP
weights live alongside the Gaussian parameter pytree under one optimizer and
one checkpoint format.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from skyfall_gs_tpu.core.sh import SH_C0


class AppearanceConfig(NamedTuple):
    enabled: bool = False
    n_fourier_freqs: int = 4
    embedding_dim: int = 32
    hidden: int = 128

    @property
    def gaussian_embedding_dim(self) -> int:
        return 6 * self.n_fourier_freqs


def fourier_position_features(xyz: np.ndarray, num_freqs: int) -> np.ndarray:
    """Initialization features: sines of normalized positions at octave
    frequencies with 0 / pi/2 phase pairs -> (N, 6 * num_freqs)."""
    xyz = np.asarray(xyz, np.float32)
    xyz = xyz - xyz.mean(axis=0, keepdims=True)
    scale = np.quantile(np.abs(xyz), 0.97, axis=0)
    xyz = xyz / np.maximum(scale, 1e-8) * 0.5 + 0.5
    freqs = np.repeat(2.0 ** np.linspace(0, num_freqs - 1, num_freqs), 2)
    offsets = np.array([0.0, 0.5 * math.pi] * num_freqs, np.float32)
    feat = xyz[..., None] * freqs[None, None] * 2.0 * math.pi + offsets[None, None]
    return np.sin(feat).reshape(xyz.shape[0], -1).astype(np.float32)


def _linear_init(key, n_in: int, n_out: int):
    """Uniform(-1/sqrt(n_in), 1/sqrt(n_in)) for weights and biases."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(n_in)
    w = jax.random.uniform(k1, (n_in, n_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(k2, (n_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_appearance(key, cfg: AppearanceConfig, num_cameras: int):
    """Returns (mlp_params pytree, camera_embeddings (M, D))."""
    n_in = cfg.embedding_dim + 3 + cfg.gaussian_embedding_dim
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mlp = {
        "l0": _linear_init(k1, n_in, cfg.hidden),
        "l1": _linear_init(k2, cfg.hidden, cfg.hidden),
        "l2": _linear_init(k3, cfg.hidden, 6),
    }
    cam_emb = 0.01 * jax.random.normal(k4, (num_cameras, cfg.embedding_dim))
    return mlp, cam_emb


def _mlp_apply(mlp, x):
    x = x @ mlp["l0"]["w"] + mlp["l0"]["b"]
    x = jax.nn.relu(x)
    x = x @ mlp["l1"]["w"] + mlp["l1"]["b"]
    x = jax.nn.relu(x)
    return x @ mlp["l2"]["w"] + mlp["l2"]["b"]


def apply_appearance(
    mlp,
    gaussian_embeddings: jnp.ndarray,  # (N, 6F)
    camera_embedding: jnp.ndarray,     # (D,) one camera's embedding
    features: jnp.ndarray,             # (N, K, 3) SH coefficients
) -> jnp.ndarray:
    """Tone the SH coefficients for one camera.  Returns (N, K, 3)."""
    n, k, _ = features.shape
    flat = jnp.clip(features.reshape(n, k * 3), None, 1.0)   # k-major [k0 rgb, ...]
    dc = flat[:, :3]
    inp = jnp.concatenate(
        [dc, gaussian_embeddings,
         jnp.broadcast_to(camera_embedding[None, :], (n, camera_embedding.shape[0]))],
        axis=-1,
    )
    out = _mlp_apply(mlp, inp) * 0.01
    offset, mul = out[:, :3], out[:, 3:]
    offset_full = jnp.concatenate(
        [offset / SH_C0, jnp.zeros((n, (k - 1) * 3), flat.dtype)], axis=-1
    )
    mul_full = jnp.tile(mul, (1, k))
    toned = flat * mul_full + offset_full
    return jnp.clip(toned, None, 1.0).reshape(n, k, 3)
