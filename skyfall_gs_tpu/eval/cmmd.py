"""CMMD: CLIP Maximum Mean Discrepancy.

Capability parity: reference cmmd_pytorch/ — the RBF-kernel MMD with
sigma=10 and human-readable scale 1000 (distance.py:22-64; Eq. (5) of
Gretton et al. 2012), computed over CLIP ViT-L/14-336 image embeddings
(embedding.py:22-71).

The MMD itself is native JAX (batched MXU matmuls).  The CLIP embedder needs
pretrained weights; it loads transformers' CLIP from a local path/cache and
raises a clear error when weights are unavailable (no network egress here) —
any callable mapping images -> (N, D) embeddings can be substituted.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

_SIGMA = 10.0
_SCALE = 1000.0
_CLIP_MODEL = "openai/clip-vit-large-patch14-336"


@jax.jit
def mmd(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Biased/minimum-variance MMD^2 estimate with an RBF kernel, x1000."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    gamma = 1.0 / (2.0 * _SIGMA ** 2)
    x_sq = jnp.sum(x * x, axis=1)
    y_sq = jnp.sum(y * y, axis=1)

    def kmean(a, b, a_sq, b_sq):
        d2 = -2.0 * (a @ b.T) + a_sq[:, None] + b_sq[None, :]
        return jnp.mean(jnp.exp(-gamma * d2))

    return _SCALE * (kmean(x, x, x_sq, x_sq) + kmean(y, y, y_sq, y_sq)
                     - 2.0 * kmean(x, y, x_sq, y_sq))


class ClipEmbedder:
    """CLIP ViT-L/14-336 image embeddings via transformers (local weights)."""

    def __init__(self, model_name: str = _CLIP_MODEL, device: str = "cpu"):
        try:
            from transformers import CLIPImageProcessor, CLIPVisionModelWithProjection
        except Exception as e:  # pragma: no cover
            raise RuntimeError(f"transformers unavailable: {e}")
        try:
            self.processor = CLIPImageProcessor.from_pretrained(model_name)
            self.model = CLIPVisionModelWithProjection.from_pretrained(
                model_name).eval().to(device)
        except Exception as e:
            raise RuntimeError(
                f"CLIP weights for {model_name} are not available locally "
                f"(no network egress): {e}. Pass a custom embed_fn to "
                f"compute_cmmd instead.")
        self.device = device

    def __call__(self, images: Sequence[np.ndarray], batch_size: int = 32
                 ) -> np.ndarray:
        import torch

        embs = []
        for i in range(0, len(images), batch_size):
            batch = [np.clip(im * 255, 0, 255).astype(np.uint8)
                     for im in images[i:i + batch_size]]
            inputs = self.processor(images=batch, return_tensors="pt")
            with torch.no_grad():
                out = self.model(pixel_values=inputs["pixel_values"]
                                 .to(self.device))
            e = out.image_embeds
            e = e / e.norm(dim=-1, keepdim=True)
            embs.append(e.cpu().numpy())
        return np.concatenate(embs, axis=0)


def compute_cmmd(
    ref_images: Sequence[np.ndarray],
    eval_images: Sequence[np.ndarray],
    embed_fn: Optional[Callable] = None,
) -> float:
    """CMMD between two image sets ((H, W, 3) float [0,1] each)."""
    if embed_fn is None:
        embed_fn = ClipEmbedder()
    x = embed_fn(ref_images)
    y = embed_fn(eval_images)
    return float(mmd(jnp.asarray(x), jnp.asarray(y)))
