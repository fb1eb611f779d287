"""Monocular depth prediction: ViT encoder + dense head, pure JAX.

Capability parity: the reference's ``MoGeIDU`` (train.py:35,57-62,495-502) —
MoGe (ViT-L/14 DINOv2 encoder + dense geometry head) predicting relative
depth for (a) pseudo-view supervision during Stage 1 and (b) refined IDU
frames in Stage 2.  The training losses are scale-invariant (1 - Pearson,
train.py:970-977), so relative depth is sufficient.

This module implements the inference network TPU-natively:
  * a DINOv2-style ViT encoder (patch-14 embedding, learned pos-emb with
    bicubic resize, pre-norm blocks, MHSA on the MXU) as pure jitted
    functions over a parameter pytree;
  * a DPT-style dense head fusing four intermediate feature maps into a
    full-resolution depth map;
  * ``convert_torch_state_dict`` mapping a torch DINOv2/MoGe-style
    checkpoint into the pytree (gated: this environment has no network
    egress, so pretrained weights must already be on local disk);
  * random-init construction for shape/jit testing and for distillation.

Everything is batched over frames under one jit; images are resized to a
multiple of the patch size internally.
"""

from __future__ import annotations

import math
from typing import Dict, List, NamedTuple, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


class ViTConfig(NamedTuple):
    patch_size: int = 14
    width: int = 1024
    depth: int = 24
    heads: int = 16
    mlp_ratio: float = 4.0
    img_size: int = 518          # native grid = 37x37 tokens
    out_layers: tuple = (5, 11, 17, 23)
    head_width: int = 256


# ----------------------------------------------------------------------------
# Parameter construction
# ----------------------------------------------------------------------------

def _linear(key, n_in, n_out, scale=None):
    k1, k2 = jax.random.split(key)
    s = scale if scale is not None else (1.0 / math.sqrt(n_in))
    return {"w": jax.random.normal(k1, (n_in, n_out)) * s,
            "b": jnp.zeros(n_out)}


def _ln():
    return {"scale": None, "bias": None}  # filled per-width below


def init_vit_params(key, cfg: ViTConfig = ViTConfig()):
    keys = jax.random.split(key, cfg.depth * 6 + 16)
    ki = iter(keys)
    d = cfg.width
    grid = cfg.img_size // cfg.patch_size
    params = {
        "patch_embed": {
            "w": jax.random.normal(next(ki),
                                   (cfg.patch_size, cfg.patch_size, 3, d)) * 0.02,
            "b": jnp.zeros(d),
        },
        "cls_token": jax.random.normal(next(ki), (1, 1, d)) * 0.02,
        "pos_embed": jax.random.normal(next(ki), (1, grid * grid + 1, d)) * 0.02,
        "blocks": [],
        "norm": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
    }
    for _ in range(cfg.depth):
        params["blocks"].append({
            "ln1": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
            "qkv": _linear(next(ki), d, 3 * d),
            "proj": _linear(next(ki), d, d),
            "ln2": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
            "fc1": _linear(next(ki), d, int(d * cfg.mlp_ratio)),
            "fc2": _linear(next(ki), int(d * cfg.mlp_ratio), d),
            "ls1": jnp.ones(d),   # DINOv2 LayerScale
            "ls2": jnp.ones(d),
        })
    # MoGe-style dense head (reference train.py:495-502 uses the MoGe
    # submodule, whose checkout is empty upstream — the module layout here
    # mirrors the MoGe head: per-tap 1x1 ``projects``, per-level fusion
    # ``upsample_blocks``, and an ``output_block`` emitting a 4-channel
    # (point xyz + mask) map).
    head = {"projects": [], "upsample_blocks": [],
            "output_block": {"conv1": None, "conv2": None}}
    hw = cfg.head_width
    for _ in cfg.out_layers:
        head["projects"].append({
            "w": jax.random.normal(next(ki), (1, 1, d, hw)) * 0.02,
            "b": jnp.zeros(hw)})
    for _ in cfg.out_layers:
        head["upsample_blocks"].append({
            "w": jax.random.normal(next(ki), (3, 3, hw, hw)) * 0.02,
            "b": jnp.zeros(hw)})
    head["output_block"]["conv1"] = {
        "w": jax.random.normal(next(ki), (3, 3, hw, hw // 2)) * 0.02,
        "b": jnp.zeros(hw // 2)}
    head["output_block"]["conv2"] = {
        "w": jax.random.normal(next(ki), (1, 1, hw // 2, 4)) * 0.02,
        "b": jnp.zeros(4)}
    params["head"] = head
    return params


# ----------------------------------------------------------------------------
# Forward
# ----------------------------------------------------------------------------

def _layernorm(x, p, eps=1e-6):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _attention(x, p, heads):
    b, n, d = x.shape
    qkv = x @ p["qkv"]["w"] + p["qkv"]["b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = d // heads

    def split(t):
        return t.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=jnp.float32) / math.sqrt(hd)
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
    return out @ p["proj"]["w"] + p["proj"]["b"]


def _block(x, p, heads):
    x = x + p["ls1"] * _attention(_layernorm(x, p["ln1"]), p, heads)
    h = _layernorm(x, p["ln2"])
    # DINOv2 uses nn.GELU with the EXACT erf form (torch default) — the
    # tanh approximation drifts ~5e-4 per block (caught by the torch
    # oracle in tests/test_torch_oracles.py).
    h = jax.nn.gelu(h @ p["fc1"]["w"] + p["fc1"]["b"], approximate=False)
    h = h @ p["fc2"]["w"] + p["fc2"]["b"]
    return x + p["ls2"] * h


def _resize_pos_embed(pos, grid_hw):
    """Bicubic-resize the (1, 1+G*G, D) positional embedding to a new grid."""
    gh, gw = grid_hw
    cls, patch = pos[:, :1], pos[:, 1:]
    g0 = int(math.sqrt(patch.shape[1]))
    d = patch.shape[-1]
    img = patch.reshape(1, g0, g0, d)
    img = jax.image.resize(img, (1, gh, gw, d), method="cubic")
    return jnp.concatenate([cls, img.reshape(1, gh * gw, d)], axis=1)


def vit_features(params, images, cfg: ViTConfig = ViTConfig()):
    """(B, H, W, 3) -> list of (B, gh, gw, D) feature maps at cfg.out_layers."""
    b, h, w, _ = images.shape
    ps = cfg.patch_size
    gh, gw = h // ps, w // ps
    x = jax.lax.conv_general_dilated(
        images, params["patch_embed"]["w"], (ps, ps), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + params["patch_embed"]["b"]
    x = x.reshape(b, gh * gw, -1)
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _resize_pos_embed(params["pos_embed"], (gh, gw))

    taps = []
    for i, blk in enumerate(params["blocks"]):
        x = _block(x, blk, cfg.heads)
        if i in cfg.out_layers:
            taps.append(x[:, 1:].reshape(b, gh, gw, -1))
    return taps, _layernorm(x, params["norm"])


def _conv(x, p, stride=1):
    pad = (p["w"].shape[0] // 2, p["w"].shape[0] // 2)
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), [pad, pad],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


def moge_points(params, images, cfg: ViTConfig = ViTConfig()):
    """(B, H, W, 3) float [0,1] -> ((B, H, W, 3) point map, (B, H, W) mask).

    Affine-invariant point map (MoGe's native output) with a validity mask;
    the z component is the relative depth the Pearson losses consume.
    """
    b, h, w, _ = images.shape
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    x = (images - mean) / std
    taps, _ = vit_features(params, x, cfg)

    head = params["head"]
    feat = None
    # fuse deepest-to-shallowest with progressive 2x upsampling; each tap is
    # resized to the running feature resolution before injection (DPT-style
    # reassembly collapsed onto the ViT's single-grid features).
    for tap, tp, fp in zip(reversed(taps), reversed(head["projects"]),
                           reversed(head["upsample_blocks"])):
        t = _conv(tap, tp)
        if feat is None:
            feat = t
        else:
            t = jax.image.resize(t, feat.shape, method="bilinear")
            feat = feat + t
        feat = jax.nn.relu(_conv(feat, fp))
        bh, bw = feat.shape[1] * 2, feat.shape[2] * 2
        feat = jax.image.resize(feat, (b, bh, bw, feat.shape[-1]),
                                method="bilinear")
    ob = head["output_block"]
    feat = jax.nn.relu(_conv(feat, ob["conv1"]))
    raw = _conv(feat, ob["conv2"])
    raw = jax.image.resize(raw, (b, h, w, raw.shape[-1]), method="bilinear")
    pts = jnp.concatenate(
        [raw[..., :2], jax.nn.softplus(raw[..., 2:3])], axis=-1)
    mask = jax.nn.sigmoid(raw[..., 3])
    return pts, mask


def moge_depth(params, images, cfg: ViTConfig = ViTConfig()):
    """(B, H, W, 3) float [0,1] -> (B, H, W) positive relative depth."""
    pts, _ = moge_points(params, images, cfg)
    return pts[..., 2]


# ----------------------------------------------------------------------------
# Torch checkpoint conversion (gated on local weights)
# ----------------------------------------------------------------------------

def convert_torch_state_dict(state_dict: Dict[str, "np.ndarray"],
                             cfg: ViTConfig = ViTConfig(),
                             allow_partial_head: bool = False):
    """Map a torch MoGe / DINOv2 checkpoint into the parameter pytree.

    Accepted layouts (reference train.py:495-502 loads the MoGe submodule's
    checkpoint; its checkout is empty upstream, so the schema below is the
    MoGe module layout reconstructed from its public release):

      * real MoGe checkpoints: encoder under ``backbone.*`` (DINOv2 names)
        plus ``head.projects.{i}``, ``head.upsample_blocks.{i}`` and
        ``head.output_block`` (Sequential indices or bare convs);
      * bare DINOv2 encoders (no ``backbone.`` prefix, no head) — only
        valid with ``allow_partial_head=True``, which keeps the random
        head (useful for distillation, not for inference).

    An optional ``model.`` wrapper prefix is stripped.  Missing keys raise
    KeyError — nothing is silently left random.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    if any(k.startswith("model.") for k in sd):
        sd = {(k[6:] if k.startswith("model.") else k): v
              for k, v in sd.items()}
    bb = "backbone." if any(k.startswith("backbone.") for k in sd) else ""
    params = init_vit_params(jax.random.PRNGKey(0), cfg)

    def lin(prefix):
        return {"w": jnp.asarray(sd[prefix + ".weight"].T),
                "b": jnp.asarray(sd[prefix + ".bias"])}

    def conv_hwio(prefix):
        # torch conv (O, I, kh, kw) -> HWIO
        return {"w": jnp.asarray(sd[prefix + ".weight"].transpose(2, 3, 1, 0)),
                "b": jnp.asarray(sd[prefix + ".bias"])}

    params["patch_embed"] = conv_hwio(f"{bb}patch_embed.proj")
    params["cls_token"] = jnp.asarray(sd[f"{bb}cls_token"])
    params["pos_embed"] = jnp.asarray(sd[f"{bb}pos_embed"])
    for i in range(cfg.depth):
        p = f"{bb}blocks.{i}"
        params["blocks"][i] = {
            "ln1": {"scale": jnp.asarray(sd[f"{p}.norm1.weight"]),
                    "bias": jnp.asarray(sd[f"{p}.norm1.bias"])},
            "qkv": lin(f"{p}.attn.qkv"),
            "proj": lin(f"{p}.attn.proj"),
            "ln2": {"scale": jnp.asarray(sd[f"{p}.norm2.weight"]),
                    "bias": jnp.asarray(sd[f"{p}.norm2.bias"])},
            "fc1": lin(f"{p}.mlp.fc1"),
            "fc2": lin(f"{p}.mlp.fc2"),
            "ls1": jnp.asarray(sd.get(f"{p}.ls1.gamma", np.ones(cfg.width))),
            "ls2": jnp.asarray(sd.get(f"{p}.ls2.gamma", np.ones(cfg.width))),
        }
    params["norm"] = {"scale": jnp.asarray(sd[f"{bb}norm.weight"]),
                      "bias": jnp.asarray(sd[f"{bb}norm.bias"])}

    def head_conv(prefix):
        # Sequential index ("...0.weight") or bare conv ("...weight").
        if prefix + ".weight" in sd:
            return conv_hwio(prefix)
        return conv_hwio(prefix + ".0")

    if any(k.startswith("head.") for k in sd):
        head = params["head"]
        for i in range(len(cfg.out_layers)):
            head["projects"][i] = head_conv(f"head.projects.{i}")
            head["upsample_blocks"][i] = head_conv(f"head.upsample_blocks.{i}")
        ob_keys = sorted(
            {k.split(".")[2] for k in sd if k.startswith("head.output_block.")
             and k.endswith(".weight")}, key=int)
        if len(ob_keys) < 2:
            raise KeyError(
                f"head.output_block has {len(ob_keys)} conv(s); expected 2 "
                "(3x3 + 1x1)")
        head["output_block"]["conv1"] = conv_hwio(
            f"head.output_block.{ob_keys[0]}")
        head["output_block"]["conv2"] = conv_hwio(
            f"head.output_block.{ob_keys[-1]}")
    elif not allow_partial_head:
        raise KeyError(
            "checkpoint contains no head.* keys — a bare encoder cannot "
            "predict depth. Pass allow_partial_head=True to keep a "
            "random-initialized head (distillation only).")
    return params


class MoGePredictor:
    """IDU-facing depth backend (reference MoGeIDU interface)."""

    def __init__(self, save_path: Optional[str] = None, fov_x: float = 60.0,
                 checkpoint_path: Optional[str] = None,
                 cfg: ViTConfig = ViTConfig(), params=None, **_):
        self.cfg = cfg
        self.fov_x = fov_x
        self.save_path = save_path
        if params is not None:
            self.params = params
        elif checkpoint_path is not None:
            import torch

            sd = torch.load(checkpoint_path, map_location="cpu")
            if "model" in sd:
                sd = sd["model"]
            self.params = convert_torch_state_dict(
                {k: v.numpy() for k, v in sd.items()}, cfg)
        else:
            raise RuntimeError(
                "MoGe weights are not available locally (no network egress). "
                "Pass checkpoint_path=<local torch checkpoint> or params=..., "
                "or use the 'render' depth backend.")
        self._jitted = jax.jit(lambda imgs: moge_depth(self.params, imgs, cfg))

    def _target_hw(self, img: np.ndarray) -> tuple:
        """Aspect-preserving inference size: ~img_size^2 pixels, each side a
        patch multiple.  The ViT handles arbitrary grids via pos-emb resize,
        so non-square frames keep their aspect instead of being squashed."""
        h, w = np.asarray(img).shape[:2]
        ps = self.cfg.patch_size
        scale = self.cfg.img_size / math.sqrt(h * w)
        th = max(ps, int(round(h * scale / ps)) * ps)
        tw = max(ps, int(round(w * scale / ps)) * ps)
        return th, tw

    def _prep(self, img: np.ndarray) -> np.ndarray:
        import cv2

        th, tw = self._target_hw(img)
        return cv2.resize(np.asarray(img, np.float32), (tw, th),
                          interpolation=cv2.INTER_AREA)

    def __call__(self, image: np.ndarray) -> np.ndarray:
        return self.run([image])[0]

    def run(self, images: Sequence[np.ndarray], batch_size: int = 8,
            **_) -> List[np.ndarray]:
        import cv2

        # Group consecutive frames by prepped shape so each jit signature
        # sees a full batch (orbit sets are uniform -> one signature).
        out: List[Optional[np.ndarray]] = [None] * len(images)
        groups: Dict[tuple, List[int]] = {}
        for i, im in enumerate(images):
            groups.setdefault(self._target_hw(im), []).append(i)
        for _, idxs in groups.items():
            for j in range(0, len(idxs), batch_size):
                sel = idxs[j:j + batch_size]
                inp = jnp.asarray(
                    np.stack([self._prep(images[i]) for i in sel]))
                depths = np.asarray(self._jitted(inp))
                for i, d in zip(sel, depths):
                    h, w = np.asarray(images[i]).shape[:2]
                    out[i] = cv2.resize(d, (w, h),
                                        interpolation=cv2.INTER_LINEAR)
        return out  # type: ignore[return-value]
