"""FLUX VAE (AutoencoderKL) in pure JAX.

Capability parity: the reference's FlowEdit refiner encodes rendered orbit
views into FLUX latent space and decodes the edited latents back to pixels
(reference train.py:448-460; HF diffusers AutoencoderKL inside the FLUX
pipeline).  TPU-native re-implementation as pure jitted functions over a
parameter pytree:

  * encoder: conv stem -> 4 down stages (2 ResNet blocks each, stride-2
    downsample between stages) -> mid (ResNet, single-head spatial
    attention, ResNet) -> GroupNorm/SiLU -> 2*latent_channels (mean,
    logvar);
  * decoder: mirror with 3 ResNet blocks per stage and nearest-neighbor 2x
    upsampling;
  * FLUX latent normalization z' = (z - shift) * scale;
  * ``convert_torch_state_dict`` for the diffusers ``AutoencoderKL``
    checkpoint (FLUX config: no quant convs).

Convs run NHWC on the MXU; GroupNorm(32) matches the torch eps.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class VAEConfig(NamedTuple):
    base_ch: int = 128
    ch_mult: tuple = (1, 2, 4, 4)
    num_res: int = 2               # encoder ResNet blocks per stage
    latent_ch: int = 16
    scaling_factor: float = 0.3611
    shift_factor: float = 0.1159
    groups: int = 32

    @classmethod
    def tiny(cls):
        return cls(base_ch=16, ch_mult=(1, 2), num_res=1, latent_ch=4,
                   groups=4)


# ----------------------------------------------------------------------------
# Parameter construction
# ----------------------------------------------------------------------------

def _conv_p(key, kh, kw, cin, cout, scale=0.02):
    k1, _ = jax.random.split(key)
    return {"w": jax.random.normal(k1, (kh, kw, cin, cout)) * scale,
            "b": jnp.zeros(cout)}


def _gn_p(c):
    return {"scale": jnp.ones(c), "bias": jnp.zeros(c)}


def _resnet_p(ki, cin, cout):
    p = {
        "norm1": _gn_p(cin),
        "conv1": _conv_p(next(ki), 3, 3, cin, cout),
        "norm2": _gn_p(cout),
        "conv2": _conv_p(next(ki), 3, 3, cout, cout),
    }
    if cin != cout:
        p["shortcut"] = _conv_p(next(ki), 1, 1, cin, cout)
    return p


def _attn_p(ki, c):
    return {
        "norm": _gn_p(c),
        "q": _conv_p(next(ki), 1, 1, c, c),
        "k": _conv_p(next(ki), 1, 1, c, c),
        "v": _conv_p(next(ki), 1, 1, c, c),
        "out": _conv_p(next(ki), 1, 1, c, c),
    }


def init_vae_params(key, cfg: VAEConfig = VAEConfig()):
    ki = iter(jax.random.split(key, 4096))
    chs = [cfg.base_ch * m for m in cfg.ch_mult]

    enc = {"conv_in": _conv_p(next(ki), 3, 3, 3, chs[0]), "down": []}
    cin = chs[0]
    for si, c in enumerate(chs):
        stage = {"res": [], "down": None}
        for _ in range(cfg.num_res):
            stage["res"].append(_resnet_p(ki, cin, c))
            cin = c
        if si < len(chs) - 1:
            stage["down"] = _conv_p(next(ki), 3, 3, c, c)
        enc["down"].append(stage)
    enc["mid"] = {
        "res1": _resnet_p(ki, cin, cin),
        "attn": _attn_p(ki, cin),
        "res2": _resnet_p(ki, cin, cin),
    }
    enc["norm_out"] = _gn_p(cin)
    enc["conv_out"] = _conv_p(next(ki), 3, 3, cin, 2 * cfg.latent_ch)

    dec = {"conv_in": _conv_p(next(ki), 3, 3, cfg.latent_ch, chs[-1])}
    cin = chs[-1]
    dec["mid"] = {
        "res1": _resnet_p(ki, cin, cin),
        "attn": _attn_p(ki, cin),
        "res2": _resnet_p(ki, cin, cin),
    }
    dec["up"] = []
    for si, c in enumerate(reversed(chs)):
        stage = {"res": [], "up": None}
        for _ in range(cfg.num_res + 1):
            stage["res"].append(_resnet_p(ki, cin, c))
            cin = c
        if si < len(chs) - 1:
            stage["up"] = _conv_p(next(ki), 3, 3, c, c)
        dec["up"].append(stage)
    dec["norm_out"] = _gn_p(cin)
    dec["conv_out"] = _conv_p(next(ki), 3, 3, cin, 3)
    return {"encoder": enc, "decoder": dec}


# ----------------------------------------------------------------------------
# Forward
# ----------------------------------------------------------------------------

def _conv(x, p, stride=1, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


def _groupnorm(x, p, groups, eps=1e-6):
    b, h, w, c = x.shape
    xg = x.reshape(b, h, w, groups, c // groups)
    mu = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    return xg.reshape(b, h, w, c) * p["scale"] + p["bias"]


def _resnet(x, p, groups):
    h = jax.nn.silu(_groupnorm(x, p["norm1"], groups))
    h = _conv(h, p["conv1"])
    h = jax.nn.silu(_groupnorm(h, p["norm2"], groups))
    h = _conv(h, p["conv2"])
    if "shortcut" in p:
        x = _conv(x, p["shortcut"])
    return x + h


def _spatial_attn(x, p, groups):
    b, h, w, c = x.shape
    n = _groupnorm(x, p["norm"], groups)
    q = _conv(n, p["q"]).reshape(b, h * w, c)
    k = _conv(n, p["k"]).reshape(b, h * w, c)
    v = _conv(n, p["v"]).reshape(b, h * w, c)
    attn = jnp.einsum("bqc,bkc->bqk", q, k,
                      preferred_element_type=jnp.float32) / jnp.sqrt(
        jnp.float32(c))
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bqk,bkc->bqc", attn, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return x + _conv(out.reshape(b, h, w, c), p["out"])


def vae_encode(params, cfg: VAEConfig, images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) in [-1, 1] -> (B, H/8, W/8, latent_ch) normalized mean
    latents (deterministic: the posterior mean, diffusers .mode())."""
    enc = params["encoder"]
    g = cfg.groups
    x = _conv(images, enc["conv_in"])
    for stage in enc["down"]:
        for rp in stage["res"]:
            x = _resnet(x, rp, g)
        if stage["down"] is not None:
            # diffusers Downsample2D: asymmetric (0,1) pad + VALID stride 2
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = _conv(x, stage["down"], stride=2, pad="VALID")
    x = _resnet(x, enc["mid"]["res1"], g)
    x = _spatial_attn(x, enc["mid"]["attn"], g)
    x = _resnet(x, enc["mid"]["res2"], g)
    x = jax.nn.silu(_groupnorm(x, enc["norm_out"], g))
    x = _conv(x, enc["conv_out"])
    mean = x[..., :cfg.latent_ch]
    return (mean - cfg.shift_factor) * cfg.scaling_factor


def vae_decode(params, cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w, latent_ch) normalized latents -> (B, 8h, 8w, 3) in [-1, 1]."""
    dec = params["decoder"]
    g = cfg.groups
    z = z / cfg.scaling_factor + cfg.shift_factor
    x = _conv(z, dec["conv_in"])
    x = _resnet(x, dec["mid"]["res1"], g)
    x = _spatial_attn(x, dec["mid"]["attn"], g)
    x = _resnet(x, dec["mid"]["res2"], g)
    for stage in dec["up"]:
        for rp in stage["res"]:
            x = _resnet(x, rp, g)
        if stage["up"] is not None:
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
            x = _conv(x, stage["up"])
    x = jax.nn.silu(_groupnorm(x, dec["norm_out"], g))
    return _conv(x, dec["conv_out"])


# ----------------------------------------------------------------------------
# Torch checkpoint conversion (diffusers AutoencoderKL keys, FLUX config)
# ----------------------------------------------------------------------------

def convert_torch_state_dict(state_dict: Dict[str, "np.ndarray"],
                             cfg: VAEConfig = VAEConfig()):
    """Map a diffusers ``AutoencoderKL`` state dict (FLUX VAE: no quant
    convs) into the pytree.  Raises KeyError on missing keys — nothing is
    left random."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(prefix):
        # torch conv (O, I, kh, kw) -> HWIO
        return {"w": jnp.asarray(sd[prefix + ".weight"].transpose(2, 3, 1, 0)),
                "b": jnp.asarray(sd[prefix + ".bias"])}

    def lin_as_conv(prefix):
        # torch attention linear (O, I) -> 1x1 conv HWIO
        w = sd[prefix + ".weight"]
        return {"w": jnp.asarray(w.T[None, None]),
                "b": jnp.asarray(sd[prefix + ".bias"])}

    def gn(prefix):
        return {"scale": jnp.asarray(sd[prefix + ".weight"]),
                "bias": jnp.asarray(sd[prefix + ".bias"])}

    def resnet(prefix, cin, cout):
        p = {"norm1": gn(prefix + ".norm1"), "conv1": conv(prefix + ".conv1"),
             "norm2": gn(prefix + ".norm2"), "conv2": conv(prefix + ".conv2")}
        if cin != cout:
            p["shortcut"] = conv(prefix + ".conv_shortcut")
        return p

    def attn(prefix):
        return {"norm": gn(prefix + ".group_norm"),
                "q": lin_as_conv(prefix + ".to_q"),
                "k": lin_as_conv(prefix + ".to_k"),
                "v": lin_as_conv(prefix + ".to_v"),
                "out": lin_as_conv(prefix + ".to_out.0")}

    chs = [cfg.base_ch * m for m in cfg.ch_mult]

    enc = {"conv_in": conv("encoder.conv_in"), "down": []}
    cin = chs[0]
    for si, c in enumerate(chs):
        stage = {"res": [], "down": None}
        for j in range(cfg.num_res):
            stage["res"].append(
                resnet(f"encoder.down_blocks.{si}.resnets.{j}", cin, c))
            cin = c
        if si < len(chs) - 1:
            stage["down"] = conv(f"encoder.down_blocks.{si}.downsamplers.0.conv")
        enc["down"].append(stage)
    enc["mid"] = {
        "res1": resnet("encoder.mid_block.resnets.0", cin, cin),
        "attn": attn("encoder.mid_block.attentions.0"),
        "res2": resnet("encoder.mid_block.resnets.1", cin, cin),
    }
    enc["norm_out"] = gn("encoder.conv_norm_out")
    enc["conv_out"] = conv("encoder.conv_out")

    dec = {"conv_in": conv("decoder.conv_in")}
    cin = chs[-1]
    dec["mid"] = {
        "res1": resnet("decoder.mid_block.resnets.0", cin, cin),
        "attn": attn("decoder.mid_block.attentions.0"),
        "res2": resnet("decoder.mid_block.resnets.1", cin, cin),
    }
    dec["up"] = []
    for si, c in enumerate(reversed(chs)):
        stage = {"res": [], "up": None}
        for j in range(cfg.num_res + 1):
            stage["res"].append(
                resnet(f"decoder.up_blocks.{si}.resnets.{j}", cin, c))
            cin = c
        if si < len(chs) - 1:
            stage["up"] = conv(f"decoder.up_blocks.{si}.upsamplers.0.conv")
        dec["up"].append(stage)
    dec["norm_out"] = gn("decoder.conv_norm_out")
    dec["conv_out"] = conv("decoder.conv_out")
    return {"encoder": enc, "decoder": dec}
