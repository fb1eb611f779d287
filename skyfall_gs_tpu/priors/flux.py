"""FLUX rectified-flow transformer (DiT) in pure JAX.

Capability parity: the reference's Stage-2 refiner runs FlowEdit on a FLUX
flow-matching backbone via HF diffusers (`FlowEditRefineIDU`, reference
train.py:38,448-460; FLUX pinned in requirements.txt, knobs at
arguments/__init__.py:267-274).  This module implements the FLUX
transformer TPU-natively as pure jitted functions over a parameter pytree
(the MoGe playbook, priors/moge.py):

  * double-stream (MMDiT) blocks: separate image/text streams with joint
    attention, AdaLN-Zero modulation from the (timestep, guidance, pooled
    text) conditioning vector;
  * single-stream blocks: fused parallel attention + MLP over the
    concatenated sequence;
  * 3-axis RoPE over (text, height, width) token ids;
  * q/k RMS normalization per head;
  * ``convert_torch_state_dict`` mapping a diffusers
    ``FluxTransformer2DModel`` checkpoint into the pytree (weights must be
    on local disk — no network egress);
  * random-init construction at any width for shape/jit tests.

The public entry is :func:`flux_velocity` — the ``v(z, t, cond)`` field the
FlowEdit ODE integrates (priors/flowedit.py).  Latent <-> token packing
helpers live here too; the VAE is in priors/flux_vae.py and the text
encoders in priors/text_encoders.py.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class FluxConfig(NamedTuple):
    """FluxTransformer2DModel hyperparameters (diffusers FLUX.1 defaults)."""

    in_channels: int = 64          # 16 VAE channels x 2x2 packing
    hidden: int = 3072             # heads * head_dim
    heads: int = 24
    head_dim: int = 128
    depth_double: int = 19
    depth_single: int = 38
    joint_dim: int = 4096          # T5-XXL feature width
    pooled_dim: int = 768          # CLIP-L pooled width
    axes_dim: tuple = (16, 56, 56)  # RoPE dims for (batch/text, y, x)
    theta: int = 10_000
    guidance: bool = True          # FLUX.1-dev; schnell has no guidance emb
    mlp_ratio: float = 4.0
    time_freq_dim: int = 256

    @classmethod
    def tiny(cls):
        """Reduced width for shape/jit tests (same topology)."""
        return cls(in_channels=16, hidden=64, heads=2, head_dim=32,
                   depth_double=2, depth_single=2, joint_dim=32,
                   pooled_dim=16, axes_dim=(8, 12, 12), time_freq_dim=32)


# ----------------------------------------------------------------------------
# Parameter construction
# ----------------------------------------------------------------------------

def _linear(key, n_in, n_out, scale=0.02):
    k1, _ = jax.random.split(key)
    return {"w": jax.random.normal(k1, (n_in, n_out)) * scale,
            "b": jnp.zeros(n_out)}


def init_flux_params(key, cfg: FluxConfig = FluxConfig()):
    d = cfg.hidden
    hd = cfg.head_dim
    mlp = int(d * cfg.mlp_ratio)
    nkeys = 20 + cfg.depth_double * 16 + cfg.depth_single * 8
    ki = iter(jax.random.split(key, nkeys))

    def mlp2(n_in):
        return {"fc1": _linear(next(ki), n_in, d), "fc2": _linear(next(ki), d, d)}

    params = {
        "x_embedder": _linear(next(ki), cfg.in_channels, d),
        "context_embedder": _linear(next(ki), cfg.joint_dim, d),
        "time_embedder": mlp2(cfg.time_freq_dim),
        "text_embedder": mlp2(cfg.pooled_dim),
        "guidance_embedder": mlp2(cfg.time_freq_dim) if cfg.guidance else None,
        "double": [],
        "single": [],
        "norm_out": _linear(next(ki), d, 2 * d),
        "proj_out": _linear(next(ki), d, cfg.in_channels),
    }
    for _ in range(cfg.depth_double):
        params["double"].append({
            "img_mod": _linear(next(ki), d, 6 * d),
            "txt_mod": _linear(next(ki), d, 6 * d),
            "img_q": _linear(next(ki), d, d),
            "img_k": _linear(next(ki), d, d),
            "img_v": _linear(next(ki), d, d),
            "txt_q": _linear(next(ki), d, d),
            "txt_k": _linear(next(ki), d, d),
            "txt_v": _linear(next(ki), d, d),
            "img_qnorm": jnp.ones(hd), "img_knorm": jnp.ones(hd),
            "txt_qnorm": jnp.ones(hd), "txt_knorm": jnp.ones(hd),
            "img_out": _linear(next(ki), d, d),
            "txt_out": _linear(next(ki), d, d),
            "img_mlp1": _linear(next(ki), d, mlp),
            "img_mlp2": _linear(next(ki), mlp, d),
            "txt_mlp1": _linear(next(ki), d, mlp),
            "txt_mlp2": _linear(next(ki), mlp, d),
        })
    for _ in range(cfg.depth_single):
        params["single"].append({
            "mod": _linear(next(ki), d, 3 * d),
            "q": _linear(next(ki), d, d),
            "k": _linear(next(ki), d, d),
            "v": _linear(next(ki), d, d),
            "qnorm": jnp.ones(hd), "knorm": jnp.ones(hd),
            "mlp_in": _linear(next(ki), d, mlp),
            "out": _linear(next(ki), d + mlp, d),
        })
    return params


# ----------------------------------------------------------------------------
# Building blocks
# ----------------------------------------------------------------------------

def _lin(x, p):
    return x @ p["w"] + p["b"]


def _layernorm(x, eps=1e-6):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _rmsnorm(x, scale, eps=1e-6):
    ms = jnp.mean(jnp.square(x), -1, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps) * scale


def _sinusoidal(t, dim, max_period=10_000.0):
    """diffusers Timesteps(flip_sin_to_cos=True): [cos | sin], t in [0, 1000]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half) / half)
    ang = t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def _time_mlp(p, emb):
    return _lin(jax.nn.silu(_lin(emb, p["fc1"])), p["fc2"])


def rope_freqs(ids: jnp.ndarray, cfg: FluxConfig):
    """(L, 3) position ids -> (L, head_dim/2) cos/sin tables.

    Axis i contributes axes_dim[i]/2 frequency pairs at theta^-(2j/d_i).
    """
    parts_cos, parts_sin = [], []
    for ax, d_ax in enumerate(cfg.axes_dim):
        half = d_ax // 2
        omega = 1.0 / (cfg.theta ** (jnp.arange(half) * 2.0 / d_ax))
        ang = ids[:, ax:ax + 1].astype(jnp.float32) * omega[None, :]
        parts_cos.append(jnp.cos(ang))
        parts_sin.append(jnp.sin(ang))
    return jnp.concatenate(parts_cos, -1), jnp.concatenate(parts_sin, -1)


def _apply_rope(x, cos, sin):
    """x: (B, H, L, hd) with hd = 2 * cos.shape[-1]; interleaved pairs."""
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    xr = x2[..., 0]
    xi = x2[..., 1]
    out_r = xr * cos - xi * sin
    out_i = xr * sin + xi * cos
    return jnp.stack([out_r, out_i], axis=-1).reshape(x.shape)


def _heads(x, heads):
    b, n, d = x.shape
    return x.reshape(b, n, heads, d // heads).transpose(0, 2, 1, 3)


def _attention(q, k, v):
    """(B, H, L, hd) each -> (B, L, H*hd), f32 accumulation on the MXU."""
    hd = q.shape[-1]
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=jnp.float32) / math.sqrt(hd)
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    b, h, n, _ = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, n, h * hd)


def _modulate(x, shift, scale):
    return _layernorm(x) * (1.0 + scale[:, None, :]) + shift[:, None, :]


def _double_block(p, img, txt, temb, cos, sin, cfg):
    h = cfg.heads
    im = _lin(temb, p["img_mod"])
    tm = _lin(temb, p["txt_mod"])
    (i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2) = jnp.split(im, 6, -1)
    (t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2) = jnp.split(tm, 6, -1)

    img_n = _modulate(img, i_sh1, i_sc1)
    txt_n = _modulate(txt, t_sh1, t_sc1)

    iq = _rmsnorm(_heads(_lin(img_n, p["img_q"]), h), p["img_qnorm"])
    ik = _rmsnorm(_heads(_lin(img_n, p["img_k"]), h), p["img_knorm"])
    iv = _heads(_lin(img_n, p["img_v"]), h)
    tq = _rmsnorm(_heads(_lin(txt_n, p["txt_q"]), h), p["txt_qnorm"])
    tk = _rmsnorm(_heads(_lin(txt_n, p["txt_k"]), h), p["txt_knorm"])
    tv = _heads(_lin(txt_n, p["txt_v"]), h)

    # Joint attention over [txt; img] (diffusers concatenation order).
    q = jnp.concatenate([tq, iq], axis=2)
    k = jnp.concatenate([tk, ik], axis=2)
    v = jnp.concatenate([tv, iv], axis=2)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    out = _attention(q, k, v)
    lt = txt.shape[1]
    txt_a, img_a = out[:, :lt], out[:, lt:]

    img = img + i_g1[:, None, :] * _lin(img_a, p["img_out"])
    txt = txt + t_g1[:, None, :] * _lin(txt_a, p["txt_out"])

    img_m = _modulate(img, i_sh2, i_sc2)
    img = img + i_g2[:, None, :] * _lin(
        jax.nn.gelu(_lin(img_m, p["img_mlp1"]), approximate=True), p["img_mlp2"])
    txt_m = _modulate(txt, t_sh2, t_sc2)
    txt = txt + t_g2[:, None, :] * _lin(
        jax.nn.gelu(_lin(txt_m, p["txt_mlp1"]), approximate=True), p["txt_mlp2"])
    return img, txt


def _single_block(p, x, temb, cos, sin, cfg):
    h = cfg.heads
    sh, sc, g = jnp.split(_lin(temb, p["mod"]), 3, -1)
    xn = _modulate(x, sh, sc)
    q = _rmsnorm(_heads(_lin(xn, p["q"]), h), p["qnorm"])
    k = _rmsnorm(_heads(_lin(xn, p["k"]), h), p["knorm"])
    v = _heads(_lin(xn, p["v"]), h)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    attn = _attention(q, k, v)
    mlp = jax.nn.gelu(_lin(xn, p["mlp_in"]), approximate=True)
    out = _lin(jnp.concatenate([attn, mlp], axis=-1), p["out"])
    return x + g[:, None, :] * out


# ----------------------------------------------------------------------------
# Velocity field
# ----------------------------------------------------------------------------

class FluxCond(NamedTuple):
    """Conditioning bundle for one prompt."""

    txt: jnp.ndarray       # (B or 1, Lt, joint_dim) T5 sequence features
    pooled: jnp.ndarray    # (B or 1, pooled_dim) CLIP pooled features
    guidance: float = 3.5  # CFG-distilled guidance scale (FLUX.1-dev)


def flux_velocity(params, cfg: FluxConfig, img_tokens, img_ids, cond: FluxCond,
                  t) -> jnp.ndarray:
    """Predict dz/dt for packed latent tokens.

    Args:
        img_tokens: (B, L, in_channels) packed latents.
        img_ids: (L, 3) int positions (0, y, x).
        cond: text conditioning (broadcast over B if leading dim 1).
        t: scalar or (B,) sigma in [0, 1] (diffusers passes t*1000 to the
            sinusoidal embedder).

    Returns:
        (B, L, in_channels) velocity.
    """
    b, l, _ = img_tokens.shape
    txt = jnp.broadcast_to(cond.txt, (b,) + cond.txt.shape[1:])
    pooled = jnp.broadcast_to(cond.pooled, (b,) + cond.pooled.shape[1:])
    lt = txt.shape[1]

    t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (b,))
    temb = _time_mlp(params["time_embedder"],
                     _sinusoidal(t * 1000.0, cfg.time_freq_dim))
    temb = temb + _time_mlp(params["text_embedder"], pooled)
    if cfg.guidance and params["guidance_embedder"] is not None:
        gvec = jnp.full((b,), cond.guidance, jnp.float32)
        temb = temb + _time_mlp(params["guidance_embedder"],
                                _sinusoidal(gvec * 1000.0, cfg.time_freq_dim))
    temb = jax.nn.silu(temb)

    img = _lin(img_tokens, params["x_embedder"])
    txt = _lin(txt, params["context_embedder"])

    txt_ids = jnp.zeros((lt, 3), jnp.int32)
    ids = jnp.concatenate([txt_ids, img_ids.astype(jnp.int32)], axis=0)
    cos, sin = rope_freqs(ids, cfg)

    for blk in params["double"]:
        img, txt = _double_block(blk, img, txt, temb, cos, sin, cfg)

    x = jnp.concatenate([txt, img], axis=1)
    for blk in params["single"]:
        x = _single_block(blk, x, temb, cos, sin, cfg)
    img = x[:, lt:]

    # AdaLayerNormContinuous: scale, shift (diffusers chunk order).
    scale, shift = jnp.split(_lin(temb, params["norm_out"]), 2, -1)
    img = _layernorm(img) * (1.0 + scale[:, None, :]) + shift[:, None, :]
    return _lin(img, params["proj_out"])


# ----------------------------------------------------------------------------
# Latent <-> token packing
# ----------------------------------------------------------------------------

def pack_latents(z: jnp.ndarray):
    """(B, h, w, C) VAE latents -> ((B, h/2*w/2, 4C) tokens, (L, 3) ids)."""
    b, h, w, c = z.shape
    tok = (z.reshape(b, h // 2, 2, w // 2, 2, c)
           .transpose(0, 1, 3, 2, 4, 5)
           .reshape(b, (h // 2) * (w // 2), 4 * c))
    ys, xs = jnp.meshgrid(jnp.arange(h // 2), jnp.arange(w // 2), indexing="ij")
    ids = jnp.stack([jnp.zeros_like(ys), ys, xs], axis=-1).reshape(-1, 3)
    return tok, ids


def unpack_latents(tok: jnp.ndarray, h: int, w: int):
    """Inverse of :func:`pack_latents` for a (h, w) latent grid."""
    b, l, c4 = tok.shape
    c = c4 // 4
    return (tok.reshape(b, h // 2, w // 2, 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h, w, c))


def shifted_sigmas(num_steps: int, image_seq_len: int,
                   base_len: int = 256, max_len: int = 4096,
                   base_shift: float = 0.5, max_shift: float = 1.15):
    """FLUX resolution-dependent sigma schedule (FlowMatchEulerDiscrete
    dynamic shifting): sigma' = exp(mu) / (exp(mu) + 1/sigma - 1)."""
    m = (max_shift - base_shift) / (max_len - base_len)
    mu = image_seq_len * m + (base_shift - base_len * m)
    sig = jnp.linspace(1.0, 1.0 / num_steps, num_steps)
    sig = jnp.exp(mu) / (jnp.exp(mu) + (1.0 / sig - 1.0))
    return jnp.concatenate([sig, jnp.zeros(1)])


# ----------------------------------------------------------------------------
# Torch checkpoint conversion (diffusers FluxTransformer2DModel keys)
# ----------------------------------------------------------------------------

def convert_torch_state_dict(state_dict: Dict[str, "np.ndarray"],
                             cfg: FluxConfig = FluxConfig()):
    """Map a diffusers ``FluxTransformer2DModel`` state dict into the pytree.

    Accepts numpy-valued dicts (call ``.numpy()`` on torch tensors first).
    Every parameter in the returned tree comes from the checkpoint — nothing
    is left random-initialized (raises KeyError on missing keys).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def lin(prefix):
        return {"w": jnp.asarray(sd[prefix + ".weight"].T),
                "b": jnp.asarray(sd[prefix + ".bias"])}

    def mlp2(prefix):
        return {"fc1": lin(prefix + ".linear_1"), "fc2": lin(prefix + ".linear_2")}

    params = {
        "x_embedder": lin("x_embedder"),
        "context_embedder": lin("context_embedder"),
        "time_embedder": mlp2("time_text_embed.timestep_embedder"),
        "text_embedder": {
            "fc1": lin("time_text_embed.text_embedder.linear_1"),
            "fc2": lin("time_text_embed.text_embedder.linear_2"),
        },
        "guidance_embedder": (
            mlp2("time_text_embed.guidance_embedder")
            if "time_text_embed.guidance_embedder.linear_1.weight" in sd
            else None),
        "double": [],
        "single": [],
        "norm_out": lin("norm_out.linear"),
        "proj_out": lin("proj_out"),
    }
    for i in range(cfg.depth_double):
        p = f"transformer_blocks.{i}"
        params["double"].append({
            "img_mod": lin(f"{p}.norm1.linear"),
            "txt_mod": lin(f"{p}.norm1_context.linear"),
            "img_q": lin(f"{p}.attn.to_q"),
            "img_k": lin(f"{p}.attn.to_k"),
            "img_v": lin(f"{p}.attn.to_v"),
            "txt_q": lin(f"{p}.attn.add_q_proj"),
            "txt_k": lin(f"{p}.attn.add_k_proj"),
            "txt_v": lin(f"{p}.attn.add_v_proj"),
            "img_qnorm": jnp.asarray(sd[f"{p}.attn.norm_q.weight"]),
            "img_knorm": jnp.asarray(sd[f"{p}.attn.norm_k.weight"]),
            "txt_qnorm": jnp.asarray(sd[f"{p}.attn.norm_added_q.weight"]),
            "txt_knorm": jnp.asarray(sd[f"{p}.attn.norm_added_k.weight"]),
            "img_out": lin(f"{p}.attn.to_out.0"),
            "txt_out": lin(f"{p}.attn.to_add_out"),
            "img_mlp1": lin(f"{p}.ff.net.0.proj"),
            "img_mlp2": lin(f"{p}.ff.net.2"),
            "txt_mlp1": lin(f"{p}.ff_context.net.0.proj"),
            "txt_mlp2": lin(f"{p}.ff_context.net.2"),
        })
    for i in range(cfg.depth_single):
        p = f"single_transformer_blocks.{i}"
        params["single"].append({
            "mod": lin(f"{p}.norm.linear"),
            "q": lin(f"{p}.attn.to_q"),
            "k": lin(f"{p}.attn.to_k"),
            "v": lin(f"{p}.attn.to_v"),
            "qnorm": jnp.asarray(sd[f"{p}.attn.norm_q.weight"]),
            "knorm": jnp.asarray(sd[f"{p}.attn.norm_k.weight"]),
            "mlp_in": lin(f"{p}.proj_mlp"),
            "out": lin(f"{p}.proj_out"),
        })
    return params
