"""Mesh-sharded FLUX inference: bf16 tensor parallelism over a TPU slice.

Why this exists: FLUX.1 is ~12B parameters (19 double + 38 single blocks at
hidden 3072, priors/flux.py:39-54).  Held f32 on one v5e chip that is
~48 GB against 16 GB of HBM — the reference's Stage-2 refiner
(reference train.py:38,448-460) simply cannot run single-device on this
hardware class.  The TPU-native answer is Megatron-style tensor parallelism
over the ICI mesh with bf16 parameters:

  * attention q/k/v projections column-sharded (whole heads per device),
    output projections row-sharded with a ``psum`` to rebuild the residual
    stream;
  * MLP up-projections column-sharded, down-projections row-sharded with a
    ``psum``;
  * the large AdaLN modulation projections (d -> 6d / 3d; ~4.4 GB of
    FLUX.1) column-sharded with a tiny ``all_gather`` of the (B, 6d)
    result;
  * everything else (embedders, norm scales, final head; ~0.13 GB bf16)
    replicated;
  * per-device blocks run under one ``lax.scan`` over stacked block
    parameters — one trace/compile regardless of depth.

HBM budget (FLUX.1-dev, bf16, from count_flux_params):
    total ~11.9B params = 23.8 GB
    tp=8 : 2.96 GB sharded + 0.13 GB replicated = ~3.1 GB/chip  -> fits
           v5e (16 GB) with >12 GB left for activations + VAE + scene.
    tp=4 : ~6.0 GB/chip                                          -> fits.
    Activations at 1024x1024 (4096 tokens, batch 8, bf16): the largest
    live tensor is a (8, 4096, 3072) stream = 201 MB; attention scores
    per device are (8, heads/tp, 4224, 4224) bf16 = 0.85 GB at tp=8 —
    within budget (flash-style chunking is unnecessary at these sizes).

Row-sharded biases are added AFTER the psum (a naive translation adds them
``tp`` times).  Numerics: bf16 storage/compute with f32 attention
accumulation (``preferred_element_type``) and f32 layer/RMS norms; the
8-device CPU-mesh parity test (tests/test_flux_shard.py) pins the sharded
f32 path to the single-device reference at <=2e-5.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from skyfall_gs_tpu.priors.flux import (
    FluxConfig,
    FluxCond,
    _sinusoidal,
    _time_mlp,
    rope_freqs,
)


# ----------------------------------------------------------------------------
# Parameter stacking + sharding rules
# ----------------------------------------------------------------------------

def stack_flux_params(params):
    """List-of-block pytrees -> stacked arrays with a leading depth axis.

    The single-block fused output projection (d + mlp, d) is split into
    ``out_attn`` (d, d) and ``out_mlp`` (mlp, d) so each half row-shards
    cleanly along its own width (a contiguous split of the fused rows
    would straddle the attn/mlp boundary).
    """
    stacked = {k: v for k, v in params.items() if k not in ("double", "single")}

    def stack(blocks):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    stacked["double"] = stack(params["double"])
    singles = []
    for blk in params["single"]:
        d_in = blk["q"]["w"].shape[0]
        blk = dict(blk)
        out = blk.pop("out")
        blk["out_attn"] = {"w": out["w"][:d_in]}
        blk["out_mlp"] = {"w": out["w"][d_in:]}
        blk["out_b"] = out["b"]
        singles.append(blk)
    stacked["single"] = stack(singles)
    return stacked


def _col(depth_axis=True):
    """Column-parallel linear: outputs sharded."""
    return {"w": P(None, None, "tp") if depth_axis else P(None, "tp"),
            "b": P(None, "tp") if depth_axis else P("tp")}


def _row(depth_axis=True):
    """Row-parallel linear: inputs sharded, bias added post-psum."""
    return {"w": P(None, "tp", None) if depth_axis else P("tp", None),
            "b": P(None) if depth_axis else P()}


def flux_param_specs(cfg: FluxConfig):
    """PartitionSpec pytree matching :func:`stack_flux_params` output."""
    rep2 = {"w": P(), "b": P()}
    repm = {"fc1": rep2, "fc2": rep2}
    double = {
        "img_mod": _col(), "txt_mod": _col(),
        "img_q": _col(), "img_k": _col(), "img_v": _col(),
        "txt_q": _col(), "txt_k": _col(), "txt_v": _col(),
        "img_qnorm": P(), "img_knorm": P(),
        "txt_qnorm": P(), "txt_knorm": P(),
        "img_out": _row(), "txt_out": _row(),
        "img_mlp1": _col(), "img_mlp2": _row(),
        "txt_mlp1": _col(), "txt_mlp2": _row(),
    }
    single = {
        "mod": _col(),
        "q": _col(), "k": _col(), "v": _col(),
        "qnorm": P(), "knorm": P(),
        "mlp_in": _col(),
        "out_attn": {"w": P(None, "tp", None)},
        "out_mlp": {"w": P(None, "tp", None)},
        "out_b": P(None),
    }
    return {
        "x_embedder": rep2,
        "context_embedder": rep2,
        "time_embedder": repm,
        "text_embedder": repm,
        "guidance_embedder": repm if cfg.guidance else None,
        "double": double,
        "single": single,
        "norm_out": rep2,
        "proj_out": rep2,
    }


def shard_flux_params(params, mesh: Mesh, cfg: FluxConfig,
                      dtype: Optional[jnp.dtype] = jnp.bfloat16):
    """Stack, (optionally) cast, and place parameters onto the mesh.

    ``params`` is the list-of-blocks pytree from ``init_flux_params`` /
    ``convert_torch_state_dict``.  With ``dtype=jnp.bfloat16`` (the
    production setting) every leaf is cast before placement, halving HBM.
    """
    stacked = stack_flux_params(params)
    if dtype is not None:
        stacked = jax.tree.map(lambda x: x.astype(dtype), stacked)
    specs = flux_param_specs(cfg)
    return jax.tree.map(
        lambda x, s: (None if x is None
                      else jax.device_put(x, NamedSharding(mesh, s))),
        stacked, specs,
        is_leaf=lambda x: x is None)


def count_flux_params(cfg: FluxConfig = FluxConfig()):
    """(total_params, sharded_params, replicated_params) — the HBM budget."""
    d, hd, mlp = cfg.hidden, cfg.head_dim, int(cfg.hidden * cfg.mlp_ratio)
    lin = lambda n_in, n_out: n_in * n_out + n_out
    dbl = (2 * lin(d, 6 * d)            # img/txt AdaLN modulation
           + 6 * lin(d, d) + 4 * hd     # q/k/v (both streams) + q/k norms
           + 2 * lin(d, d)              # img_out, txt_out
           + 2 * (lin(d, mlp) + lin(mlp, d)))   # img/txt MLPs
    sgl = (lin(d, 3 * d) + 3 * lin(d, d) + 2 * hd
           + lin(d, mlp) + lin(d + mlp, d))
    sharded = cfg.depth_double * dbl + cfg.depth_single * sgl
    mlp2 = lambda n_in: lin(n_in, d) + lin(d, d)
    rep = (lin(cfg.in_channels, d) + lin(cfg.joint_dim, d)
           + mlp2(cfg.time_freq_dim) + mlp2(cfg.pooled_dim)
           + (mlp2(cfg.time_freq_dim) if cfg.guidance else 0)
           + lin(d, 2 * d) + lin(d, cfg.in_channels))
    return sharded + rep, sharded, rep


# ----------------------------------------------------------------------------
# Per-device forward (runs under shard_map)
# ----------------------------------------------------------------------------

def _lin(x, p):
    return x @ p["w"] + p["b"]


def _layernorm32(x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _rmsnorm32(x, scale, eps=1e-6):
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(x32), -1, keepdims=True)
    return (x32 * jax.lax.rsqrt(ms + eps)).astype(x.dtype) * scale


def _modulate(x, shift, scale):
    return _layernorm32(x) * (1.0 + scale[:, None, :]) + shift[:, None, :]


def _heads(x, heads):
    b, n, d = x.shape
    return x.reshape(b, n, heads, d // heads).transpose(0, 2, 1, 3)


def _apply_rope(x, cos, sin):
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    xr, xi = x2[..., 0], x2[..., 1]
    out_r = xr * cos - xi * sin
    out_i = xr * sin + xi * cos
    return jnp.stack([out_r, out_i], axis=-1).reshape(x.shape).astype(x.dtype)


def _attention(q, k, v):
    hd = q.shape[-1]
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=jnp.float32) / math.sqrt(hd)
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    b, h, n, _ = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, n, h * hd)


def _gather_mod(temb, p, axis):
    """Column-sharded modulation projection + tiny all_gather of the result."""
    local = _lin(temb, p)                                   # (B, 6d/tp)
    return jax.lax.all_gather(local, axis, axis=1, tiled=True)


def _row_lin(x, p, axis):
    """Row-parallel linear: partial matmul, psum, then bias."""
    part = x @ p["w"]
    return jax.lax.psum(part, axis) + p["b"]


def _double_step(blk, img, txt, temb, cos, sin, heads_local, axis):
    im = _gather_mod(temb, blk["img_mod"], axis)
    tm = _gather_mod(temb, blk["txt_mod"], axis)
    (i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2) = jnp.split(im, 6, -1)
    (t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2) = jnp.split(tm, 6, -1)

    img_n = _modulate(img, i_sh1, i_sc1)
    txt_n = _modulate(txt, t_sh1, t_sc1)

    iq = _rmsnorm32(_heads(_lin(img_n, blk["img_q"]), heads_local),
                    blk["img_qnorm"])
    ik = _rmsnorm32(_heads(_lin(img_n, blk["img_k"]), heads_local),
                    blk["img_knorm"])
    iv = _heads(_lin(img_n, blk["img_v"]), heads_local)
    tq = _rmsnorm32(_heads(_lin(txt_n, blk["txt_q"]), heads_local),
                    blk["txt_qnorm"])
    tk = _rmsnorm32(_heads(_lin(txt_n, blk["txt_k"]), heads_local),
                    blk["txt_knorm"])
    tv = _heads(_lin(txt_n, blk["txt_v"]), heads_local)

    q = jnp.concatenate([tq, iq], axis=2)
    k = jnp.concatenate([tk, ik], axis=2)
    v = jnp.concatenate([tv, iv], axis=2)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    out = _attention(q, k, v)                               # (B, L, d/tp)
    lt = txt.shape[1]
    txt_a, img_a = out[:, :lt], out[:, lt:]

    img = img + i_g1[:, None, :] * _row_lin(img_a, blk["img_out"], axis)
    txt = txt + t_g1[:, None, :] * _row_lin(txt_a, blk["txt_out"], axis)

    img_m = _modulate(img, i_sh2, i_sc2)
    h = jax.nn.gelu(_lin(img_m, blk["img_mlp1"]), approximate=True)
    img = img + i_g2[:, None, :] * _row_lin(h, blk["img_mlp2"], axis)
    txt_m = _modulate(txt, t_sh2, t_sc2)
    h = jax.nn.gelu(_lin(txt_m, blk["txt_mlp1"]), approximate=True)
    txt = txt + t_g2[:, None, :] * _row_lin(h, blk["txt_mlp2"], axis)
    return img, txt


def _single_step(blk, x, temb, cos, sin, heads_local, axis):
    mod = _gather_mod(temb, blk["mod"], axis)
    sh, sc, g = jnp.split(mod, 3, -1)
    xn = _modulate(x, sh, sc)
    q = _rmsnorm32(_heads(_lin(xn, blk["q"]), heads_local), blk["qnorm"])
    k = _rmsnorm32(_heads(_lin(xn, blk["k"]), heads_local), blk["knorm"])
    v = _heads(_lin(xn, blk["v"]), heads_local)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    attn = _attention(q, k, v)                              # (B, L, d/tp)
    mlp = jax.nn.gelu(_lin(xn, blk["mlp_in"]), approximate=True)
    part = attn @ blk["out_attn"]["w"] + mlp @ blk["out_mlp"]["w"]
    out = jax.lax.psum(part, axis) + blk["out_b"]
    return x + g[:, None, :] * out


# ----------------------------------------------------------------------------
# Public entry
# ----------------------------------------------------------------------------

def make_sharded_flux_velocity(mesh: Mesh, cfg: FluxConfig,
                               tp_axis: str = "tp",
                               compute_dtype: Optional[jnp.dtype] = None):
    """Build the tensor-parallel ``v(tokens, t, cond)`` velocity field.

    Args:
        mesh: a Mesh whose ``tp_axis`` divides ``cfg.heads`` and
            ``cfg.hidden * cfg.mlp_ratio``.
        compute_dtype: cast the token/conditioning stream on entry
            (params carry their own dtype from ``shard_flux_params``);
            None keeps the input dtype.

    Returns:
        fn(stacked_params, img_tokens (B, L, C), img_ids (L, 3),
           cond: FluxCond, t scalar/(B,)) -> (B, L, C) f32 velocity.
    """
    tp = mesh.shape[tp_axis]
    if cfg.heads % tp:
        raise ValueError(f"heads={cfg.heads} not divisible by tp={tp}")
    heads_local = cfg.heads // tp
    specs = flux_param_specs(cfg)

    def body(params, img_tokens, img_ids, txt, pooled, guidance, t):
        b, l, _ = img_tokens.shape
        dt = compute_dtype or img_tokens.dtype
        txt = jnp.broadcast_to(txt, (b,) + txt.shape[1:])
        pooled = jnp.broadcast_to(pooled, (b,) + pooled.shape[1:])

        temb = _time_mlp(params["time_embedder"],
                         _sinusoidal(t * 1000.0, cfg.time_freq_dim)
                         .astype(dt))
        temb = temb + _time_mlp(params["text_embedder"], pooled.astype(dt))
        if cfg.guidance and params["guidance_embedder"] is not None:
            gv = jnp.broadcast_to(guidance, (b,))
            temb = temb + _time_mlp(
                params["guidance_embedder"],
                _sinusoidal(gv * 1000.0, cfg.time_freq_dim).astype(dt))
        temb = jax.nn.silu(temb)

        img = _lin(img_tokens.astype(dt), params["x_embedder"])
        txt_s = _lin(txt.astype(dt), params["context_embedder"])
        lt = txt_s.shape[1]

        txt_ids = jnp.zeros((lt, 3), jnp.int32)
        ids = jnp.concatenate([txt_ids, img_ids.astype(jnp.int32)], axis=0)
        cos, sin = rope_freqs(ids, cfg)

        def dstep(carry, blk):
            i, tx = _double_step(blk, carry[0], carry[1], temb, cos, sin,
                                 heads_local, tp_axis)
            return (i, tx), None

        (img, txt_s), _ = jax.lax.scan(dstep, (img, txt_s), params["double"])

        x = jnp.concatenate([txt_s, img], axis=1)

        def sstep(x, blk):
            return _single_step(blk, x, temb, cos, sin, heads_local,
                                tp_axis), None

        x, _ = jax.lax.scan(sstep, x, params["single"])
        img = x[:, lt:]

        scale, shift = jnp.split(_lin(temb, params["norm_out"]), 2, -1)
        img = _layernorm32(img) * (1.0 + scale[:, None, :]) \
            + shift[:, None, :]
        return _lin(img, params["proj_out"]).astype(jnp.float32)

    rep = P()
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(specs, rep, rep, rep, rep, rep, rep),
        out_specs=rep,
        check_vma=False)

    @jax.jit
    def velocity(stacked_params, img_tokens, img_ids, cond: FluxCond, t):
        b = img_tokens.shape[0]
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (b,))
        guidance = jnp.asarray(cond.guidance, jnp.float32)
        return sharded(stacked_params, img_tokens, img_ids,
                       cond.txt, cond.pooled, guidance, t)

    return velocity
