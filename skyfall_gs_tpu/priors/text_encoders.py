"""T5 and CLIP text encoders in pure JAX — FLUX conditioning.

Capability parity: the FLUX pipeline the reference's FlowEdit refiner wraps
(reference train.py:448-460; requirements.txt pins transformers==4.46.3)
conditions the DiT on two text encoders:

  * T5-XXL (``text_encoder_2``) producing the (L, 4096) token sequence fed
    to the joint-attention context stream;
  * CLIP-L (``text_encoder``) producing the (768,) pooled embedding mixed
    into the AdaLN conditioning vector.

Both are implemented TPU-natively as pure jitted functions over parameter
pytrees, with HF-key weight converters (weights must be local — no network
egress) and reduced-width random init for shape/jit tests.  Tokenization is
the caller's concern: these take token ids (any HF tokenizer on local disk
works; the IDU prompts are short static strings, so ids can also be
precomputed offline).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


# ----------------------------------------------------------------------------
# T5 encoder (v1.1 topology: RMSNorm, gated-GELU FF, relative position bias)
# ----------------------------------------------------------------------------

class T5Config(NamedTuple):
    vocab: int = 32_128
    d_model: int = 4096
    d_ff: int = 10_240
    heads: int = 64
    layers: int = 24
    rel_buckets: int = 32
    rel_max_dist: int = 128

    @classmethod
    def tiny(cls):
        return cls(vocab=128, d_model=32, d_ff=64, heads=2, layers=2,
                   rel_buckets=8, rel_max_dist=16)


def _mat(key, n_in, n_out, scale=0.02):
    return jax.random.normal(key, (n_in, n_out)) * scale


def init_t5_params(key, cfg: T5Config = T5Config()):
    ki = iter(jax.random.split(key, cfg.layers * 8 + 4))
    d = cfg.d_model
    params = {
        "embed": _mat(next(ki), cfg.vocab, d, 1.0),
        "rel_bias": _mat(next(ki), cfg.rel_buckets, cfg.heads, 0.02),
        "blocks": [],
        "final_norm": jnp.ones(d),
    }
    inner = cfg.heads * (d // cfg.heads)
    for _ in range(cfg.layers):
        params["blocks"].append({
            "ln1": jnp.ones(d),
            "q": _mat(next(ki), d, inner), "k": _mat(next(ki), d, inner),
            "v": _mat(next(ki), d, inner), "o": _mat(next(ki), inner, d),
            "ln2": jnp.ones(d),
            "wi0": _mat(next(ki), d, cfg.d_ff),
            "wi1": _mat(next(ki), d, cfg.d_ff),
            "wo": _mat(next(ki), cfg.d_ff, d),
        })
    return params


def _t5_rmsnorm(x, scale, eps=1e-6):
    ms = jnp.mean(jnp.square(x), -1, keepdims=True)
    return x * jax.lax.rsqrt(ms + eps) * scale


def _t5_rel_buckets(rel_pos, num_buckets, max_dist):
    """Bidirectional T5 relative position bucketing."""
    nb = num_buckets // 2
    out = jnp.where(rel_pos > 0, nb, 0)
    n = jnp.abs(rel_pos)
    max_exact = nb // 2
    large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_dist / max_exact) * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return out + jnp.where(n < max_exact, n, large)


def t5_encode(params, token_ids: jnp.ndarray, cfg: T5Config = T5Config(),
              attn_mask=None) -> jnp.ndarray:
    """(B, L) int32 -> (B, L, d_model) encoder features."""
    b, l = token_ids.shape
    heads = cfg.heads
    x = params["embed"][token_ids]

    pos = jnp.arange(l)
    buckets = _t5_rel_buckets(pos[None, :] - pos[:, None],
                              cfg.rel_buckets, cfg.rel_max_dist)
    bias = params["rel_bias"][buckets]                 # (L, L, H)
    bias = bias.transpose(2, 0, 1)[None]               # (1, H, L, L)
    if attn_mask is not None:
        bias = bias + jnp.where(attn_mask[:, None, None, :], 0.0, -1e9)

    def split(t):
        return t.reshape(b, l, heads, -1).transpose(0, 2, 1, 3)

    for blk in params["blocks"]:
        h = _t5_rmsnorm(x, blk["ln1"])
        q, k, v = split(h @ blk["q"]), split(h @ blk["k"]), split(h @ blk["v"])
        # T5 omits the 1/sqrt(d) attention scaling (folded into init).
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32) + bias
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, -1)
        x = x + o @ blk["o"]
        h = _t5_rmsnorm(x, blk["ln2"])
        ff = jax.nn.gelu(h @ blk["wi0"], approximate=True) * (h @ blk["wi1"])
        x = x + ff @ blk["wo"]
    return _t5_rmsnorm(x, params["final_norm"])


def convert_t5_state_dict(state_dict: Dict[str, "np.ndarray"],
                          cfg: T5Config = T5Config()):
    """Map an HF ``T5EncoderModel`` state dict into the pytree (raises
    KeyError on missing keys — nothing left random)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    emb = sd.get("shared.weight", sd.get("encoder.embed_tokens.weight"))
    params = {
        "embed": jnp.asarray(emb),
        "rel_bias": jnp.asarray(
            sd["encoder.block.0.layer.0.SelfAttention"
               ".relative_attention_bias.weight"]),
        "blocks": [],
        "final_norm": jnp.asarray(sd["encoder.final_layer_norm.weight"]),
    }
    for i in range(cfg.layers):
        p = f"encoder.block.{i}"
        params["blocks"].append({
            "ln1": jnp.asarray(sd[f"{p}.layer.0.layer_norm.weight"]),
            "q": jnp.asarray(sd[f"{p}.layer.0.SelfAttention.q.weight"].T),
            "k": jnp.asarray(sd[f"{p}.layer.0.SelfAttention.k.weight"].T),
            "v": jnp.asarray(sd[f"{p}.layer.0.SelfAttention.v.weight"].T),
            "o": jnp.asarray(sd[f"{p}.layer.0.SelfAttention.o.weight"].T),
            "ln2": jnp.asarray(sd[f"{p}.layer.1.layer_norm.weight"]),
            "wi0": jnp.asarray(sd[f"{p}.layer.1.DenseReluDense.wi_0.weight"].T),
            "wi1": jnp.asarray(sd[f"{p}.layer.1.DenseReluDense.wi_1.weight"].T),
            "wo": jnp.asarray(sd[f"{p}.layer.1.DenseReluDense.wo.weight"].T),
        })
    return params


# ----------------------------------------------------------------------------
# CLIP text encoder (ViT-L/14 text tower; pooled output at the EOT token)
# ----------------------------------------------------------------------------

class CLIPTextConfig(NamedTuple):
    vocab: int = 49_408
    width: int = 768
    heads: int = 12
    layers: int = 12
    max_len: int = 77
    eos_id: int = 49_407

    @classmethod
    def tiny(cls):
        return cls(vocab=128, width=32, heads=2, layers=2, max_len=16,
                   eos_id=127)


def init_clip_text_params(key, cfg: CLIPTextConfig = CLIPTextConfig()):
    ki = iter(jax.random.split(key, cfg.layers * 8 + 4))
    d = cfg.width

    def linp(n_in, n_out):
        return {"w": _mat(next(ki), n_in, n_out), "b": jnp.zeros(n_out)}

    params = {
        "token_embed": _mat(next(ki), cfg.vocab, d),
        "pos_embed": _mat(next(ki), cfg.max_len, d),
        "blocks": [],
        "final_ln": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
    }
    for _ in range(cfg.layers):
        params["blocks"].append({
            "ln1": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
            "q": linp(d, d), "k": linp(d, d), "v": linp(d, d),
            "out": linp(d, d),
            "ln2": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
            "fc1": linp(d, 4 * d),
            "fc2": linp(4 * d, d),
        })
    return params


def _ln(x, p, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def clip_text_encode(params, token_ids: jnp.ndarray,
                     cfg: CLIPTextConfig = CLIPTextConfig()):
    """(B, L) int32 -> ((B, L, width) hidden, (B, width) pooled-at-EOT)."""
    b, l = token_ids.shape
    heads = cfg.heads
    d = cfg.width
    x = params["token_embed"][token_ids] + params["pos_embed"][None, :l]
    causal = jnp.where(
        jnp.arange(l)[None, :] <= jnp.arange(l)[:, None], 0.0, -1e9)

    def split(t):
        return t.reshape(b, l, heads, -1).transpose(0, 2, 1, 3)

    for blk in params["blocks"]:
        h = _ln(x, blk["ln1"])
        q = split(h @ blk["q"]["w"] + blk["q"]["b"])
        k = split(h @ blk["k"]["w"] + blk["k"]["b"])
        v = split(h @ blk["v"]["w"] + blk["v"]["b"])
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn / np.sqrt(d // heads) + causal
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, d)
        x = x + o @ blk["out"]["w"] + blk["out"]["b"]
        h = _ln(x, blk["ln2"])
        # CLIP quick_gelu
        h = h @ blk["fc1"]["w"] + blk["fc1"]["b"]
        h = h * jax.nn.sigmoid(1.702 * h)
        x = x + h @ blk["fc2"]["w"] + blk["fc2"]["b"]

    x = _ln(x, params["final_ln"])
    eot = jnp.argmax((token_ids == cfg.eos_id).astype(jnp.int32), axis=1)
    pooled = x[jnp.arange(b), eot]
    return x, pooled


def convert_clip_text_state_dict(state_dict: Dict[str, "np.ndarray"],
                                 cfg: CLIPTextConfig = CLIPTextConfig()):
    """Map an HF ``CLIPTextModel`` state dict into the pytree."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    t = "text_model"

    def linp(prefix):
        return {"w": jnp.asarray(sd[prefix + ".weight"].T),
                "b": jnp.asarray(sd[prefix + ".bias"])}

    def lnp(prefix):
        return {"scale": jnp.asarray(sd[prefix + ".weight"]),
                "bias": jnp.asarray(sd[prefix + ".bias"])}

    params = {
        "token_embed": jnp.asarray(
            sd[f"{t}.embeddings.token_embedding.weight"]),
        "pos_embed": jnp.asarray(
            sd[f"{t}.embeddings.position_embedding.weight"]),
        "blocks": [],
        "final_ln": lnp(f"{t}.final_layer_norm"),
    }
    for i in range(cfg.layers):
        p = f"{t}.encoder.layers.{i}"
        params["blocks"].append({
            "ln1": lnp(f"{p}.layer_norm1"),
            "q": linp(f"{p}.self_attn.q_proj"),
            "k": linp(f"{p}.self_attn.k_proj"),
            "v": linp(f"{p}.self_attn.v_proj"),
            "out": linp(f"{p}.self_attn.out_proj"),
            "ln2": lnp(f"{p}.layer_norm2"),
            "fc1": linp(f"{p}.mlp.fc1"),
            "fc2": linp(f"{p}.mlp.fc2"),
        })
    return params
