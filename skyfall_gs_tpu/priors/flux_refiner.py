"""FLUX-backed FlowEdit refiner: wiring the DiT + VAE + text conditioning.

Capability parity: the reference constructs ``FlowEditRefineIDU(save_path,
device, model_type="FLUX")`` and calls ``.run(imgs, n_min, n_max, n_max_end,
n_avg)`` (reference train.py:448-460).  This module builds the same backend
from the TPU-native pieces:

  * priors/flux.py        — the rectified-flow DiT velocity field
  * priors/flux_vae.py    — latent encode/decode
  * priors/text_encoders.py — T5 sequence + CLIP pooled conditioning

Weights must be local (no network egress).  ``build_flux_refiner`` accepts
either a diffusers-layout checkpoint directory or in-memory parameter
pytrees (random-init at reduced width for tests); conditioning comes from
precomputed prompt embeddings or token ids + local text-encoder weights.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from skyfall_gs_tpu.priors.flowedit import FlowEditRefiner
from skyfall_gs_tpu.priors.flux import (
    FluxConfig,
    FluxCond,
    flux_velocity,
    pack_latents,
    shifted_sigmas,
    unpack_latents,
)
from skyfall_gs_tpu.priors.flux_vae import VAEConfig, vae_decode, vae_encode


def _load_torch_dir(path: str):
    """Load every *.safetensors / *.bin under ``path`` into one numpy dict."""
    sd = {}
    for root, _, files in os.walk(path):
        for f in sorted(files):
            fp = os.path.join(root, f)
            if f.endswith(".safetensors"):
                from safetensors import safe_open

                with safe_open(fp, framework="np") as h:
                    for k in h.keys():
                        sd[k] = h.get_tensor(k)
            elif f.endswith((".bin", ".pt", ".pth")):
                import torch

                obj = torch.load(fp, map_location="cpu", weights_only=True)
                if isinstance(obj, dict) and "state_dict" in obj:
                    obj = obj["state_dict"]
                sd.update({k: v.numpy() for k, v in obj.items()})
    if not sd:
        raise FileNotFoundError(f"no torch weights found under {path}")
    return sd


def default_conditioning(cfg: FluxConfig, rng=None,
                         guidance_src: float = 1.5,
                         guidance_tar: float = 5.5,
                         txt_len: int = 64):
    """Zero (or random for tests) prompt embeddings for both branches."""
    if rng is None:
        src_txt = jnp.zeros((1, txt_len, cfg.joint_dim))
        src_pool = jnp.zeros((1, cfg.pooled_dim))
        tar_txt, tar_pool = src_txt, src_pool
    else:
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        src_txt = jax.random.normal(k1, (1, txt_len, cfg.joint_dim)) * 0.02
        src_pool = jax.random.normal(k2, (1, cfg.pooled_dim)) * 0.02
        tar_txt = jax.random.normal(k3, (1, txt_len, cfg.joint_dim)) * 0.02
        tar_pool = jax.random.normal(k4, (1, cfg.pooled_dim)) * 0.02
    return (FluxCond(src_txt, src_pool, guidance_src),
            FluxCond(tar_txt, tar_pool, guidance_tar))


def encode_prompts(src_ids_t5, tar_ids_t5, src_ids_clip, tar_ids_clip,
                   t5_params, clip_params,
                   t5_cfg=None, clip_cfg=None,
                   guidance_src: float = 1.5, guidance_tar: float = 5.5):
    """Build (src_cond, tar_cond) from token ids + local encoder weights."""
    from skyfall_gs_tpu.priors.text_encoders import (
        CLIPTextConfig,
        T5Config,
        clip_text_encode,
        t5_encode,
    )

    t5_cfg = t5_cfg or T5Config()
    clip_cfg = clip_cfg or CLIPTextConfig()
    src_txt = t5_encode(t5_params, jnp.asarray(src_ids_t5), t5_cfg)
    tar_txt = t5_encode(t5_params, jnp.asarray(tar_ids_t5), t5_cfg)
    _, src_pool = clip_text_encode(clip_params, jnp.asarray(src_ids_clip),
                                   clip_cfg)
    _, tar_pool = clip_text_encode(clip_params, jnp.asarray(tar_ids_clip),
                                   clip_cfg)
    return (FluxCond(src_txt, src_pool, guidance_src),
            FluxCond(tar_txt, tar_pool, guidance_tar))


def build_flux_refiner(
    checkpoint_path: Optional[str] = None,
    transformer_params=None,
    vae_params=None,
    src_cond: Optional[FluxCond] = None,
    tar_cond: Optional[FluxCond] = None,
    cfg: FluxConfig = FluxConfig(),
    vae_cfg: VAEConfig = VAEConfig(),
    num_steps: int = 28,
    save_path: Optional[str] = None,
    batch_size: int = 8,
    seed: int = 0,
    use_shifted_sigmas: bool = True,
    image_size: Optional[int] = None,
    mesh=None,
    tp_dtype="bfloat16",
) -> FlowEditRefiner:
    """Construct the FLUX FlowEdit refine backend.

    Args:
        checkpoint_path: diffusers pipeline directory (subdirs
            ``transformer/`` and ``vae/``) or a flat directory of torch
            weights.  Mutually optional with explicit params.
        transformer_params / vae_params: in-memory pytrees (tests use
            random init at ``FluxConfig.tiny()`` width).
        src_cond / tar_cond: prompt conditioning; defaults to zero
            embeddings (structure-preserving edit) when omitted.
        image_size: pixel size of the frames for the resolution-shifted
            sigma schedule.  When None (the default) the schedule is
            computed per image shape from the actual latent token count
            at run time — pass a size only to pin one static grid.
        mesh: a ``jax.sharding.Mesh`` with a ``"tp"`` axis.  When given,
            the DiT runs tensor-parallel over the mesh with parameters
            cast to ``tp_dtype`` (bf16 by default) — the production
            setting: full FLUX.1 is ~12B params and only fits a v5e
            slice sharded (priors/flux_shard.py documents the HBM
            budget).  The VAE (~80M params) stays replicated.
    """
    if transformer_params is None or vae_params is None:
        if checkpoint_path is None:
            raise RuntimeError(
                "No local FLUX weights available (no network egress). Pass "
                "checkpoint_path=<diffusers FLUX dir> or explicit "
                "transformer_params/vae_params.")
        from skyfall_gs_tpu.priors.flux import (
            convert_torch_state_dict as conv_tf)
        from skyfall_gs_tpu.priors.flux_vae import (
            convert_torch_state_dict as conv_vae)

        tf_dir = os.path.join(checkpoint_path, "transformer")
        vae_dir = os.path.join(checkpoint_path, "vae")
        if transformer_params is None:
            transformer_params = conv_tf(
                _load_torch_dir(tf_dir if os.path.isdir(tf_dir)
                                else checkpoint_path), cfg)
        if vae_params is None:
            vae_params = conv_vae(
                _load_torch_dir(vae_dir if os.path.isdir(vae_dir)
                                else checkpoint_path), vae_cfg)

    if src_cond is None or tar_cond is None:
        d_src, d_tar = default_conditioning(cfg)
        src_cond = src_cond or d_src
        tar_cond = tar_cond or d_tar

    # One (encode, decode, velocity) closure TRIPLE per image shape,
    # lru-cached: the velocity field is a static argument of the jitted
    # FlowEdit ODE, so the per-shape closure identity is what keys its jit
    # cache.  (Two aspect ratios can produce the same packed token count —
    # the latent grid and RoPE ids must not leak between them via
    # trace-time state.)
    import functools

    factor = 2 ** (len(vae_cfg.ch_mult) - 1)

    if mesh is not None:
        from skyfall_gs_tpu.priors.flux_shard import (
            make_sharded_flux_velocity,
            shard_flux_params,
        )

        dtype = jnp.dtype(tp_dtype) if tp_dtype is not None else None
        sharded_params = shard_flux_params(transformer_params, mesh, cfg,
                                           dtype=dtype)
        sharded_vel = make_sharded_flux_velocity(mesh, cfg)

    @functools.lru_cache(maxsize=None)
    def shape_fns(height: int, width: int):
        lh, lw = height // factor, width // factor
        ys, xs = np.meshgrid(np.arange(lh // 2), np.arange(lw // 2),
                             indexing="ij")
        ids = jnp.asarray(
            np.stack([np.zeros_like(ys), ys, xs], -1).reshape(-1, 3))

        @jax.jit
        def encode_fn(imgs: jnp.ndarray) -> jnp.ndarray:
            """(B, H, W, 3) in [0, 1] -> (B, L, 4*latent_ch) tokens."""
            z = vae_encode(vae_params, vae_cfg, imgs * 2.0 - 1.0)
            tok, _ = pack_latents(z)
            return tok

        @jax.jit
        def decode_fn(tok: jnp.ndarray) -> jnp.ndarray:
            z = unpack_latents(tok, lh, lw)
            img = vae_decode(vae_params, vae_cfg, z)
            return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

        if mesh is not None:
            def velocity_fn(tok: jnp.ndarray, t, cond: FluxCond):
                return sharded_vel(sharded_params, tok, ids, cond, t)
        else:
            def velocity_fn(tok: jnp.ndarray, t, cond: FluxCond):
                return flux_velocity(transformer_params, cfg, tok, ids,
                                     cond, t)

        return encode_fn, decode_fn, velocity_fn

    sigmas = None
    sigmas_fn = None
    if use_shifted_sigmas:
        if image_size is not None:
            seq_len = (image_size // 16) ** 2
            sigmas = shifted_sigmas(num_steps, seq_len)
        else:
            # Resolution-shifted schedule from the actual packed token
            # count of each frame shape (VAE /factor then 2x2 packing).
            @functools.lru_cache(maxsize=None)
            def sigmas_fn(height: int, width: int):
                seq_len = (height // (2 * factor)) * (width // (2 * factor))
                return shifted_sigmas(num_steps, seq_len)

    return FlowEditRefiner(
        save_path=save_path,
        model_type="FLUX",
        shape_fns=shape_fns,
        src_cond=src_cond,
        tar_cond=tar_cond,
        num_steps=num_steps,
        seed=seed,
        batch_size=batch_size,
        sigmas=sigmas,
        sigmas_fn=sigmas_fn,
    )
