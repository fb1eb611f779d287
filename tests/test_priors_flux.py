"""FLUX backbone tests: DiT velocity, VAE, text encoders, FlowEdit wiring.

All at reduced width (same topology as FLUX.1) — real weights cannot be
fetched in this environment, so these validate shapes, jit-ability, the
torch-key converters (zero random leaves), and the single-compile batched
FlowEdit contract.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skyfall_gs_tpu.priors.flowedit import flow_edit_ode, flow_edit_ode_batch
from skyfall_gs_tpu.priors.flux import (
    FluxConfig,
    FluxCond,
    convert_torch_state_dict,
    flux_velocity,
    init_flux_params,
    pack_latents,
    shifted_sigmas,
    unpack_latents,
)
from skyfall_gs_tpu.priors.flux_vae import (
    VAEConfig,
    init_vae_params,
    vae_decode,
    vae_encode,
)
from skyfall_gs_tpu.priors.flux_vae import (
    convert_torch_state_dict as convert_vae_sd,
)


def _tiny_cond(cfg, key, guidance=3.5):
    k1, k2 = jax.random.split(key)
    return FluxCond(
        txt=jax.random.normal(k1, (1, 6, cfg.joint_dim)) * 0.02,
        pooled=jax.random.normal(k2, (1, cfg.pooled_dim)) * 0.02,
        guidance=guidance,
    )


class TestFluxTransformer:
    def test_velocity_shapes_and_jit(self):
        cfg = FluxConfig.tiny()
        params = init_flux_params(jax.random.PRNGKey(0), cfg)
        z = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.in_channels))
        ys, xs = jnp.meshgrid(jnp.arange(4), jnp.arange(4), indexing="ij")
        ids = jnp.stack([jnp.zeros_like(ys), ys, xs], -1).reshape(-1, 3)
        cond = _tiny_cond(cfg, jax.random.PRNGKey(2))
        v = jax.jit(lambda p, z, t: flux_velocity(p, cfg, z, ids, cond, t))(
            params, z, 0.7)
        assert v.shape == z.shape
        assert bool(jnp.all(jnp.isfinite(v)))

    def test_schnell_variant_no_guidance(self):
        cfg = FluxConfig.tiny()._replace(guidance=False)
        params = init_flux_params(jax.random.PRNGKey(0), cfg)
        assert params["guidance_embedder"] is None
        z = jnp.zeros((1, 4, cfg.in_channels))
        ids = jnp.zeros((4, 3), jnp.int32)
        cond = _tiny_cond(cfg, jax.random.PRNGKey(2))
        v = flux_velocity(params, cfg, z, ids, cond, 0.5)
        assert v.shape == z.shape

    def test_pack_unpack_roundtrip(self):
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 6, 16))
        tok, ids = pack_latents(z)
        assert tok.shape == (2, 12, 64)
        assert ids.shape == (12, 3)
        # ids enumerate the packed grid row-major
        np.testing.assert_array_equal(np.asarray(ids[:, 1]),
                                      np.repeat(np.arange(4), 3))
        z2 = unpack_latents(tok, 8, 6)
        np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-7)

    def test_shifted_sigmas_monotone(self):
        s = np.asarray(shifted_sigmas(28, (512 // 16) ** 2))
        assert s.shape == (29,)
        assert s[0] > 0.9 and s[-1] == 0.0
        assert (np.diff(s) < 0).all()

    def test_convert_torch_state_dict_full_coverage(self):
        """A name-faithful diffusers-layout fake checkpoint converts with
        zero random leaves (missing keys raise)."""
        import torch

        cfg = FluxConfig.tiny()
        d, hd, mlp = cfg.hidden, cfg.head_dim, int(cfg.hidden * cfg.mlp_ratio)
        g = torch.Generator().manual_seed(0)
        MAGIC = 0.123

        def lin(o, i):
            return {"weight": torch.full((o, i), MAGIC),
                    "bias": torch.zeros(o)}

        sd = {}

        def add(prefix, p):
            for k, v in p.items():
                sd[f"{prefix}.{k}"] = v

        add("x_embedder", lin(d, cfg.in_channels))
        add("context_embedder", lin(d, cfg.joint_dim))
        add("time_text_embed.timestep_embedder.linear_1",
            lin(d, cfg.time_freq_dim))
        add("time_text_embed.timestep_embedder.linear_2", lin(d, d))
        add("time_text_embed.text_embedder.linear_1", lin(d, cfg.pooled_dim))
        add("time_text_embed.text_embedder.linear_2", lin(d, d))
        add("time_text_embed.guidance_embedder.linear_1",
            lin(d, cfg.time_freq_dim))
        add("time_text_embed.guidance_embedder.linear_2", lin(d, d))
        add("norm_out.linear", lin(2 * d, d))
        add("proj_out", lin(cfg.in_channels, d))
        for i in range(cfg.depth_double):
            p = f"transformer_blocks.{i}"
            add(f"{p}.norm1.linear", lin(6 * d, d))
            add(f"{p}.norm1_context.linear", lin(6 * d, d))
            for nm in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                       "add_v_proj"):
                add(f"{p}.attn.{nm}", lin(d, d))
            for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
                sd[f"{p}.attn.{nm}.weight"] = torch.ones(hd)
            add(f"{p}.attn.to_out.0", lin(d, d))
            add(f"{p}.attn.to_add_out", lin(d, d))
            add(f"{p}.ff.net.0.proj", lin(mlp, d))
            add(f"{p}.ff.net.2", lin(d, mlp))
            add(f"{p}.ff_context.net.0.proj", lin(mlp, d))
            add(f"{p}.ff_context.net.2", lin(d, mlp))
        for i in range(cfg.depth_single):
            p = f"single_transformer_blocks.{i}"
            add(f"{p}.norm.linear", lin(3 * d, d))
            for nm in ("to_q", "to_k", "to_v"):
                add(f"{p}.attn.{nm}", lin(d, d))
            sd[f"{p}.attn.norm_q.weight"] = torch.ones(hd)
            sd[f"{p}.attn.norm_k.weight"] = torch.ones(hd)
            add(f"{p}.proj_mlp", lin(mlp, d))
            add(f"{p}.proj_out", lin(d, d + mlp))

        params = convert_torch_state_dict(
            {k: v.numpy() for k, v in sd.items()}, cfg)
        # every weight matrix carries the checkpoint's value — no random init
        leaves = jax.tree.leaves(params)
        assert all(
            bool(jnp.all((l == MAGIC) | (l == 0.0) | (l == 1.0)))
            for l in leaves)
        # a missing block key must raise, not silently fall back to random
        sd.pop("transformer_blocks.0.attn.to_q.weight")
        with pytest.raises(KeyError):
            convert_torch_state_dict(
                {k: v.numpy() for k, v in sd.items()}, cfg)


class TestFluxVAE:
    def test_encode_decode_shapes(self):
        cfg = VAEConfig.tiny()
        params = init_vae_params(jax.random.PRNGKey(0), cfg)
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3)) * 2 - 1
        z = jax.jit(lambda p, x: vae_encode(p, cfg, x))(params, img)
        assert z.shape == (1, 8, 8, cfg.latent_ch)  # 2x downsample (tiny)
        out = jax.jit(lambda p, z: vae_decode(p, cfg, z))(params, z)
        assert out.shape == (1, 16, 16, 3)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_convert_torch_state_dict(self):
        import torch

        cfg = VAEConfig.tiny()
        chs = [cfg.base_ch * m for m in cfg.ch_mult]
        MAGIC = 0.25
        sd = {}

        def conv(prefix, o, i, k=3):
            sd[f"{prefix}.weight"] = torch.full((o, i, k, k), MAGIC)
            sd[f"{prefix}.bias"] = torch.zeros(o)

        def linw(prefix, o, i):
            sd[f"{prefix}.weight"] = torch.full((o, i), MAGIC)
            sd[f"{prefix}.bias"] = torch.zeros(o)

        def gn(prefix, c):
            sd[f"{prefix}.weight"] = torch.ones(c)
            sd[f"{prefix}.bias"] = torch.zeros(c)

        def resnet(prefix, cin, cout):
            gn(f"{prefix}.norm1", cin)
            conv(f"{prefix}.conv1", cout, cin)
            gn(f"{prefix}.norm2", cout)
            conv(f"{prefix}.conv2", cout, cout)
            if cin != cout:
                conv(f"{prefix}.conv_shortcut", cout, cin, k=1)

        def attn(prefix, c):
            gn(f"{prefix}.group_norm", c)
            for nm in ("to_q", "to_k", "to_v", "to_out.0"):
                linw(f"{prefix}.{nm}", c, c)

        conv("encoder.conv_in", chs[0], 3)
        cin = chs[0]
        for si, c in enumerate(chs):
            for j in range(cfg.num_res):
                resnet(f"encoder.down_blocks.{si}.resnets.{j}", cin, c)
                cin = c
            if si < len(chs) - 1:
                conv(f"encoder.down_blocks.{si}.downsamplers.0.conv", c, c)
        resnet("encoder.mid_block.resnets.0", cin, cin)
        attn("encoder.mid_block.attentions.0", cin)
        resnet("encoder.mid_block.resnets.1", cin, cin)
        gn("encoder.conv_norm_out", cin)
        conv("encoder.conv_out", 2 * cfg.latent_ch, cin)

        conv("decoder.conv_in", chs[-1], cfg.latent_ch)
        cin = chs[-1]
        resnet("decoder.mid_block.resnets.0", cin, cin)
        attn("decoder.mid_block.attentions.0", cin)
        resnet("decoder.mid_block.resnets.1", cin, cin)
        for si, c in enumerate(reversed(chs)):
            for j in range(cfg.num_res + 1):
                resnet(f"decoder.up_blocks.{si}.resnets.{j}", cin, c)
                cin = c
            if si < len(chs) - 1:
                conv(f"decoder.up_blocks.{si}.upsamplers.0.conv", c, c)
        gn("decoder.conv_norm_out", cin)
        conv("decoder.conv_out", 3, cin)

        params = convert_vae_sd({k: v.numpy() for k, v in sd.items()}, cfg)
        leaves = jax.tree.leaves(params)
        assert all(
            bool(jnp.all((l == MAGIC) | (l == 0.0) | (l == 1.0)))
            for l in leaves)
        img = jnp.zeros((1, 8, 8, 3))
        z = vae_encode(params, cfg, img)
        assert bool(jnp.all(jnp.isfinite(z)))


class TestTextEncoders:
    def test_t5_tiny(self):
        from skyfall_gs_tpu.priors.text_encoders import (
            T5Config,
            init_t5_params,
            t5_encode,
        )

        cfg = T5Config.tiny()
        params = init_t5_params(jax.random.PRNGKey(0), cfg)
        ids = jnp.asarray([[3, 5, 7, 0, 0]], jnp.int32)
        out = jax.jit(lambda p, i: t5_encode(p, i, cfg))(params, ids)
        assert out.shape == (1, 5, cfg.d_model)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_clip_tiny_pooled_at_eot(self):
        from skyfall_gs_tpu.priors.text_encoders import (
            CLIPTextConfig,
            clip_text_encode,
            init_clip_text_params,
        )

        cfg = CLIPTextConfig.tiny()
        params = init_clip_text_params(jax.random.PRNGKey(0), cfg)
        ids = jnp.asarray([[5, 9, cfg.eos_id, 0, 0]], jnp.int32)
        hidden, pooled = clip_text_encode(params, ids, cfg)
        assert hidden.shape == (1, 5, cfg.width)
        assert pooled.shape == (1, cfg.width)
        np.testing.assert_allclose(np.asarray(pooled[0]),
                                   np.asarray(hidden[0, 2]), atol=1e-6)

    def test_t5_converter(self):
        import torch

        from skyfall_gs_tpu.priors.text_encoders import (
            T5Config,
            convert_t5_state_dict,
            t5_encode,
        )

        cfg = T5Config.tiny()
        MAGIC = 0.5
        sd = {"shared.weight": torch.full((cfg.vocab, cfg.d_model), MAGIC),
              "encoder.final_layer_norm.weight": torch.ones(cfg.d_model),
              "encoder.block.0.layer.0.SelfAttention"
              ".relative_attention_bias.weight":
                  torch.full((cfg.rel_buckets, cfg.heads), MAGIC)}
        inner = cfg.d_model
        for i in range(cfg.layers):
            p = f"encoder.block.{i}"
            for nm in ("q", "k", "v", "o"):
                sd[f"{p}.layer.0.SelfAttention.{nm}.weight"] = torch.full(
                    (inner, cfg.d_model), MAGIC)
            sd[f"{p}.layer.0.layer_norm.weight"] = torch.ones(cfg.d_model)
            sd[f"{p}.layer.1.DenseReluDense.wi_0.weight"] = torch.full(
                (cfg.d_ff, cfg.d_model), MAGIC)
            sd[f"{p}.layer.1.DenseReluDense.wi_1.weight"] = torch.full(
                (cfg.d_ff, cfg.d_model), MAGIC)
            sd[f"{p}.layer.1.DenseReluDense.wo.weight"] = torch.full(
                (cfg.d_model, cfg.d_ff), MAGIC)
            sd[f"{p}.layer.1.layer_norm.weight"] = torch.ones(cfg.d_model)
        params = convert_t5_state_dict(
            {k: v.numpy() for k, v in sd.items()}, cfg)
        leaves = jax.tree.leaves(params)
        assert all(
            bool(jnp.all((l == MAGIC) | (l == 1.0))) for l in leaves)
        out = t5_encode(params, jnp.zeros((1, 3), jnp.int32), cfg)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_clip_converter(self):
        import torch

        from skyfall_gs_tpu.priors.text_encoders import (
            CLIPTextConfig,
            clip_text_encode,
            convert_clip_text_state_dict,
        )

        cfg = CLIPTextConfig.tiny()
        d = cfg.width
        MAGIC = 0.5
        sd = {
            "text_model.embeddings.token_embedding.weight":
                torch.full((cfg.vocab, d), MAGIC),
            "text_model.embeddings.position_embedding.weight":
                torch.full((cfg.max_len, d), MAGIC),
            "text_model.final_layer_norm.weight": torch.ones(d),
            "text_model.final_layer_norm.bias": torch.zeros(d),
        }
        for i in range(cfg.layers):
            p = f"text_model.encoder.layers.{i}"
            for nm in ("self_attn.q_proj", "self_attn.k_proj",
                       "self_attn.v_proj", "self_attn.out_proj"):
                sd[f"{p}.{nm}.weight"] = torch.full((d, d), MAGIC)
                sd[f"{p}.{nm}.bias"] = torch.zeros(d)
            sd[f"{p}.mlp.fc1.weight"] = torch.full((4 * d, d), MAGIC)
            sd[f"{p}.mlp.fc1.bias"] = torch.zeros(4 * d)
            sd[f"{p}.mlp.fc2.weight"] = torch.full((d, 4 * d), MAGIC)
            sd[f"{p}.mlp.fc2.bias"] = torch.zeros(d)
            for ln in ("layer_norm1", "layer_norm2"):
                sd[f"{p}.{ln}.weight"] = torch.ones(d)
                sd[f"{p}.{ln}.bias"] = torch.zeros(d)
        params = convert_clip_text_state_dict(
            {k: v.numpy() for k, v in sd.items()}, cfg)
        leaves = jax.tree.leaves(params)
        assert all(
            bool(jnp.all((l == MAGIC) | (l == 0.0) | (l == 1.0)))
            for l in leaves)
        h, pooled = clip_text_encode(params, jnp.zeros((1, 3), jnp.int32), cfg)
        assert bool(jnp.all(jnp.isfinite(h)))


class TestBatchedFlowEdit:
    def test_batch_matches_unbatched(self, rng):
        def velocity(z, t, c):
            return jnp.sin(z * c) + t

        x = jnp.asarray(rng.normal(size=(3, 4, 4)).astype(np.float32))
        key = jax.random.PRNGKey(0)
        nm = jnp.asarray([6, 6, 6], jnp.int32)
        out_b = flow_edit_ode_batch(velocity, x, 2.0, 3.0, key, nm,
                                    num_steps=8, n_min=1, n_max=6, n_avg=1)
        # unbatched reference with the SAME noise: the batch draws one eps
        # of the full (B, ...) shape per step, so run all three rows jointly
        out_u = flow_edit_ode(lambda z, t, c: velocity(z, t, c), x, 2.0, 3.0,
                              key, num_steps=8, n_min=1, n_max=6, n_avg=1)
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_u),
                                   atol=1e-5)

    def test_single_compile_across_n_max(self, rng):
        """Annealed per-image windows must NOT change the jit signature."""
        traces = []

        def velocity(z, t, c):
            traces.append(1)  # python side effect fires once per trace
            return jnp.full_like(z, c)

        from skyfall_gs_tpu.priors.flowedit import FlowEditRefiner

        ref = FlowEditRefiner(velocity_fn=velocity, src_cond=0.0,
                              tar_cond=1.0, num_steps=10, batch_size=4)
        imgs = [rng.uniform(size=(4, 4, 3)).astype(np.float32)
                for _ in range(8)]
        out = ref.run(imgs, n_min=0, n_max=10, n_max_end=0)
        assert len(out) == 8
        # scan traces the body once; both batches reuse one compiled fn
        assert sum(traces) == 2  # v_src + v_tar inside the scanned step

    def test_annealing_mask_semantics(self, rng):
        from skyfall_gs_tpu.priors.flowedit import FlowEditRefiner

        ref = FlowEditRefiner(velocity_fn=lambda z, t, c: jnp.full_like(z, c),
                              src_cond=0.0, tar_cond=1.0, num_steps=10,
                              batch_size=8)
        imgs = [rng.uniform(size=(4, 4, 3)).astype(np.float32)
                for _ in range(3)]
        out = ref.run(imgs, n_min=0, n_max=10, n_max_end=0)
        np.testing.assert_allclose(out[0], imgs[0] - 1.0, atol=1e-5)
        np.testing.assert_allclose(out[1], imgs[1] - 0.5, atol=1e-5)
        np.testing.assert_allclose(out[2], imgs[2], atol=1e-5)

    def test_widening_anneal_not_truncated(self, rng):
        """Regression (advisor r2): n_max_end > n_max anneals WIDER windows;
        the scan window must grow to max(nms) instead of silently clipping
        every image to n_max."""
        from skyfall_gs_tpu.priors.flowedit import FlowEditRefiner

        ref = FlowEditRefiner(velocity_fn=lambda z, t, c: jnp.full_like(z, c),
                              src_cond=0.0, tar_cond=1.0, num_steps=10,
                              batch_size=8)
        imgs = [rng.uniform(size=(4, 4, 3)).astype(np.float32)
                for _ in range(3)]
        # nms = [5, 8, 10]; constant unit velocity delta integrates to
        # -nm/num_steps on the uniform grid.
        out = ref.run(imgs, n_min=0, n_max=5, n_max_end=10)
        np.testing.assert_allclose(out[0], imgs[0] - 0.5, atol=1e-5)
        np.testing.assert_allclose(out[1], imgs[1] - 0.8, atol=1e-5)
        np.testing.assert_allclose(out[2], imgs[2] - 1.0, atol=1e-5)

    def test_window_beyond_num_steps_raises(self, rng):
        from skyfall_gs_tpu.priors.flowedit import FlowEditRefiner

        ref = FlowEditRefiner(velocity_fn=lambda z, t, c: z, src_cond=0.0,
                              tar_cond=1.0, num_steps=8)
        with pytest.raises(ValueError, match="exceeds num_steps"):
            ref.run([rng.uniform(size=(4, 4, 3)).astype(np.float32)],
                    n_max=12)

    def test_mixed_shapes_grouped(self, rng):
        """Regression (advisor r2): a run() over mixed frame shapes groups
        by shape (instead of crashing on jnp.stack) and returns results in
        input order."""
        from skyfall_gs_tpu.priors.flowedit import FlowEditRefiner

        ref = FlowEditRefiner(velocity_fn=lambda z, t, c: jnp.full_like(z, c),
                              src_cond=0.0, tar_cond=1.0, num_steps=10,
                              batch_size=4)
        shapes = [(4, 4, 3), (4, 8, 3), (4, 4, 3), (4, 8, 3), (4, 4, 3)]
        imgs = [rng.uniform(size=s).astype(np.float32) for s in shapes]
        out = ref.run(imgs, n_min=0, n_max=10)
        assert [o.shape for o in out] == shapes
        for o, im in zip(out, imgs):
            np.testing.assert_allclose(o, im - 1.0, atol=1e-5)


class TestFluxRefinerEndToEnd:
    def test_tiny_flux_flowedit_runs(self, rng):
        from skyfall_gs_tpu.priors.flux_refiner import build_flux_refiner

        cfg = FluxConfig.tiny()
        vae_cfg = VAEConfig.tiny()
        ref = build_flux_refiner(
            transformer_params=init_flux_params(jax.random.PRNGKey(0), cfg),
            vae_params=init_vae_params(jax.random.PRNGKey(1), vae_cfg),
            cfg=cfg, vae_cfg=vae_cfg, num_steps=4, batch_size=2)
        imgs = [rng.uniform(size=(8, 8, 3)).astype(np.float32)
                for _ in range(2)]
        out = ref.run(imgs, n_min=0, n_max=3, n_max_end=-1, n_avg=1)
        assert len(out) == 2
        assert out[0].shape == (8, 8, 3)
        assert np.isfinite(out[0]).all()
        assert (out[0] >= 0).all() and (out[0] <= 1).all()

    def test_registry_builds_flux_from_params(self):
        """get_refiner('flowedit', ...) constructs end-to-end (VERDICT #3)."""
        from skyfall_gs_tpu.priors import get_refiner

        cfg = FluxConfig.tiny()
        vae_cfg = VAEConfig.tiny()
        ref = get_refiner(
            "flowedit",
            transformer_params=init_flux_params(jax.random.PRNGKey(0), cfg),
            vae_params=init_vae_params(jax.random.PRNGKey(1), vae_cfg),
            cfg=cfg, vae_cfg=vae_cfg, num_steps=2, batch_size=1)
        imgs = [np.zeros((8, 8, 3), np.float32)]
        out = ref.run(imgs, n_min=0, n_max=2)
        assert out[0].shape == (8, 8, 3)

    def test_aspect_ratios_sharing_token_count_keep_their_grids(self, rng):
        """Regression: two image shapes with the SAME packed token count
        (8x32 and 16x16 at the tiny VAE's 2x factor both give 16 tokens)
        must decode back to their own shapes with their own RoPE grids —
        the per-shape closure identity keys the jit caches, so trace-time
        latent-grid state can never leak between them."""
        from skyfall_gs_tpu.priors.flux_refiner import build_flux_refiner

        cfg = FluxConfig.tiny()
        vae_cfg = VAEConfig.tiny()
        ref = build_flux_refiner(
            transformer_params=init_flux_params(jax.random.PRNGKey(0), cfg),
            vae_params=init_vae_params(jax.random.PRNGKey(1), vae_cfg),
            cfg=cfg, vae_cfg=vae_cfg, num_steps=2, batch_size=1)
        wide = [rng.uniform(size=(8, 32, 3)).astype(np.float32)]
        square = [rng.uniform(size=(16, 16, 3)).astype(np.float32)]
        # sanity: identical packed-token counts
        ew, _, _ = ref.shape_fns(8, 32)
        es, _, _ = ref.shape_fns(16, 16)
        assert ew(jnp.asarray(np.stack(wide))).shape[1] == \
            es(jnp.asarray(np.stack(square))).shape[1]
        out_w = ref.run(wide, n_min=0, n_max=2)
        out_s = ref.run(square, n_min=0, n_max=2)
        assert out_w[0].shape == (8, 32, 3)
        assert out_s[0].shape == (16, 16, 3)
        assert np.isfinite(out_w[0]).all() and np.isfinite(out_s[0]).all()

    def test_shifted_sigmas_inferred_per_shape(self, rng):
        """Regression (advisor r2, medium): image_size=None with
        use_shifted_sigmas=True must yield the resolution-shifted grid from
        each batch's actual token count — not silently fall back to the
        uniform linspace."""
        from skyfall_gs_tpu.priors.flux_refiner import build_flux_refiner

        cfg = FluxConfig.tiny()
        vae_cfg = VAEConfig.tiny()
        ref = build_flux_refiner(
            transformer_params=init_flux_params(jax.random.PRNGKey(0), cfg),
            vae_params=init_vae_params(jax.random.PRNGKey(1), vae_cfg),
            cfg=cfg, vae_cfg=vae_cfg, num_steps=4, batch_size=1)
        assert ref.sigmas_fn is not None
        factor = 2 ** (len(vae_cfg.ch_mult) - 1)
        for (h, w) in [(8, 8), (8, 32)]:
            seq_len = (h // (2 * factor)) * (w // (2 * factor))
            np.testing.assert_allclose(
                np.asarray(ref.sigmas_fn(h, w)),
                np.asarray(shifted_sigmas(4, seq_len)))
        uniform = np.linspace(1.0, 0.0, 5)
        assert not np.allclose(np.asarray(ref.sigmas_fn(8, 8)), uniform)
        out = ref.run([rng.uniform(size=(8, 8, 3)).astype(np.float32)],
                      n_min=0, n_max=3)
        assert np.isfinite(out[0]).all()
