"""Generative-prior tests: FlowEdit ODE, ViT depth net, registries."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skyfall_gs_tpu.priors import (
    IdentityRefiner,
    RenderDepthPredictor,
    get_depth_predictor,
    get_refiner,
)
from skyfall_gs_tpu.priors.flowedit import FlowEditRefiner, flow_edit_ode
from skyfall_gs_tpu.priors.moge import (
    MoGePredictor,
    ViTConfig,
    init_vit_params,
    moge_depth,
)


class TestRegistries:
    def test_identity_refiner(self, rng):
        r = get_refiner("identity")
        imgs = [rng.uniform(size=(8, 8, 3)).astype(np.float32)]
        out = r.run(imgs, n_min=0, n_max=5)
        np.testing.assert_array_equal(out[0], imgs[0])

    def test_render_depth_predictor(self, rng):
        d = get_depth_predictor("render")
        img = rng.uniform(size=(8, 8, 3)).astype(np.float32)
        out = d(img)
        assert out.shape == (8, 8)

    def test_gated_backends_raise_clearly(self):
        with pytest.raises(RuntimeError, match="velocity_fn"):
            get_refiner("flowedit")
        with pytest.raises(RuntimeError, match="weights"):
            get_depth_predictor("moge")


class TestFlowEditODE:
    def test_linear_flow_translates_distribution(self, rng):
        """With v(z, t, c) = c - eps-estimate of a rectified flow between a
        point mass and noise, the FlowEdit delta moves x_src toward the
        target condition by (c_tar - c_src)."""
        # toy velocity field of the OT flow to a point mass at c:
        #   z_t = (1-t) c + t eps  =>  v = (z - c*... ) closed form: v = (z_t - c)/t... use
        # the known rectified-flow field v(z,t) = (z - c) * d/dt log ... simplest:
        # linear model v(z, t, c) = c - (z - t*0)  is not a flow; instead use
        # v(z, t, c) = (c - z) / max(t, eps) * (-1)?  Keep it simpler: constant
        # field v = c. Then dv = c_tar - c_src and the edit shifts by
        # (t_min_grid - t_max_grid) * dv summed = -(window length) * dv.
        def velocity(z, t, c):
            return jnp.full_like(z, c)

        x = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
        num_steps = 10
        n_min, n_max = 0, 5
        out = flow_edit_ode(velocity, x, 1.0, 3.0, jax.random.PRNGKey(0),
                            num_steps=num_steps, n_min=n_min, n_max=n_max)
        # each step: dt = -1/num_steps, dv = 2 -> total = -(5/10)*2 = -1
        np.testing.assert_allclose(np.asarray(out), np.asarray(x) - 1.0,
                                   atol=1e-5)

    def test_identical_conditions_noop(self, rng):
        def velocity(z, t, c):
            return jnp.sin(z) + c

        x = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
        out = flow_edit_ode(velocity, x, 0.5, 0.5, jax.random.PRNGKey(1),
                            num_steps=8, n_min=0, n_max=8, n_avg=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

    def test_refiner_with_injected_model(self, rng):
        ref = FlowEditRefiner(
            velocity_fn=lambda z, t, c: jnp.full_like(z, c),
            src_cond=0.0, tar_cond=1.0, num_steps=10)
        imgs = [rng.uniform(size=(4, 4, 3)).astype(np.float32)
                for _ in range(3)]
        out = ref.run(imgs, n_min=0, n_max=10, n_max_end=0)
        assert len(out) == 3
        # first image gets the full window (shift -1), last gets none
        np.testing.assert_allclose(out[0], imgs[0] - 1.0, atol=1e-5)
        np.testing.assert_allclose(out[2], imgs[2], atol=1e-5)


class TestMoGeNet:
    def test_tiny_vit_shapes_and_jit(self, rng):
        cfg = ViTConfig(patch_size=14, width=64, depth=2, heads=4,
                        img_size=56, out_layers=(0, 1), head_width=32)
        params = init_vit_params(jax.random.PRNGKey(0), cfg)
        imgs = jnp.asarray(rng.uniform(size=(2, 56, 56, 3)).astype(np.float32))
        depth = jax.jit(lambda p, x: moge_depth(p, x, cfg))(params, imgs)
        assert depth.shape == (2, 56, 56)
        assert bool(jnp.all(depth > 0))
        assert bool(jnp.all(jnp.isfinite(depth)))

    def test_predictor_with_params(self, rng):
        cfg = ViTConfig(patch_size=14, width=64, depth=2, heads=4,
                        img_size=56, out_layers=(0, 1), head_width=32)
        params = init_vit_params(jax.random.PRNGKey(0), cfg)
        pred = MoGePredictor(cfg=cfg, params=params)
        imgs = [rng.uniform(size=(40, 30, 3)).astype(np.float32)]
        out = pred.run(imgs)
        assert out[0].shape == (40, 30)


class TestTorchConversion:
    def test_convert_dinov2_style_state_dict(self, rng):
        """Round-trip a synthetic torch-layout state dict into the ViT."""
        import torch

        from skyfall_gs_tpu.priors.moge import (
            ViTConfig,
            convert_torch_state_dict,
            moge_depth,
        )

        cfg = ViTConfig(patch_size=14, width=32, depth=2, heads=4,
                        img_size=28, out_layers=(0, 1), head_width=16)
        d, hidden = cfg.width, int(cfg.width * cfg.mlp_ratio)
        g = torch.Generator().manual_seed(0)
        sd = {
            "patch_embed.proj.weight": torch.randn(d, 3, 14, 14, generator=g) * 0.02,
            "patch_embed.proj.bias": torch.zeros(d),
            "cls_token": torch.randn(1, 1, d, generator=g) * 0.02,
            "pos_embed": torch.randn(1, 5, d, generator=g) * 0.02,
            "norm.weight": torch.ones(d),
            "norm.bias": torch.zeros(d),
        }
        for i in range(cfg.depth):
            p = f"blocks.{i}"
            sd.update({
                f"{p}.norm1.weight": torch.ones(d),
                f"{p}.norm1.bias": torch.zeros(d),
                f"{p}.attn.qkv.weight": torch.randn(3 * d, d, generator=g) * 0.02,
                f"{p}.attn.qkv.bias": torch.zeros(3 * d),
                f"{p}.attn.proj.weight": torch.randn(d, d, generator=g) * 0.02,
                f"{p}.attn.proj.bias": torch.zeros(d),
                f"{p}.norm2.weight": torch.ones(d),
                f"{p}.norm2.bias": torch.zeros(d),
                f"{p}.mlp.fc1.weight": torch.randn(hidden, d, generator=g) * 0.02,
                f"{p}.mlp.fc1.bias": torch.zeros(hidden),
                f"{p}.mlp.fc2.weight": torch.randn(d, hidden, generator=g) * 0.02,
                f"{p}.mlp.fc2.bias": torch.zeros(d),
                f"{p}.ls1.gamma": torch.ones(d),
                f"{p}.ls2.gamma": torch.ones(d),
            })
        npsd = {k: v.numpy() for k, v in sd.items()}
        # a bare encoder (no head) must not silently keep a random head
        with pytest.raises(KeyError, match="head"):
            convert_torch_state_dict(npsd, cfg)
        params = convert_torch_state_dict(npsd, cfg, allow_partial_head=True)
        img = jnp.asarray(rng.uniform(size=(1, 28, 28, 3)).astype(np.float32))
        depth = moge_depth(params, img, cfg)
        assert depth.shape == (1, 28, 28)
        assert bool(jnp.all(jnp.isfinite(depth)))
        # converted qkv really is the transpose of the torch layout
        np.testing.assert_allclose(
            np.asarray(params["blocks"][0]["qkv"]["w"]),
            sd["blocks.0.attn.qkv.weight"].numpy().T, atol=1e-7)

    def test_convert_full_moge_schema(self, rng):
        """A name-faithful MoGe checkpoint (backbone.* encoder + head.*)
        converts with zero random leaves (VERDICT round-1 item 4)."""
        import torch

        from skyfall_gs_tpu.priors.moge import (
            ViTConfig,
            convert_torch_state_dict,
            moge_depth,
            moge_points,
        )

        cfg = ViTConfig(patch_size=14, width=32, depth=2, heads=4,
                        img_size=28, out_layers=(0, 1), head_width=16)
        d, hidden, hw = cfg.width, int(cfg.width * cfg.mlp_ratio), cfg.head_width
        MAGIC = 0.25

        def full(*shape):
            return torch.full(shape, MAGIC)

        sd = {
            "backbone.patch_embed.proj.weight": full(d, 3, 14, 14),
            "backbone.patch_embed.proj.bias": torch.zeros(d),
            "backbone.cls_token": full(1, 1, d),
            "backbone.pos_embed": full(1, 5, d),
            "backbone.norm.weight": torch.ones(d),
            "backbone.norm.bias": torch.zeros(d),
        }
        for i in range(cfg.depth):
            p = f"backbone.blocks.{i}"
            sd.update({
                f"{p}.norm1.weight": torch.ones(d),
                f"{p}.norm1.bias": torch.zeros(d),
                f"{p}.attn.qkv.weight": full(3 * d, d),
                f"{p}.attn.qkv.bias": torch.zeros(3 * d),
                f"{p}.attn.proj.weight": full(d, d),
                f"{p}.attn.proj.bias": torch.zeros(d),
                f"{p}.norm2.weight": torch.ones(d),
                f"{p}.norm2.bias": torch.zeros(d),
                f"{p}.mlp.fc1.weight": full(hidden, d),
                f"{p}.mlp.fc1.bias": torch.zeros(hidden),
                f"{p}.mlp.fc2.weight": full(d, hidden),
                f"{p}.mlp.fc2.bias": torch.zeros(d),
                f"{p}.ls1.gamma": torch.ones(d),
                f"{p}.ls2.gamma": torch.ones(d),
            })
        for i in range(len(cfg.out_layers)):
            sd[f"head.projects.{i}.weight"] = full(hw, d, 1, 1)
            sd[f"head.projects.{i}.bias"] = torch.zeros(hw)
            sd[f"head.upsample_blocks.{i}.0.weight"] = full(hw, hw, 3, 3)
            sd[f"head.upsample_blocks.{i}.0.bias"] = torch.zeros(hw)
        sd["head.output_block.0.weight"] = full(hw // 2, hw, 3, 3)
        sd["head.output_block.0.bias"] = torch.zeros(hw // 2)
        sd["head.output_block.2.weight"] = full(4, hw // 2, 1, 1)
        sd["head.output_block.2.bias"] = torch.zeros(4)

        params = convert_torch_state_dict(
            {k: v.numpy() for k, v in sd.items()}, cfg)
        leaves = jax.tree.leaves(params)
        assert all(
            bool(jnp.all((l == MAGIC) | (l == 0.0) | (l == 1.0)))
            for l in leaves), "random-initialized leaves survived conversion"
        img = jnp.zeros((1, 28, 28, 3))
        pts, mask = moge_points(params, img, cfg)
        assert pts.shape == (1, 28, 28, 3) and mask.shape == (1, 28, 28)
        assert moge_depth(params, img, cfg).shape == (1, 28, 28)
        # the 'model.' wrapper prefix is stripped too
        params2 = convert_torch_state_dict(
            {"model." + k: v.numpy() for k, v in sd.items()}, cfg)
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(params2)[0]),
            np.asarray(jax.tree.leaves(params)[0]))

    def test_predictor_keeps_aspect(self, rng):
        """Non-square frames are prepped aspect-preserving (not squashed)."""
        from skyfall_gs_tpu.priors.moge import MoGePredictor, ViTConfig

        cfg = ViTConfig(patch_size=14, width=64, depth=2, heads=4,
                        img_size=56, out_layers=(0, 1), head_width=32)
        params = init_vit_params(jax.random.PRNGKey(0), cfg)
        pred = MoGePredictor(cfg=cfg, params=params)
        th, tw = pred._target_hw(np.zeros((100, 400, 3), np.float32))
        assert th % 14 == 0 and tw % 14 == 0
        assert tw > th  # aspect preserved
        out = pred.run([rng.uniform(size=(100, 400, 3)).astype(np.float32),
                        rng.uniform(size=(60, 60, 3)).astype(np.float32)])
        assert out[0].shape == (100, 400)
        assert out[1].shape == (60, 60)
