"""Tensor-parallel FLUX inference: sharded-vs-single-device parity.

Runs on the 8 virtual CPU devices from conftest.  The config mirrors
FLUX.1 topology at reduced width with heads divisible by 8 so every mesh
split is exact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from skyfall_gs_tpu.priors.flux import (
    FluxConfig,
    FluxCond,
    flux_velocity,
    init_flux_params,
    pack_latents,
)
from skyfall_gs_tpu.priors.flux_shard import (
    count_flux_params,
    make_sharded_flux_velocity,
    shard_flux_params,
    stack_flux_params,
)


def tp_config(guidance=True):
    """Tiny topology whose heads (8) and mlp width divide the 8-way mesh."""
    return FluxConfig(in_channels=16, hidden=64, heads=8, head_dim=8,
                      depth_double=2, depth_single=3, joint_dim=32,
                      pooled_dim=16, axes_dim=(4, 2, 2), time_freq_dim=32,
                      guidance=guidance)


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices("cpu")[:8])
    return Mesh(devs, ("tp",))


def _inputs(cfg, rng, b=2, hw=8):
    z = jnp.asarray(rng.normal(size=(b, hw, hw, cfg.in_channels // 4))
                    .astype(np.float32))
    tok, ids = pack_latents(z)
    cond = FluxCond(
        txt=jnp.asarray(rng.normal(size=(1, 6, cfg.joint_dim))
                        .astype(np.float32)) * 0.02,
        pooled=jnp.asarray(rng.normal(size=(1, cfg.pooled_dim))
                           .astype(np.float32)) * 0.02,
        guidance=3.5)
    return tok, ids, cond


class TestShardedFluxParity:
    @pytest.mark.parametrize("guidance", [True, False])
    def test_matches_single_device_f32(self, mesh, rng, guidance):
        cfg = tp_config(guidance)
        params = init_flux_params(jax.random.PRNGKey(0), cfg)
        tok, ids, cond = _inputs(cfg, rng)

        want = np.asarray(flux_velocity(params, cfg, tok, ids, cond, 0.7))

        sharded_params = shard_flux_params(params, mesh, cfg, dtype=None)
        vel = make_sharded_flux_velocity(mesh, cfg)
        got = np.asarray(vel(sharded_params, tok, ids, cond, 0.7))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_bf16_path_finite_and_close(self, mesh, rng):
        cfg = tp_config()
        params = init_flux_params(jax.random.PRNGKey(0), cfg)
        tok, ids, cond = _inputs(cfg, rng)
        want = np.asarray(flux_velocity(params, cfg, tok, ids, cond, 0.5))

        sharded_params = shard_flux_params(params, mesh, cfg,
                                           dtype=jnp.bfloat16)
        # every sharded leaf is bf16
        assert all(l.dtype == jnp.bfloat16
                   for l in jax.tree.leaves(sharded_params))
        vel = make_sharded_flux_velocity(mesh, cfg)
        got = np.asarray(vel(sharded_params, tok, ids, cond, 0.5))
        assert got.dtype == np.float32
        assert np.isfinite(got).all()
        # bf16 has ~3 decimal digits; agreement is loose but must correlate
        denom = np.abs(want).mean() + 1e-6
        assert np.abs(got - want).mean() / denom < 0.05

    def test_batched_t_vector(self, mesh, rng):
        cfg = tp_config()
        params = init_flux_params(jax.random.PRNGKey(0), cfg)
        tok, ids, cond = _inputs(cfg, rng, b=3)
        sharded_params = shard_flux_params(params, mesh, cfg, dtype=None)
        vel = make_sharded_flux_velocity(mesh, cfg)
        t = jnp.asarray([0.1, 0.5, 0.9])
        got = np.asarray(vel(sharded_params, tok, ids, cond, t))
        want = np.asarray(flux_velocity(params, cfg, tok, ids, cond, t))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


class TestParamAccounting:
    def test_count_matches_actual_leaves(self):
        cfg = tp_config()
        params = init_flux_params(jax.random.PRNGKey(0), cfg)
        total, sharded, rep = count_flux_params(cfg)
        actual = sum(int(np.prod(l.shape))
                     for l in jax.tree.leaves(params))
        assert total == actual
        assert sharded + rep == total

    def test_flux1_fits_v5e8_bf16(self):
        """The documented HBM budget: full FLUX.1 sharded 8-way in bf16
        leaves >12 GB of a 16 GB v5e chip free."""
        total, sharded, rep = count_flux_params(FluxConfig())
        assert 11.5e9 < total < 12.5e9          # ~12B as published
        per_chip_bytes = (sharded / 8 + rep) * 2
        assert per_chip_bytes < 3.5e9

    def test_stacking_splits_fused_out(self):
        cfg = tp_config()
        params = init_flux_params(jax.random.PRNGKey(0), cfg)
        st = stack_flux_params(params)
        d = cfg.hidden
        mlp = int(d * cfg.mlp_ratio)
        assert st["single"]["out_attn"]["w"].shape == \
            (cfg.depth_single, d, d)
        assert st["single"]["out_mlp"]["w"].shape == \
            (cfg.depth_single, mlp, d)
        np.testing.assert_array_equal(
            np.asarray(st["single"]["out_attn"]["w"][1]),
            np.asarray(params["single"][1]["out"]["w"][:d]))


@pytest.mark.slow
class TestShardedFlowEdit:
    def test_refiner_with_sharded_velocity(self, mesh, rng):
        """End-to-end: FlowEditRefiner driving the tensor-parallel field."""
        from skyfall_gs_tpu.priors.flowedit import FlowEditRefiner

        cfg = tp_config()
        params = init_flux_params(jax.random.PRNGKey(0), cfg)
        sharded_params = shard_flux_params(params, mesh, cfg, dtype=None)
        vel = make_sharded_flux_velocity(mesh, cfg)

        hw = 8
        ys, xs = np.meshgrid(np.arange(hw // 2), np.arange(hw // 2),
                             indexing="ij")
        ids = jnp.asarray(
            np.stack([np.zeros_like(ys), ys, xs], -1).reshape(-1, 3))
        cond = FluxCond(txt=jnp.zeros((1, 4, cfg.joint_dim)),
                        pooled=jnp.zeros((1, cfg.pooled_dim)), guidance=1.0)

        def velocity_fn(z, t, c):
            return vel(sharded_params, z, ids, c, t)

        ref = FlowEditRefiner(velocity_fn=velocity_fn, src_cond=cond,
                              tar_cond=cond, num_steps=3, batch_size=2)
        imgs = [rng.normal(size=((hw // 2) ** 2, cfg.in_channels))
                .astype(np.float32) for _ in range(2)]
        out = ref.run(imgs, n_min=0, n_max=2)
        assert len(out) == 2
        assert np.isfinite(out[0]).all()

    def test_build_flux_refiner_mesh_matches_unsharded(self, mesh, rng):
        """build_flux_refiner(mesh=...) (the production Stage-2 wiring)
        reproduces the single-device refiner output in f32."""
        from skyfall_gs_tpu.priors.flux_refiner import build_flux_refiner
        from skyfall_gs_tpu.priors.flux_vae import (
            VAEConfig,
            init_vae_params,
        )

        cfg = tp_config()
        vae_cfg = VAEConfig.tiny()
        tfp = init_flux_params(jax.random.PRNGKey(0), cfg)
        vaep = init_vae_params(jax.random.PRNGKey(1), vae_cfg)
        kw = dict(transformer_params=tfp, vae_params=vaep, cfg=cfg,
                  vae_cfg=vae_cfg, num_steps=3, batch_size=2, seed=7)
        ref_single = build_flux_refiner(**kw)
        ref_tp = build_flux_refiner(mesh=mesh, tp_dtype=None, **kw)
        imgs = [rng.uniform(size=(8, 8, 3)).astype(np.float32)
                for _ in range(2)]
        out_s = ref_single.run(imgs, n_min=0, n_max=2)
        out_t = ref_tp.run(imgs, n_min=0, n_max=2)
        for a, b in zip(out_s, out_t):
            np.testing.assert_allclose(a, b, atol=5e-5)
