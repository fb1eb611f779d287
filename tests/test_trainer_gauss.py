"""Trainer gaussian-sharded mode: splat-state sharding through the
production Trainer (mesh_mode="gauss" — parallel/gauss_shard).

The HBM-scaling axis as a full trainer mode, not just a bare step:
  * a 1-device gauss mesh reproduces the single-device trajectory (the
    depth-binned merge over one bin IS the plain composite);
  * fused windows (make_gauss_sharded_multistep) don't change the
    gauss-mode trajectory across densify/reset/growth events;
  * a 4-device run with depth supervision, sharded densification
    (global quantile via collectives, shard-local clone/split/prune) and
    even-pad capacity growth trains end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skyfall_gs_tpu.config import (
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
)
from tests.test_train import _synthetic_scene


def _mk(scene, tmp_path, mesh, fuse=8, **opt_overrides):
    from skyfall_gs_tpu.train.loop import Trainer

    model_cfg = ModelConfig(model_path=str(tmp_path))
    defaults = dict(
        iterations=18, densify_from_iter=10 ** 9, densify_until_iter=0,
        opacity_reset_interval=10 ** 9, lambda_depth=0.0,
        lambda_opacity=0.01, position_lr_max_steps=18,
    )
    defaults.update(opt_overrides)
    return Trainer(model_cfg, OptimizationConfig(**defaults),
                   PipelineConfig(fuse_steps=fuse), scene, mesh=mesh,
                   mesh_mode="gauss")


def _gauss_mesh(n):
    from jax.sharding import Mesh

    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"needs >= {n} cpu devices")
    return Mesh(np.array(devs[:n]), ("gauss",))


@pytest.mark.slow
class TestTrainerGauss:
    def test_gauss1_matches_single_device(self, rng, tmp_path):
        from skyfall_gs_tpu.train.loop import Trainer

        scene = _synthetic_scene(rng)
        model_cfg = ModelConfig(model_path=str(tmp_path))
        opt = dict(iterations=10, densify_from_iter=10 ** 9,
                   densify_until_iter=0, opacity_reset_interval=10 ** 9,
                   lambda_depth=0.5, lambda_opacity=0.01,
                   position_lr_max_steps=10)
        t0 = Trainer(model_cfg, OptimizationConfig(**opt),
                     PipelineConfig(fuse_steps=1), scene)
        s0 = t0.train(t0.init_state(), iterations=10)
        t1 = _mk(scene, tmp_path, _gauss_mesh(1), fuse=1, **opt)
        s1 = t1.train(t1.init_state(), iterations=10)
        # One depth bin over one shard is the plain composite: only XLA
        # fusion-order wobble remains.
        np.testing.assert_allclose(np.asarray(s1.model.params.xyz),
                                   np.asarray(s0.model.params.xyz),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s1.opt.mu.opacity),
                                   np.asarray(s0.opt.mu.opacity),
                                   rtol=0, atol=1e-5)

    def test_gauss_fused_matches_unfused(self, rng, tmp_path):
        opt = dict(
            iterations=18, densify_from_iter=2, densify_until_iter=14,
            densification_interval=6, opacity_reset_interval=9,
            opacity_cooldown_iterations=3, lambda_depth=0.0,
            position_lr_max_steps=18, densify_grad_threshold=1e-7,
        )
        scene = _synthetic_scene(rng)
        t1 = _mk(scene, tmp_path, _gauss_mesh(2), fuse=1, **opt)
        s1 = t1.train(t1.init_state(), iterations=18)
        tf = _mk(scene, tmp_path, _gauss_mesh(2), fuse=4, **opt)
        sf = tf.train(tf.init_state(), iterations=18)
        # scan-fused vs unrolled windows differ only by XLA fusion-order
        # wobble (single elements at ~2e-5 after 18 iters with splits)
        np.testing.assert_allclose(np.asarray(sf.model.params.xyz),
                                   np.asarray(s1.model.params.xyz),
                                   rtol=0, atol=5e-5)
        assert int(sf.step) == int(s1.step) == 18
        assert np.asarray(sf.model.aux.alive).sum() == \
            np.asarray(s1.model.aux.alive).sum()

    def test_gauss_checkpoint_resume_orbax(self, rng, tmp_path):
        """Gauss-mode checkpoints ride the orbax collective path (no host
        gather): save at 8, resume into a fresh sharded trainer, states
        match bit-exactly including Adam moments."""
        import os

        scene = _synthetic_scene(rng)
        opt = dict(iterations=8, lambda_depth=0.5, position_lr_max_steps=8)
        t1 = _mk(scene, tmp_path, _gauss_mesh(2), fuse=1, **opt)
        s1 = t1.train(t1.init_state(), iterations=8,
                      checkpoint_iterations=(8,))
        ckpt = os.path.join(str(tmp_path), "chkpnt8.orbax")
        assert os.path.isdir(ckpt)

        t2 = _mk(scene, tmp_path, _gauss_mesh(2), fuse=1, **opt)
        s2 = t2.init_state(start_checkpoint=ckpt)
        assert t2.start_iteration == 8
        assert "gauss" in getattr(s2.model.params.xyz.sharding, "spec", ())
        np.testing.assert_array_equal(np.asarray(s2.model.params.xyz),
                                      np.asarray(s1.model.params.xyz))
        np.testing.assert_array_equal(np.asarray(s2.opt.nu.scaling),
                                      np.asarray(s1.opt.nu.scaling))

    def test_gauss_orbax_resume_with_growth(self, rng, tmp_path):
        """Restoring a checkpoint whose capacity exceeds the fresh
        template's grows the template DIRECTLY into the sharded layout
        (jit out_shardings — no device ever holds the full-capacity
        state), and a mesh whose size does not divide the saved capacity
        fails fast with the real constraint."""
        import os

        from skyfall_gs_tpu.train.loop import Trainer

        scene = _synthetic_scene(rng)
        model_cfg = ModelConfig(model_path=str(tmp_path))
        opt = dict(iterations=8, densify_from_iter=10 ** 9,
                   densify_until_iter=0, opacity_reset_interval=10 ** 9,
                   lambda_depth=0.0, lambda_opacity=0.01,
                   position_lr_max_steps=8)
        t1 = Trainer(model_cfg, OptimizationConfig(**opt),
                     PipelineConfig(fuse_steps=1, gaussian_capacity=2048),
                     scene, mesh=_gauss_mesh(2), mesh_mode="gauss")
        s1 = t1.train(t1.init_state(), iterations=8,
                      checkpoint_iterations=(8,))
        assert int(s1.model.params.capacity) == 2048
        ckpt = os.path.join(str(tmp_path), "chkpnt8.orbax")
        assert os.path.isdir(ckpt)

        t2 = Trainer(model_cfg, OptimizationConfig(**opt),
                     PipelineConfig(fuse_steps=1), scene,
                     mesh=_gauss_mesh(2), mesh_mode="gauss")
        assert t2.init_state().model.params.capacity < 2048  # growth is real
        s2 = t2.init_state(start_checkpoint=ckpt)
        assert int(s2.model.params.capacity) == 2048
        assert "gauss" in getattr(s2.model.params.xyz.sharding, "spec", ())
        np.testing.assert_array_equal(np.asarray(s2.model.params.xyz),
                                      np.asarray(s1.model.params.xyz))
        np.testing.assert_array_equal(np.asarray(s2.opt.nu.scaling),
                                      np.asarray(s1.opt.nu.scaling))

        t3 = Trainer(model_cfg, OptimizationConfig(**opt),
                     PipelineConfig(fuse_steps=1), scene,
                     mesh=_gauss_mesh(3), mesh_mode="gauss")
        with pytest.raises(ValueError, match="not divisible"):
            t3.init_state(start_checkpoint=ckpt)

    def _run_idu_episode(self, seed, tmp_path, mesh, fuse, iters=18,
                         **opt_overrides):
        """One Stage-2 episode through the real IDUOrchestrator, optionally
        on a gaussian-sharded Trainer (mesh_mode='gauss')."""
        from skyfall_gs_tpu.priors import IdentityRefiner, RenderDepthPredictor
        from skyfall_gs_tpu.train.idu import IDUOrchestrator
        from skyfall_gs_tpu.train.loop import Trainer

        rng = np.random.default_rng(seed)
        scene = _synthetic_scene(rng)
        model_cfg = ModelConfig(model_path=str(tmp_path))
        opt = dict(
            iterations=iters,
            idu_episode_iterations=iters,
            idu_densify_until_iter=12,
            densify_from_iter=2,
            densification_interval=6,
            idu_opacity_reset_interval=9,
            opacity_cooldown_iterations=3,
            idu_testing_interval=10 ** 9,
            idu_num_cams=2, idu_num_samples_per_view=1,
            idu_render_size=32, idu_train_ratio=0.5,
            lambda_depth=0.5, lambda_opacity=0.01,
            lambda_pseudo_depth=0.5, sample_pseudo_interval=7,
            idu_refine=False, idu_position_lr_max_steps=iters,
            densify_grad_threshold=1e-7,
        )
        opt.update(opt_overrides)
        opt_cfg = OptimizationConfig(**opt)
        trainer = Trainer(model_cfg, opt_cfg, PipelineConfig(fuse_steps=fuse),
                          scene, mesh=mesh,
                          mesh_mode="gauss" if mesh is not None else "view")

        def small_stack(ele, rad):
            from skyfall_gs_tpu.core.camera import orbit_cameras

            return orbit_cameras([0, 0, 0], ele, 3.0, num_cams=4,
                                 width=32, height=32, fov_deg=60.0,
                                 uids=[0] * 4)

        trainer._gen_pseudo_stack_at = small_stack
        state = trainer.init_state()
        orch = IDUOrchestrator(trainer=trainer, refiner=IdentityRefiner(),
                               depth_predictor=RenderDepthPredictor())
        return orch.train_episode(state, 0, [[0.0, 0.0, 0.0]],
                                  60.0, 3.0, 60.0)

    def test_gauss1_idu_episode_matches_single_device(self, tmp_path):
        """A Stage-2 episode on a 1-shard gauss mesh reproduces the
        single-device episode: same host-RNG draws (shared draw_tuple),
        one depth bin IS the plain composite — only XLA fusion-order
        wobble remains.  Covers pseudo steps (7/14) and the Bernoulli
        IDU/original kind mixing.  Densification is disabled: the sharded
        densify folds the split-noise rng with the shard index, so even a
        1-shard run draws different children than the single-device path
        (same rule as test_gauss1_matches_single_device); the 2-shard
        fused-vs-unfused test below covers densify/reset events."""
        no_dens = dict(idu_densify_until_iter=0, densify_from_iter=10 ** 9)
        s0 = self._run_idu_episode(7, tmp_path / "a", None, fuse=1,
                                   **no_dens)
        s1 = self._run_idu_episode(7, tmp_path / "b", _gauss_mesh(1), fuse=1,
                                   **no_dens)
        np.testing.assert_allclose(np.asarray(s1.model.params.xyz),
                                   np.asarray(s0.model.params.xyz),
                                   rtol=0, atol=5e-5)
        assert int(s1.step) == int(s0.step) == 18
        assert (np.asarray(s1.model.aux.alive).sum()
                == np.asarray(s0.model.aux.alive).sum())

    def test_gauss2_idu_fused_matches_unfused(self, tmp_path):
        """Mixed-kind fused episode windows (make_gauss_idu_multistep:
        runtime kind, lax.cond between the two gauss step bodies) must not
        change the gauss-sharded episode trajectory; the end-of-episode
        checkpoint rides the collective orbax path."""
        import os

        s1 = self._run_idu_episode(7, tmp_path / "a", _gauss_mesh(2), fuse=1)
        sf = self._run_idu_episode(7, tmp_path / "b", _gauss_mesh(2), fuse=4)
        np.testing.assert_allclose(np.asarray(sf.model.params.xyz),
                                   np.asarray(s1.model.params.xyz),
                                   rtol=0, atol=5e-5)
        assert int(sf.step) == int(s1.step) == 18
        assert (np.asarray(sf.model.aux.alive).sum()
                == np.asarray(s1.model.aux.alive).sum())
        # sharded all the way through + collective checkpoint at episode end
        assert "gauss" in getattr(sf.model.params.xyz.sharding, "spec", ())
        assert os.path.isdir(os.path.join(str(tmp_path / "b"),
                                          "chkpnt18.orbax"))

    def test_gauss4_densify_and_growth_train(self, rng, tmp_path):
        t = _mk(
            _synthetic_scene(rng), tmp_path, _gauss_mesh(4), fuse=4,
            iterations=16, lambda_depth=0.1,
            densify_from_iter=2, densify_until_iter=14,
            densification_interval=8, densify_grad_threshold=1e-7,
        )
        losses = []
        log = t.logger.log_step

        def spy(it, metrics, wall):
            losses.append(float(metrics.loss))
            return log(it, metrics, wall)

        t.logger.log_step = spy
        state0 = t.init_state()
        cap0 = state0.model.params.capacity
        n0 = int(state0.model.num_alive)
        state = t.train(state0, iterations=16)
        assert int(state.step) == 16
        assert np.isfinite(losses).all()
        assert min(losses) < losses[0]
        # densification ran on the sharded state and changed the census
        assert int(state.model.num_alive) != n0
        # the state stayed sharded along gauss the whole way
        sh = state.model.params.xyz.sharding
        assert "gauss" in getattr(sh, "spec", ())
        # capacity growth (triggered by the free-space guard) stayed
        # divisible across shards
        assert state.model.params.capacity % 4 == 0
        assert state.model.params.capacity >= cap0
        assert np.isfinite(np.asarray(state.model.params.xyz)).all()
