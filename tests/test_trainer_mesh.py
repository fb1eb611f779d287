"""Trainer mesh mode: view-parallel multi-chip training through the
production Trainer (parallel/sharding.make_parallel_multistep_indexed).

Covers the three properties that make the mode trustworthy:
  * a 1-device mesh reproduces the single-device trajectory exactly
    (pmean over one device is the identity, picks/keys streams match);
  * fused windows don't change the mesh-mode trajectory (same invariant
    the single-device fused test enforces), across densify/reset events;
  * an 8-device run with depth + pseudo supervision and densification
    trains (loss decreases, stats accumulate) — the full feature surface
    of the step rides through the shard_map path.
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
                   PipelineConfig(fuse_steps=fuse), scene, mesh=mesh)


@pytest.mark.slow
class TestTrainerMesh:
    def test_mesh_b1_matches_single_device(self, rng, tmp_path):
        from skyfall_gs_tpu.parallel.mesh import make_mesh

        scene = _synthetic_scene(rng)
        t0 = _mk(scene, tmp_path, mesh=None)
        s0 = t0.train(t0.init_state(), iterations=12)
        t1 = _mk(scene, tmp_path, mesh=make_mesh(1))
        s1 = t1.train(t1.init_state(), iterations=12)
        np.testing.assert_allclose(np.asarray(s1.model.params.xyz),
                                   np.asarray(s0.model.params.xyz),
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s1.opt.mu.opacity),
                                   np.asarray(s0.opt.mu.opacity),
                                   rtol=0, atol=1e-6)

    def test_mesh_fused_matches_unfused(self, rng, tmp_path):
        from skyfall_gs_tpu.parallel.mesh import make_mesh

        if len(jax.devices("cpu")) < 2:
            pytest.skip("needs >= 2 cpu devices")
        opt = dict(
            iterations=18, densify_from_iter=2, densify_until_iter=14,
            densification_interval=6, opacity_reset_interval=9,
            opacity_cooldown_iterations=3, lambda_depth=0.0,
            position_lr_max_steps=18,
        )
        scene = _synthetic_scene(rng)
        t1 = _mk(scene, tmp_path, mesh=make_mesh(2), fuse=1, **opt)
        s1 = t1.train(t1.init_state(), iterations=18)
        tf = _mk(scene, tmp_path, mesh=make_mesh(2), fuse=4, **opt)
        sf = tf.train(tf.init_state(), iterations=18)
        np.testing.assert_allclose(np.asarray(sf.model.params.xyz),
                                   np.asarray(s1.model.params.xyz),
                                   rtol=0, atol=1e-5)
        assert int(sf.step) == int(s1.step) == 18
        assert np.asarray(sf.model.aux.alive).sum() == \
            np.asarray(s1.model.aux.alive).sum()

    def test_idu_episode_mesh_b1_matches_single_device(self, rng, tmp_path):
        """A 1-device view mesh reproduces the single-device EPISODE
        trajectory (B=1 rows add no extra draws; pmean over one device is
        the identity)."""
        from skyfall_gs_tpu.parallel.mesh import make_mesh
        from skyfall_gs_tpu.priors import IdentityRefiner, RenderDepthPredictor
        from skyfall_gs_tpu.train.idu import IDUOrchestrator

        opt = dict(
            iterations=12, idu_episode_iterations=12,
            idu_densify_until_iter=8, densify_from_iter=2,
            densification_interval=6, idu_opacity_reset_interval=10 ** 9,
            idu_testing_interval=10 ** 9, idu_num_cams=2,
            idu_num_samples_per_view=1, idu_render_size=32,
            idu_train_ratio=0.5, lambda_depth=0.5, idu_refine=False,
            idu_position_lr_max_steps=12, densify_grad_threshold=1e-7,
        )
        scene = _synthetic_scene(rng)

        def run(mesh, sub):
            t = _mk(scene, tmp_path / sub, mesh=mesh, fuse=4, **opt)
            orch = IDUOrchestrator(trainer=t, refiner=IdentityRefiner(),
                                   depth_predictor=RenderDepthPredictor())
            return orch.train_episode(t.init_state(), 0, [[0.0, 0.0, 0.0]],
                                      60.0, 3.0, 60.0)

        s0 = run(None, "a")
        s1 = run(make_mesh(1), "b")
        np.testing.assert_allclose(np.asarray(s1.model.params.xyz),
                                   np.asarray(s0.model.params.xyz),
                                   rtol=0, atol=5e-5)
        assert int(s1.step) == int(s0.step) == 12
        assert np.asarray(s1.model.aux.alive).sum() == \
            np.asarray(s0.model.aux.alive).sum()

    def test_idu_episode_mesh4_with_pseudo_trains(self, rng, tmp_path):
        """A 4-device view-parallel episode with mixed-kind fused windows,
        pseudo-depth supervision and densification trains end to end."""
        from skyfall_gs_tpu.parallel.mesh import make_mesh
        from skyfall_gs_tpu.priors import IdentityRefiner, RenderDepthPredictor
        from skyfall_gs_tpu.train.idu import IDUOrchestrator

        if len(jax.devices("cpu")) < 4:
            pytest.skip("needs >= 4 cpu devices")
        t = _mk(
            _synthetic_scene(rng), tmp_path, mesh=make_mesh(4), fuse=4,
            iterations=14, idu_episode_iterations=14,
            idu_densify_until_iter=10, densify_from_iter=2,
            densification_interval=7, idu_opacity_reset_interval=10 ** 9,
            idu_testing_interval=10 ** 9, idu_num_cams=2,
            idu_num_samples_per_view=1, idu_render_size=32,
            idu_train_ratio=0.5, lambda_depth=0.5, idu_refine=False,
            lambda_pseudo_depth=0.1, sample_pseudo_interval=5,
            idu_position_lr_max_steps=14, densify_grad_threshold=1e-7,
        )

        def small_stack(ele, rad):
            from skyfall_gs_tpu.core.camera import orbit_cameras

            return orbit_cameras([0, 0, 0], ele, 3.0, num_cams=4,
                                 width=32, height=32, fov_deg=60.0,
                                 uids=[0] * 4)
        t._gen_pseudo_stack_at = small_stack
        orch = IDUOrchestrator(trainer=t, refiner=IdentityRefiner(),
                               depth_predictor=RenderDepthPredictor())
        state = orch.train_episode(t.init_state(), 0, [[0.0, 0.0, 0.0]],
                                   60.0, 3.0, 60.0)
        assert int(state.step) == 14
        assert np.isfinite(np.asarray(state.model.params.xyz)).all()
        assert float(np.asarray(state.model.aux.denom).max()) > 0

    def test_mesh8_full_features_trains(self, rng, tmp_path):
        from skyfall_gs_tpu.parallel.mesh import make_mesh

        if len(jax.devices("cpu")) < 8:
            pytest.skip("needs 8 cpu devices")
        t = _mk(
            _synthetic_scene(rng), tmp_path, mesh=make_mesh(8), fuse=4,
            iterations=16, lambda_depth=0.1,
            densify_from_iter=2, densify_until_iter=14,
            densification_interval=8,
            lambda_pseudo_depth=0.05, sample_pseudo_interval=5,
            start_sample_pseudo=1, end_sample_pseudo=100,
        )
        t.depth_predictor = lambda img: np.linspace(
            1.0, 2.0, img.shape[0] * img.shape[1], dtype=np.float32
        ).reshape(img.shape[:2])
        losses = []
        log = t.logger.log_step

        def spy(it, metrics, wall):
            losses.append(float(metrics.loss))
            return log(it, metrics, wall)

        t.logger.log_step = spy
        state = t.train(t.init_state(), iterations=16)
        assert int(state.step) == 16
        # 16 iterations with mid-run densify churn are too noisy for a
        # strict monotone check; training health = finite, improving at
        # some point, and parameters actually moving.
        assert np.isfinite(losses).all()
        assert min(losses) < losses[0]
        assert float(np.asarray(state.model.aux.denom).max()) > 0
        assert np.isfinite(np.asarray(state.model.params.xyz)).all()
