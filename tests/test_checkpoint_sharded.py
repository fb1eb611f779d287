"""Orbax sharded checkpoints: roundtrip bit-exactness across shardings.

The npz format gathers to one host; the orbax path must (a) save a
gaussian-sharded TrainState without gathering, (b) restore onto whatever
sharding the template carries (sharded -> replicated -> resharded), and
(c) agree bit-exactly with the same state saved through the npz path.
"""

import numpy as np
import pytest


def _tiny_state(rng, capacity=64, appearance=True):
    import jax.numpy as jnp

    from skyfall_gs_tpu.model.appearance import AppearanceConfig
    from skyfall_gs_tpu.model.gaussians import create_from_points
    from skyfall_gs_tpu.train.step import init_train_state

    pts = rng.normal(size=(30, 3)).astype(np.float32)
    cols = rng.uniform(size=(30, 3)).astype(np.float32)
    st = create_from_points(
        pts, cols, capacity=capacity,
        appearance=AppearanceConfig(enabled=appearance, embedding_dim=8,
                                    hidden=16),
        num_cameras=5)
    ts = init_train_state(st)
    ts = ts.replace(step=jnp.int32(77))
    mu = __import__("jax").tree.map(lambda x: x + 0.25, ts.opt.mu)
    return ts.replace(opt=ts.opt.replace(mu=mu))


def _assert_tree_equal(a, b):
    import jax

    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestShardedCheckpoint:
    def test_sharded_save_restore_roundtrip(self, rng, tmp_path):
        import jax
        from jax.sharding import Mesh

        from skyfall_gs_tpu.parallel.gauss_shard import shard_train_state
        from skyfall_gs_tpu.train.checkpoint_sharded import (
            load_checkpoint_sharded,
            peek_checkpoint_meta_sharded,
            save_checkpoint_sharded,
        )

        ts = _tiny_state(rng)
        mesh = Mesh(np.array(jax.devices()[:8]), ("gauss",))
        sharded = shard_train_state(ts, mesh)
        path = str(tmp_path / "ck_orbax")
        save_checkpoint_sharded(path, sharded, 77)

        assert peek_checkpoint_meta_sharded(path)["iteration"] == 77

        # Restore onto the SAME sharded template: shardings preserved.
        tmpl = shard_train_state(
            jax.tree.map(lambda x: x * 0, ts), mesh)
        back, it = load_checkpoint_sharded(path, tmpl)
        assert it == 77
        assert back.model.params.xyz.sharding == sharded.model.params.xyz.sharding
        _assert_tree_equal(back, ts)
        assert back.model.spatial_lr_scale == ts.model.spatial_lr_scale

        # Restore onto a DIFFERENT mesh (4 devices) — cross-sharding restore.
        mesh4 = Mesh(np.array(jax.devices()[:4]), ("gauss",))
        tmpl4 = shard_train_state(jax.tree.map(lambda x: x * 0, ts), mesh4)
        back4, _ = load_checkpoint_sharded(path, tmpl4)
        _assert_tree_equal(back4, ts)

        # Restore onto a host (unsharded) template.
        backh, _ = load_checkpoint_sharded(path, jax.tree.map(lambda x: x * 0, ts))
        _assert_tree_equal(backh, ts)

    def test_matches_npz_format(self, rng, tmp_path):
        """The orbax checkpoint restores the same state the npz path does."""
        import jax

        from skyfall_gs_tpu.train.checkpoint import (
            load_checkpoint,
            save_checkpoint,
        )
        from skyfall_gs_tpu.train.checkpoint_sharded import (
            load_checkpoint_sharded,
            save_checkpoint_sharded,
        )

        ts = _tiny_state(rng, appearance=False)  # exercise None leaves too
        p_npz = str(tmp_path / "ck.npz")
        p_orb = str(tmp_path / "ck_orbax")
        save_checkpoint(p_npz, ts, 77)
        save_checkpoint_sharded(p_orb, ts, 77)

        tmpl = jax.tree.map(lambda x: x * 0, ts)
        a, _ = load_checkpoint(p_npz, tmpl)
        b, _ = load_checkpoint_sharded(p_orb, tmpl)
        _assert_tree_equal(a, b)
        assert b.model.params.appearance_embeddings is None
