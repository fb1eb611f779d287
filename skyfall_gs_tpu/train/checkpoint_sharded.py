"""Sharded (multi-host-safe) training checkpoints via orbax.

The ``.npz`` format (train/checkpoint.py) is bit-exact but single-host: it
materializes every leaf with ``np.asarray``, which requires fully-addressable
arrays and gathers the whole model to one process.  In the gaussian-sharded
/ multi-host regimes (parallel/gauss_shard.py, parallel/mesh.py) the
TrainState leaves are ``jax.Array``s sharded over a Mesh; this module writes
each process's shards in parallel (orbax OCDBT) and restores to whatever
sharding the provided template carries — a pod checkpoints without ever
assembling the model on one host, and a single-host run can restore a pod
checkpoint (and vice versa).

Capability parity: reference train.py:342-344 (``torch.save`` of the capture
tuple), extended to the multi-host axis the reference lacks; SURVEY §5.4
names orbax checkpoints of the {params, optimizer, densify stats, step}
pytree as the TPU-idiomatic equivalent.

Multi-host usage: every process calls :func:`save_checkpoint_sharded` /
:func:`load_checkpoint_sharded` collectively with the same path on a shared
filesystem (orbax coordinates through the jax.distributed client that
parallel/mesh.initialize_distributed sets up).

Contents match the npz format exactly: the flax state dict of the full
TrainState (params, Adam mu/nu/count, densification stats, appearance
tensors/MLP, step) plus the same JSON metadata — verified bit-exact against
the npz path in tests/test_checkpoint_sharded.py.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _prune_none(d: dict) -> dict:
    """Drop ``None`` leaves (orbax cannot serialize them); the template
    supplies them back on restore via the same merge the npz path uses."""
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            sub = _prune_none(v)
            if sub:
                out[k] = sub
        elif v is not None:
            out[k] = v
    return out


def _merge(template: dict, restored: dict) -> dict:
    out = {}
    for k, v in template.items():
        if isinstance(v, dict):
            out[k] = _merge(v, restored.get(k, {}))
        elif k in restored:
            out[k] = restored[k]
        else:
            out[k] = v  # None / missing leaves come from the template
    return out


def _abstract_like(x):
    """Restore target for one leaf: jax.Arrays restore onto their template
    sharding; host leaves restore as numpy."""
    if isinstance(x, jax.Array):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
    return np.asarray(x)


def _state_meta(train_state, iteration: int) -> dict:
    model = train_state.model
    emb = model.params.appearance_embeddings
    return {
        "iteration": int(iteration),
        "active_sh_degree": model.active_sh_degree,
        "max_sh_degree": model.max_sh_degree,
        "appearance": list(model.appearance),
        "spatial_lr_scale": model.spatial_lr_scale,
        "capacity": int(model.params.capacity),
        "num_cameras": int(emb.shape[0]) if emb is not None else 0,
    }


def save_checkpoint_sharded(path: str, train_state, iteration: int) -> None:
    """Collective save of the full TrainState; leaves keep their shardings.

    ``path`` is a directory (created by orbax; must not already exist).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    state_dict = _prune_none(serialization.to_state_dict(train_state))
    with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ck:
        ck.save(
            path,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state_dict),
                meta=ocp.args.JsonSave(_state_meta(train_state, iteration)),
            ),
        )


def load_checkpoint_sharded(path: str, template) -> Tuple[object, int]:
    """Collective restore into a pytree shaped (and SHARDED) like
    ``template``: each jax.Array leaf lands with the template leaf's
    sharding, regardless of the mesh it was saved from.  Returns
    ``(state, iteration)``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    tmpl_dict = serialization.to_state_dict(template)
    abstract = jax.tree.map(_abstract_like, _prune_none(tmpl_dict))
    with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ck:
        restored = ck.restore(
            path,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract),
                meta=ocp.args.JsonRestore(),
            ),
        )
    meta = restored["meta"]
    merged = _merge(tmpl_dict, restored["state"])
    state = serialization.from_state_dict(template, merged)
    model = state.model.replace(
        active_sh_degree=meta["active_sh_degree"],
        max_sh_degree=meta["max_sh_degree"],
        spatial_lr_scale=meta["spatial_lr_scale"],
    )
    return state.replace(model=model), meta["iteration"]


def peek_checkpoint_meta_sharded(path: str) -> dict:
    import orbax.checkpoint as ocp

    with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ck:
        return ck.restore(
            os.path.abspath(path),
            args=ocp.args.Composite(meta=ocp.args.JsonRestore()),
        )["meta"]
