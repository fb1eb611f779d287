"""Training checkpoints: full-state save/restore.

Capability parity: reference train.py:342-344 (torch.save of
(gaussians.capture(), iteration)) and scene/gaussian_model.py:128-188
(capture/restore/load_from_checkpoints) — the checkpoint holds every
parameter tensor, the appearance tensors/MLP, densification statistics, the
complete Adam state, and the spatial LR scale.

Format: a single .npz of the flattened state dict (flax serialization), plus
the static metadata needed to rebuild the pytree skeleton.  No pickle.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np
from flax import serialization


def _flatten(d, prefix="", out=None):
    if out is None:
        out = {}
    for k, v in d.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            _flatten(v, key, out)
        elif v is None:
            continue
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten_into(template: dict, flat: dict, prefix=""):
    out = {}
    for k, v in template.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out[k] = _unflatten_into(v, flat, key)
        elif key in flat:
            out[k] = flat[key]
        else:
            out[k] = v
    return out


def save_checkpoint(path: str, train_state, iteration: int) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    state_dict = serialization.to_state_dict(train_state)
    flat = _flatten(state_dict)
    model = train_state.model
    emb = model.params.appearance_embeddings
    meta = {
        "iteration": int(iteration),
        "active_sh_degree": model.active_sh_degree,
        "max_sh_degree": model.max_sh_degree,
        "appearance": list(model.appearance),
        "spatial_lr_scale": model.spatial_lr_scale,
        "capacity": int(model.params.capacity),
        "num_cameras": int(emb.shape[0]) if emb is not None else 0,
    }
    np.savez_compressed(path, __meta__=json.dumps(meta), **flat)


def load_checkpoint(path: str, template) -> Tuple[object, int]:
    """Restore into a pytree shaped like ``template`` (same capacity and
    appearance configuration).  Returns (state, iteration)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    flat = {k: data[k] for k in data.files if k != "__meta__"}
    state_dict = serialization.to_state_dict(template)
    merged = _unflatten_into(state_dict, flat)
    state = serialization.from_state_dict(template, merged)
    model = state.model.replace(
        active_sh_degree=meta["active_sh_degree"],
        max_sh_degree=meta["max_sh_degree"],
        spatial_lr_scale=meta["spatial_lr_scale"],
    )
    state = state.replace(model=model)
    return state, meta["iteration"]


def peek_checkpoint_meta(path: str) -> dict:
    data = np.load(path, allow_pickle=False)
    return json.loads(str(data["__meta__"]))
