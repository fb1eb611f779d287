"""Adam with per-field learning rates and densification-friendly state.

Capability parity: reference scene/gaussian_model.py:350-400 (torch Adam with
eps=1e-15 and one param group per tensor, scheduled xyz LR) and the optimizer
state surgery in :549-624 (new points get zeroed moments; pruned points drop
their moments).

Written by hand (30 lines of pytree math) instead of optax so the moment
pytree has *exactly* the parameter structure — densification can scatter
zeros into moment slots with the same masked writes it applies to parameters.
The Adam step count is shared across the whole tensor, matching torch
semantics where re-created params inherit the group's step.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class AdamState:
    mu: Any       # pytree like params
    nu: Any       # pytree like params
    count: jnp.ndarray  # () int32


class AdamHyper(NamedTuple):
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-15


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def adam_update(
    grads,
    state: AdamState,
    params,
    lr_tree,
    hyper: AdamHyper = AdamHyper(),
    weight_decay_tree=None,
):
    """One Adam step.

    Args:
        lr_tree: pytree with the same structure as params whose leaves are
            scalar learning rates (python floats or traced scalars).  A leaf
            lr of 0 freezes that field.
        weight_decay_tree: optional same-structure pytree of L2 coefficients
            (torch-Adam style: added to the gradient before the moments).

    Returns:
        (new_params, new_state).
    """
    count = state.count + 1
    b1, b2, eps = hyper.b1, hyper.b2, hyper.eps
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    if weight_decay_tree is None:
        weight_decay_tree = jax.tree.map(lambda _: 0.0, params)

    def leaf(p, g, mu, nu, lr, wd):
        if g is None:
            return p, mu, nu
        g = g + wd * p
        mu = b1 * mu + (1.0 - b1) * g
        nu = b2 * nu + (1.0 - b2) * g * g
        mhat = mu / c1
        vhat = nu / c2
        p = p - lr * mhat / (jnp.sqrt(vhat) + eps)
        return p, mu, nu

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_mu = treedef.flatten_up_to(state.mu)
    flat_nu = treedef.flatten_up_to(state.nu)
    flat_lr = treedef.flatten_up_to(lr_tree)
    flat_wd = treedef.flatten_up_to(weight_decay_tree)

    out = [leaf(*args) for args in zip(flat_p, flat_g, flat_mu, flat_nu, flat_lr, flat_wd)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_mu = treedef.unflatten([o[1] for o in out])
    new_nu = treedef.unflatten([o[2] for o in out])
    return new_p, AdamState(mu=new_mu, nu=new_nu, count=count)


def make_lr_tree(
    params,
    opt_cfg,
    xyz_lr,
    spatial_lr_scale: float = 1.0,
):
    """Build the per-field LR pytree matching GaussianParams.

    Parity with reference scene/gaussian_model.py:357-377: xyz scheduled,
    f_rest = feature_lr / 20, plus the appearance groups when present.
    ``xyz_lr`` may be a traced scalar (already includes spatial_lr_scale).
    """
    del spatial_lr_scale  # xyz_lr arrives pre-scaled
    from skyfall_gs_tpu.model.gaussians import GaussianParams

    return GaussianParams(
        xyz=xyz_lr,
        features_dc=opt_cfg.feature_lr,
        features_rest=opt_cfg.feature_lr / 20.0,
        scaling=opt_cfg.scaling_lr,
        rotation=opt_cfg.rotation_lr,
        opacity=opt_cfg.opacity_lr,
        embeddings=(opt_cfg.embedding_lr if params.embeddings is not None else None),
        appearance_embeddings=(
            opt_cfg.appearance_embedding_lr
            if params.appearance_embeddings is not None else None
        ),
        appearance_mlp=(
            jax.tree.map(lambda _: opt_cfg.appearance_mlp_lr, params.appearance_mlp)
            if params.appearance_mlp is not None else None
        ),
    )


def make_weight_decay_tree(params, opt_cfg):
    """Only the per-camera appearance embeddings get L2 regularization
    (reference scene/gaussian_model.py:375)."""
    from skyfall_gs_tpu.model.gaussians import GaussianParams

    return GaussianParams(
        xyz=0.0,
        features_dc=0.0,
        features_rest=0.0,
        scaling=0.0,
        rotation=0.0,
        opacity=0.0,
        embeddings=(0.0 if params.embeddings is not None else None),
        appearance_embeddings=(
            opt_cfg.appearance_embedding_regularization
            if params.appearance_embeddings is not None else None
        ),
        appearance_mlp=(
            jax.tree.map(lambda _: 0.0, params.appearance_mlp)
            if params.appearance_mlp is not None else None
        ),
    )
