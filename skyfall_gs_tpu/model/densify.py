"""Adaptive density control as shape-preserving masked writes.

Capability parity: reference scene/gaussian_model.py:626-749
(densification_postfix / densify_and_split / densify_and_clone /
densify_and_prune / add_densification_stats), including:

  * the AbsGS dynamic threshold: Q = quantile(grads_abs, 1 - ratio) where
    ratio is the fraction of points whose signed screen grad exceeds
    ``densify_grad_threshold`` (:707-724);
  * clone for small Gaussians, split (N=2, samples from the Gaussian,
    scale / (0.8 * N)) for large ones (:653-705);
  * pruning by opacity < min_opacity or world-space scale > 0.1 * extent.
    The reference's screen-radius prune is faithfully a no-op: the CUDA
    lineage resets ``max_radii2D`` inside densification_postfix *before*
    the prune reads it (:651,731-739) — we keep that exact behavior;
  * all densification stats reset to zero afterwards.

TPU re-design: the reference reallocates tensors and performs optimizer
state surgery.  Here capacity is fixed: children are scattered into dead
slots (drop-on-overflow with a reported drop count), Adam moments are zeroed
at the written slots, and the caller grows capacity host-side (one recompile)
when free space runs low.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from skyfall_gs_tpu.core.transforms import quat_to_rotmat
from skyfall_gs_tpu.model.gaussians import GaussianAux, GaussianParams, get_opacity, get_scaling
from skyfall_gs_tpu.model.optim import AdamState

_PER_GAUSSIAN_FIELDS = (
    "xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity",
    "embeddings",
)


class DensifyStats(NamedTuple):
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    n_dropped: jnp.ndarray   # children lost to capacity overflow
    n_alive: jnp.ndarray


def add_densification_stats(
    aux: GaussianAux,
    mean2d_grad: jnp.ndarray,      # (C, 2) d loss / d pixel-space mean
    mean2d_abs_grad: jnp.ndarray,  # (C, 2) AbsGS absolute pixel-space grad
    radii: jnp.ndarray,            # (C,) int32
    width: int,
    height: int,
) -> GaussianAux:
    """Accumulate screen-space gradient statistics for visible Gaussians.

    The reference accumulates NDC-scale gradients (pixel grads x W/2, H/2 —
    the CUDA backward multiplies by 0.5 * W); we rescale here so the
    ``densify_grad_threshold`` calibration (0.0002) carries over.
    """
    scale = jnp.asarray([0.5 * width, 0.5 * height], jnp.float32)
    update = (radii > 0) & aux.alive
    g = jnp.linalg.norm(mean2d_grad * scale, axis=-1)
    ga = jnp.linalg.norm(mean2d_abs_grad * scale, axis=-1)
    return aux.replace(
        grad_accum=aux.grad_accum + jnp.where(update, g, 0.0),
        grad_accum_abs=aux.grad_accum_abs + jnp.where(update, ga, 0.0),
        grad_accum_abs_max=jnp.maximum(
            aux.grad_accum_abs_max, jnp.where(update, ga, 0.0)
        ),
        denom=aux.denom + update.astype(aux.denom.dtype),
        max_radii2d=jnp.maximum(
            aux.max_radii2d, jnp.where(update, radii.astype(jnp.float32), 0.0)
        ),
    )


def _masked_quantile(values: jnp.ndarray, mask: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Linear-interpolation quantile over masked entries (torch.quantile)."""
    c = values.shape[0]
    vals = jnp.where(mask, values, jnp.inf)
    svals = jnp.sort(vals)
    n = jnp.sum(mask)
    pos = jnp.clip(q, 0.0, 1.0) * jnp.maximum(n - 1, 0).astype(jnp.float32)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.maximum(n - 1, 0))
    frac = pos - i0.astype(jnp.float32)
    i0 = jnp.clip(i0, 0, c - 1)
    i1 = jnp.clip(i1, 0, c - 1)
    out = svals[i0] * (1.0 - frac) + svals[i1] * frac
    return jnp.where(n > 0, out, 0.99)


def _scatter_rows(arr: jnp.ndarray, dest: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    return arr.at[dest].set(vals, mode="drop")


def densify_and_prune(
    params: GaussianParams,
    aux: GaussianAux,
    opt_state: AdamState,
    rng: jax.Array,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float,
    percent_dense: float,
    axis: str | None = None,
) -> tuple[GaussianParams, GaussianAux, AdamState, DensifyStats]:
    """One clone/split/prune pass.  Pure, jittable, shape-preserving.

    With ``axis`` set (inside shard_map over a gaussian-sharded state), the
    two GLOBAL quantities — the >=max_grad ratio and the AbsGS quantile
    threshold — are computed with collectives (psum + one all_gather of the
    per-splat abs-grad stat, ~4 MB/M splats every ~100 iters); selection,
    slot allocation, clone/split writes, pruning and the Adam-moment
    surgery all stay shard-local (children land in the parent's shard's
    dead region).  Reported stats are psum'd.  Identical semantics to the
    unsharded pass up to which dead slots children occupy.
    """
    cap = params.capacity
    alive = aux.alive
    denom_ok = aux.denom > 0
    grads = jnp.where(denom_ok & alive, aux.grad_accum / jnp.maximum(aux.denom, 1), 0.0)
    grads_abs = jnp.where(denom_ok & alive, aux.grad_accum_abs / jnp.maximum(aux.denom, 1), 0.0)

    if axis is None:
        n_alive0 = jnp.sum(alive)
        ratio = jnp.sum((grads >= max_grad) & alive) / jnp.maximum(n_alive0, 1)
        q_thresh = _masked_quantile(grads_abs, alive, 1.0 - ratio)
        # Degenerate guard: with no accumulated stats Q would be 0 and >= Q
        # would select everything; disable abs-based selection instead.
        q_thresh = jnp.where(jnp.sum(grads_abs) > 0.0, q_thresh, jnp.inf)
    else:
        n_alive0 = jax.lax.psum(jnp.sum(alive), axis)
        ratio = jax.lax.psum(jnp.sum((grads >= max_grad) & alive),
                             axis) / jnp.maximum(n_alive0, 1)
        g_abs = jax.lax.all_gather(grads_abs, axis).reshape(-1)
        g_alive = jax.lax.all_gather(alive, axis).reshape(-1)
        q_thresh = _masked_quantile(g_abs, g_alive, 1.0 - ratio)
        q_thresh = jnp.where(jnp.sum(g_abs) > 0.0, q_thresh, jnp.inf)

    scaling = get_scaling(params)
    scale_max = jnp.max(scaling, axis=1)
    grad_cond = ((grads >= max_grad) | (grads_abs >= q_thresh)) & alive
    clone_mask = grad_cond & (scale_max <= percent_dense * extent)
    split_mask = grad_cond & (scale_max > percent_dense * extent)

    opacity = get_opacity(params)
    # The radii branch reads post-reset (all-zero) max_radii2D in the
    # reference, so it is kept for parity but never fires.
    prune_zero_radii = jnp.zeros_like(aux.max_radii2d)
    prune_pred_parent = (opacity < min_opacity)
    if max_screen_size:
        prune_pred_parent = (
            prune_pred_parent
            | (prune_zero_radii > max_screen_size)
            | (scale_max > 0.1 * extent)
        )

    # --- allocate destination slots in the dead region -----------------------
    alive_after_kill = alive & ~split_mask & ~(alive & prune_pred_parent)
    free_order = jnp.argsort(alive_after_kill)           # dead slots first
    n_free = cap - jnp.sum(alive_after_kill)

    clone_keep = clone_mask & ~prune_pred_parent
    pos_clone = jnp.cumsum(clone_keep) - 1
    n_clone = jnp.sum(clone_keep)

    # Split children: evaluate the prune predicate at child scale.
    child_scaling = scaling / (0.8 * 2.0)
    child_scale_max = jnp.max(child_scaling, axis=1)
    child_pred = opacity < min_opacity
    if max_screen_size:
        child_pred = child_pred | (child_scale_max > 0.1 * extent)
    split_keep = split_mask & ~child_pred
    pos_split = jnp.cumsum(split_keep) - 1
    n_split = jnp.sum(split_keep)

    def slot(linear_pos, valid):
        idx = jnp.where(valid & (linear_pos < n_free), linear_pos, cap)
        return jnp.where(idx < cap, free_order[jnp.clip(idx, 0, cap - 1)], cap)

    dest_clone = slot(pos_clone, clone_keep)
    dest_s0 = slot(n_clone + 2 * pos_split, split_keep)
    dest_s1 = slot(n_clone + 2 * pos_split + 1, split_keep)

    total_children = n_clone + 2 * n_split
    n_dropped = jnp.maximum(total_children - n_free, 0)

    # --- child values ---------------------------------------------------------
    k0, k1 = jax.random.split(rng)
    rot = quat_to_rotmat(params.rotation)                # (C, 3, 3)

    def split_child(key):
        noise = jax.random.normal(key, (cap, 3)) * scaling
        offset = jnp.einsum("nij,nj->ni", rot, noise)
        return params.xyz + offset

    child_xyz0 = split_child(k0)
    child_xyz1 = split_child(k1)
    child_log_scaling = jnp.log(jnp.maximum(child_scaling, 1e-12))

    def write_children(leaf_name, arr):
        src = getattr(params, leaf_name)
        arr = _scatter_rows(arr, dest_clone, src)
        if leaf_name == "xyz":
            arr = _scatter_rows(arr, dest_s0, child_xyz0)
            arr = _scatter_rows(arr, dest_s1, child_xyz1)
        elif leaf_name == "scaling":
            arr = _scatter_rows(arr, dest_s0, child_log_scaling)
            arr = _scatter_rows(arr, dest_s1, child_log_scaling)
        else:
            arr = _scatter_rows(arr, dest_s0, src)
            arr = _scatter_rows(arr, dest_s1, src)
        return arr

    new_fields = {}
    for name in _PER_GAUSSIAN_FIELDS:
        src = getattr(params, name)
        if src is None:
            continue
        new_fields[name] = write_children(name, src)

    new_params = params.replace(**new_fields)

    # Zero Adam moments at the freshly written slots.
    def zero_slots(arr):
        zeros1 = jnp.zeros((1,) + arr.shape[1:], arr.dtype)
        for dest in (dest_clone, dest_s0, dest_s1):
            arr = arr.at[dest].set(jnp.broadcast_to(zeros1, arr.shape), mode="drop")
        return arr

    def surgery(tree):
        fields = {}
        for name in _PER_GAUSSIAN_FIELDS:
            leaf = getattr(tree, name)
            if leaf is None:
                continue
            fields[name] = zero_slots(leaf)
        return tree.replace(**fields)

    new_opt = opt_state.replace(mu=surgery(opt_state.mu), nu=surgery(opt_state.nu))

    # --- new alive mask & stat reset ------------------------------------------
    written = jnp.zeros(cap, bool)
    for dest in (dest_clone, dest_s0, dest_s1):
        written = written.at[dest].set(True, mode="drop")
    new_alive = alive_after_kill | written

    zeros = jnp.zeros(cap)
    new_aux = aux.replace(
        alive=new_alive,
        grad_accum=zeros,
        grad_accum_abs=zeros,
        grad_accum_abs_max=zeros,
        denom=zeros,
        max_radii2d=zeros,
        filter_3d=write_children_filter(aux.filter_3d, dest_clone, dest_s0, dest_s1),
    )

    n_pruned = jnp.sum(alive & prune_pred_parent) + jnp.sum(split_mask & ~prune_pred_parent)
    stats = DensifyStats(
        n_cloned=n_clone,
        n_split=n_split,
        n_pruned=n_pruned,
        n_dropped=n_dropped,
        n_alive=jnp.sum(new_alive),
    )
    if axis is not None:
        stats = jax.tree.map(lambda x: jax.lax.psum(x, axis), stats)
    return new_params, new_aux, new_opt, stats


def write_children_filter(filter_3d, dest_clone, dest_s0, dest_s1):
    """Children inherit the parent 3D filter until the next recompute."""
    out = filter_3d
    for dest in (dest_clone, dest_s0, dest_s1):
        out = out.at[dest].set(filter_3d, mode="drop")
    return out


def grow_capacity(state, opt_state: AdamState, new_capacity: int):
    """Host-side capacity growth: pad all per-Gaussian arrays with dead slots.

    Triggers one recompilation of the training step; call with doubling
    capacities to amortize.
    """
    cap = state.params.capacity
    if new_capacity <= cap:
        return state, opt_state
    pad = new_capacity - cap

    def pad_rows(arr, fill=0.0):
        widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
        return jnp.pad(arr, widths, constant_values=fill)

    def pad_params(p: GaussianParams) -> GaussianParams:
        fields = {}
        for name in _PER_GAUSSIAN_FIELDS:
            leaf = getattr(p, name)
            if leaf is None:
                continue
            if name == "rotation":
                padded = jnp.concatenate(
                    [leaf, jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], leaf.dtype), (pad, 1))]
                )
            elif name == "opacity":
                padded = pad_rows(leaf, fill=-10.0)
            else:
                padded = pad_rows(leaf)
            fields[name] = padded
        return p.replace(**fields)

    def pad_moments(p: GaussianParams) -> GaussianParams:
        # Adam moments of fresh padding slots must be ZERO for every field —
        # reusing pad_params here once filled nu.opacity with the -10 logit
        # fill, and a negative second moment is sqrt(-x) = NaN on the next
        # optimizer step (it poisoned every padding row's opacity, then
        # cascaded into scaling/rotation through 0 * NaN gradients).
        fields = {}
        for name in _PER_GAUSSIAN_FIELDS:
            leaf = getattr(p, name)
            if leaf is None:
                continue
            fields[name] = pad_rows(leaf)
        return p.replace(**fields)

    new_params = pad_params(state.params)
    new_aux = GaussianAux(
        alive=jnp.pad(state.aux.alive, (0, pad)),
        filter_3d=pad_rows(state.aux.filter_3d),
        max_radii2d=pad_rows(state.aux.max_radii2d),
        grad_accum=pad_rows(state.aux.grad_accum),
        grad_accum_abs=pad_rows(state.aux.grad_accum_abs),
        grad_accum_abs_max=pad_rows(state.aux.grad_accum_abs_max),
        denom=pad_rows(state.aux.denom),
    )
    new_opt = opt_state.replace(
        mu=pad_moments(opt_state.mu), nu=pad_moments(opt_state.nu)
    )
    return state.replace(params=new_params, aux=new_aux), new_opt
