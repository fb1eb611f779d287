"""Multi-chip training: view-parallel data parallelism over a device mesh.

The reference trains one view per step on one GPU.  On a TPU slice we train
B views per step — one per device along the ``data`` mesh axis — with the
Gaussian state replicated and gradients/statistics combined with XLA
collectives over ICI:

  * parameter gradients: ``pmean`` (equivalent to averaging the B per-view
    losses);
  * densification statistics: ``psum`` of per-view screen-gradient
    accumulators and visibility counts, ``pmax`` of radii — the exact
    multi-view generalization of the reference's sequential accumulation
    (scene/gaussian_model.py:744-749 over successive steps);
  * metrics: ``pmean``.

Implemented with ``shard_map`` so the per-device body is the ordinary
single-view step (including the Pallas rasterizer) and the collectives are
explicit.  The optimizer update runs replicated — identical on every device
because the pmean'd gradients are identical.

The second axis — Gaussian-sharded rasterization (sharding the N-splat
state itself across devices with depth-partitioned compositing, appearance
included) — ships in :mod:`skyfall_gs_tpu.parallel.gauss_shard`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from skyfall_gs_tpu.model.densify import add_densification_stats
from skyfall_gs_tpu.model.optim import (
    adam_update,
    make_lr_tree,
    make_weight_decay_tree,
)
from skyfall_gs_tpu.model.render import render
from skyfall_gs_tpu.train.step import StepMetrics, TrainState, _build_grads_fn


def _combine_and_update(state: TrainState, loss, aux_out, gparams, gdummies,
                        w, h, opt_cfg, xyz_lr, axis: str):
    """ICI collectives + replicated optimizer update, shared by every
    view-parallel step variant.

    * parameter gradients: ``pmean`` (equivalent to averaging the B
      per-view losses);
    * densification statistics: ``psum`` of per-view accumulator deltas and
      visibility counts, ``pmax`` of radii — the exact B-view
      generalization of the reference's sequential accumulation;
    * metrics: ``pmean`` (overflow: ``psum``).
    """
    model = state.model
    gparams = jax.lax.pmean(gparams, axis)
    aux0 = model.aux
    aux1 = add_densification_stats(aux0, gdummies[0], gdummies[1],
                                   aux_out["radii"], w, h)
    new_aux = aux0.replace(
        grad_accum=aux0.grad_accum + jax.lax.psum(
            aux1.grad_accum - aux0.grad_accum, axis),
        grad_accum_abs=aux0.grad_accum_abs + jax.lax.psum(
            aux1.grad_accum_abs - aux0.grad_accum_abs, axis),
        grad_accum_abs_max=jax.lax.pmax(aux1.grad_accum_abs_max, axis),
        denom=aux0.denom + jax.lax.psum(aux1.denom - aux0.denom, axis),
        max_radii2d=jax.lax.pmax(aux1.max_radii2d, axis),
    )

    lr_tree = make_lr_tree(model.params, opt_cfg, xyz_lr)
    wd_tree = make_weight_decay_tree(model.params, opt_cfg)
    new_params, new_opt = adam_update(
        gparams, state.opt, model.params, lr_tree,
        weight_decay_tree=wd_tree)

    new_state = TrainState(
        model=model.replace(params=new_params, aux=new_aux),
        opt=new_opt, step=state.step + 1)
    metrics = StepMetrics(
        loss=jax.lax.pmean(loss, axis),
        l1=jax.lax.pmean(aux_out["l1"], axis),
        depth_loss=jax.lax.pmean(aux_out["depth_loss"], axis),
        opacity_loss=aux_out["opacity_loss"],
        psnr=jax.lax.pmean(aux_out["psnr"], axis),
        n_alive=jnp.sum(new_aux.alive),
        overflow=jax.lax.psum(aux_out["overflow"], axis),
    )
    return new_state, metrics


def _build_parallel_step(
    mesh: Mesh,
    opt_cfg,
    axis: str = "data",
    **step_kwargs,
):
    """Build the raw (unjitted) shard_map'd multi-device train step.

    The per-view loss/gradient core is the SAME function the single-device
    step compiles (train.step._build_grads_fn) — every step option
    (kernel_size, backend, use_depth, photometric, lpips_fn, bin_capacity,
    ...) behaves identically; this wrapper only adds the ICI collectives
    between gradient computation and the replicated optimizer update.

    Signature of the returned function:
        step(state, cameras_B, images (B,H,W,3), masks (B,H,W),
             depths (B,H,W), bg (3,), xyz_lr, lambda_opacity)
          -> (state, StepMetrics)
    where B == mesh size along ``axis``.
    """
    grads_fn = _build_grads_fn(opt_cfg, **step_kwargs)

    def local_step(state: TrainState, cam_b, image_b, mask_b, depth_b, bg,
                   xyz_lr, lambda_opacity):
        # Local shard: exactly one view.
        camera = jax.tree.map(lambda x: x[0], cam_b)
        loss, aux_out, gparams, gdummies = grads_fn(
            state.model, camera, image_b[0], mask_b[0], depth_b[0], bg,
            jax.random.PRNGKey(0), lambda_opacity)
        return _combine_and_update(
            state, loss, aux_out, gparams, gdummies,
            camera.width, camera.height, opt_cfg, xyz_lr, axis)

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return sharded


def make_parallel_train_step(mesh: Mesh, *args, **kwargs):
    """Jitted multi-device train step — see :func:`_build_parallel_step`.

    Signature of the returned function:
        step(state, cameras_B, images (B,H,W,3), masks (B,H,W),
             depths (B,H,W), bg (3,), xyz_lr, lambda_opacity)
          -> (state, StepMetrics)
    where B == mesh size along ``axis``.
    """
    return jax.jit(_build_parallel_step(mesh, *args, **kwargs))


def make_parallel_multistep(mesh: Mesh, *args, **kwargs):
    """Scan-fused window of view-parallel training steps: one dispatch runs
    K consecutive B-view steps over the mesh (the multi-chip analogue of
    train.step.make_train_multistep — per-dispatch runtime overhead is paid
    once per window instead of once per step).

    Signature:
        multi(state, cameras (K,B-stacked pytree), images (K,B,H,W,3),
              masks (K,B,H,W), depths (K,B,H,W), bg (3,), xyz_lrs (K,),
              lambda_opacities (K,))
            -> (state, StepMetrics with (K,)-leaves)
    """
    sharded = _build_parallel_step(mesh, *args, **kwargs)

    def multi(state, cams_kb, images_kb, masks_kb, depths_kb, bg,
              xyz_lrs, lambda_opacities):
        def body(st, xs):
            cam_b, img_b, msk_b, dep_b, lr, lam = xs
            return sharded(st, cam_b, img_b, msk_b, dep_b, bg, lr, lam)

        return jax.lax.scan(
            body, state,
            (cams_kb, images_kb, masks_kb, depths_kb, xyz_lrs,
             lambda_opacities))

    return jax.jit(multi)


def make_parallel_multistep_indexed(mesh: Mesh, opt_cfg, axis: str = "data",
                                    use_pseudo: bool = False, **step_kwargs):
    """Scan-fused view-parallel window over DEVICE-RESIDENT view groups.

    The Trainer's multi-chip hot path: like make_parallel_multistep, but the
    whole resolution group's stacked views are passed by device handle
    (replicated) and each scan step dynamic-slices its device's view — the
    host stages only the (K, B) index picks per window, never pixels.
    Per-view ray-jitter keys derive from the per-step key by folding in the
    device's mesh position.

    Signature:
        multi(state, cameras (M-stacked pytree), images (M,H,W,3),
              masks (M,H,W), depths (M,H,W), idxs (K,B) int32, bg (3,),
              rngs (K,2) per-step keys, xyz_lrs (K,), lambda_opacities (K,)
              [, pseudo_cameras (K-stacked), pseudo_depths (K,Hp,Wp),
               pseudo_scales (K,)])
            -> (state, StepMetrics with (K,)-leaves)
    where B == mesh size along ``axis``.  Pseudo-view supervision args are
    replicated — every device adds the same pseudo-depth term, and the
    pmean leaves its gradient contribution identical to the single-device
    semantics.
    """
    grads_fn = _build_grads_fn(opt_cfg, use_pseudo=use_pseudo, **step_kwargs)

    def local_multi(state, cameras, images, masks, depths, idxs, bg, rngs,
                    xyz_lrs, lambda_opacities, *pseudo_kargs):
        def body(st, xs):
            i, key, lr, lam = xs[:4]
            pseudo = xs[4:]
            i0 = i[0]  # local (1,) slice of this step's (B,) picks
            cam = jax.tree.map(lambda x: x[i0], cameras)
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            loss, aux_out, gparams, gdummies = grads_fn(
                st.model, cam, images[i0], masks[i0], depths[i0], bg,
                key, lam, *pseudo)
            return _combine_and_update(
                st, loss, aux_out, gparams, gdummies,
                cam.width, cam.height, opt_cfg, lr, axis)

        return jax.lax.scan(
            body, state, (idxs, rngs, xyz_lrs, lambda_opacities)
            + tuple(pseudo_kargs))

    n_extra = 3 if use_pseudo else 0
    sharded = shard_map(
        local_multi, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(None, axis), P(), P(), P(), P())
        + (P(),) * n_extra,
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_parallel_idu_multistep(mesh: Mesh, opt_cfg, idu_kwargs: dict,
                                orig_kwargs: dict, axis: str = "data",
                                use_pseudo: bool = False):
    """View-parallel scan-fused window of MIXED IDU/original episode steps:
    the multi-chip counterpart of train.step.make_idu_multistep (runtime
    per-step kind, lax.cond between the two step bodies) composed with
    make_parallel_multistep_indexed's B-views-per-step semantics (pmean'd
    grads, psum/pmax'd densify stats, replicated update, device-resident
    view groups, (K, B) index picks).

    Signature:
        multi(state,
              idu_cameras (M1-stacked), idu_images (M1,H1,W1,3),
              idu_masks, idu_depths,
              orig_cameras (M2-stacked), orig_images (M2,H2,W2,3),
              orig_masks, orig_depths,
              kinds (K,) int32 (1 = IDU view, 0 = original view),
              idu_idxs (K,B), orig_idxs (K,B) int32 (dummy 0 where unused),
              bg (3,), rngs (K,2), xyz_lrs (K,), lambda_opacities (K,)
              [, pseudo_cameras (K-stacked), pseudo_depths (K,Hp,Wp),
               pseudo_scales (K,)])
            -> (state, StepMetrics with (K,)-leaves)
    """
    g_idu = _build_grads_fn(opt_cfg, use_pseudo=use_pseudo, **idu_kwargs)
    g_orig = _build_grads_fn(opt_cfg, use_pseudo=use_pseudo, **orig_kwargs)

    def local_multi(state, idu_cameras, idu_images, idu_masks, idu_depths,
                    orig_cameras, orig_images, orig_masks, orig_depths,
                    kinds, idu_idxs, orig_idxs, bg, rngs, xyz_lrs,
                    lambda_opacities, *pseudo_kargs):
        def body(st, xs):
            kind, ii, oi, key, lr, lam = xs[:6]
            pseudo = xs[6:]
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))

            def run(grads_fn, cameras, images, masks, depths, idx, st):
                i0 = idx[0]  # local (1,) slice of this step's (B,) picks
                cam = jax.tree.map(lambda x: x[i0], cameras)
                loss, aux_out, gparams, gdummies = grads_fn(
                    st.model, cam, images[i0], masks[i0], depths[i0], bg,
                    key, lam, *pseudo)
                return _combine_and_update(
                    st, loss, aux_out, gparams, gdummies,
                    cam.width, cam.height, opt_cfg, lr, axis)

            return jax.lax.cond(
                kind == 1,
                lambda s: run(g_idu, idu_cameras, idu_images, idu_masks,
                              idu_depths, ii, s),
                lambda s: run(g_orig, orig_cameras, orig_images, orig_masks,
                              orig_depths, oi, s),
                st)

        return jax.lax.scan(
            body, state,
            (kinds, idu_idxs, orig_idxs, rngs, xyz_lrs, lambda_opacities)
            + tuple(pseudo_kargs))

    n_extra = 3 if use_pseudo else 0
    sharded = shard_map(
        local_multi, mesh=mesh,
        in_specs=(P(),) * 9 + (P(), P(None, axis), P(None, axis),
                               P(), P(), P(), P()) + (P(),) * n_extra,
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_tile_parallel_render(mesh: Mesh, kernel_size: float = 0.1,
                              backend: str = "tiled", axis: str = "data",
                              bin_capacity=None):
    """Single-frame tile (band) parallelism: the image's horizontal bands are
    sharded across the mesh; every device keeps the full (replicated)
    Gaussian state, renders its band through an exact band sub-camera
    (core.camera.band_camera), and the bands concatenate over ICI.

    Unlike view parallelism this cuts the *latency* of one frame — the
    interactive-viewer axis.  Gaussian-sharded compositing (splitting the
    splat state itself) lives in :mod:`skyfall_gs_tpu.parallel.gauss_shard`.

    Returned signature: fn(model, band_cameras_B, bg) -> (H, W, 3) image,
    where band_cameras_B is the stacked pytree of
    [band_camera(cam, k, B) for k in range(B)].
    """

    def local(model, cam_b, bg):
        camera = jax.tree.map(lambda x: x[0], cam_b)
        out = render(model, camera, bg, kernel_size=kernel_size,
                     backend=backend, testing=True, inference=True,
                     bin_capacity=bin_capacity)
        return out.color  # (Hb, W, 3); bands concatenate along rows

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_parallel_render(mesh: Mesh, kernel_size: float = 0.1,
                         backend: str = "tiled", axis: str = "data",
                         bin_capacity=None):
    """Batched view-parallel rendering: B cameras -> B images across the mesh.

    Used for IDU orbit-set generation and batch evaluation (the reference
    renders these sequentially, train.py:350-357)."""

    def local(model, cam_b, bg):
        camera = jax.tree.map(lambda x: x[0], cam_b)
        out = render(model, camera, bg, kernel_size=kernel_size,
                     backend=backend, testing=True,
                     bin_capacity=bin_capacity)
        return out.color[None], out.depth[None]

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(sharded)
