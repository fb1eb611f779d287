"""The jitted Stage-1 training step.

Capability parity: the reference hot loop (train.py:142-348):
  * ray-jitter subpixel offsets and offset-resampled GT (:189-193, 64-77);
  * masked L1 + SSIM photometric loss (:206-223);
  * Pearson depth loss on masked GT depth (:226-234);
  * opacity binary-entropy regularization (:236-242);
  * pseudo-view monocular-depth supervision with 500-iter warm-up scaling
    (:245-277) — the monodepth prediction is produced outside the step (it
    is inference-only) and enters as a constant;
  * screen-space gradient statistics for densification via the dummy-input
    trick (:312-315);
  * Adam step with per-field LRs and the scheduled xyz LR (:169, 337-340).

The whole step is one jit-compiled pure function
``(state, view, rng, scalars) -> (state, metrics)``; host code only drives
the curriculum (SH degree, densify cadence, opacity resets).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from skyfall_gs_tpu.core.camera import Camera
from skyfall_gs_tpu.model.gaussians import GaussianModelState, get_opacity
from skyfall_gs_tpu.model.optim import (
    AdamState,
    adam_init,
    adam_update,
    make_lr_tree,
    make_weight_decay_tree,
)
from skyfall_gs_tpu.model.densify import add_densification_stats
from skyfall_gs_tpu.model.render import render
from skyfall_gs_tpu.ops.losses import (
    depth_pearson_loss,
    l1_loss,
    opacity_entropy_loss,
    photometric_loss,
    psnr,
)


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    depth_loss: jnp.ndarray
    opacity_loss: jnp.ndarray
    psnr: jnp.ndarray
    n_alive: jnp.ndarray
    # duplicated entries dropped by an undersized binning capacity; nonzero
    # means splats silently vanished from this step's render + gradients
    # (the logger warns so _update_bin_capacity undersizing is visible)
    overflow: jnp.ndarray


@struct.dataclass
class TrainState:
    model: GaussianModelState
    opt: AdamState
    step: jnp.ndarray  # () int32


def init_train_state(model: GaussianModelState) -> TrainState:
    return TrainState(model=model, opt=adam_init(model.params),
                      step=jnp.zeros((), jnp.int32))


def resample_with_offset(image: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-resample (H, W, C) at pixel positions shifted by ``offset``
    (H, W, 2), border-clamped — parity with create_offset_gt
    (reference train.py:64-77)."""
    h, w = image.shape[:2]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] + offset[..., 1]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] + offset[..., 0]
    coords = jnp.stack([ys, xs], axis=0)

    def chan(c):
        return jax.scipy.ndimage.map_coordinates(c, list(coords), order=1,
                                                 mode="nearest")

    return jnp.stack([chan(image[..., i]) for i in range(image.shape[-1])], -1)


def _build_grads_fn(
    opt_cfg,
    kernel_size: float = 0.1,
    backend: str = "tiled",
    ray_jitter: bool = False,
    resample_gt: bool = False,
    use_depth: bool = True,
    use_pseudo: bool = False,
    photometric: bool = True,
    testing_render: bool = False,
    bin_capacity: Optional[int] = None,
    lpips_fn=None,
):
    """Build the per-view loss/gradient core shared by the single-device
    step and the multi-device (view-parallel) step: everything from render
    through value_and_grad, but NOT the optimizer update or densification
    statistics — the parallel step inserts its ICI collectives between the
    two (parallel/sharding.py).

    Signature:
        grads(model, camera, gt_image (H,W,3), gt_mask (H,W), gt_depth (H,W),
              bg (3,), rng, lambda_opacity,
              [pseudo_camera, pseudo_gt_depth, pseudo_scale])
            -> (loss, aux_out dict, gparams, gdummies)
    """

    def grads_fn(model, camera: Camera, gt_image, gt_mask, gt_depth,
                 bg, rng, lambda_opacity,
                 pseudo_camera=None, pseudo_gt_depth=None, pseudo_scale=None):
        cap = model.params.capacity
        h, w = camera.height, camera.width

        if ray_jitter:
            rng, krj = jax.random.split(rng)
            subpix = jax.random.uniform(krj, (h, w, 2), jnp.float32) - 0.5
        else:
            subpix = None

        dummies0 = (jnp.zeros((cap, 2)), jnp.zeros((cap, 2)))

        def loss_fn(params, dummies):
            m = model.replace(params=params)
            out = render(
                m, camera, bg, kernel_size=kernel_size,
                subpixel_offset=subpix,
                mean2d_dummy=dummies[0], mean2d_abs_dummy=dummies[1],
                backend=backend, testing=testing_render,
                bin_capacity=bin_capacity,
                # the normal channel is not part of any training loss
                # (parity: rendered_norm is unused in reference train.py)
                with_normals=False,
            )
            image = out.color * gt_mask[..., None]
            gt = gt_image * gt_mask[..., None]
            if resample_gt and subpix is not None:
                gt = resample_with_offset(gt, subpix)

            if photometric:
                if lpips_fn is not None:
                    # LPIPS-swapped photometric loss (reference
                    # train.py:218-220): (1-l) L1 + l LPIPS.
                    ll1 = l1_loss(image, gt)
                    lp = lpips_fn(image[None] * 2.0 - 1.0,
                                  gt[None] * 2.0 - 1.0)[0]
                    photo = ((1.0 - opt_cfg.lambda_dssim) * ll1
                             + opt_cfg.lambda_dssim * lp)
                else:
                    photo, ll1 = photometric_loss(
                        jnp.transpose(image, (2, 0, 1)),
                        jnp.transpose(gt, (2, 0, 1)),
                        opt_cfg.lambda_dssim,
                    )
                total = photo
            else:
                # IDU views without refinement skip the photometric term
                # (reference train.py:772-781).
                ll1 = jnp.zeros(())
                total = jnp.zeros(())

            d_loss = jnp.zeros(())
            if use_depth and opt_cfg.lambda_depth > 0:
                d_loss = depth_pearson_loss(gt_depth * gt_mask,
                                            out.depth * gt_mask)
                total = total + opt_cfg.lambda_depth * d_loss

            o_loss = opacity_entropy_loss(get_opacity(params), m.aux.alive)
            total = total + lambda_opacity * o_loss

            if use_pseudo:
                pout = render(
                    m, pseudo_camera, bg, kernel_size=kernel_size,
                    backend=backend,
                )
                pd = depth_pearson_loss(pseudo_gt_depth, pout.depth)
                pd = jnp.where(jnp.isnan(pd), 0.0, pd)
                total = total + pseudo_scale * opt_cfg.lambda_pseudo_depth * pd
                d_loss = d_loss + pd

            aux = {
                "l1": ll1,
                "depth_loss": d_loss,
                "opacity_loss": o_loss,
                "radii": out.radii,
                "psnr": psnr(image, gt),
                "overflow": jax.lax.stop_gradient(
                    out.overflow if out.overflow is not None
                    else jnp.zeros((), jnp.int32)),
            }
            return total, aux

        (loss, aux_out), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(model.params, dummies0)
        gparams, gdummies = grads
        return loss, aux_out, gparams, gdummies

    return grads_fn


def _build_step_fn(opt_cfg, **kwargs):
    """Build the raw (unjitted) step function for one resolution group.

    Signature:
        step(state, camera, gt_image (H,W,3), gt_mask (H,W), gt_depth (H,W),
             bg (3,), rng, xyz_lr, lambda_opacity,
             [pseudo_camera, pseudo_gt_depth, pseudo_scale])
            -> (state, StepMetrics)
    """
    grads_fn = _build_grads_fn(opt_cfg, **kwargs)

    def step_fn(state: TrainState, camera: Camera, gt_image, gt_mask, gt_depth,
                bg, rng, xyz_lr, lambda_opacity, *pseudo_args):
        model = state.model
        h, w = camera.height, camera.width
        loss, aux_out, gparams, gdummies = grads_fn(
            model, camera, gt_image, gt_mask, gt_depth, bg, rng,
            lambda_opacity, *pseudo_args)

        new_aux = add_densification_stats(
            model.aux, gdummies[0], gdummies[1], aux_out["radii"], w, h
        )

        lr_tree = make_lr_tree(model.params, opt_cfg, xyz_lr)
        wd_tree = make_weight_decay_tree(model.params, opt_cfg)
        new_params, new_opt = adam_update(
            gparams, state.opt, model.params, lr_tree,
            weight_decay_tree=wd_tree,
        )

        new_state = TrainState(
            model=model.replace(params=new_params, aux=new_aux),
            opt=new_opt,
            step=state.step + 1,
        )
        metrics = StepMetrics(
            loss=loss,
            l1=aux_out["l1"],
            depth_loss=aux_out["depth_loss"],
            opacity_loss=aux_out["opacity_loss"],
            psnr=aux_out["psnr"],
            n_alive=jnp.sum(new_aux.alive),
            overflow=aux_out["overflow"],
        )
        return new_state, metrics

    return step_fn


def make_train_step(*args, **kwargs):
    """Jitted single step — see :func:`_build_step_fn` for the signature.

    The input TrainState is DONATED: every production caller rebinds
    ``state, metrics = step(state, ...)``, and donation lets XLA alias the
    pass-through leaves (alive mask, filter_3d, densify accumulators on
    non-accumulating steps) instead of copying them into fresh output
    buffers, and update the Adam moments in place (halves the state's peak
    HBM footprint).  On CPU donation is ignored (tests unaffected); never
    reuse the input state after calling on TPU.
    """
    return jax.jit(_build_step_fn(*args, **kwargs), donate_argnums=(0,))


def make_train_multistep(*args, **kwargs):
    """Jitted scan-fused window of consecutive training steps.

    One dispatch runs K steps (per-dispatch runtime overhead is ~1.4 ms on
    the tunneled TPU; a K=8 window amortizes it to ~0.2 ms/step).  The
    whole resolution group's stacked views are passed by device handle (no
    copies) and each scan step dynamic-slices its view on device, so the
    host does no per-step work at all.  Host-event steps (pseudo
    supervision, densify, SH bumps, opacity resets) are NOT supported
    inside a window — the Trainer sizes windows so they never cross one.

    Signature:
        multi(state, group_cameras (M-stacked pytree), group_images
              (M,H,W,3), group_masks (M,H,W), group_depths (M,H,W),
              idxs (K,) int32 view picks, bg (3,), rngs (K,2) keys,
              xyz_lrs (K,), lambda_opacities (K,))
            -> (state, StepMetrics with (K,)-leaves)
    """
    if kwargs.get("use_pseudo"):
        raise ValueError("pseudo-view steps cannot be scan-fused")
    step_fn = _build_step_fn(*args, **kwargs)

    def multi(state, cameras, images, masks, depths, idxs, bg, rngs,
              xyz_lrs, lambda_opacities):
        def body(st, xs):
            i, key, lr, lam = xs
            cam = jax.tree.map(lambda x: x[i], cameras)
            return step_fn(st, cam, images[i], masks[i], depths[i], bg,
                           key, lr, lam)

        return jax.lax.scan(body, state,
                            (idxs, rngs, xyz_lrs, lambda_opacities))

    # State donated: callers rebind (see make_train_step).
    return jax.jit(multi, donate_argnums=(0,))


def make_idu_multistep(opt_cfg, idu_kwargs: dict, orig_kwargs: dict):
    """Jitted scan-fused window of MIXED IDU/original episode steps.

    The Stage-2 episode loop (reference train.py:725-798) flips a Bernoulli
    coin per iteration between an IDU view (photometric only when
    ``idu_refine``, + depth Pearson vs the refined-image monodepth) and an
    original view (photometric only).  At idu_train_ratio=0.5 same-kind
    runs are geometric with mean 2, so same-kind window fusion never fires;
    instead the KIND is a per-step runtime input and the scan body
    ``lax.cond``s between the two step bodies.  Both bodies compile once
    into the same signature; each runtime step executes only its branch, so
    the per-dispatch overhead (~1.4 ms through the tunnel) amortizes over
    the window no matter how the kinds interleave.

    ``idu_kwargs`` / ``orig_kwargs`` are the :func:`_build_step_fn` kwargs
    of the two variants (they differ in photometric/use_depth/
    testing_render).  Pseudo-view steps cannot be fused (host render +
    depth-predictor round trip) — the episode loop breaks windows there.

    Signature:
        multi(state,
              idu_cameras (M1-stacked pytree), idu_images (M1,H1,W1,3),
              idu_masks (M1,H1,W1), idu_depths (M1,H1,W1),
              orig_cameras (M2-stacked), orig_images (M2,H2,W2,3),
              orig_masks, orig_depths,
              kinds (K,) int32 (1 = IDU view, 0 = original view),
              idu_idxs (K,), orig_idxs (K,) int32 (dummy 0 where unused),
              bg (3,), rngs (K,2), xyz_lrs (K,), lambda_opacities (K,))
            -> (state, StepMetrics with (K,)-leaves)
    """
    if idu_kwargs.get("use_pseudo") or orig_kwargs.get("use_pseudo"):
        raise ValueError("pseudo-view steps cannot be scan-fused")
    idu_step = _build_step_fn(opt_cfg, **idu_kwargs)
    orig_step = _build_step_fn(opt_cfg, **orig_kwargs)

    def multi(state, idu_cameras, idu_images, idu_masks, idu_depths,
              orig_cameras, orig_images, orig_masks, orig_depths,
              kinds, idu_idxs, orig_idxs, bg, rngs, xyz_lrs,
              lambda_opacities):
        def body(st, xs):
            kind, ii, oi, key, lr, lam = xs

            def run_idu(st):
                cam = jax.tree.map(lambda x: x[ii], idu_cameras)
                return idu_step(st, cam, idu_images[ii], idu_masks[ii],
                                idu_depths[ii], bg, key, lr, lam)

            def run_orig(st):
                cam = jax.tree.map(lambda x: x[oi], orig_cameras)
                return orig_step(st, cam, orig_images[oi], orig_masks[oi],
                                 orig_depths[oi], bg, key, lr, lam)

            return jax.lax.cond(kind == 1, run_idu, run_orig, st)

        return jax.lax.scan(
            body, state,
            (kinds, idu_idxs, orig_idxs, rngs, xyz_lrs, lambda_opacities))

    # State donated: callers rebind (see make_train_step).
    return jax.jit(multi, donate_argnums=(0,))


def make_eval_render(kernel_size: float = 0.1, backend: str = "tiled",
                     bin_capacity: Optional[int] = None):
    """Jitted no-grad render for test-time evaluation.

    ``bin_capacity`` should come from render.measure_bin_capacity for the
    target resolution — the shape-only default undershoots at high
    resolutions and silently drops entries (see measure_bin_capacity).
    """

    def fn(model: GaussianModelState, camera: Camera, bg):
        return render(model, camera, bg, kernel_size=kernel_size,
                      testing=True, backend=backend,
                      bin_capacity=bin_capacity,
                      inference=(backend == "tiled"))

    return jax.jit(fn)
