"""Gaussian-sharded training: split the splat state itself across devices.

The scaling axis the reference cannot offer (SURVEY.md §2.4/§7 hard part #4):
densification grows the per-scene Gaussian count without bound, and a single
chip's HBM caps it.  Here the padded state pytree — parameters, Adam moments,
densification statistics — lives sharded along the splat dimension over the
``gauss`` mesh axis; each device holds capacity/B splats.

Exact ordered alpha compositing across shards is the hard part: per-pixel
blending must be globally depth sorted, but shards are arbitrary subsets.
The trick: re-partition **by global view-depth quantile bins** per step.
If device k composites exactly the splats in depth bin k (bin edges =
global quantiles of visible view depth), then for every pixel all of bin k's
contributions precede bin k+1's, so the per-device partial images merge
exactly with the over operator:

    C = C_0 + T_0 C_1 + T_0 T_1 C_2 + ...,   T = prod_k T_k

No fragment exchange is needed — only:
  * one ``all_gather`` of the 13-float projected screen attributes
    (means2d, conic, opacity, depth, channels) — the raw 60+-float state and
    the 3x optimizer state stay sharded;
  * a tiny all-gather of the B partial images for the merge scan.

Gradients flow back through the all_gather as a reduce-scatter under
``shard_map`` autodiff, landing on the owning shard.  Binning runs
replicated over the full entry set (its cost is small vs compositing);
each device's compositor only processes its bin's entries (other bins are
radius-culled before duplication).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from skyfall_gs_tpu.model.densify import add_densification_stats
from skyfall_gs_tpu.model.gaussians import get_opacity
from skyfall_gs_tpu.model.optim import (
    adam_update,
    make_lr_tree,
    make_weight_decay_tree,
)
from skyfall_gs_tpu.ops.losses import (
    depth_pearson_loss,
    opacity_entropy_loss,
    photometric_loss,
    psnr,
)
from skyfall_gs_tpu.ops.projection import project_gaussians
from skyfall_gs_tpu.ops.rasterize_tiled import composite_tiled
from skyfall_gs_tpu.core.sh import eval_sh
from skyfall_gs_tpu.train.step import StepMetrics, TrainState


def _depth_bin_edges(depth, visible, num_bins):
    """Global view-depth quantile edges (computed identically per device
    from the gathered depths)."""
    d = jnp.where(visible, depth, jnp.nan)
    qs = jnp.linspace(0.0, 1.0, num_bins + 1)[1:-1]
    inner = jnp.nanquantile(d, qs)
    return jnp.concatenate([jnp.asarray([-jnp.inf]), inner,
                            jnp.asarray([jnp.inf])])


def sharded_render_merge(
    xyz, scales, quats, opac, colors, alive, camera, bg,
    kernel_size: float, axis: str, num_bins: int,
    mean2d_dummy=None, mean2d_abs_dummy=None, bin_capacity=None,
    subpixel_offset=None,
):
    """Render inside shard_map: per-shard projection, all-gathered screen
    attrs, depth-binned per-device composite, exact over-merge.

    All per-splat inputs are the LOCAL shard (capacity/B rows).  Returns
    (color (H,W,3), depth, alpha, radii_local) where radii_local covers the
    local shard (for densification stats).
    """
    k = jax.lax.axis_index(axis)

    proj = project_gaussians(xyz, scales, quats, opac, camera,
                             kernel_size=kernel_size, mask=alive)
    mean2d = proj.mean2d
    if mean2d_dummy is not None:
        mean2d = mean2d + mean2d_dummy

    channels = jnp.concatenate(
        [colors, proj.depth[:, None], jnp.zeros_like(xyz)], axis=-1)

    local13 = jnp.concatenate(
        [mean2d, proj.conic, proj.opacity[:, None], proj.depth[:, None],
         channels], axis=1)                       # (n_loc, 2+3+1+1+7 = 14)
    gath = jax.lax.all_gather(local13, axis)      # (B, n_loc, 14)
    b = gath.shape[0]
    full = gath.reshape(b * gath.shape[1], gath.shape[2])
    g_mean2d = full[:, 0:2]
    g_conic = full[:, 2:5]
    g_opac = full[:, 5]
    g_depth = full[:, 6]
    g_channels = full[:, 7:14]

    radii_all = jax.lax.all_gather(proj.radius, axis).reshape(-1)
    rxy_all = jax.lax.all_gather(proj.radius_xy, axis).reshape(-1, 2)
    visible = radii_all > 0

    edges = _depth_bin_edges(g_depth, visible, num_bins)
    lo = edges[k]
    hi = edges[k + 1]
    in_bin = (g_depth >= lo) & (g_depth < hi)
    radii_bin = jnp.where(in_bin, radii_all, 0)
    rxy_bin = jnp.where(in_bin[:, None], rxy_all, 0)

    absd = None
    if mean2d_abs_dummy is not None:
        absd = jax.lax.all_gather(mean2d_abs_dummy, axis).reshape(-1, 2)

    out_k, tfin_k, overflow_k = composite_tiled(
        g_mean2d, g_conic, g_depth, radii_bin, g_opac, g_channels,
        camera.height, camera.width,
        mean2d_abs_dummy=absd, cap=bin_capacity, radius_xy=rxy_bin,
        subpixel_offset=subpixel_offset,
    )                                              # (H, W, 7), (H, W), ()

    # Exact depth-ordered merge across bins.
    outs = jax.lax.all_gather(out_k, axis)         # (B, H, W, 7)
    tfins = jax.lax.all_gather(tfin_k, axis)       # (B, H, W)

    def merge(carry, xs):
        acc, t_run = carry
        o, tf = xs
        return (acc + t_run[..., None] * o, t_run * tf), None

    (acc, t_all), _ = jax.lax.scan(
        merge,
        (jnp.zeros_like(outs[0]), jnp.ones_like(tfins[0])),
        (outs, tfins),
    )
    color = acc[..., :3] + t_all[..., None] * bg[None, None, :]
    alpha = 1.0 - t_all
    depth = acc[..., 3] / jnp.maximum(alpha, 1e-8)  # alpha-normalized
    overflow = jax.lax.psum(overflow_k, axis)
    return color, depth, alpha, proj.radius, overflow


def _build_gauss_grads_fn(
    opt_cfg,
    has_appearance: bool,
    kernel_size: float,
    use_depth: bool,
    axis: str,
    num_bins: int,
    bin_capacity=None,
    ray_jitter: bool = False,
    resample_gt: bool = False,
    use_pseudo: bool = False,
    photometric: bool = True,
    testing_render: bool = False,
):
    """Per-view loss + gradients on a gaussian shard — the sharded
    counterpart of :func:`skyfall_gs_tpu.train.step._build_grads_fn`
    (same call contract: every step option — ray-jitter subpixel offsets,
    offset-resampled GT, pseudo-view monodepth supervision, photometric
    on/off for unrefined IDU views, test-time appearance — behaves
    identically; reference train.py:189-277).

    Runs inside shard_map; all collectives are over ``axis`` (the gaussian
    axis).  Returns ``grads(model, camera, gt_image, gt_mask, gt_depth, bg,
    rng, lambda_opacity[, pseudo_camera, pseudo_gt_depth, pseudo_scale])
    -> (loss, aux_out, gparams, gdummies)`` where gparams' replicated
    appearance leaves are already psum'd over the shards (so a subsequent
    Adam update stays bitwise identical across shards).

    The rng is REPLICATED across the gaussian shards — ray-jitter offsets
    must be identical on every shard because each shard composites a
    different depth bin of the SAME image (mismatched jitter would break
    the exact over-merge).
    """

    def grads(model, camera, gt_image, gt_mask, gt_depth, bg,
              rng, lambda_opacity,
              pseudo_camera=None, pseudo_gt_depth=None, pseudo_scale=None):
        n_loc = model.params.xyz.shape[0]
        h, w = camera.height, camera.width

        if ray_jitter:
            # Same split order as train.step._build_grads_fn so a 1-shard
            # mesh reproduces the single-device trajectory exactly.
            rng, krj = jax.random.split(rng)
            subpix = jax.random.uniform(krj, (h, w, 2), jnp.float32) - 0.5
        else:
            subpix = None

        dummies0 = (jnp.zeros((n_loc, 2)), jnp.zeros((n_loc, 2)))

        def loss_fn(params, dummies):
            from skyfall_gs_tpu.model.gaussians import (
                opacity_with_3d_filter,
                scaling_with_3d_filter,
            )

            scales = scaling_with_3d_filter(params, model.aux.filter_3d)
            opac = opacity_with_3d_filter(params, model.aux.filter_3d)

            def render_view(cam, dums, sp, cap, testing):
                """Sharded render of one camera: SH/appearance colors for
                this shard's splats + depth-binned exact compositing
                (mirrors model.render.render minus the normal channel)."""
                dirs = params.xyz - cam.cam_center[None, :]
                dirs = dirs / (
                    jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
                if has_appearance:
                    from skyfall_gs_tpu.model.appearance import (
                        apply_appearance,
                    )

                    emb_table = params.appearance_embeddings
                    if testing:
                        # Fixed reference embedding uid min(6, M-1)
                        # (reference gaussian_renderer/__init__.py:95-104).
                        emb = emb_table[min(6, emb_table.shape[0] - 1)]
                    else:
                        uid = jnp.clip(cam.uid, 0, emb_table.shape[0] - 1)
                        emb = emb_table[uid]
                    toned = apply_appearance(
                        params.appearance_mlp, params.embeddings,
                        emb, params.features)                 # (n_loc, K, 3)
                    sh = jnp.swapaxes(toned, 1, 2)
                else:
                    sh = jnp.swapaxes(params.features, 1, 2)
                colors = jnp.maximum(
                    eval_sh(model.active_sh_degree, sh, dirs) + 0.5, 0.0)
                return sharded_render_merge(
                    params.xyz, scales, params.rotation, opac, colors,
                    model.aux.alive, cam, bg, kernel_size, axis, num_bins,
                    mean2d_dummy=None if dums is None else dums[0],
                    mean2d_abs_dummy=None if dums is None else dums[1],
                    bin_capacity=cap, subpixel_offset=sp,
                )

            color, depth_img, alpha, radii, overflow = render_view(
                camera, dummies, subpix, bin_capacity, testing_render)
            image = color * gt_mask[..., None]
            gt = gt_image * gt_mask[..., None]
            if resample_gt and subpix is not None:
                from skyfall_gs_tpu.train.step import resample_with_offset

                gt = resample_with_offset(gt, subpix)
            if photometric:
                photo, ll1 = photometric_loss(
                    jnp.transpose(image, (2, 0, 1)),
                    jnp.transpose(gt, (2, 0, 1)), opt_cfg.lambda_dssim)
                total = photo
            else:
                # IDU views without refinement skip the photometric term
                # (reference train.py:772-781).
                ll1 = jnp.zeros(())
                total = jnp.zeros(())
            d_loss = jnp.zeros(())
            if use_depth and opt_cfg.lambda_depth > 0:
                d_loss = depth_pearson_loss(gt_depth * gt_mask,
                                            depth_img * gt_mask)
                total = total + opt_cfg.lambda_depth * d_loss
            # entropy over the full (sharded) set: mean of per-shard sums
            ent_sum = jax.lax.psum(
                opacity_entropy_loss(get_opacity(params), model.aux.alive)
                * jnp.maximum(jnp.sum(model.aux.alive), 1), axis)
            n_all = jax.lax.psum(jnp.sum(model.aux.alive), axis)
            o_loss = ent_sum / jnp.maximum(n_all, 1)
            total = total + lambda_opacity * o_loss

            if use_pseudo:
                # Pseudo-view monodepth supervision (reference
                # train.py:245-277): rendered WITHOUT the gradient dummies
                # so the pseudo view never feeds densification stats —
                # exactly like the single-device step's pseudo render.
                _, p_depth, _, _, _ = render_view(
                    pseudo_camera, None, None, None, False)
                pd = depth_pearson_loss(pseudo_gt_depth, p_depth)
                pd = jnp.where(jnp.isnan(pd), 0.0, pd)
                total = total + pseudo_scale * opt_cfg.lambda_pseudo_depth * pd
                d_loss = d_loss + pd

            return total, {"l1": ll1, "depth_loss": d_loss,
                           "opacity_loss": o_loss, "radii": radii,
                           "psnr": psnr(image, gt),
                           "overflow": jax.lax.stop_gradient(overflow)}

        (loss, aux_out), g = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(model.params, dummies0)
        gparams, gdummies = g
        if has_appearance:
            # Replicated appearance leaves: each shard's backward only sees
            # its own splats' contribution — sum for the true gradient (the
            # Adam update then stays bitwise identical across shards).
            gparams = gparams.replace(
                appearance_mlp=jax.tree.map(
                    lambda v: jax.lax.psum(v, axis), gparams.appearance_mlp),
                appearance_embeddings=jax.lax.psum(
                    gparams.appearance_embeddings, axis),
            )
        return loss, aux_out, gparams, gdummies

    return grads


def _build_gauss_local_step(
    opt_cfg,
    has_appearance: bool,
    kernel_size: float,
    use_depth: bool,
    axis: str,
    num_bins: int,
    bin_capacity=None,
    **grads_kwargs,
):
    """The per-shard step body (grads -> densify stats -> Adam), to be
    wrapped in shard_map directly (single step) or inside a lax.scan window
    (multistep)."""
    grads_fn = _build_gauss_grads_fn(
        opt_cfg, has_appearance, kernel_size, use_depth, axis, num_bins,
        bin_capacity=bin_capacity, **grads_kwargs)

    def local_step(state: TrainState, camera, gt_image, gt_mask, gt_depth,
                   bg, rng, xyz_lr, lambda_opacity, *pseudo_args):
        model = state.model
        loss, aux_out, gparams, gdummies = grads_fn(
            model, camera, gt_image, gt_mask, gt_depth, bg, rng,
            lambda_opacity, *pseudo_args)

        new_aux = add_densification_stats(
            model.aux, gdummies[0], gdummies[1], aux_out["radii"],
            camera.width, camera.height)

        lr_tree = make_lr_tree(model.params, opt_cfg, xyz_lr)
        wd_tree = make_weight_decay_tree(model.params, opt_cfg)
        new_params, new_opt = adam_update(
            gparams, state.opt, model.params, lr_tree,
            weight_decay_tree=wd_tree)

        new_state = TrainState(
            model=model.replace(params=new_params, aux=new_aux),
            opt=new_opt, step=state.step + 1)
        metrics = StepMetrics(
            loss=loss, l1=aux_out["l1"], depth_loss=aux_out["depth_loss"],
            opacity_loss=aux_out["opacity_loss"], psnr=aux_out["psnr"],
            n_alive=jax.lax.psum(jnp.sum(new_aux.alive), axis),
            overflow=aux_out["overflow"],
        )
        return new_state, metrics

    return local_step


def _gauss_state_spec(template_state: TrainState, axis: str):
    """Per-splat leaves (leading dim == capacity) shard on the axis; the
    appearance camera table / MLP and 0-D leaves (step, Adam count)
    replicate."""
    capacity = template_state.model.params.capacity
    return jax.tree_util.tree_map_with_path(
        lambda p, x: P(axis) if _is_splat_leaf(p, x, capacity) else P(),
        template_state)


def make_gauss_sharded_train_step(
    mesh: Mesh,
    opt_cfg,
    template_state: TrainState,
    kernel_size: float = 0.1,
    use_depth: bool = True,
    axis: str = "gauss",
    bin_capacity=None,
    use_pseudo: bool = False,
    **grads_kwargs,
):
    """Build the jitted splat-sharded train step.

    The TrainState's per-splat leaves must be sharded along ``axis`` (use
    :func:`shard_train_state`); camera/images/rng are replicated.  The
    appearance model rides along: per-splat Fourier ``embeddings`` shard
    with the splats, the camera table + MLP replicate, and their gradients
    are ``psum``-reduced across shards (each shard only sees its own
    splats' contribution).

    Signature — the SAME as the single-device train.step.make_train_step:
        step(state, camera, gt_image, gt_mask, gt_depth, bg, rng, xyz_lr,
             lambda_opacity[, pseudo_camera, pseudo_gt_depth, pseudo_scale])
            -> (state, StepMetrics)
    Extra options forward to :func:`_build_gauss_grads_fn` (ray_jitter,
    resample_gt, photometric, testing_render).
    """
    has_appearance = (
        template_state.model.params.appearance_embeddings is not None
        and template_state.model.params.appearance_mlp is not None)
    local_step = _build_gauss_local_step(
        opt_cfg, has_appearance, kernel_size, use_depth, axis,
        mesh.shape[axis], bin_capacity=bin_capacity,
        use_pseudo=use_pseudo, **grads_kwargs)
    state_spec = _gauss_state_spec(template_state, axis)

    n_extra = 3 if use_pseudo else 0
    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(state_spec, P(), P(), P(), P(), P(), P(), P(), P())
        + (P(),) * n_extra,
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    # State donated: every caller rebinds (Trainer, dryrun).
    return jax.jit(sharded, donate_argnums=(0,))


def make_gauss_sharded_multistep(
    mesh: Mesh,
    opt_cfg,
    template_state: TrainState,
    kernel_size: float = 0.1,
    use_depth: bool = True,
    axis: str = "gauss",
    bin_capacity=None,
    **grads_kwargs,
):
    """Scan-fused window of K consecutive splat-sharded steps in ONE
    dispatch — the gaussian-sharded counterpart of
    train.step.make_train_multistep (same windowing contract: the Trainer
    sizes windows so no host event falls inside one; pseudo-view steps
    cannot be fused).

    Signature — the SAME as train.step.make_train_multistep:
        multi(state, group_cameras (M-stacked pytree), group_images
              (M,H,W,3), group_masks (M,H,W), group_depths (M,H,W),
              idxs (K,) int32 view picks, bg (3,), rngs (K,2) keys,
              xyz_lrs (K,), lambda_opacities (K,))
            -> (state, StepMetrics with (K,)-leaves)
    """
    if grads_kwargs.get("use_pseudo"):
        raise ValueError("pseudo-view steps cannot be scan-fused")
    has_appearance = (
        template_state.model.params.appearance_embeddings is not None
        and template_state.model.params.appearance_mlp is not None)
    local_step = _build_gauss_local_step(
        opt_cfg, has_appearance, kernel_size, use_depth, axis,
        mesh.shape[axis], bin_capacity=bin_capacity, **grads_kwargs)
    state_spec = _gauss_state_spec(template_state, axis)

    def local_multi(state, cameras, images, masks, depths, idxs, bg, rngs,
                    xyz_lrs, lambda_opacities):
        def body(st, xs):
            i, key, lr, lam = xs
            cam = jax.tree.map(lambda x: x[i], cameras)
            return local_step(st, cam, images[i], masks[i], depths[i], bg,
                              key, lr, lam)

        return jax.lax.scan(body, state,
                            (idxs, rngs, xyz_lrs, lambda_opacities))

    sharded = shard_map(
        local_multi, mesh=mesh,
        in_specs=(state_spec, P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    # State donated: every caller rebinds (Trainer, dryrun).
    return jax.jit(sharded, donate_argnums=(0,))


def make_gauss_idu_multistep(
    mesh: Mesh,
    opt_cfg,
    template_state: TrainState,
    idu_kwargs: dict,
    orig_kwargs: dict,
    axis: str = "gauss",
):
    """Scan-fused window of MIXED IDU/original episode steps on a
    gaussian-sharded state — the splat-sharding counterpart of
    train.step.make_idu_multistep (reference episode loop train.py:725-798).

    Same contract as the single-device variant: the per-step KIND is a
    runtime input and the scan body ``lax.cond``s between the two gauss
    local-step bodies, so one compile covers every IDU/original
    interleaving; the Trainer-side episode loop sizes windows so no host
    event (pseudo supervision, densify, opacity reset) falls inside one.
    ``idu_kwargs`` / ``orig_kwargs`` are :func:`_build_gauss_local_step`
    option dicts (kernel_size, use_depth, bin_capacity, ray_jitter,
    resample_gt, photometric, testing_render).

    Signature — identical to train.step.make_idu_multistep:
        multi(state, idu_cameras (M1-stacked), idu_images (M1,H1,W1,3),
              idu_masks, idu_depths, orig_cameras (M2-stacked), orig_images,
              orig_masks, orig_depths, kinds (K,) int32, idu_idxs (K,),
              orig_idxs (K,), bg (3,), rngs (K,2), xyz_lrs (K,),
              lambda_opacities (K,))
            -> (state, StepMetrics with (K,)-leaves)
    """
    if idu_kwargs.get("use_pseudo") or orig_kwargs.get("use_pseudo"):
        raise ValueError("pseudo-view steps cannot be scan-fused")
    has_appearance = (
        template_state.model.params.appearance_embeddings is not None
        and template_state.model.params.appearance_mlp is not None)
    num_bins = mesh.shape[axis]
    idu_step = _build_gauss_local_step(
        opt_cfg, has_appearance, axis=axis, num_bins=num_bins, **idu_kwargs)
    orig_step = _build_gauss_local_step(
        opt_cfg, has_appearance, axis=axis, num_bins=num_bins, **orig_kwargs)
    state_spec = _gauss_state_spec(template_state, axis)

    def local_multi(state, idu_cameras, idu_images, idu_masks, idu_depths,
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

    sharded = shard_map(
        local_multi, mesh=mesh,
        in_specs=(state_spec,) + (P(),) * 15,
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    # State donated: every caller rebinds (IDU episode loop, dryrun).
    return jax.jit(sharded, donate_argnums=(0,))


def make_sharded_densify(mesh: Mesh, template_state: TrainState,
                         axis: str = "gauss", **static_kwargs):
    """Jitted clone/split/prune pass over a gaussian-sharded state.

    Wraps model.densify.densify_and_prune in shard_map: the >=threshold
    ratio and the AbsGS quantile are computed globally with collectives,
    selection/writes/pruning stay shard-local (children land in the
    parent's shard's dead region — see densify_and_prune's ``axis`` doc).
    The rng is folded with the shard index so split-children noise is
    i.i.d. across shards.

    Signature: densify(state, rng) -> (state, DensifyStats [psum'd]).
    """
    from skyfall_gs_tpu.model.densify import densify_and_prune

    state_spec = _gauss_state_spec(template_state, axis)

    def local(state: TrainState, rng):
        k = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        params, aux, opt, stats = densify_and_prune(
            state.model.params, state.model.aux, state.opt, k,
            axis=axis, **static_kwargs)
        new_state = state.replace(
            model=state.model.replace(params=params, aux=aux), opt=opt)
        return new_state, stats

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(state_spec, P()),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    # State donated: every caller rebinds (Trainer, dryrun).
    return jax.jit(sharded, donate_argnums=(0,))


def sharded_grow_capacity(state: TrainState, mesh: Mesh, new_capacity: int,
                          axis: str = "gauss") -> TrainState:
    """Grow a gaussian-sharded TrainState's capacity with the pad slots
    distributed EVENLY across shards (a plain global pad-at-end would give
    the last shard all the free slots, starving the other shards'
    shard-local densify allocation).

    Runs model.densify.grow_capacity per shard under shard_map (row order
    is a semantic no-op — splats are an unordered set).  ``new_capacity``
    is the GLOBAL capacity; must be a multiple of the mesh axis size.
    """
    from skyfall_gs_tpu.model.densify import grow_capacity

    n_shards = mesh.shape[axis]
    if new_capacity % n_shards:
        raise ValueError(f"new_capacity {new_capacity} not divisible by "
                         f"{n_shards} shards")
    local_new = new_capacity // n_shards
    old_spec = _gauss_state_spec(state, axis)

    def local(st: TrainState):
        model, opt = grow_capacity(st.model, st.opt, local_new)
        return st.replace(model=model, opt=opt)

    # Output spec: same sharding decisions, evaluated on a template with
    # the grown shapes (host-side zeros suffice — only shapes matter).
    import numpy as _np

    def grown_leaf(x, spec):
        if spec == P(axis):
            shape = (new_capacity,) + x.shape[1:]
            return _np.zeros(shape, x.dtype)
        return x

    template = jax.tree.map(grown_leaf, state, old_spec)
    new_spec = _gauss_state_spec(template, axis)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(old_spec,),
        out_specs=new_spec,
        check_vma=False,
    )
    # Donate: frees each device's old shard as the grown one
    # materializes (the caller rebinds).
    return jax.jit(fn, donate_argnums=(0,))(state)


def make_grid_train_step(
    mesh: Mesh,
    opt_cfg,
    template_state: TrainState,
    kernel_size: float = 0.1,
    use_depth: bool = True,
    data_axis: str = "data",
    gauss_axis: str = "gauss",
    bin_capacity=None,
    **grads_kwargs,
):
    """Build the jitted 2D view x gauss grid train step: both scaling axes
    at once over a ``Mesh((B, G), (data_axis, gauss_axis))``.

    Device (d, g) holds splat shard g (capacity/G rows of params, Adam
    moments, densification stats — replicated across the data rows) and
    processes view d.  Within each data row the render runs the
    depth-binned exact compositing over ``gauss_axis`` (sharded_render_merge);
    across rows the B per-view gradients ``pmean`` and densification
    statistics psum/pmax exactly as the 1D view-parallel step
    (parallel/sharding._combine_and_update) — so a (B, G) grid reproduces
    the B-view batched trajectory of a G-way sharded model.  Per-view
    ray-jitter keys derive from the replicated per-step key by folding in
    the data-row index (the make_parallel_multistep_indexed convention).

    Signature: step(state, cameras_B, images (B,H,W,3), masks (B,H,W),
    depths (B,H,W), bg (3,), rng, xyz_lr, lambda_opacity)
    -> (state, StepMetrics) where B == mesh.shape[data_axis].
    """
    from skyfall_gs_tpu.parallel.sharding import _combine_and_update

    num_bins = mesh.shape[gauss_axis]
    has_appearance = (
        template_state.model.params.appearance_embeddings is not None
        and template_state.model.params.appearance_mlp is not None)
    grads_fn = _build_gauss_grads_fn(
        opt_cfg, has_appearance, kernel_size, use_depth, gauss_axis,
        num_bins, bin_capacity=bin_capacity, **grads_kwargs)

    def local_step(state: TrainState, cam_b, image_b, mask_b, depth_b, bg,
                   rng, xyz_lr, lambda_opacity):
        camera = jax.tree.map(lambda x: x[0], cam_b)
        key = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        loss, aux_out, gparams, gdummies = grads_fn(
            state.model, camera, image_b[0], mask_b[0], depth_b[0], bg,
            key, lambda_opacity)
        new_state, metrics = _combine_and_update(
            state, loss, aux_out, gparams, gdummies,
            camera.width, camera.height, opt_cfg, xyz_lr, data_axis)
        # n_alive from _combine_and_update counts only the local shard.
        return new_state, metrics._replace(
            n_alive=jax.lax.psum(metrics.n_alive, gauss_axis))

    capacity = template_state.model.params.capacity
    state_spec = jax.tree_util.tree_map_with_path(
        lambda p, x: (P(gauss_axis) if _is_splat_leaf(p, x, capacity)
                      else P()),
        template_state)

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(state_spec, P(data_axis), P(data_axis), P(data_axis),
                  P(data_axis), P(), P(), P(), P()),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    # State donated: every caller rebinds (Trainer, dryrun).
    return jax.jit(sharded, donate_argnums=(0,))


# Leaves that replicate no matter their shape: the appearance camera table
# is camera-indexed and the MLP is global, so a scene where num_cameras (or
# a layer width) happens to equal the splat capacity must not shard them.
_REPLICATED_PATH_PARTS = ("appearance_embeddings", "appearance_mlp")


def _is_splat_leaf(path, x, capacity: int) -> bool:
    from jax.tree_util import keystr

    if any(part in keystr(path) for part in _REPLICATED_PATH_PARTS):
        return False
    return getattr(x, "ndim", 0) >= 1 and x.shape[0] == capacity


def shard_train_state(state: TrainState, mesh: Mesh, axis: str = "gauss"):
    """Device-put a TrainState with per-splat leaves sharded along axis
    (appearance camera table / MLP replicate).

    Replicated leaves are COPIED, not aliased: device_put to a replicated
    sharding may reuse the source buffer as one shard, and the sharded
    steps DONATE their input state — an aliased buffer would delete the
    caller's original leaves out from under it.  Replicated leaves are
    small by design (camera table, MLP, scalars), so the copy is free;
    per-splat leaves change shape per device and never alias."""
    from jax.sharding import NamedSharding

    capacity = state.model.params.capacity

    def put(path, x):
        if _is_splat_leaf(path, x, capacity):
            return jax.device_put(x, NamedSharding(mesh, P(axis)))
        return jax.device_put(jnp.copy(x) if isinstance(x, jax.Array) else x,
                              NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(put, state)
