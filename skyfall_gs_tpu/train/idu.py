"""Stage-2: Iterative Dataset Update (IDU) episode curriculum.

Capability parity: reference train.py:350-967 —
  * render_idu_set (:350-357): orbit views rendered with the test-time
    (fixed) appearance embedding unless ``idu_random_ap``;
  * generate_idu_training_set (:360-525): orbit cameras per look-at target
    (uid 1000+i, or random train uids with random_ap), rendered -> refined
    by the diffusion backend -> monocular depth on the refined frames ->
    repackaged as training views with cx=cy=0; intermediates saved under
    ``model_path/idu/e{e}_r{r}/{render,render_refine,render_depth}``;
    the no-curriculum variant generates one ring per (elevation, radius)
    pair and subsamples 1/len(elevations) of them (:398-415);
  * training_idu_episode (:579-916): mixes IDU views (probability
    ``idu_train_ratio``; photometric term only when ``idu_refine``; depth
    Pearson vs the predicted depth) with original views (photometric only),
    densifies until first_iter + idu_densify_until_iter, resets opacity
    every idu_opacity_reset_interval with lambda_opacity -> 0 for
    idu_opacity_cooling_iterations, episode-relative xyz LR schedule, and a
    final checkpoint + PLY per episode;
  * training_idu (:918-967): per-dataset curriculum over (elevation, radius)
    pairs with a grid of idu_grid_size^2 look-at targets spanning
    idu_grid_width x idu_grid_height (borders removed), or 5 episodes when
    the curriculum is disabled.
"""

from __future__ import annotations

import os
import random
import time
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from skyfall_gs_tpu.config import IDU_CURRICULA, IDUCurriculum
from skyfall_gs_tpu.core.camera import orbit_cameras
from skyfall_gs_tpu.io.scene import View, stack_views
from skyfall_gs_tpu.model.gaussians import camera_filter_arrays
from skyfall_gs_tpu.train.checkpoint import save_checkpoint
from skyfall_gs_tpu.train.loop import Trainer
from skyfall_gs_tpu.train.step import TrainState, make_train_step
from skyfall_gs_tpu.utils.general import expon_lr_schedule


def _save_frames(frames: List[np.ndarray], path: str) -> None:
    from PIL import Image

    os.makedirs(path, exist_ok=True)
    for i, f in enumerate(frames):
        arr = np.clip(np.asarray(f) * 255.0 + 0.5, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(path, f"{i:05d}.png"))


@dataclass
class IDUOrchestrator:
    trainer: Trainer
    refiner: object          # priors.Refiner
    depth_predictor: object  # priors.DepthPredictor

    # ------------------------------------------------------------------
    def generate_idu_views(
        self,
        state: TrainState,
        targets: Sequence[Sequence[float]],
        elevation,
        radius,
        fov: float,
        episode_tag: str,
    ) -> List[View]:
        o = self.trainer.opt_cfg
        cfg = self.trainer.model_cfg
        size = o.idu_render_size
        rng = self.trainer.py_rng
        num_train = max(self.trainer.scene.num_train, 1)

        def rings(ele, rad):
            cams = []
            for target in targets:
                if o.idu_random_ap:
                    uids = [rng.randrange(num_train)
                            for _ in range(o.idu_num_cams * o.idu_num_samples_per_view)]
                else:
                    uids = None
                cams.extend(orbit_cameras(
                    target, ele, rad,
                    num_cams=o.idu_num_cams,
                    num_samples=o.idu_num_samples_per_view,
                    width=size, height=size, fov_deg=fov,
                    uid_base=1000, uids=uids,
                ))
            return cams

        if isinstance(elevation, (list, tuple)):
            cams = []
            for ele, rad in zip(elevation, radius):
                cams.extend(rings(ele, rad))
            rng.shuffle(cams)
            cams = cams[: len(cams) // len(elevation)]
        else:
            cams = rings(elevation, radius)

        # Render the orbit set with the fixed test embedding unless random_ap.
        imgs = []
        for cam in cams:
            out = self.trainer._eval_render(state.model, cam, self.trainer.bg)
            imgs.append(np.clip(np.asarray(out.color), 0.0, 1.0))

        idu_dir = os.path.join(cfg.model_path, "idu", episode_tag)
        _save_frames(imgs, os.path.join(idu_dir, "render"))

        if o.idu_refine:
            refined = self.refiner.run(
                imgs,
                n_min=o.idu_flow_edit_n_min,
                n_max=o.idu_flow_edit_n_max,
                n_max_end=o.idu_flow_edit_n_max_end,
                n_avg=o.idu_flow_edit_n_avg,
            )
            _save_frames(refined, os.path.join(idu_dir, "render_refine"))
        else:
            refined = imgs

        depths = self.depth_predictor.run(refined)
        np.save(os.path.join(idu_dir, "render_depth.npy"),
                np.stack(depths).astype(np.float32))

        views = []
        for cam, img, dep in zip(cams, refined, depths):
            views.append(View(camera=cam, image=np.asarray(img, np.float32),
                              mask=None, depth=np.asarray(dep, np.float32),
                              image_name=episode_tag))
        return views

    # ------------------------------------------------------------------
    def train_episode(
        self,
        state: TrainState,
        first_iter: int,
        targets,
        elevation,
        radius,
        fov: float,
    ) -> TrainState:
        t = self.trainer
        o = t.opt_cfg
        cfg = t.model_cfg
        tag = f"e{elevation}_r{radius}" if not isinstance(elevation, (list, tuple)) \
            else "e_mixed"

        idu_views = self.generate_idu_views(
            state, targets, elevation, radius, fov, tag)
        idu_group = stack_views(idu_views)

        # 3D filter over train + IDU cameras (reference train.py:671).
        all_cams = [v.camera for v in t.scene.train_views] + \
            [v.camera for v in idu_views]
        filter_cams = camera_filter_arrays(all_cams)
        t.filter_cams = filter_cams
        state = state.replace(model=state.model.replace(
            aux=state.model.aux.replace(filter_3d=t._compute_filter(state))))

        end_iter = first_iter + o.idu_episode_iterations
        densify_until = first_iter + o.idu_densify_until_iter

        xyz_sched = expon_lr_schedule(
            o.position_lr_init * state.model.spatial_lr_scale,
            o.position_lr_final * state.model.spatial_lr_scale,
            lr_delay_mult=o.position_lr_delay_mult,
            max_steps=o.idu_position_lr_max_steps,
        )

        if t.bin_capacity is None:
            t._update_bin_capacity(state)
        step_cache = {}

        def idu_step_fn(use_pseudo: bool):
            # Same LPIPS swap and right-sized binning capacity as Stage 1
            # (reference applies the LPIPS loss inside IDU episodes too,
            # train.py:774-776).  Kwargs come from the SAME _kind_kwargs
            # the fused windows use, so the single-step and fused IDU
            # paths cannot drift apart.
            key = (use_pseudo, t.bin_capacity)
            if key not in step_cache:
                idu_kwargs, _ = _kind_kwargs()
                if gauss:
                    from skyfall_gs_tpu.parallel.gauss_shard import (
                        make_gauss_sharded_train_step,
                    )

                    step_cache[key] = make_gauss_sharded_train_step(
                        t.mesh, o, t._gauss_template, axis=t.mesh_axis,
                        use_pseudo=use_pseudo, **idu_kwargs)
                else:
                    step_cache[key] = make_train_step(
                        o, use_pseudo=use_pseudo, **idu_kwargs)
            return step_cache[key]

        def episode_pseudo_curriculum(iteration: int):
            # reference train.py:801-808: elevation 85->45 across the
            # episode (radius schedule follows the pseudo-cam bounds).
            frac = (end_iter - iteration) / max(o.idu_episode_iterations, 1)
            return frac * (85.0 - 45.0) + 45.0, frac * (150.0 - 75.0) + 75.0

        lambda_opacity = o.lambda_opacity
        cooldown: Optional[int] = None
        idu_indices: List[int] = []
        pseudo_stack: List = []

        gauss = getattr(t, "_gauss_mesh", False)
        if gauss and not hasattr(t, "_gauss_template"):
            # Abstract spec template for the shard_map builders (episodes
            # may run without a prior Stage-1 t.train() call — e.g. resumed
            # from a checkpoint straight into the curriculum).
            t._gauss_template = jax.eval_shape(lambda s: s, state)
        mesh_B = t._mesh_B  # 0 = single device or gauss-sharded (1 view/
        #                     step); >0 = view-parallel episodes

        def draw_tuple(j: int):
            """One iteration's host-RNG draws: the IDU/original Bernoulli
            flip and the view pick (a full B-row in view-mesh mode, drawn
            atomically like Trainer._pick_step).  Shared by the fused and
            single paths so both consume the py_rng stream identically."""
            use_idu = (
                j + o.idu_iter_full_train <= end_iter
                and t.py_rng.random() < o.idu_train_ratio
            )
            if use_idu:
                if not idu_indices:
                    idu_indices.extend(range(idu_group.size))
                i = idu_indices.pop(t.py_rng.randrange(len(idu_indices)))
                if mesh_B:
                    i = [i] + [t.py_rng.randrange(idu_group.size)
                               for _ in range(mesh_B - 1)]
                return (True, None, i)
            # Original views draw through Trainer._pick_step so the atomic
            # B-row invariant (lead + B-1 extras drawn together) lives in
            # exactly one place.
            g, i = t._pick_step()
            return (False, g, i)

        def pseudo_at(j: int) -> bool:
            return (
                o.lambda_pseudo_depth > 0
                and self.depth_predictor is not None
                and j % o.sample_pseudo_interval == 0
            )

        def post_event(j: int) -> bool:
            # host work that must run right AFTER step j (densify, opacity
            # reset, filter recompute, report)
            if j < densify_until:
                if (j > o.densify_from_iter
                        and j % o.densification_interval == 0):
                    return True
                if (j % o.idu_opacity_reset_interval == 0
                        and j < end_iter - 100):
                    return True
            elif j % 100 == 0 and j < end_iter - 100:
                return True
            return j % o.idu_testing_interval == 0 or j == end_iter

        def _kind_kwargs():
            if gauss:
                # Gauss-sharded builders take no backend/lpips — the
                # sharded render is always tiled and skips the LPIPS swap
                # (same option surface as Trainer._gauss_kwargs, so the
                # fused and single-step gauss episode paths match the
                # Stage-1 gauss step exactly).
                common = dict(
                    kernel_size=cfg.kernel_size,
                    ray_jitter=cfg.ray_jitter,
                    resample_gt=cfg.resample_gt_image,
                    bin_capacity=t.bin_capacity,
                )
            else:
                lpips_fn = None
                if o.use_lpips_loss:
                    lpips_fn = t._get_lpips()._jitted
                common = dict(
                    kernel_size=cfg.kernel_size,
                    backend=t.pipe_cfg.rasterizer_backend,
                    ray_jitter=cfg.ray_jitter,
                    resample_gt=cfg.resample_gt_image,
                    bin_capacity=t.bin_capacity,
                    lpips_fn=lpips_fn,
                )
            return (dict(use_depth=o.lambda_depth > 0,
                         photometric=o.idu_refine,
                         testing_render=not o.idu_random_ap, **common),
                    dict(use_depth=False, photometric=True, **common))

        def multi_fn(use_pseudo: bool = False):
            # Mixed-kind fused window: kinds are runtime inputs (see
            # train.step.make_idu_multistep / parallel.sharding.
            # make_parallel_idu_multistep).  One signature covers every
            # IDU/original interleaving.
            key = ("idu_multi", mesh_B, use_pseudo, t.bin_capacity)
            if key not in step_cache:
                idu_kwargs, orig_kwargs = _kind_kwargs()
                if mesh_B:
                    from skyfall_gs_tpu.parallel.sharding import (
                        make_parallel_idu_multistep,
                    )

                    step_cache[key] = make_parallel_idu_multistep(
                        t.mesh, o, idu_kwargs, orig_kwargs,
                        axis=t.mesh_axis, use_pseudo=use_pseudo)
                elif gauss:
                    from skyfall_gs_tpu.parallel.gauss_shard import (
                        make_gauss_idu_multistep,
                    )

                    assert not use_pseudo
                    step_cache[key] = make_gauss_idu_multistep(
                        t.mesh, o, t._gauss_template,
                        idu_kwargs=idu_kwargs, orig_kwargs=orig_kwargs,
                        axis=t.mesh_axis)
                else:
                    from skyfall_gs_tpu.train.step import make_idu_multistep

                    assert not use_pseudo
                    step_cache[key] = make_idu_multistep(
                        o, idu_kwargs=idu_kwargs, orig_kwargs=orig_kwargs)
            return step_cache[key]

        # Dummy original-group for all-IDU windows: a stable pick keeps the
        # jit signature unique per (orig image shape) rather than per window.
        default_group = t.scene.train_groups[t.group_keys[0]]

        fuse = max(int(t.pipe_cfg.fuse_steps), 1)
        pending: List = []        # fully-drawn (use_idu, g, i) lookaheads
        iteration = first_iter + 1
        while iteration <= end_iter:
            if cooldown is not None:
                if cooldown > 0:
                    cooldown -= 1
                else:
                    cooldown = None
                    lambda_opacity = o.lambda_opacity

            head = pending.pop() if pending else draw_tuple(iteration)
            use_pseudo = pseudo_at(iteration)

            # Scan-fuse a full window of consecutive steps (mixed kinds OK —
            # the kind is a runtime input) unless a host event interrupts:
            # pseudo supervision, densify/reset boundaries, or an
            # original-view group switch.  Only full windows fuse (every
            # window length is its own 30-90 s remote compile signature).
            window = [head]
            if fuse > 1 and not use_pseudo:
                orig_g = head[1]  # None while the window is all-IDU so far
                while (len(window) < fuse
                       and iteration + len(window) <= end_iter
                       and not pseudo_at(iteration + len(window))
                       and not post_event(iteration + len(window) - 1)):
                    nxt = pending.pop() if pending else \
                        draw_tuple(iteration + len(window))
                    if nxt[1] is not None:
                        if orig_g is None:
                            orig_g = nxt[1]
                        elif nxt[1] is not orig_g:
                            pending.append(nxt)
                            break
                    window.append(nxt)
                if len(window) < fuse:
                    for tup in reversed(window[1:]):
                        pending.append(tup)
                    window = [head]

            def row(tup, kind):
                """(K-slot, B) index row for the fused call (dummy zeros for
                the other kind's slots)."""
                if (tup[0] is not kind):
                    return [0] * max(mesh_B, 1)
                i = tup[2]
                return list(i) if isinstance(i, list) else [i]

            if len(window) > 1:
                w = len(window)
                ks, lrs, lams = [], [], []
                for k in range(w):
                    if k > 0:
                        if cooldown is not None:
                            if cooldown > 0:
                                cooldown -= 1
                            else:
                                cooldown = None
                                lambda_opacity = o.lambda_opacity
                    t.rng, krng = jax.random.split(t.rng)
                    ks.append(krng)
                    lrs.append(xyz_sched(iteration + k - first_iter))
                    lams.append(lambda_opacity)
                g = next((tup[1] for tup in window if tup[1] is not None),
                         default_group)
                kinds = jnp.asarray([1 if tup[0] else 0 for tup in window],
                                    jnp.int32)
                idu_rows = [row(tup, True) for tup in window]
                orig_rows = [row(tup, False) for tup in window]
                if mesh_B:
                    idu_idxs = jnp.asarray(idu_rows, jnp.int32)   # (K, B)
                    orig_idxs = jnp.asarray(orig_rows, jnp.int32)
                else:
                    idu_idxs = jnp.asarray([r[0] for r in idu_rows],
                                           jnp.int32)             # (K,)
                    orig_idxs = jnp.asarray([r[0] for r in orig_rows],
                                            jnp.int32)
                state, mstack = multi_fn()(
                    state, idu_group.cameras, idu_group.images,
                    idu_group.masks, idu_group.depths,
                    g.cameras, g.images, g.masks, g.depths,
                    kinds, idu_idxs, orig_idxs, t.bg, jnp.stack(ks),
                    jnp.asarray(lrs, jnp.float32),
                    jnp.asarray(lams, jnp.float32))
                if t.logger:
                    for k in range(w):
                        t.logger.log_step(
                            iteration + k,
                            jax.tree.map(lambda x, k=k: x[k], mstack), 0.0)
                metrics = jax.tree.map(lambda x: x[w - 1], mstack)
                iteration += w - 1  # post-step processing runs for the last
            else:
                use_idu, g, i = head
                t.rng, krng = jax.random.split(t.rng)
                xyz_lr = jnp.float32(xyz_sched(iteration - first_iter))

                # in-episode pseudo-view monodepth supervision
                # (train.py:801-832)
                pseudo_args = ()
                if use_pseudo:
                    if not pseudo_stack:
                        ele, rad = episode_pseudo_curriculum(iteration)
                        pseudo_stack = t._gen_pseudo_stack_at(ele, rad)
                    pcam = pseudo_stack.pop(
                        t.py_rng.randrange(len(pseudo_stack)))
                    pout = t._eval_render(state.model, pcam, t.bg)
                    pdepth = self.depth_predictor(
                        np.asarray(jnp.clip(pout.color, 0, 1)))
                    pseudo_args = (pcam, jnp.asarray(pdepth),
                                   jnp.float32(1.0))

                if mesh_B:
                    # K=1 window of the parallel mixed-kind step (pseudo
                    # args replicate with a leading K axis).
                    pk = ()
                    if use_pseudo:
                        pcam, pdepth, pscale = pseudo_args
                        pk = (jax.tree.map(lambda x: jnp.asarray(x)[None],
                                           pcam),
                              pdepth[None], pscale[None])
                    gg = g if g is not None else default_group
                    head_row = row(head, head[0])
                    state, mstack = multi_fn(use_pseudo)(
                        state, idu_group.cameras, idu_group.images,
                        idu_group.masks, idu_group.depths,
                        gg.cameras, gg.images, gg.masks, gg.depths,
                        jnp.asarray([1 if use_idu else 0], jnp.int32),
                        jnp.asarray([head_row if use_idu
                                     else [0] * mesh_B], jnp.int32),
                        jnp.asarray([[0] * mesh_B if use_idu
                                     else head_row], jnp.int32),
                        t.bg, krng[None],
                        jnp.asarray([xyz_lr], jnp.float32),
                        jnp.asarray([lambda_opacity], jnp.float32), *pk)
                    metrics = jax.tree.map(lambda x: x[0], mstack)
                elif use_idu:
                    cam, image, mask, depth = idu_group.select(i)
                    state, metrics = idu_step_fn(use_pseudo)(
                        state, cam, image, mask, depth, t.bg, krng,
                        xyz_lr, jnp.float32(lambda_opacity), *pseudo_args)
                else:
                    cam, image, mask, depth = g.select(i)
                    step_fn = t._get_step_fn(False, use_pseudo)  # photo only
                    state, metrics = step_fn(
                        state, cam, image, mask, depth, t.bg, krng,
                        xyz_lr, jnp.float32(lambda_opacity), *pseudo_args)

            # densification / opacity reset
            if iteration < densify_until:
                if (iteration > o.densify_from_iter
                        and iteration % o.densification_interval == 0):
                    state = t._densify(state)
                if (iteration % o.idu_opacity_reset_interval == 0
                        and iteration < end_iter - 100):
                    new_op = t._reset_opacity_fn(
                        state.model.params, state.model.aux.filter_3d)
                    state = state.replace(model=state.model.replace(
                        params=state.model.params.replace(opacity=new_op)))
                    lambda_opacity = 0.0
                    cooldown = o.idu_opacity_cooling_iterations
            elif iteration % 100 == 0 and iteration < end_iter - 100:
                state = state.replace(model=state.model.replace(
                    aux=state.model.aux.replace(
                        filter_3d=t._compute_filter(state))))

            if len(window) == 1 and t.logger:
                t.logger.log_step(iteration, metrics, 0.0)
            if iteration % o.idu_testing_interval == 0 or iteration == end_iter:
                t._report(state, iteration)
            iteration += 1

        if gauss:
            # Collective orbax save — the sharded state is never gathered
            # to one host (same rule as the Stage-1 gauss checkpoints).
            from skyfall_gs_tpu.train.checkpoint_sharded import (
                save_checkpoint_sharded,
            )

            ckpt = os.path.join(cfg.model_path, f"chkpnt{end_iter}.orbax")
            save_checkpoint_sharded(ckpt, state, end_iter)
        else:
            ckpt = os.path.join(cfg.model_path, f"chkpnt{end_iter}.npz")
            save_checkpoint(ckpt, state, end_iter)
        t.save_ply(state, end_iter)
        return state

    # ------------------------------------------------------------------
    def run(self, state: TrainState, first_iter: int) -> TrainState:
        """The full Stage-2 curriculum (reference training_idu)."""
        t = self.trainer
        o = t.opt_cfg
        cur: IDUCurriculum = IDU_CURRICULA[o.datasets_type]

        xs = np.linspace(-o.idu_grid_width / 2, o.idu_grid_width / 2,
                         o.idu_grid_size + 2)[1:-1]
        ys = np.linspace(-o.idu_grid_height / 2, o.idu_grid_height / 2,
                         o.idu_grid_size + 2)[1:-1]
        xx, yy = np.meshgrid(xs, ys)
        targets = np.stack([xx, yy, np.zeros_like(xx)], -1).reshape(-1, 3).tolist()

        it = first_iter
        if not o.idu_no_curriculum:
            for radius, elevation in zip(cur.radius_list, cur.elevation_list):
                print(f"[IDU] episode elevation={elevation} radius={radius}")
                state = self.train_episode(
                    state, it, targets, float(elevation), float(radius), cur.fov)
                it += o.idu_episode_iterations
        else:
            for _ in range(5):
                state = self.train_episode(
                    state, it, targets, list(cur.elevation_list),
                    list(cur.radius_list), cur.fov)
                it += o.idu_episode_iterations
        return state
