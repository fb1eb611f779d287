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
            # train.py:774-776).
            key = (use_pseudo, t.bin_capacity)
            if key not in step_cache:
                lpips_fn = None
                if o.use_lpips_loss:
                    lpips_fn = t._get_lpips()._jitted
                step_cache[key] = make_train_step(
                    o, kernel_size=cfg.kernel_size,
                    backend=t.pipe_cfg.rasterizer_backend,
                    ray_jitter=cfg.ray_jitter,
                    resample_gt=cfg.resample_gt_image,
                    use_depth=o.lambda_depth > 0,
                    use_pseudo=use_pseudo,
                    photometric=o.idu_refine,
                    testing_render=not o.idu_random_ap,
                    bin_capacity=t.bin_capacity,
                    lpips_fn=lpips_fn,
                )
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

        for iteration in range(first_iter + 1, end_iter + 1):
            if cooldown is not None:
                if cooldown > 0:
                    cooldown -= 1
                else:
                    cooldown = None
                    lambda_opacity = o.lambda_opacity

            use_idu = (
                iteration + o.idu_iter_full_train <= end_iter
                and t.py_rng.random() < o.idu_train_ratio
            )
            t.rng, krng = jax.random.split(t.rng)
            xyz_lr = jnp.float32(xyz_sched(iteration - first_iter))

            # in-episode pseudo-view monodepth supervision (train.py:801-832)
            pseudo_args = ()
            use_pseudo = (
                o.lambda_pseudo_depth > 0
                and self.depth_predictor is not None
                and iteration % o.sample_pseudo_interval == 0
            )
            if use_pseudo:
                if not pseudo_stack:
                    ele, rad = episode_pseudo_curriculum(iteration)
                    pseudo_stack = t._gen_pseudo_stack_at(ele, rad)
                pcam = pseudo_stack.pop(t.py_rng.randrange(len(pseudo_stack)))
                pout = t._eval_render(state.model, pcam, t.bg)
                pdepth = self.depth_predictor(
                    np.asarray(jnp.clip(pout.color, 0, 1)))
                pseudo_args = (pcam, jnp.asarray(pdepth), jnp.float32(1.0))

            if use_idu:
                if not idu_indices:
                    idu_indices = list(range(idu_group.size))
                i = idu_indices.pop(t.py_rng.randrange(len(idu_indices)))
                cam, image, mask, depth = idu_group.select(i)
                state, metrics = idu_step_fn(use_pseudo)(
                    state, cam, image, mask, depth, t.bg, krng,
                    xyz_lr, jnp.float32(lambda_opacity), *pseudo_args)
            else:
                g, i = t._pick_view()
                cam, image, mask, depth = g.select(i)
                step_fn = t._get_step_fn(False, use_pseudo)  # photometric only
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
                    from skyfall_gs_tpu.model.gaussians import reset_opacity

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

            if t.logger:
                t.logger.log_step(iteration, metrics, 0.0)
            if iteration % o.idu_testing_interval == 0 or iteration == end_iter:
                t._report(state, iteration)

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
