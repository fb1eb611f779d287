"""Benchmark driver: steady-state Stage-1 training throughput on real TPU.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: the Skyfall-GS Stage-1 hot loop (render -> L1+SSIM+entropy loss ->
backward through the tiled Pallas rasterizer -> Adam) on a synthetic
satellite-like scene at 512x512 with 100k Gaussians — the reference's
steady-state regime (JAX scenes train 512-1024 px with 1e5-1e6 splats).

The reference repo publishes no throughput numbers (BASELINE.md); the
baseline constant below is the commonly reported mip-splatting-class
single-A100 figure for this regime (~20 it/s), so vs_baseline > 1 means
faster than the CUDA reference class.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_ITERS_PER_SEC = 20.0  # A100-class mip-splatting, 512px / ~1e5 splats

N_GAUSSIANS = 100_000
IMG = 512
WARMUP = 8
MEASURE = 40


def main():
    import threading

    # Watchdog: a wedged axon tunnel hangs the first device claim forever
    # (see CLAUDE.md), which would leave the driver with NO output line at
    # all.  If the TPU doesn't respond within 15 minutes (well past the
    # 30-90 s/signature remote-compile budget), emit an explicit
    # infra-failure line; any real result printed later supersedes it (the
    # driver parses the output tail).
    fallback = {
        "metric": "stage1_train_iters_per_sec_512px_100k",
        "value": 0.0,
        "unit": "iters/sec",
        "vs_baseline": 0.0,
        "error": "tpu_tunnel_unresponsive_900s",
    }
    watchdog = threading.Timer(
        900.0, lambda: print(json.dumps(fallback), flush=True))
    watchdog.daemon = True
    watchdog.start()

    import jax
    import jax.numpy as jnp

    from skyfall_gs_tpu.config import OptimizationConfig
    from skyfall_gs_tpu.core.camera import orbit_cameras
    from skyfall_gs_tpu.model.gaussians import create_from_points
    from skyfall_gs_tpu.train.step import init_train_state

    rng = np.random.default_rng(0)
    # satellite-like: disk of radius ~256 with structure height
    r = 256 * np.sqrt(rng.uniform(0, 1, N_GAUSSIANS))
    th = rng.uniform(0, 2 * np.pi, N_GAUSSIANS)
    pts = np.stack([r * np.cos(th), r * np.sin(th),
                    rng.uniform(0, 40, N_GAUSSIANS)], 1).astype(np.float32)
    cols = rng.uniform(0, 1, (N_GAUSSIANS, 3)).astype(np.float32)

    state = create_from_points(pts, cols, capacity=int(N_GAUSSIANS * 1.25))
    state = state.replace(
        active_sh_degree=3,
        aux=state.aux.replace(filter_3d=jnp.full(state.params.capacity, 0.3)),
    )
    ts = init_train_state(state)

    cams = orbit_cameras([0, 0, 0], 50.0, 500.0, num_cams=8,
                         width=IMG, height=IMG, fov_deg=60.0, uid_base=0)
    gt = jnp.asarray(rng.uniform(0, 1, (IMG, IMG, 3)), jnp.float32)
    mask = jnp.ones((IMG, IMG), jnp.float32)
    depth = jnp.asarray(rng.uniform(1, 500, (IMG, IMG)), jnp.float32)
    bg = jnp.zeros(3)

    from skyfall_gs_tpu.train.step import make_train_multistep

    opt_cfg = OptimizationConfig()

    # Right-size the binning capacity exactly like the Trainer does
    # (binning.capacity_for_entries is the shared formula).  The library
    # default (4x splats) would silently overflow at this workload — ~540k
    # duplicated entries vs a 400k cap — and a bench that drops 26% of
    # entries measures a lighter step than production runs.
    from skyfall_gs_tpu.model.gaussians import (
        opacity_with_3d_filter, scaling_with_3d_filter)
    from skyfall_gs_tpu.ops.binning import capacity_for_entries, count_entries
    from skyfall_gs_tpu.ops.projection import project_gaussians

    @jax.jit
    def n_entries(params, filter_3d, alive, cam):
        scales = scaling_with_3d_filter(params, filter_3d)
        opac = opacity_with_3d_filter(params, filter_3d)
        proj = project_gaussians(params.xyz, scales, params.rotation, opac,
                                 cam, kernel_size=0.1, mask=alive)
        return count_entries(proj.mean2d, proj.radius, IMG, IMG,
                             radius_xy=proj.radius_xy)

    worst = max(int(n_entries(ts.model.params, ts.model.aux.filter_3d,
                              ts.model.aux.alive, c)) for c in cams)
    bin_capacity = capacity_for_entries(worst)

    # The production inner loop: the Trainer scan-fuses windows of
    # pipe.fuse_steps consecutive steps into one dispatch (host events
    # break windows).  Drive the same fused path here.  SKYFALL_BENCH_FUSE
    # overrides the window for scheduling-gap experiments (the per-step
    # profile shows ~4 ms of dispatch gaps at FUSE=8; longer windows
    # amortize them further at the cost of densify/reset granularity).
    FUSE = int(os.environ.get("SKYFALL_BENCH_FUSE", "8"))
    multi = make_train_multistep(opt_cfg, use_depth=True,
                                 bin_capacity=bin_capacity)
    cam_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    images = jnp.broadcast_to(gt, (len(cams),) + gt.shape)
    masks = jnp.broadcast_to(mask, (len(cams),) + mask.shape)
    depths = jnp.broadcast_to(depth, (len(cams),) + depth.shape)
    idxs = jnp.arange(FUSE, dtype=jnp.int32) % len(cams)

    # Pre-split keys and hoist traced scalars: an eagerly dispatched
    # jax.random.split chained per iteration costs ~35 ms/step through the
    # axon tunnel, and fresh jnp.float32() scalars add per-step transfers —
    # neither is part of the training step (the Trainer drives the same
    # way).
    warm_wins = max(1, WARMUP // FUSE)
    meas_wins = max(2, MEASURE // FUSE)
    n_win = warm_wins + meas_wins
    keys = jax.random.split(jax.random.PRNGKey(0), n_win * FUSE).reshape(
        n_win, FUSE, -1)
    xyz_lrs = jnp.full((FUSE,), 1e-4, jnp.float32)
    lams = jnp.full((FUSE,), 0.1, jnp.float32)
    for i in range(warm_wins):
        ts, metrics = multi(ts, cam_stack, images, masks, depths, idxs, bg,
                            keys[i], xyz_lrs, lams)
    # sync by reading a scalar back: block_until_ready does not actually
    # synchronize through the axon tunnel
    float(np.asarray(ts.model.params.xyz[0, 0]))
    watchdog.cancel()  # device responded; disarm the tunnel watchdog

    t0 = time.perf_counter()
    for i in range(warm_wins, n_win):
        ts, metrics = multi(ts, cam_stack, images, masks, depths, idxs, bg,
                            keys[i], xyz_lrs, lams)
    float(np.asarray(ts.model.params.xyz[0, 0]))
    dt = time.perf_counter() - t0

    its = (n_win - warm_wins) * FUSE / dt

    result = {
        "metric": "stage1_train_iters_per_sec_512px_100k",
        "value": round(its, 3),
        "unit": "iters/sec",
        "vs_baseline": round(its / BASELINE_ITERS_PER_SEC, 3),
    }
    if FUSE != 8:
        result["fuse_steps"] = FUSE  # experiment line, self-describing
    # Emit the perf line immediately: the driver parses the output tail, so
    # if the auxiliary quality phase below is cut off by a timeout, a valid
    # result line is still on record (the post-quality line supersedes it).
    _EMITTED.update(result)
    print(json.dumps(result), flush=True)
    if os.environ.get("SKYFALL_BENCH_SKIP_QUALITY"):
        return  # perf-only sweep (e.g. SKYFALL_BENCH_FUSE experiments)
    # Seed-robust quality: the AbsGS densify quantile makes single
    # trajectories chaotic (see quality_metric docstring), so the gate
    # value is the MEDIAN over N Trainer-RNG seeds with the spread on
    # record.  A superseding JSON line is emitted after every seed — the
    # driver parses the output tail, so a timeout mid-sweep keeps the
    # seeds already measured instead of losing the whole quality phase.
    n_seeds = int(os.environ.get("SKYFALL_BENCH_QUALITY_SEEDS", "3"))
    psnrs, ssims_all = [], []
    for seed in range(n_seeds):
        try:
            q = quality_metric(seed=seed)
        except Exception as e:  # quality is auxiliary — keep the perf line
            result["quality_error"] = repr(e)
            print(json.dumps(result), flush=True)
            return
        psnrs.append(q["quality_psnr_db"])
        ssims_all.append(q["quality_ssim"])
        order = np.argsort(psnrs)
        med = order[len(psnrs) // 2] if len(psnrs) % 2 else order[
            len(psnrs) // 2 - 1]          # lower median: a real seed's run
        result.update(quality_psnr_db=psnrs[med],
                      quality_ssim=ssims_all[med],
                      quality_setup=q["quality_setup"],
                      quality_n_splats=q["quality_n_splats"],
                      quality_seeds=len(psnrs),
                      quality_psnr_per_seed=psnrs,
                      quality_psnr_spread=round(max(psnrs) - min(psnrs), 2))
        print(json.dumps(result), flush=True)


def quality_metric(seed: int = 0):
    """Reconstruction-quality anchor (BASELINE.md "PSNR/SSIM within 0.5%"
    north star) at production mechanics: a 256px procedural city scene
    trained 2000 iterations with densification, opacity resets, per-view
    APPEARANCE embeddings, and DEPTH supervision all active — the same
    subsystems a real 512-1600px satellite run exercises (reference
    arguments/__init__.py:144, utils/camera_utils.py:33-41).  Reports
    held-out PSNR and SSIM.  Deterministic setup — round-over-round deltas
    at the same ``seed`` are kernel-numerics or semantic drift, not noise —
    but the AbsGS densify quantile makes single trajectories chaotic (the
    reference's own selector: count = ratio x N by construction,
    scene/gaussian_model.py:715-722), so judge deltas against the
    seed SPREAD (scripts/quality_gate.py --seeds N), not one trajectory.

    ``seed`` varies only the Trainer's RNG stream (view picks, split
    sampling, opacity-reset phase); the scene stays fixed at seed 0 so
    the reconstruction target is identical across seeds."""
    import tempfile

    import jax.numpy as jnp

    from skyfall_gs_tpu.config import (
        ModelConfig, OptimizationConfig, PipelineConfig)
    from skyfall_gs_tpu.io.synthetic import make_city_scene, test_psnr
    from skyfall_gs_tpu.ops.ssim import ssim
    from skyfall_gs_tpu.train.loop import Trainer

    iters = 2000
    size = 256
    out_dir = tempfile.mkdtemp(prefix="skyfall_bench_q_")
    scene = make_city_scene(out_dir, n_views=16, size=size, n_points=2000,
                            n_test=2)
    model_cfg = ModelConfig(
        model_path=out_dir, kernel_size=0.1,
        appearance_enabled=True, appearance_n_fourier_freqs=4,
        appearance_embedding_dim=32)
    opt_cfg = OptimizationConfig(
        iterations=iters,
        densify_from_iter=300,
        densification_interval=150,
        densify_until_iter=int(iters * 0.6),
        opacity_reset_interval=1500,
        lambda_depth=0.1,
        lambda_opacity=0.01,
        position_lr_max_steps=iters,
    )
    trainer = Trainer(model_cfg, opt_cfg, PipelineConfig(), scene,
                      rng_seed=seed)
    state = trainer.init_state()
    state = trainer.train(state, iterations=iters, save_iterations=(),
                          checkpoint_iterations=())

    ssims = []
    for v in scene.test_views:
        out = trainer._eval_render(state.model, v.camera, trainer.bg)
        img = jnp.clip(out.color, 0, 1).transpose(2, 0, 1)   # HWC -> CHW
        ssims.append(float(ssim(img, jnp.asarray(v.image).transpose(2, 0, 1))))
    return {
        "quality_psnr_db": round(test_psnr(trainer, scene, state), 2),
        "quality_ssim": round(float(np.mean(ssims)), 4),
        "quality_setup": f"city{size}px_{iters}it_densify_appearance_depth",
        "quality_n_splats": int(state.model.num_alive),
        "quality_seed": seed,
    }


# Last successfully-emitted perf result; the crash handler re-emits it so a
# late interrupt (e.g. SIGTERM during the quality phase) never overwrites a
# real measurement with value=0.0 — the driver parses the output TAIL.
_EMITTED = {}


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:
        # A compile/runtime failure before the perf line would otherwise
        # leave the driver with NOTHING to parse (the tunnel watchdog only
        # covers a silent hang).  Emit an explicit failure line — carrying
        # the already-measured value if the perf phase completed — and
        # re-raise so the traceback still reaches the log.
        line = {
            "metric": "stage1_train_iters_per_sec_512px_100k",
            "value": 0.0,
            "unit": "iters/sec",
            "vs_baseline": 0.0,
        }
        line.update(_EMITTED)
        line["error"] = f"bench_exception: {type(e).__name__}: {e}"[:500]
        print(json.dumps(line), flush=True)
        raise
