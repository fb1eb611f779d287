"""Entry-budget LOD sweep on real TPU: FPS + quality vs the full render.

Round-2 verdict #4: the 125k-splat untrained stress scene (the honest
post-densification regime — ~2.5M duplicated entries at 1080p) rendered
18 FPS vs the >=30 FPS north star.  Entry-budgeted rendering
(ops/rasterize.py `_apply_entry_budget`) caps the duplicated (splat, tile)
entries — the quantity every hot stage (binning gathers, both Pallas
kernels) actually scales with — by greedily keeping splats with the best
contribution-per-entry.  This script measures the speed/quality curve so
the trade is documented, not assumed.

Methodology notes (CLAUDE.md): sync by reading a scalar back (a bare
block_until_ready does not synchronize through the axon tunnel), amortize
over MEASURE dispatches, and render the FULL baseline at MEASURED binning
capacity — never the shape-only default, which silently drops entries.

Usage: timeout 900 python -u scripts/bench_entry_budget.py [width height]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_GAUSSIANS = 125_000
WARMUP = 3
MEASURE = 30


def sync(x):
    return float(np.asarray(x.ravel()[0]))


def make_stress_scene():
    """Untrained 125k-splat disk scene — same recipe as perf_probe.py."""
    import jax.numpy as jnp

    from skyfall_gs_tpu.model.gaussians import create_from_points

    rng = np.random.default_rng(0)
    r = 256 * np.sqrt(rng.uniform(0, 1, N_GAUSSIANS))
    th = rng.uniform(0, 2 * np.pi, N_GAUSSIANS)
    pts = np.stack([r * np.cos(th), r * np.sin(th),
                    rng.uniform(0, 40, N_GAUSSIANS)], 1).astype(np.float32)
    cols = rng.uniform(0, 1, (N_GAUSSIANS, 3)).astype(np.float32)
    state = create_from_points(pts, cols, capacity=N_GAUSSIANS)
    state = state.replace(
        active_sh_degree=3,
        aux=state.aux.replace(filter_3d=jnp.full(state.params.capacity, 0.3)),
    )
    return state


def main():
    import jax
    import jax.numpy as jnp

    from skyfall_gs_tpu.core.camera import orbit_cameras
    from skyfall_gs_tpu.model.render import measure_bin_capacity, render
    from skyfall_gs_tpu.ops.losses import psnr

    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 1088

    state = make_stress_scene()
    cams = orbit_cameras([0, 0, 0], 50.0, 500.0, num_cams=4,
                         width=width, height=height, fov_deg=60.0, uid_base=0)
    cam = cams[0]
    bg = jnp.zeros(3)

    cap = measure_bin_capacity(state, cams, kernel_size=0.1)
    print(f"scene: {N_GAUSSIANS} splats, {width}x{height}, "
          f"measured capacity {cap}", flush=True)

    def bench(entry_budget):
        @jax.jit
        def rfn(model):
            out = render(model, cam, bg, kernel_size=0.1, testing=True,
                         inference=True,
                         bin_capacity=None if entry_budget else cap,
                         entry_budget=entry_budget)
            return jnp.clip(out.color, 0.0, 1.0)

        img = rfn(state)
        for _ in range(WARMUP):
            img = rfn(state)
        sync(img)
        t0 = time.perf_counter()
        for _ in range(MEASURE):
            img = rfn(state)
        sync(img)
        dt = (time.perf_counter() - t0) / MEASURE
        return 1.0 / dt, img

    fps_full, img_full = bench(None)
    print(f"full (cap={cap:>9}): {fps_full:6.1f} FPS  (baseline)", flush=True)

    for budget in (2_000_000, 1_500_000, 1_000_000, 750_000, 500_000,
                   250_000):
        if budget >= cap:
            continue
        fps, img = bench(budget)
        q = float(psnr(jnp.transpose(img, (2, 0, 1)),
                       jnp.transpose(img_full, (2, 0, 1))))
        print(f"budget {budget:>9}: {fps:6.1f} FPS  "
              f"{fps / fps_full:5.2f}x  psnr-vs-full {q:5.2f} dB", flush=True)


if __name__ == "__main__":
    main()
