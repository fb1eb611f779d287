"""Decompose the bench train step into in-graph component costs on real TPU.

Times full-graph variants (not isolated micro-benches — XLA fuses differently
inside the big graph; see CLAUDE.md) and reports deltas.  Syncs by reading a
scalar back (block_until_ready is a no-op through the axon tunnel).

Usage: timeout 900 python -u scripts/perf_probe.py [variant ...]
"""

import sys
import time

import numpy as np

N_GAUSSIANS = 100_000
IMG = 512
WARMUP = 5
MEASURE = 20


def sync(x):
    import jax.numpy as jnp

    return float(np.asarray(jnp.ravel(x)[0]))


def make_inputs():
    import jax.numpy as jnp

    from skyfall_gs_tpu.core.camera import orbit_cameras
    from skyfall_gs_tpu.model.gaussians import create_from_points
    from skyfall_gs_tpu.train.step import init_train_state

    rng = np.random.default_rng(0)
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
    return ts, cams, gt, mask, depth, bg


def timeit(name, fn, *args):
    import jax

    out = None
    for _ in range(WARMUP):
        out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(MEASURE):
        out = fn(*args)
    sync(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / MEASURE
    print(f"{name:40s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from skyfall_gs_tpu.config import OptimizationConfig
    from skyfall_gs_tpu.model.gaussians import (
        opacity_with_3d_filter,
        scaling_with_3d_filter,
    )
    from skyfall_gs_tpu.model.render import render
    from skyfall_gs_tpu.ops.binning import bin_gaussians, count_entries
    from skyfall_gs_tpu.ops.projection import project_gaussians
    from skyfall_gs_tpu.train.step import make_train_step

    which = set(sys.argv[1:])

    def want(name):
        return not which or name in which

    ts, cams, gt, mask, depth, bg = make_inputs()
    cam = cams[0]
    opt_cfg = OptimizationConfig()
    model = ts.model
    params = model.params

    # measured entry count / capacity context
    scales = scaling_with_3d_filter(params, model.aux.filter_3d)
    opac = opacity_with_3d_filter(params, model.aux.filter_3d)
    proj = project_gaussians(params.xyz, scales, params.rotation, opac, cam,
                             kernel_size=0.1, mask=model.aux.alive)
    n_entries = int(count_entries(proj.mean2d, proj.radius, IMG, IMG,
                                  radius_xy=proj.radius_xy))
    from skyfall_gs_tpu.ops.rasterize_tiled import default_capacity

    print(f"entries={n_entries} default_cap={default_capacity(N_GAUSSIANS)}",
          flush=True)

    if want("step"):
        step = make_train_step(opt_cfg, use_depth=True)
        kk = jax.random.PRNGKey(0)
        lr = jnp.float32(1e-4)
        lo = jnp.float32(0.1)

        # make_train_step DONATES the input state — thread a COPY through
        # the timing loop (the original ts/params feed the later probes).
        st = jax.tree.map(jnp.copy, ts)
        for _ in range(WARMUP):
            st, _m = step(st, cam, gt, mask, depth, bg, kk, lr, lo)
        sync(st.model.params.xyz)
        t0 = time.perf_counter()
        for _ in range(MEASURE):
            st, _m = step(st, cam, gt, mask, depth, bg, kk, lr, lo)
        sync(st.model.params.xyz)
        dt = (time.perf_counter() - t0) / MEASURE
        print(f"{'full train step':40s} {dt * 1e3:8.2f} ms", flush=True)
        del st

    if want("fwd"):
        @jax.jit
        def fwd(params):
            m = model.replace(params=params)
            out = render(m, cam, bg, kernel_size=0.1)
            return out.color.sum()

        timeit("render fwd (train mode)", fwd, params)

    if want("fwd_inf"):
        @jax.jit
        def fwd_inf(params):
            m = model.replace(params=params)
            out = render(m, cam, bg, kernel_size=0.1, inference=True)
            return out.color.sum()

        timeit("render fwd (inference mode)", fwd_inf, params)

    if want("fwdbwd"):
        @jax.jit
        def fwdbwd(params):
            def loss(p):
                m = model.replace(params=p)
                out = render(m, cam, bg, kernel_size=0.1)
                return jnp.sum(out.color ** 2) + jnp.sum(out.depth ** 2)

            l, g = jax.value_and_grad(loss)(params)
            return g.xyz

        timeit("render fwd+bwd", fwdbwd, params)

    if want("proj"):
        @jax.jit
        def projf(params):
            scales = scaling_with_3d_filter(params, model.aux.filter_3d)
            opac = opacity_with_3d_filter(params, model.aux.filter_3d)
            proj = project_gaussians(params.xyz, scales, params.rotation,
                                     opac, cam, kernel_size=0.1,
                                     mask=model.aux.alive)
            return proj.mean2d.sum() + proj.conic.sum() + proj.depth.sum()

        timeit("projection fwd", projf, params)

    if want("bin"):
        @jax.jit
        def binf(params):
            scales = scaling_with_3d_filter(params, model.aux.filter_3d)
            opac = opacity_with_3d_filter(params, model.aux.filter_3d)
            proj = project_gaussians(params.xyz, scales, params.rotation,
                                     opac, cam, kernel_size=0.1,
                                     mask=model.aux.alive)
            binned = bin_gaussians(proj.mean2d, proj.depth, proj.radius,
                                   IMG, IMG, cap=default_capacity(N_GAUSSIANS),
                                   chunk=128, align=True)
            return binned.gather_idx.sum()

        timeit("projection + binning (aligned)", binf, params)

    if want("bin_unaligned"):
        @jax.jit
        def binf2(params):
            scales = scaling_with_3d_filter(params, model.aux.filter_3d)
            opac = opacity_with_3d_filter(params, model.aux.filter_3d)
            proj = project_gaussians(params.xyz, scales, params.rotation,
                                     opac, cam, kernel_size=0.1,
                                     mask=model.aux.alive)
            binned = bin_gaussians(proj.mean2d, proj.depth, proj.radius,
                                   IMG, IMG, cap=default_capacity(N_GAUSSIANS),
                                   chunk=128, align=False)
            return binned.gather_idx.sum()

        timeit("projection + binning (unaligned)", binf2, params)


if __name__ == "__main__":
    main()

# Appended probes (round 2): step-shaped decompositions.


def extra_probes():
    import jax
    import jax.numpy as jnp

    from skyfall_gs_tpu.config import OptimizationConfig
    from skyfall_gs_tpu.model.render import render
    from skyfall_gs_tpu.model.densify import add_densification_stats
    from skyfall_gs_tpu.model.optim import (
        adam_update, make_lr_tree, make_weight_decay_tree)
    from skyfall_gs_tpu.ops.losses import (
        depth_pearson_loss, opacity_entropy_loss, photometric_loss, psnr)
    from skyfall_gs_tpu.model.gaussians import get_opacity

    which = set(sys.argv[1:]) - {"extra"}   # 'extra' is the mode flag

    def want(name):
        return not which or name in which

    ts, cams, gt, mask, depth, bg = make_inputs()
    cam = cams[0]
    model = ts.model
    params = model.params
    opt_cfg = OptimizationConfig()

    if want("fwdbwd_dummies"):
        @jax.jit
        def f(params):
            cap = params.capacity
            dummies0 = (jnp.zeros((cap, 2)), jnp.zeros((cap, 2)))

            def loss(p, dummies):
                m = model.replace(params=p)
                out = render(m, cam, bg, kernel_size=0.1,
                             mean2d_dummy=dummies[0],
                             mean2d_abs_dummy=dummies[1], with_normals=False)
                return jnp.sum(out.color ** 2) + jnp.sum(out.depth ** 2)

            _, g = jax.value_and_grad(loss, argnums=(0, 1))(params, dummies0)
            return g[0].xyz

        timeit("fwd+bwd incl. dummy/AbsGS grads", f, params)

    if want("fwdbwd_losses"):
        @jax.jit
        def f(params):
            cap = params.capacity
            dummies0 = (jnp.zeros((cap, 2)), jnp.zeros((cap, 2)))

            def loss(p, dummies):
                m = model.replace(params=p)
                out = render(m, cam, bg, kernel_size=0.1,
                             mean2d_dummy=dummies[0],
                             mean2d_abs_dummy=dummies[1], with_normals=False)
                image = out.color * mask[..., None]
                gtm = gt * mask[..., None]
                photo, ll1 = photometric_loss(
                    jnp.transpose(image, (2, 0, 1)),
                    jnp.transpose(gtm, (2, 0, 1)), opt_cfg.lambda_dssim)
                total = photo + opt_cfg.lambda_depth * depth_pearson_loss(
                    depth * mask, out.depth * mask)
                total = total + 0.1 * opacity_entropy_loss(
                    get_opacity(p), model.aux.alive)
                return total, out.radii

            (_, radii), g = jax.value_and_grad(
                loss, argnums=(0, 1), has_aux=True)(params, dummies0)
            return g[0].xyz

        timeit("fwd+bwd + full losses", f, params)

    if want("adam"):
        g0 = jax.tree.map(jnp.ones_like, params)

        @jax.jit
        def f(params):
            lr_tree = make_lr_tree(params, opt_cfg, jnp.float32(1e-4))
            wd_tree = make_weight_decay_tree(params, opt_cfg)
            new_p, _ = adam_update(g0, ts.opt, params, lr_tree,
                                   weight_decay_tree=wd_tree)
            return new_p.xyz

        timeit("adam update only", f, params)

    if want("densify_stats"):
        g2 = jnp.ones((params.capacity, 2))
        radii = jnp.ones((params.capacity,), jnp.int32)

        @jax.jit
        def f(aux):
            return add_densification_stats(aux, g2, g2, radii, IMG, IMG).denom

        timeit("densify stats", f, model.aux)


if __name__ == "__main__" and "extra" in sys.argv[1:]:
    extra_probes()
