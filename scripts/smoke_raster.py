"""Scratch smoke test: oracle vs tiled rasterizer parity on random splats."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import numpy as np
import jax
import jax.numpy as jnp

from skyfall_gs_tpu.core.camera import make_camera, look_at_c2w, camera_from_c2w
from skyfall_gs_tpu.ops.rasterize import rasterize

rng = np.random.default_rng(0)
N = 300
H = W = 64

means = rng.normal(0, 0.8, (N, 3)).astype(np.float32)
scales = np.exp(rng.normal(-2.5, 0.4, (N, 3))).astype(np.float32)
quats = rng.normal(0, 1, (N, 4)).astype(np.float32)
opac = (1 / (1 + np.exp(-rng.normal(0, 1, N)))).astype(np.float32)
colors = rng.uniform(0, 1, (N, 3)).astype(np.float32)

c2w = look_at_c2w([2.5, 1.5, 1.2], [0, 0, 0])
cam = camera_from_c2w(c2w, fov_x=np.deg2rad(60), fov_y=np.deg2rad(60), width=W, height=H)
bg = jnp.zeros(3)

args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac), jnp.asarray(colors), cam, bg)

out_ref = rasterize(*args, backend="reference")
print("oracle color", out_ref.color.shape, float(out_ref.color.mean()),
      "alpha", float(out_ref.alpha.mean()), "visible", int(out_ref.visibility.sum()))

out_tl = rasterize(*args, backend="tiled")
print("tiled  color", out_tl.color.shape, float(out_tl.color.mean()),
      "alpha", float(out_tl.alpha.mean()))

for name in ["color", "depth", "alpha", "normal"]:
    a = getattr(out_ref, name)
    b = getattr(out_tl, name)
    d = float(jnp.max(jnp.abs(a - b)))
    print(f"max|diff| {name}: {d:.3e}")

# gradient comparison
def loss_fn(m, s, q, o, c, backend):
    out = rasterize(m, s, q, o, c, cam, bg, backend=backend)
    return jnp.sum(out.color ** 2) + jnp.sum(out.depth ** 2) + jnp.sum(out.alpha)

g_ref = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(*args[:5], "reference")
g_tl = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(*args[:5], "tiled")
for nm, a, b in zip(["means", "scales", "quats", "opac", "colors"], g_ref, g_tl):
    denom = float(jnp.max(jnp.abs(a))) + 1e-8
    d = float(jnp.max(jnp.abs(a - b)))
    print(f"grad {nm}: max|ref|={denom:.3e} max|diff|={d:.3e} rel={d/denom:.3e}")

# --- early-exit / zfill hardware validation (round 5) -----------------------
# A tile whose every pixel saturates in block 0 of 4: the while cond must go
# false (true-product transmittance carry) and the backward's zfill path must
# write EXACT ZEROS over the skipped gradient blocks — on real HBM those
# blocks are garbage unless zfill runs, so this only truly validates on TPU.
from skyfall_gs_tpu.ops.rasterize_ref import composite_reference
from skyfall_gs_tpu.ops.rasterize_tiled import BLOCK, composite_tiled

n_wall, n_tail = 64, 3 * BLOCK
n2 = n_wall + n_tail
m2 = jnp.tile(jnp.asarray([[8.0, 8.0]], jnp.float32), (n2, 1))
con = jnp.tile(jnp.asarray([[1e-4, 0.0, 1e-4]], jnp.float32), (n2, 1))
dep = jnp.arange(1, n2 + 1, dtype=jnp.float32)
rad = jnp.full((n2,), 30.0, jnp.float32)
opa = jnp.full((n2,), 0.5, jnp.float32)
chn = jnp.tile(jnp.asarray([[0.3, 0.6, 0.9, 1.0, 0.1, 0.2, 0.3]],
                           jnp.float32), (n2, 1))
o_ref, tf_ref = composite_reference(m2, con, dep, rad, opa, chn, 16, 16)
o_t, tf_t, _ = composite_tiled(m2, con, dep, rad, opa, chn, 16, 16, cap=4096)
d_sat = float(jnp.max(jnp.abs(o_t - o_ref)))
print(f"early-exit fwd max|diff|: {d_sat:.3e}")
assert d_sat < 1e-3, "saturated-tile forward diverged"

def sat_loss(m, c, o, ch):
    out, tfin, _ = composite_tiled(m, c, dep, rad, o, ch, 16, 16, cap=4096)
    return jnp.sum(out) + jnp.sum(tfin)

gs = jax.grad(sat_loss, argnums=(0, 1, 2, 3))(m2, con, opa, chn)
tail_max = max(float(jnp.max(jnp.abs(g[n_wall + BLOCK:]))) for g in gs)
print(f"early-exit post-termination grad max: {tail_max:.3e}")
assert tail_max == 0.0, "zfill failed: skipped gradient blocks not zeroed"
assert all(bool(jnp.isfinite(g).all()) for g in gs)
print("OK")
