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
print("OK")
