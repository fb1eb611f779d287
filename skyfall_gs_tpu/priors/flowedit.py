"""FlowEdit: inversion-free flow-matching image editing.

Capability parity: the reference's ``FlowEditRefineIDU`` submodule
(train.py:38,448-460) — FlowEdit (Kulikov et al. 2024) run with a FLUX
flow-matching backbone to refine rendered orbit views into photorealistic
pseudo-ground-truth, with knobs n_min / n_max / n_max_end / n_avg
(arguments/__init__.py:267-274).

Architecture here:
  * :func:`flow_edit_ode` — the FlowEdit sampling loop itself, as a pure
    jittable ``lax.scan`` over timesteps.  It only needs a velocity field
    ``v(z, t, cond) -> dz/dt``; any flow-matching model plugs in.
  * :class:`FlowEditRefiner` — the IDU-facing backend: encodes frames to
    latents, runs the ODE with source/target conditioning, decodes.  The
    FLUX backbone requires local pretrained weights (this machine has no
    network egress); constructing it without weights raises a clear error,
    and any (encode, decode, velocity) triple can be injected instead —
    the tests drive the full loop with a toy linear flow.

FlowEdit recurrence (paper Alg. 1, rectified-flow form):
    t_k:            decreasing timesteps indexed n_max -> n_min
    z_src_t  = (1 - t) x_src + t eps              (eps ~ N(0, I), n_avg draws)
    z_tar_t  = z_edit + (z_src_t - x_src_partial)
    dv       = v(z_tar_t, t, c_tar) - v(z_src_t, t, c_src)   (averaged)
    z_edit  <- z_edit + (t_{k+1} - t_k) * dv
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def flow_edit_ode(
    velocity_fn: Callable,
    x_src: jnp.ndarray,
    src_cond,
    tar_cond,
    rng: jax.Array,
    num_steps: int = 28,
    n_min: int = 0,
    n_max: int = 15,
    n_avg: int = 1,
) -> jnp.ndarray:
    """Run the FlowEdit ODE on one latent.

    Args:
        velocity_fn: v(z, t_scalar, cond) -> velocity, traceable.
        x_src: source latent (any shape).
        src_cond/tar_cond: conditioning pytrees for the two prompts.
        num_steps: total timestep grid size (t_k = 1 - k/num_steps ordering).
        n_min/n_max: FlowEdit editing window — the loop runs over the
            timesteps indexed [num_steps - n_max, num_steps - n_min).
        n_avg: noise draws averaged per step.

    Returns:
        edited latent, same shape as x_src.
    """
    # Decreasing sigma grid (rectified flow: z_t = (1-t) x + t eps).
    ts = jnp.linspace(1.0, 0.0, num_steps + 1)
    start = num_steps - n_max
    stop = num_steps - n_min
    idxs = jnp.arange(start, stop)
    keys = jax.random.split(rng, stop - start)

    def step(z_edit, inp):
        k, key = inp
        t = ts[k]
        t_next = ts[k + 1]

        def one_draw(key_i):
            eps = jax.random.normal(key_i, x_src.shape, x_src.dtype)
            z_src_t = (1.0 - t) * x_src + t * eps
            z_tar_t = z_edit + (z_src_t - x_src)
            v_src = velocity_fn(z_src_t, t, src_cond)
            v_tar = velocity_fn(z_tar_t, t, tar_cond)
            return v_tar - v_src

        dv = jnp.mean(
            jax.vmap(one_draw)(jax.random.split(key, n_avg)), axis=0)
        z_edit = z_edit + (t_next - t) * dv
        return z_edit, None

    z_final, _ = jax.lax.scan(step, x_src, (idxs, keys))
    return z_final


class FlowEditRefiner:
    """IDU refine backend running FlowEdit over a flow-matching backbone.

    Interface parity with the reference FlowEditRefineIDU:
        run(images, n_min, n_max, n_max_end, n_avg) -> refined images.
    ``n_max_end >= 0`` linearly anneals the per-image n_max from ``n_max``
    to ``n_max_end`` across the batch (the reference's episode annealing).
    """

    def __init__(
        self,
        save_path: Optional[str] = None,
        model_type: str = "FLUX",
        encode_fn: Optional[Callable] = None,
        decode_fn: Optional[Callable] = None,
        velocity_fn: Optional[Callable] = None,
        src_cond=None,
        tar_cond=None,
        num_steps: int = 28,
        seed: int = 0,
    ):
        self.save_path = save_path
        self.num_steps = num_steps
        self.rng = jax.random.PRNGKey(seed)
        if velocity_fn is None:
            raise RuntimeError(
                f"No local {model_type} flow-matching weights are available "
                "in this environment (no network egress), and no velocity_fn "
                "was injected. Provide (encode_fn, decode_fn, velocity_fn, "
                "src_cond, tar_cond) to use FlowEdit, or use the 'identity' "
                "refiner.")
        self.encode = encode_fn if encode_fn is not None else (lambda x: x)
        self.decode = decode_fn if decode_fn is not None else (lambda z: z)
        self.velocity_fn = velocity_fn
        self.src_cond = src_cond
        self.tar_cond = tar_cond

    def run(self, images: Sequence[np.ndarray], n_min: int = 0,
            n_max: int = 15, n_max_end: int = -1, n_avg: int = 1,
            **_) -> List[np.ndarray]:
        out = []
        n = len(images)
        for i, img in enumerate(images):
            if n_max_end >= 0 and n > 1:
                nm = int(round(n_max + (n_max_end - n_max) * i / (n - 1)))
            else:
                nm = n_max
            self.rng, k = jax.random.split(self.rng)
            z = self.encode(jnp.asarray(img))
            z2 = flow_edit_ode(self.velocity_fn, z, self.src_cond,
                               self.tar_cond, k, self.num_steps,
                               n_min=n_min, n_max=nm, n_avg=n_avg)
            out.append(np.asarray(self.decode(z2)))
        return out
