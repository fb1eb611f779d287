"""Small numeric utilities shared across the framework.

Capability parity: reference ``utils/general_utils.py`` (inverse_sigmoid:18,
get_expon_lr_func:29-62, safe_state:112-133).  Implemented here as pure
JAX/numpy functions so they can live inside jitted code.
"""

from __future__ import annotations

import math
import random

import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x):
    """Logit: inverse of the sigmoid opacity activation."""
    return jnp.log(x / (1.0 - x))


def expon_lr_schedule(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    """Log-linearly interpolated learning-rate schedule with optional warmup.

    Continuous interpolation ``exp(lerp(log(lr_init), log(lr_final), t))``
    with ``t = clip(step/max_steps, 0, 1)``, scaled during the first
    ``lr_delay_steps`` by a smooth sine ramp from ``lr_delay_mult`` to 1.
    Returns 0 for ``step < 0`` or when ``lr_init == 0`` (parity with the
    reference scheduler semantics at utils/general_utils.py:29-62).

    The returned callable is traceable: ``step`` may be a JAX scalar.
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        if lr_init <= 0.0 and lr_final <= 0.0:
            return jnp.zeros_like(t)
        log_lerp = jnp.exp(
            jnp.log(max(lr_init, 1e-30)) * (1.0 - t) + jnp.log(max(lr_final, 1e-30)) * t
        )
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
                0.5 * math.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay_rate = 1.0
        lr = delay_rate * log_lerp
        return jnp.where(step < 0, 0.0, lr)

    return schedule


def seed_everything(seed: int = 0) -> None:
    """Seed the host-side RNGs (JAX randomness is functional and keyed)."""
    random.seed(seed)
    np.random.seed(seed)
