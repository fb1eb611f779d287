"""Test harness: run everything on 8 virtual CPU devices.

The axon TPU plugin registers itself regardless of JAX_PLATFORMS, so we pin
the default device to CPU explicitly and force Pallas interpret mode via
SKYFALL_INTERPRET (see ops/rasterize_tiled._interpret_default).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["SKYFALL_INTERPRET"] = "1"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

try:
    _cpu = jax.devices("cpu")[0]
    jax.config.update("jax_default_device", _cpu)
except RuntimeError:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_random_splats(rng, n, spread=0.8, scale_mu=-2.2):
    import jax.numpy as jnp

    return dict(
        means3d=jnp.asarray(rng.normal(0, spread, (n, 3)).astype(np.float32)),
        scales=jnp.asarray(np.exp(rng.normal(scale_mu, 0.4, (n, 3))).astype(np.float32)),
        quats=jnp.asarray(rng.normal(0, 1, (n, 4)).astype(np.float32)),
        opacities=jnp.asarray(
            (1.0 / (1.0 + np.exp(-rng.normal(0, 1, n)))).astype(np.float32)),
        colors=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
    )


def make_test_camera(width=32, height=32, eye=(2.5, 1.5, 1.2), fov_deg=60.0):
    from skyfall_gs_tpu.core.camera import camera_from_c2w, look_at_c2w

    c2w = look_at_c2w(eye, [0.0, 0.0, 0.0])
    return camera_from_c2w(c2w, np.deg2rad(fov_deg), np.deg2rad(fov_deg),
                           width, height)
