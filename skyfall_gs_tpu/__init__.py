"""skyfall_gs_tpu — a TPU-native 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Skyfall-GS
(jayin92/Skyfall-GS): satellite-to-city 3D Gaussian Splatting with
Mip-Splatting filters, appearance modeling, depth supervision, adaptive
density control, iterative dataset update (IDU), and the photometric +
geometric evaluation suites.

Design stance (not a port):
  * Gaussian state is a pytree of fixed-capacity padded arrays with an
    ``alive`` mask, so every training step is jit-compiled with static shapes.
  * The training step is a pure function ``(state, camera, rng) -> (state,
    metrics)`` under ``jax.jit``.
  * The rasterizer is tile-binned with an XLA sort + a Pallas compositing
    kernel (MXU matmul per pixel-tile x gaussian-chunk); a pure-JAX reference
    rasterizer serves as the correctness oracle.
  * Multi-chip scaling uses ``jax.sharding.Mesh`` + view/tile parallelism
    with XLA collectives over ICI.
"""

__version__ = "0.1.0"
