"""Device-mesh construction helpers.

The reference has no intra-scene distribution (SURVEY.md §2.4): one process,
one GPU, multi-GPU only as scene-level subprocess dispatch.  This framework
makes multi-chip a first-class axis instead:

  * ``data`` axis — view parallelism: each device renders/losses a different
    camera, gradients are ``pmean``-ed over ICI (parallel/sharding.py);
  * scene parallelism across hosts stays embarrassingly parallel
    (parallel/launcher.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "data",
              platform: Optional[str] = None) -> Mesh:
    """Build a 1-D mesh over the first ``n_devices`` devices."""
    devices = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None and len(devices) < n_devices and platform is None:
        # The default platform may be a single tunneled TPU while virtual
        # host CPU devices are available (xla_force_host_platform_device_count).
        try:
            cpu = jax.devices("cpu")
            if len(cpu) >= n_devices:
                devices = cpu
        except RuntimeError:
            pass
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)} "
                f"({[d.platform for d in devices[:3]]}...)")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))
