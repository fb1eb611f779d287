"""Device-mesh construction and multi-host bootstrap helpers.

The reference has no intra-scene distribution (SURVEY.md §2.4): one process,
one GPU, multi-GPU only as scene-level subprocess dispatch (GPU polling in
scripts/run_jax.py).  This framework makes multi-chip a first-class axis
instead:

  * ``data`` axis — view parallelism: each device renders/losses a different
    camera, gradients are ``pmean``-ed over ICI (parallel/sharding.py);
  * ``gauss`` axis — splat-sharded state for scenes beyond one chip's HBM
    (parallel/gauss_shard.py);
  * scene parallelism across hosts stays embarrassingly parallel
    (parallel/launcher.py);
  * multi-host pods (SURVEY §5.8): :func:`initialize_distributed` wires
    ``jax.distributed.initialize`` from explicit arguments or the
    ``SKYFALL_COORDINATOR`` / ``SKYFALL_NUM_PROCESSES`` /
    ``SKYFALL_PROCESS_ID`` environment (what
    :func:`multihost_slot_envs` emits for the launcher), after which
    ``jax.devices()`` spans the pod and the mesh builders below shard
    over ICI+DCN transparently.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import numpy as np
from jax.sharding import Mesh

# Environment keys consumed by initialize_distributed(); emitted per-process
# by multihost_slot_envs() and forwarded by parallel/launcher.py slot_envs.
ENV_COORDINATOR = "SKYFALL_COORDINATOR"
ENV_NUM_PROCESSES = "SKYFALL_NUM_PROCESSES"
ENV_PROCESS_ID = "SKYFALL_PROCESS_ID"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[List[int]] = None,
) -> bool:
    """Initialize JAX's multi-host runtime if configured; no-op otherwise.

    Falls back to the ``SKYFALL_*`` environment (see module docstring) when
    arguments are omitted.  Single-process runs (no coordinator configured,
    or num_processes == 1) return ``False`` without touching the runtime, so
    callers can invoke this unconditionally at CLI entry.

    Returns:
        True iff ``jax.distributed.initialize`` was called.
    """
    coordinator_address = coordinator_address or os.environ.get(ENV_COORDINATOR)
    if num_processes is None and ENV_NUM_PROCESSES in os.environ:
        num_processes = int(os.environ[ENV_NUM_PROCESSES])
    if process_id is None and ENV_PROCESS_ID in os.environ:
        process_id = int(os.environ[ENV_PROCESS_ID])
    if not coordinator_address and num_processes is None and process_id is None:
        return False            # unconfigured: single-process run
    if num_processes is not None and num_processes <= 1:
        return False            # explicitly single-process
    if not coordinator_address or num_processes is None or process_id is None:
        # A half-configured pod must fail loudly: silently training as a
        # lone process while the rest of the pod waits at the coordinator
        # is a partition, not a fallback.
        raise RuntimeError(
            "partial multi-host configuration: need all of "
            f"{ENV_COORDINATOR}/{ENV_NUM_PROCESSES}/{ENV_PROCESS_ID} "
            f"(got coordinator={coordinator_address!r}, "
            f"num_processes={num_processes!r}, process_id={process_id!r})")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def multihost_slot_envs(
    hosts: List[str],
    coordinator_port: int = 8476,
) -> List[Dict[str, str]]:
    """Per-process environment dicts for a multi-host training job.

    Process 0's host is the coordinator.  Feed the result to
    ``parallel.launcher.run_scene_jobs(slot_envs=...)`` (one slot per host)
    or export it into each host's job environment; the training CLI calls
    :func:`initialize_distributed` which picks these up.
    """
    coord = f"{hosts[0]}:{coordinator_port}"
    return [
        {
            ENV_COORDINATOR: coord,
            ENV_NUM_PROCESSES: str(len(hosts)),
            ENV_PROCESS_ID: str(i),
        }
        for i in range(len(hosts))
    ]


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
