"""Device-mesh construction helpers.

The solver's parallelism axes (SURVEY.md §2): ``pools`` (partition the m
pools; coupling is one (n+1)-vector psum per ADMM iteration) and ``batch``
(independent reserve/holding scenarios).  Meshes are built from whatever
devices are available — real TPU slices in production, the 8 virtual CPU
devices in tests (``xla_force_host_platform_device_count``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["pool_mesh", "pool_batch_mesh", "init_distributed"]


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host entry: initialize jax.distributed and return process count.

    On a multi-host TPU slice the runtime usually auto-detects everything
    (call with no args); explicit args cover DCN clusters without TPU
    metadata.  Safe to call when already initialized or single-host (both
    no-ops).  After this, ``pool_mesh()`` sees every device in the slice
    and ``ShardedAdmmSolver`` programs run SPMD across hosts — pools
    partitioned globally, the per-iteration n-vector psum riding ICI
    within a slice and DCN across them (SURVEY.md §5).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # already initialized, or single-process environment
    return jax.process_count()


def pool_mesh(n_devices: Optional[int] = None, devices=None, platform=None) -> Mesh:
    """1-D mesh over the ``pools`` axis."""
    if devices is None:
        devices = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("pools",))


def pool_batch_mesh(pools: int, batch: int, devices=None, platform=None) -> Mesh:
    """2-D mesh: scenario batch (outer, DCN-friendly) x pools (inner, ICI)."""
    if devices is None:
        devices = jax.devices(platform) if platform else jax.devices()
    if len(devices) < pools * batch:
        raise ValueError(
            f"need {pools * batch} devices for a {batch}x{pools} mesh, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[: pools * batch]).reshape(batch, pools)
    return Mesh(grid, ("batch", "pools"))
