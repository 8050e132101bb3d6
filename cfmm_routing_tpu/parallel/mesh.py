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

__all__ = ["pool_mesh", "pool_batch_mesh"]


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
