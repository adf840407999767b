"""Device-mesh helpers for sharded curve workloads.

The reference is single-threaded (SURVEY.md section 2 "Parallelism" table);
every axis here is new TPU-native design.  A 1-D `data` mesh shards the
point/scalar batch axis of MSM workloads over chips; inside one host the
collectives ride ICI, across hosts DCN (jax.distributed handles the wiring).
Tests fake an 8-device mesh on CPU (tests/conftest.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..config import MeshConfig


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    """Create a 1-D data-parallel mesh over the visible devices."""
    cfg = cfg or MeshConfig()
    if devices is None:
        devices = jax.devices()
        if cfg.n_devices is not None:
            devices = devices[: cfg.n_devices]
    return Mesh(np.array(devices), (cfg.data_axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for [N, ...] arrays: batch axis split over the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host startup (jax.distributed.initialize).  On single-host or
    test environments this is a no-op."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
