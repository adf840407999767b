"""Parallelism layer: device mesh, collectives, sharded MSM, checkpointing."""

from .comm import Communicator
from .mesh import batch_sharding, initialize_distributed, make_mesh, replicated
from .msm import msm, msm_naive, msm_sharded
from . import checkpoint

__all__ = [
    "Communicator", "batch_sharding", "initialize_distributed", "make_mesh",
    "replicated", "msm", "msm_naive", "msm_sharded", "checkpoint",
]
