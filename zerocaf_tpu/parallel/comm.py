"""Distributed-communication backend (named module per SURVEY.md section 5).

The reference has no communication layer at all (no MPI/NCCL/sockets,
Cargo.toml:22-31); the TPU-native equivalent is JAX collectives over the
device mesh: psum / all_gather / ppermute lowered by XLA onto ICI
(intra-slice) or DCN (cross-host) links.  This module is the single place
that touches collectives so the CPU fake backend (8 virtual host devices,
tests/conftest.py) is drop-in.

Because elliptic-curve addition is not a hardware-reducible op, cross-device
point reductions go through `all_gather` of the per-device partial points
(tiny: one extended point = 4 x 22 int32 per device) followed by a local
batched EC tree-reduction -- see parallel/msm.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Communicator:
    """Collective ops bound to a named mesh axis.  Usable only inside
    shard_map/pjit-traced functions."""

    def __init__(self, axis: str = "data"):
        self.axis = axis

    def axis_index(self) -> jnp.ndarray:
        return jax.lax.axis_index(self.axis)

    def axis_size(self):
        return jax.lax.psum(1, self.axis)

    def psum(self, x):
        """Integer/float tree all-reduce (ICI-lowered)."""
        return jax.lax.psum(x, self.axis)

    def all_gather(self, x, axis: int = 0, tiled: bool = False):
        return jax.lax.all_gather(x, self.axis, axis=axis, tiled=tiled)

    def ppermute(self, x, perm):
        return jax.lax.ppermute(x, self.axis, perm)

    def all_gather_points(self, point_tuple):
        """Gather an extended-point pytree from every device:
        each [..., 22] coord becomes [ndev, ..., 22]."""
        return tuple(self.all_gather(c, axis=0) for c in point_tuple)
