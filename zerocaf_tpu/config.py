"""Framework configuration.

The reference selects its limb backend via cargo features
(/root/reference/src/backend/mod.rs:9-16).  Here the backend is a typed config:
the limb radix / count are chosen for TPU integer units (no 64-bit multiplier:
12-bit limbs keep every schoolbook column sum inside a signed int32), and the
parallelism knobs describe the device mesh.
"""

from __future__ import annotations

import dataclasses

# --- Limb backend ----------------------------------------------------------
# Radix 2^12 x 22 limbs (264-bit capacity for 253-bit values).
#
# Carry budget (the "no u64 multiply" analysis from SURVEY.md section 7):
#   products:  (2^12)^2 = 2^24 per partial product
#   columns:   <= 22 partial products per column  ->  22 * 2^24 < 2^28.5
#   folds:     <= 11-limb fold constant           ->  11 * 2^24 < 2^27.5
# both comfortably inside signed int32, so every kernel runs on native
# 32-bit TPU integer lanes.
#
# The fold boundary 2^252 is limb-aligned (252 = 12 * 21), which makes the
# pseudo-Mersenne reduction ("2^252 == -delta mod p") a clean limb split.
RADIX_BITS: int = 12
RADIX: int = 1 << RADIX_BITS
LIMB_MASK: int = RADIX - 1
NUM_LIMBS: int = 22
FOLD_LIMB: int = 21          # limbs[21:] hold bits >= 252
FOLD_BITS: int = 252

# Number of carry passes needed to bring int32 columns to "loose" limbs
# (each pass: rem = x & mask, carry = x >> 12 added one limb up; after 3
# passes limbs are <= 2^12, the loose-form fixed point).
CARRY_PASSES: int = 3


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for sharded workloads (MSM).

    The reference is single-threaded (SURVEY.md section 2); every axis here is
    new TPU-native design.  `data` shards the point/scalar batch axis over
    chips; collectives ride ICI inside a host and DCN across hosts.
    """

    data_axis: str = "data"
    n_devices: int | None = None  # None = all visible devices


@dataclasses.dataclass(frozen=True)
class Config:
    """Top-level framework config (the analogue of the reference's cargo
    feature surface, /root/reference/Cargo.toml:41-45)."""

    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    # Debug-mode range asserts on limb values (host-side checks in tests).
    debug_checks: bool = False
    # Use Pallas kernels for the hot paths where available (else pure jnp/XLA).
    use_pallas: bool = True


DEFAULT = Config()
