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
    # Limb backend for FieldElement/Scalar arithmetic (ops/limb.BACKENDS).
    backend: str = "i32x22"


DEFAULT = Config()

# --- Runtime backend selection (src/backend/mod.rs:9-16 analogue) ----------
# The reference picks its limb backend with a cargo feature at compile time;
# here the registry entry is chosen at runtime.  FieldElement/Scalar
# constructors consult the active name; instances carry their ModSpec as
# static pytree metadata, so mixed-backend programs are well-defined (each
# value remembers its geometry) and jit caches per backend.
#
# NOTE: the batched POINT kernels (models/, ops/pallas/) instantiate the
# i32x22 backend -- like the reference's constants tables instantiate u64
# limbs -- because their Pallas layouts are specialized to the 22x12-bit
# geometry; f32x29 is a field/scalar-level backend (measured 2.5x slower,
# tests/test_field_f9.py).

BACKEND_NAMES = ("i32x22", "f32x29")
_ACTIVE_BACKEND = "i32x22"


def set_backend(name: str) -> None:
    """Select the limb backend used by new FieldElement/Scalar values."""
    global _ACTIVE_BACKEND
    if name not in BACKEND_NAMES:
        raise ValueError(f"unknown backend {name!r}; registered: {BACKEND_NAMES}")
    _ACTIVE_BACKEND = name


def get_backend() -> str:
    return _ACTIVE_BACKEND


class use_backend:
    """Context manager: `with config.use_backend("f32x29"): ...`."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.prev = get_backend()
        set_backend(self.name)
        return self

    def __exit__(self, *exc):
        set_backend(self.prev)
        return False
