"""Op vocabulary (the analogue of /root/reference/src/traits.rs).

The reference defines Rust traits -- Identity, ValidityCheck and the ops
family Square/Double/Half/Pow/ModSqrt/InvSqrt/SqrtRatioI (traits.rs:10-142).
In Python these are structural protocols: any framework type implementing
the listed methods satisfies the trait.  They document the shared method
vocabulary and give isinstance-checkable runtime protocols for generic code
(e.g. the generic scalar-mul entry points in models/edwards.py).

Contract notes carried over verbatim:
  * ValidityCheck returns a boolean *mask* (the batched analogue of
    subtle::Choice, traits.rs:22-32).
  * SqrtRatioI keeps the reference's 4-case contract (traits.rs:125-141):
      (True,  +sqrt(u/v))   if v != 0 and u/v is square
      (True,  0)            if u == 0
      (False, 0)            if v == 0 and u != 0
      (False, +sqrt(i*u/v)) if u/v is nonsquare
    Ristretto encode/decode depend on it.
"""

from __future__ import annotations

from typing import Protocol, Tuple, runtime_checkable

import jax.numpy as jnp


@runtime_checkable
class Identity(Protocol):
    """traits.rs:10-15."""

    @classmethod
    def identity(cls, shape: tuple = ()) -> "Identity": ...


@runtime_checkable
class ValidityCheck(Protocol):
    """traits.rs:22-32; returns a boolean mask."""

    def is_valid(self) -> jnp.ndarray: ...


@runtime_checkable
class Square(Protocol):
    """traits.rs:34-45."""

    def square(self): ...


@runtime_checkable
class Double(Protocol):
    """traits.rs:47-58."""

    def double(self): ...


@runtime_checkable
class Half(Protocol):
    """traits.rs:60-71."""

    def half(self): ...


@runtime_checkable
class Pow(Protocol):
    """traits.rs:73-84."""

    def pow(self, exp): ...


@runtime_checkable
class ModSqrt(Protocol):
    """traits.rs:86-103; sign-selectable square root."""

    def mod_sqrt(self, sign) -> Tuple[jnp.ndarray, "ModSqrt"]: ...


@runtime_checkable
class InvSqrt(Protocol):
    """traits.rs:105-123."""

    def inv_sqrt(self) -> Tuple[jnp.ndarray, "InvSqrt"]: ...


@runtime_checkable
class SqrtRatioI(Protocol):
    """traits.rs:125-141 (contract above)."""

    def sqrt_ratio_i(self, v) -> Tuple[jnp.ndarray, "SqrtRatioI"]: ...
