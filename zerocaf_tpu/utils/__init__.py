"""Utilities: profiling/roofline accounting, RNG helpers."""

from . import profiling

__all__ = ["profiling"]
