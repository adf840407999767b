"""Profiling & roofline accounting for the limb kernels.

The reference's only perf tooling is the Criterion harness
(/root/reference/benchmarks/dusk_benchmarks.rs); here we add what BASELINE.md
asks for: jax.profiler trace capture plus static roofline notes (integer ops
and bytes moved per batched kernel) so each kernel's arithmetic intensity is
auditable per chip.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median wall time per call (seconds), with block_until_ready."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


@dataclasses.dataclass(frozen=True)
class KernelCost:
    """Static per-element cost model for a batched kernel (roofline notes)."""

    name: str
    int_ops: int        # int32 mul/add ops per batch element
    bytes_moved: int    # HBM bytes in+out per batch element (fused ideal)

    @property
    def arithmetic_intensity(self) -> float:
        return self.int_ops / max(self.bytes_moved, 1)


# Cost accounting for the core kernels (radix-2^12, 22 limbs):
#   schoolbook: 22*22 MACs = 968; carries ~6 passes * 44 limbs * 3 ops ~ 800;
#   folds: ~3 * (12*23 MACs + carries) ~ 1700  => ~3.5k int ops per field mul.
FIELD_MUL = KernelCost("field_mul", int_ops=3500, bytes_moved=3 * 22 * 4)
FIELD_ADD = KernelCost("field_add", int_ops=160, bytes_moved=3 * 22 * 4)
POINT_ADD = KernelCost("point_add", int_ops=10 * 3500 + 7 * 160,
                       bytes_moved=12 * 22 * 4)
POINT_DOUBLE = KernelCost("point_double", int_ops=8 * 3500 + 6 * 160,
                          bytes_moved=8 * 22 * 4)
# ladder: 250 * (double + add + select); all intermediates stay on-chip, so
# bytes/elem is just scalar bits + point in/out.
SCALAR_MUL = KernelCost("scalar_mul_ladder",
                        int_ops=250 * (POINT_ADD.int_ops + POINT_DOUBLE.int_ops),
                        bytes_moved=(8 + 250 // 8) * 22 * 4)


def report(costs=(FIELD_MUL, FIELD_ADD, POINT_ADD, POINT_DOUBLE, SCALAR_MUL)):
    lines = ["kernel               int_ops/elem  bytes/elem  intensity(op/B)"]
    for c in costs:
        lines.append(f"{c.name:20s} {c.int_ops:12d} {c.bytes_moved:11d} "
                     f"{c.arithmetic_intensity:10.1f}")
    return "\n".join(lines)
