#!/usr/bin/env python
"""Timing-variance harness for the constant-time claims (docs/CONSTANT_TIME.md).

Drives the oblivious paths with adversarial operand classes and reports
per-class timing.  Classes must agree within noise: a significant spread
would indicate value-dependent timing somewhere under XLA/Mosaic (which
the lockstep design is supposed to exclude).

METHODOLOGY (round 4: within-dispatch class comparison).  Earlier rounds
timed each class in a separate chained run; the axon tunnel's run-to-run
drift (~5-10%) then dominated the spread (VERDICT r3 item 6).  Now ONE
compiled executable `run2(state, ref_cls, probe_cls)` chains `iters` ops
on the reference class and then `iters` ops on the probe class inside the
same dispatch (a sentinel data-dependency links the segments, so XLA can
eliminate neither).  The per-class delta is

    t_cls - t_ref = (T(ref, cls) - T(ref, ref)) / iters

-- a difference of two timings of the SAME executable at the same shapes,
so dispatch, readback and tunnel cost cancel exactly; reps are
interleaved across classes so slow drift affects every class equally.
The reference class's absolute per-op time comes from differencing run2
against a single-segment run1 (the established two-graph-size trick).

Two prior-harness traps remain documented and fixed: (1) classes are
traced inputs, never jit closure constants (else XLA specializes the
graph per class -- observed fabricated 2x); (2) the chained feedback
preserves the operand class (limb0 ^= sentinel-indicator), else every
class measures the same post-first-iteration random distribution.

Prints one JSON line per (path, class) plus a per-path spread summary.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("BENCH_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from zerocaf_tpu import constants as C
from zerocaf_tpu.models import edwards as ed
from zerocaf_tpu.ops import limb as l

BATCH = int(os.environ.get("CT_BATCH", 4096))
SENTINEL = 1234567  # never produced in practice; not provably so to XLA


def _readback(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def _dep(leaf):
    """[batch, 1]-shaped data dependency that is 0 in practice."""
    return (leaf[..., :1] == SENTINEL).astype(jnp.int32)


def paired_probe(path, stepfn, state, classes, iters, unit, reps=7):
    """Within-dispatch class comparison; see module docstring.

    stepfn(state, cls) -> leaf array ([batch, ...], used only through the
    sentinel feedback).  classes: dict name -> class array; the FIRST
    entry is the reference."""
    names = list(classes)
    refname = names[0]
    arrs = {nm: jnp.asarray(a) for nm, a in classes.items()}

    def seg(c0, st):
        def body(i, c):
            leaf = stepfn(st, c)
            return jnp.concatenate([c[..., :1] ^ _dep(leaf), c[..., 1:]],
                                   axis=-1)
        return jax.lax.fori_loop(0, iters, body, c0)

    @jax.jit
    def run2(st, ca, cb):
        ca_f = seg(ca, st)
        cb0 = jnp.concatenate([cb[..., :1] ^ _dep(ca_f), cb[..., 1:]],
                              axis=-1)
        return seg(cb0, st)

    @jax.jit
    def run1(st, ca):
        return seg(ca, st)

    ref = arrs[refname]
    for nm in names:                      # compile + warm everything first
        _readback(run2(state, ref, arrs[nm]))
    _readback(run1(state, ref))

    t2 = {nm: [] for nm in names}
    t1 = []
    for _ in range(reps):                 # interleave classes within a rep
        for nm in names:
            t0 = time.perf_counter()
            _readback(run2(state, ref, arrs[nm]))
            t2[nm].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _readback(run1(state, ref))
        t1.append(time.perf_counter() - t0)

    def med(ts):
        ts = sorted(ts)
        return ts[len(ts) // 2]

    m2 = {nm: med(ts) for nm, ts in t2.items()}
    m1 = med(t1)
    scale = {"us": 1e6, "ns": 1e9}[unit]
    ref_abs = max(m2[refname] - m1, 1e-12) / iters
    per = {}
    for nm in names:
        t_cls = ref_abs + (m2[nm] - m2[refname]) / iters
        per[nm] = t_cls
        print(json.dumps({"path": path, "class": nm,
                          f"{unit}_per_op": round(t_cls / BATCH * scale, 4),
                          f"delta_{unit}":
                          round((t_cls - ref_abs) / BATCH * scale, 4)}),
              flush=True)
    spread = (max(per.values()) - min(per.values())) / ref_abs
    print(json.dumps({"path": path, "spread_pct": round(100 * spread, 2),
                      "ref_class": refname, "iters": iters, "reps": reps,
                      "method": "within-dispatch paired segments"}),
          flush=True)


def scalar_classes():
    rng = np.random.default_rng(0)
    return {
        "random": rng.integers(0, 2, (BATCH, 250)).astype(np.int32),
        "zeros": np.zeros((BATCH, 250), np.int32),
        "ones": np.ones((BATCH, 250), np.int32),
        "alternating": np.tile(np.arange(250) % 2,
                               (BATCH, 1)).astype(np.int32),
    }


def field_classes():
    rng = np.random.default_rng(1)
    near_p = np.tile(np.asarray(C.P_LIMBS, np.int32), (BATCH, 1))
    near_p[:, 0] -= 1
    return {
        "random": rng.integers(0, 4096, (BATCH, 22)).astype(np.int32),
        "zeros": np.zeros((BATCH, 22), np.int32),
        "max_limbs": np.full((BATCH, 22), 4095, np.int32),
        "near_p": near_p,
    }


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "batch": BATCH}), flush=True)
    base = jnp.asarray(np.broadcast_to(C.BASEPOINT.astype(np.int32),
                                       (BATCH, 4, 22)).copy())
    pt = tuple(base[:, i] for i in range(4))

    # 250-bit oblivious ladder per scalar-bit class
    paired_probe("ladder",
                 lambda st, cls: ed._scalar_mul(st, cls)[0],
                 pt, scalar_classes(), iters=2, unit="us")

    # field mul per operand class (class is the varying operand)
    ys = jnp.asarray(field_classes()["random"])
    paired_probe("field_mul",
                 lambda st, cls: l.mul(cls, st, l.FIELD),
                 ys, field_classes(), iters=2048, unit="ns")

    # production signed-digit Pallas ladder (mul_windowed TPU default)
    if jax.devices()[0].platform == "tpu":
        from zerocaf_tpu.ops.pallas import field_kernels as fk
        rng = np.random.default_rng(2)
        wclasses = {
            "random": rng.integers(0, 16, (BATCH, 63)).astype(np.int32),
            "zeros": np.zeros((BATCH, 63), np.int32),
            "max_digits": np.full((BATCH, 63), 15, np.int32),
            "alternating": np.tile(np.arange(63) % 16,
                                   (BATCH, 1)).astype(np.int32),
        }
        # r5 (VERDICT r4 item 6): longer paired segments + more reps to
        # settle the 3.09%-vs-3% r4 spread -- overridable for sweeps
        paired_probe("windowed_signed_pallas",
                     lambda st, cls: fk.scalar_mul_windowed_signed(
                         st, cls, 4)[0],
                     pt, wclasses,
                     iters=int(os.environ.get("CT_WIN_ITERS", "8")),
                     unit="us",
                     reps=int(os.environ.get("CT_WIN_REPS", "15")))


if __name__ == "__main__":
    main()
