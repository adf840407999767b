#!/usr/bin/env python
"""Timing-variance harness for the constant-time claims (docs/CONSTANT_TIME.md).

Drives the oblivious paths with adversarial operand classes and reports the
chained per-op time per class.  Classes must agree within noise: a
significant spread would indicate value-dependent timing somewhere under
XLA/Mosaic (which the lockstep design is supposed to exclude).

Prints one JSON line per (path, class).
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


def _readback(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def time_chain(step, init, iters, reps=5):
    def mk(k):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, k, lambda i, x: step(x), x)
        return run

    r1, r2 = mk(iters), mk(2 * iters)
    _readback(r1(init)); _readback(r2(init))

    def med(run):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _readback(run(init))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    return max(med(r2) - med(r1), 1e-12) / iters


def scalar_classes():
    rng = np.random.default_rng(0)
    return {
        "zeros": np.zeros((BATCH, 250), np.int32),
        "ones": np.ones((BATCH, 250), np.int32),
        "random": rng.integers(0, 2, (BATCH, 250)).astype(np.int32),
        "alternating": np.tile(np.arange(250) % 2,
                               (BATCH, 1)).astype(np.int32),
    }


def field_classes():
    rng = np.random.default_rng(1)
    near_p = np.tile(np.asarray(C.P_LIMBS, np.int32), (BATCH, 1))
    near_p[:, 0] -= 1
    return {
        "zeros": np.zeros((BATCH, 22), np.int32),
        "max_limbs": np.full((BATCH, 22), 4095, np.int32),
        "random": rng.integers(0, 4096, (BATCH, 22)).astype(np.int32),
        "near_p": near_p,
    }


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "batch": BATCH}), flush=True)
    base = jnp.asarray(np.broadcast_to(C.BASEPOINT.astype(np.int32),
                                       (BATCH, 4, 22)).copy())
    pt = tuple(base[:, i] for i in range(4))

    # METHODOLOGY NOTES (both bugs were observed and fixed here):
    # 1. The secret-class array MUST be a traced value (threaded through
    #    the chained state), never a lambda closure -- jit treats
    #    closed-over arrays as compile-time constants and XLA then
    #    SPECIALIZES the graph per class (dead-code-eliminating the
    #    multiply branch for an all-zeros constant scalar: observed 4.9 vs
    #    10.0 us/op).  One compiled graph serves every class below.
    # 2. The chained feedback MUST PRESERVE THE CLASS: chaining
    #    x <- f(x) randomizes the operands after one iteration, so the
    #    classes would all measure the same (random) distribution.  The
    #    feedback below re-issues the class operand plus a sentinel
    #    indicator of the previous output -- a real data dependency XLA
    #    cannot fold, while the measured operands stay in-class (+-1 on
    #    one limb) every iteration.
    SENTINEL = 1234567  # never produced in practice; not provably so to XLA

    def dep(y):
        """[batch, 1]-shaped data dependency that is 0 in practice."""
        return (y[..., :1] == SENTINEL).astype(jnp.int32)

    # 250-bit oblivious ladder per scalar-bit class
    for name, bits in scalar_classes().items():
        b = jnp.asarray(bits)

        def step(s):
            p, cls = s
            q = ed._scalar_mul(p, cls)
            b2 = jnp.concatenate([cls[..., :1] ^ dep(q[0]), cls[..., 1:]],
                                 axis=-1)
            return (p, b2)

        t = time_chain(step, (pt, b), 1)
        print(json.dumps({"path": "ladder", "class": name,
                          "us_per_op": round(t / BATCH * 1e6, 4)}), flush=True)

    # field mul per operand class
    ys = jnp.asarray(field_classes()["random"])
    for name, xs in field_classes().items():
        x = jnp.asarray(xs)

        def step(s):
            a, b2, cls = s
            y = l.mul(a, b2, l.FIELD)
            a2 = jnp.concatenate([cls[..., :1] + dep(y), cls[..., 1:]],
                                 axis=-1)
            return (a2, b2, cls)

        t = time_chain(step, (x, ys, x), 256)
        print(json.dumps({"path": "field_mul", "class": name,
                          "ns_per_op": round(t / BATCH * 1e9, 3)}), flush=True)

    # production signed-digit Pallas ladder (mul_windowed TPU default)
    # per window-digit class
    if jax.devices()[0].platform == "tpu":
        from zerocaf_tpu.ops.pallas import field_kernels as fk
        rng = np.random.default_rng(2)
        wclasses = {
            "zeros": np.zeros((BATCH, 63), np.int32),
            "max_digits": np.full((BATCH, 63), 15, np.int32),
            "random": rng.integers(0, 16, (BATCH, 63)).astype(np.int32),
            "alternating": np.tile(np.arange(63) % 16,
                                   (BATCH, 1)).astype(np.int32),
        }
        for name, ws in wclasses.items():
            w = jnp.asarray(ws)

            def step(s):
                p, cls = s
                q = fk.scalar_mul_windowed_signed(p, cls, 4)
                w2 = jnp.concatenate([cls[..., :1] ^ dep(q[0]),
                                      cls[..., 1:]], axis=-1)
                return (p, w2)

            t = time_chain(step, (pt, w), 2)
            print(json.dumps({"path": "windowed_signed_pallas", "class": name,
                              "us_per_op": round(t / BATCH * 1e6, 4)}),
                  flush=True)


if __name__ == "__main__":
    main()
