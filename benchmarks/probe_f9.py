#!/usr/bin/env python
"""A/B probe: f32x29 (radix-2^9 FMA) vs i32x22 (radix-2^12 + MXU fold)
field multiplication on the real device.  Differenced chained timing
(T(2k)-T(k))/k so tunnel dispatch cost cancels.

Usage: python benchmarks/probe_f9.py [mul_i32 mul_f9 sq_i32 sq_f9 ...]
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

from zerocaf_tpu.ops import limb as l
from zerocaf_tpu import oracle as o

LANES = 1 << 16
ITERS = 64


def _readback(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def time_chain(step, init, iters=ITERS, reps=3):
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

    t1, t2 = med(r1), med(r2)
    return max(t2 - t1, 1e-12) / iters


def operands(spec):
    rng = np.random.default_rng(0)
    vals = [int.from_bytes(rng.bytes(31), "little") for _ in range(64)]
    arr = np.stack([o.int_to_limbs(v % spec.m, n=spec.nlimbs, w=spec.wbits)
                    for v in vals])
    x = np.tile(arr, (LANES // 64, 1)).astype(spec.np_dtype)
    y = np.tile(arr[::-1], (LANES // 64, 1)).astype(spec.np_dtype)
    return jnp.asarray(x), jnp.asarray(y)


def report(name, t):
    print(json.dumps({"probe": name, "ns_per_op": round(t / LANES * 1e9, 3),
                      "Mops_per_s": round(LANES / t / 1e6, 1)}), flush=True)


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    only = set(sys.argv[1:])

    def want(n):
        return not only or n in only

    for name, spec in (("i32", l.FIELD), ("f9", l.FIELD_F9)):
        x, y = operands(spec)
        if want(f"mul_{name}"):
            t = time_chain(lambda a, y=y, s=spec: l.mul(a, y, s), x)
            report(f"mul_{name}", t)
        if want(f"sq_{name}"):
            t = time_chain(lambda a, s=spec: l.square(a, s), x)
            report(f"sq_{name}", t)

    if want("mul_pallas"):
        from zerocaf_tpu.ops.pallas import field_kernels as fk
        x, y = operands(l.FIELD)
        t = time_chain(lambda a, y=y: fk.mul_tiled(a, y, l.FIELD), x)
        report("mul_pallas", t)

    if want("fused_win"):
        from zerocaf_tpu.ops.pallas import field_kernels as fk
        from zerocaf_tpu import constants as C
        batch = int(os.environ.get("BENCH_BATCH", 16384))
        rng = np.random.default_rng(0)
        base = np.broadcast_to(C.BASEPOINT.astype(np.int32),
                               (batch, 4, 22)).copy()
        pt = tuple(jnp.asarray(base[:, i]) for i in range(4))
        w = jnp.asarray(rng.integers(0, 16, (batch, 63)).astype(np.int32))

        variant = os.environ.get("FUSED_VARIANT", "fused")
        fn = (fk.scalar_mul_windowed_fused if variant == "fused"
              else fk.scalar_mul_windowed_stepped)

        def step(p):
            return fn(p, w, 4)

        t = time_chain(step, pt, iters=2)
        print(json.dumps({"probe": f"{variant}_win", "batch": batch,
                          "mults_per_s": round(batch / t, 1),
                          "ms_per_call": round(t * 1e3, 2)}), flush=True)

    if want("fixed_pallas"):
        from zerocaf_tpu.models import edwards as ed
        from zerocaf_tpu.ops.pallas import field_kernels as fk
        batch = int(os.environ.get("BENCH_BATCH", 16384))
        rng = np.random.default_rng(0)
        cw = int(os.environ.get("COMB_WIDTH", ed.COMB_WIDTH))
        nwin = -(-250 // cw)
        w0 = jnp.asarray(rng.integers(0, 1 << cw, (batch, nwin)).astype(np.int32))

        for nm, fn in (("fixed_xla", lambda w: ed._fixed_base_mul(w, cw)),
                       ("fixed_pallas",
                        lambda w: fk.fixed_base_mul_stepped(w, cw))):
            def step(w, fn=fn):
                Q = fn(w)
                mixed = jnp.concatenate([Q[0], Q[1], Q[2]], axis=-1)[..., :nwin]
                return (w + mixed) & ((1 << cw) - 1)
            t = time_chain(step, w0, iters=8)
            print(json.dumps({"probe": nm, "batch": batch,
                              "mults_per_s": round(batch / t, 1)}), flush=True)

    if want("padd"):
        # batched point add: fused Pallas kernel vs XLA path (incl. the
        # layout transposes the Pallas wrapper pays)
        from zerocaf_tpu.models import edwards as ed
        from zerocaf_tpu.ops.pallas import field_kernels as fk
        from zerocaf_tpu import constants as C
        n = 1 << 17
        rng = np.random.default_rng(0)
        base = np.broadcast_to(C.BASEPOINT.astype(np.int32), (n, 4, 22)).copy()
        P = tuple(jnp.asarray(base[:, i]) for i in range(4))

        def step_x(p):
            return ed._add(p, p)

        def step_p(p):
            return fk.padd_tiled(p, p)

        for nm, st in (("padd_xla", step_x), ("padd_pallas", step_p)):
            t = time_chain(st, P, iters=8)
            print(json.dumps({"probe": nm, "n": n,
                              "ns_per_add": round(t / n * 1e9, 3)}), flush=True)

    if want("mul_cascade"):
        # XLA path but with the all-VPU cascade fold instead of the MXU dot
        x, y = operands(l.FIELD)

        @jax.jit
        def mc(a, b):
            return l.reduce_to_semi_cascade(l.school(a, b), l.FIELD)

        t = time_chain(lambda a, y=y: mc(a, y), x)
        report("mul_cascade", t)


if __name__ == "__main__":
    main()
