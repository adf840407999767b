#!/usr/bin/env python
"""Probe: fused Pallas power chain vs the XLA square-and-multiply chain.

The inverse / sqrt_ratio_i exponentiations (~253-bit fixed exponents)
dominate the Ristretto encode/decode roundtrip; this measures the isolated
chain both ways plus the end-to-end roundtrip, with the honest chained
methodology from bench.py (difference two graph sizes so tunnel dispatch
cancels).  Run on TPU:  python benchmarks/probe_pow.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from zerocaf_tpu import constants as C
from zerocaf_tpu.ops import limb as l
from zerocaf_tpu.ops.pallas import field_kernels as fk
from zerocaf_tpu.models import ristretto as ri


def _readback(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1)])


def time_chain(step, init, iters, reps=3):
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


def xla_pow(a, e, spec):
    """The pre-routing XLA chain (square-and-multiply scan)."""
    bits = np.array([int(b) for b in bin(e)[2:]], dtype=np.int32)

    def body(res, bit):
        res = l.square(res, spec)
        res = l.select(bit.astype(bool), l.mul(res, a, spec), res)
        return res, None

    one = jnp.broadcast_to(l.from_int(1, spec), a.shape).astype(a.dtype)
    res, _ = jax.lax.scan(body, one, jnp.asarray(bits))
    return res


def main():
    batch = int(os.environ.get("BENCH_BATCH", "16384"))
    rng = np.random.default_rng(3)
    e = (C.P - 5) // 8
    A = jnp.asarray(rng.integers(0, 4096, (batch, 22)).astype(np.int32))

    out = {"batch": batch, "platform": jax.devices()[0].platform}

    t = time_chain(lambda a: xla_pow(a, e, l.FIELD), A, 2)
    out["xla_pow_sec"] = t
    out["xla_pow_per_sec"] = round(batch / t, 1)

    t = time_chain(lambda a: fk.pow_tiled(a, e, l.FIELD), A, 2)
    out["pallas_pow_sec"] = t
    out["pallas_pow_per_sec"] = round(batch / t, 1)

    base = jnp.asarray(np.broadcast_to(C.BASEPOINT.astype(np.int32),
                                       (batch, 4, 22)).copy())
    pt = tuple(base[:, i] for i in range(4))

    def rt(p):
        bts = ri._compress(p)
        (x, y, z, tt), ok = ri._decompress(bts)
        return (x, y, z, tt)

    t = time_chain(rt, pt, 2)
    out["ristretto_roundtrip_sec"] = t
    out["ristretto_roundtrips_per_sec"] = round(batch / t, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
