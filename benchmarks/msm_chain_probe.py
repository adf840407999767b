#!/usr/bin/env python
"""Honest device-side MSM timing: chain m MSMs in ONE graph with an
opaque data dependency (each MSM's windows are XORed with one result bit
of the previous MSM -- valid digits, unprovable-to-XLA dependency) and
difference two chain lengths, so per-call dispatch/readback latency
under the axon tunnel cancels (the CLAUDE.md single-dispatch trap --
walls at this scale are ~50-80 ms, where a ~10-30 ms tunnel constant
materially contaminates the fixed-term estimate).

Usage: python benchmarks/msm_chain_probe.py [log2n ...] (default 14 16)
Env: CHAIN_C (default auto), CHAIN_M (default 3: times m=1 vs m=3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from zerocaf_tpu import EdwardsPoint, Scalar
import importlib

M = importlib.import_module("zerocaf_tpu.parallel.msm")


def chain_graph(c, nwin, m):
    @jax.jit
    def run(pt, windows):
        total = None
        w = windows
        for _ in range(m):
            total = M._msm_dense(pt, w, c, nwin)
            # opaque dependency: XOR one result bit into every digit
            # (windows < 2^c stay valid; XLA cannot fold it away)
            bit = (total[0][0] & 1).astype(windows.dtype)
            w = windows ^ bit
        return total

    return run


def timeit(fn, iters=3):
    jax.block_until_ready(jax.tree_util.tree_leaves(fn())[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    log2ns = [int(a) for a in sys.argv[1:]] or [14, 16]
    m = int(os.environ.get("CHAIN_M", "3"))
    for log2n in log2ns:
        n = 1 << log2n
        c = int(os.environ.get("CHAIN_C", "0")) or M.auto_c_dense(n)
        nwin = -(-251 // c)
        k1, k2 = jax.random.split(jax.random.PRNGKey(4))
        pts = EdwardsPoint.basepoint_mul(Scalar.random(k1, (n,)))
        sc = Scalar.random(k2, (n,))
        windows = sc.windows(c, nwin)
        pt = pts._tuple()
        jax.block_until_ready(pt[0])
        g1 = chain_graph(c, nwin, 1)
        gm = chain_graph(c, nwin, m)
        t1 = timeit(lambda: g1(pt, windows))
        tm = timeit(lambda: gm(pt, windows))
        per = (tm - t1) / (m - 1)
        print(json.dumps({
            "n": n, "c": c, "m": m,
            "t1_s": round(t1, 4), "tm_s": round(tm, 4),
            "per_msm_device_s": round(per, 4),
            "dispatch_overhead_s": round(t1 - per, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
