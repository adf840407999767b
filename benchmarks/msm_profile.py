#!/usr/bin/env python
"""Stage-level timing of the graph-split MSM at one size: argsort, gather,
segmented scan, scatter, combine.  Decides where MSM optimization effort goes.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("BENCH_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

import zerocaf_tpu as z
from zerocaf_tpu.models import edwards as _ed
import importlib

M = importlib.import_module("zerocaf_tpu.parallel.msm")

LOG2N = int(os.environ.get("PROF_LOG2N", 16))
N = 1 << LOG2N


def timeit(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    pts = z.EdwardsPoint.basepoint_mul(z.Scalar.random(k1, (N,)))
    scalars = z.Scalar.random(k2, (N,))
    windows = scalars.windows(8, 32)
    pt = pts._tuple()
    digits = windows[:, 0]
    print(json.dumps({"n": N, "platform": jax.devices()[0].platform}), flush=True)

    t = timeit(jax.jit(jnp.argsort), digits)
    print(json.dumps({"stage": "argsort", "s": round(t, 4)}), flush=True)

    order = jnp.argsort(digits)

    @jax.jit
    def gather(pt, order):
        return tuple(c[order] for c in pt)

    t = timeit(gather, pt, order)
    print(json.dumps({"stage": "gather_points", "s": round(t, 4)}), flush=True)

    p_sorted = gather(pt, order)
    d_sorted = digits[order]
    starts = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (d_sorted[1:] != d_sorted[:-1]).astype(jnp.int32)])

    t = timeit(jax.jit(M._segmented_scan_points), p_sorted, starts)
    print(json.dumps({"stage": "segmented_scan", "s": round(t, 4),
                      "rounds": max(1, (N - 1).bit_length())}), flush=True)

    @jax.jit
    def scatter(summed, d_sorted):
        ends = jnp.concatenate([(d_sorted[1:] != d_sorted[:-1]),
                                jnp.ones((1,), bool)])
        idx = jnp.where(ends, d_sorted, 256)
        return tuple(
            jnp.zeros((257, 22), jnp.int32).at[:, 0].set(i0).at[idx].set(c)[:256]
            for c, i0 in zip(summed, (0, 1, 1, 0)))

    summed = M._segmented_scan_points(p_sorted, starts)
    t = timeit(scatter, summed, d_sorted)
    print(json.dumps({"stage": "scatter_buckets", "s": round(t, 4)}), flush=True)

    t = timeit(lambda: M._window_buckets(pt, digits, 256))
    print(json.dumps({"stage": "window_total", "s": round(t, 4)}), flush=True)

    tables = tuple(jnp.stack([c] * 32) for c in scatter(summed, d_sorted))
    t = timeit(lambda: M._combine_windows(tables, 8, 256))
    print(json.dumps({"stage": "combine_windows", "s": round(t, 4)}), flush=True)

    # raw N-wide EC add for reference
    t = timeit(jax.jit(lambda p: _ed._add(p, p)), pt)
    print(json.dumps({"stage": "one_nwide_add", "s": round(t, 5)}), flush=True)


if __name__ == "__main__":
    main()
