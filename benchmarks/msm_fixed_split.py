#!/usr/bin/env python
"""Split the dense-MSM fixed term honestly: time the FULL _msm_dense
graph vs the TABLES-ONLY graph (_msm_dense_tables) at the same N --
both are real dispatched graphs, so their difference isolates the
combine (+ Horner) cost without single-dispatch stage timing (which is
dispatch-floor-limited on this rig, BASELINE.md).

Usage: python benchmarks/msm_fixed_split.py [log2n] (default 16)
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

import zerocaf_tpu as z
from zerocaf_tpu import EdwardsPoint, Scalar
import importlib

M = importlib.import_module("zerocaf_tpu.parallel.msm")


def timeit(fn, iters=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(jax.tree_util.tree_leaves(fn())[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])[..., :1]
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = 1 << log2n
    c = M.auto_c_dense(n)
    nwin = -(-251 // c)
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    pts = EdwardsPoint.basepoint_mul(Scalar.random(k1, (n,)))
    sc = Scalar.random(k2, (n,))
    windows = sc.windows(c, nwin)
    pt = pts._tuple()
    jax.block_until_ready(pt[0])

    k = int(os.environ.get("SPLIT_K", str(M.DENSE_K)))
    if k >= 3:
        tab_fn = lambda p, w: M._msm_dense_tables_k(p, w, c, nwin, k=k)
    elif k == 2:
        tab_fn = lambda p, w: M._msm_dense_tables_paired(p, w, c, nwin)
    else:
        tab_fn = lambda p, w: M._msm_dense_tables(p, w, c, nwin)
    tables_only = jax.jit(tab_fn)
    t_tab = timeit(lambda: tables_only(pt, windows))
    t_full = timeit(lambda: M._msm_dense(pt, windows, c, nwin, k=k))
    print(json.dumps({
        "n": n, "c": c, "nwin": nwin, "k": k,
        "platform": jax.devices()[0].platform,
        "tables_only_s": round(t_tab, 4),
        "full_s": round(t_full, 4),
        "combine_s": round(t_full - t_tab, 4),
        "note": "combine_s = window combine + Horner (the shard_combine "
                "target); tables_only still carries kernel+reduce tails",
    }), flush=True)


if __name__ == "__main__":
    main()
