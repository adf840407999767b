#!/usr/bin/env python
"""Dense-MSM diagnostic on real hardware: correctness vs the scan path at
small N, then a (c, N) wall-time sweep of the dense kernel.

Usage: python benchmarks/diag_msm_dense.py [log2n ...] (default: 14)
Env: DIAG_CS="5,6" window widths to sweep; DIAG_K=<k> routes the
k-window grouped kernel explicitly (k=2 paired, k=1 single-window;
default: the production msm() routing, i.e. DENSE_K); DIAG_PR=<r>
sets the lane-reduce pallas_rounds (grouped path only).
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
from zerocaf_tpu import EdwardsPoint, RistrettoPoint, Scalar
from zerocaf_tpu.parallel import msm as msm_fn
import importlib
M = importlib.import_module("zerocaf_tpu.parallel.msm")
K = int(os.environ["DIAG_K"]) if os.environ.get("DIAG_K") else None
PR = int(os.environ.get("DIAG_PR", "1"))
FOLD = int(os.environ.get("DIAG_FOLD", str(M.DENSE_FOLD)))


def run_msm(pts, sc, c):
    if K is not None:
        nwin = -(-251 // c)
        kw = {"fold": FOLD} if K >= 3 else {}
        return EdwardsPoint(*M._msm_dense(
            pts._tuple(), sc.windows(c, nwin), c, nwin, k=K,
            pallas_rounds=PR, **kw))
    return msm_fn(pts, sc, c=c, dense=True)


def enc(p):
    return bytes(np.asarray(RistrettoPoint(p).compress()).tolist()).hex()


def main():
    log2ns = [int(a) for a in sys.argv[1:]] or [14]
    cs = [int(x) for x in os.environ.get("DIAG_CS", "5,6").split(",")]
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)

    # correctness: dense vs scan on the device (small N, fresh compile)
    n0 = 2048
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    pts = EdwardsPoint.basepoint_mul(Scalar.random(k1, (n0,)))
    sc = Scalar.random(k2, (n0,))
    t0 = time.perf_counter()
    e_scan = enc(msm_fn(pts, sc, c=8, dense=False))
    print(json.dumps({"scan_c8_s": round(time.perf_counter() - t0, 2)}),
          flush=True)
    for c in cs:
        t0 = time.perf_counter()
        e_dense = enc(run_msm(pts, sc, c))
        ok = e_dense == e_scan
        print(json.dumps({"dense_c": c, "n": n0, "bit_exact_vs_scan": ok,
                          "first_run_s": round(time.perf_counter() - t0, 2)}),
              flush=True)
        assert ok, (c, e_dense, e_scan)

    for log2n in log2ns:
        n = 1 << log2n
        k1, k2 = jax.random.split(jax.random.PRNGKey(40 + log2n))
        pts = EdwardsPoint.basepoint_mul(Scalar.random(k1, (n,)))
        sc = Scalar.random(k2, (n,))
        jax.block_until_ready(pts.X)
        for c in cs:
            def run():
                out = run_msm(pts, sc, c)
                np.asarray(out.X[0])
                return out
            t0 = time.perf_counter()
            run()
            first = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                run()
                ts.append(time.perf_counter() - t0)
            t = sorted(ts)[len(ts) // 2]
            print(json.dumps({"n": n, "c": c, "k": K, "pr": PR, "fold": FOLD,
                              "wall_s": round(t, 4),
                              "points_per_s": round(n / t, 1),
                              "first_s": round(first, 2)}), flush=True)


if __name__ == "__main__":
    main()
