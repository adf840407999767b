#!/usr/bin/env python
"""Window-width sweep of the SORT+SCAN MSM path at scale (VERDICT r3
item 9): auto_c's 2^18/2^20 thresholds were extrapolated from point
measurements; this records the actual c sweep.  (The dense VMEM kernel
is the production TPU path since r4; the scan path remains the CPU
default and the dense path's cross-check, so its auto_c still matters.)

Usage: python benchmarks/msm_scan_sweep.py [log2n] [c ...]
       default: 18 at c in {12, 14, 16}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

import zerocaf_tpu as z
from zerocaf_tpu import EdwardsPoint, RistrettoPoint, Scalar
from zerocaf_tpu.parallel import msm as msm_fn


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    cs = [int(a) for a in sys.argv[2:]] or [12, 14, 16]
    n = 1 << log2n
    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    pts = EdwardsPoint.basepoint_mul(Scalar.random(k1, (n,)))
    sc = Scalar.random(k2, (n,))
    jax.block_until_ready(pts.X)
    print(json.dumps({"n": n, "platform": jax.devices()[0].platform,
                      "path": "scan (dense=False)"}), flush=True)
    ref = None
    for c in cs:
        def run():
            out = msm_fn(pts, sc, c=c, dense=False)
            return bytes(np.asarray(RistrettoPoint(out).compress()).tolist())
        t0 = time.perf_counter()
        enc = run()
        first = time.perf_counter() - t0
        if ref is None:
            ref = enc
        assert enc == ref, f"c={c} differs"
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        t = sorted(ts)[len(ts) // 2]
        print(json.dumps({"c": c, "wall_s": round(t, 3),
                          "first_s": round(first, 1),
                          "points_per_s": round(n / t, 1)}), flush=True)


if __name__ == "__main__":
    main()
