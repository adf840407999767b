#!/usr/bin/env python
"""Single-device MSM wall-time bench (BASELINE.json config 4).

Times sum(k_i * P_i) for N points on whatever jax.devices() provides, using
the graph-split Pippenger path (three small jit graphs; see parallel/msm.py).
Correctness is gated at small N against the pure-Python oracle; larger N are
gated by internal consistency (c=8 vs c=6 window widths must agree
bit-exactly after Ristretto compression).

Usage: python benchmarks/msm_bench.py [--log2n 18] [--cpu] [--iters 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2n", type=int, default=16)
    ap.add_argument("--c", type=int, default=0,
                    help="window width; 0 = auto (parallel/msm.auto_c)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--verify-oracle", type=int, default=0,
                    help="also verify vs python oracle on this many points")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import numpy as np

    import zerocaf_tpu as z
    from zerocaf_tpu.parallel import msm

    n = 1 << args.log2n
    # c=0 (default): let msm route -- dense VMEM kernel at auto_c_dense on
    # TPU, sort+scan at auto_c otherwise.  The cross-check below always
    # runs the OTHER implementation, so every bench run is also a
    # dense-vs-scan bit-exactness gate.
    c_arg = None if args.c == 0 else args.c
    key = jax.random.PRNGKey(42)
    k1, k2 = jax.random.split(key)
    print(json.dumps({"devices": [str(d) for d in jax.devices()], "n": n}),
          flush=True)

    t0 = time.perf_counter()
    pts = z.EdwardsPoint.basepoint_mul(z.Scalar.random(k1, (n,)))
    scalars = z.Scalar.random(k2, (n,))
    jax.block_until_ready(pts.X)
    print(json.dumps({"setup_s": round(time.perf_counter() - t0, 3)}), flush=True)

    if args.verify_oracle:
        import zerocaf_tpu.oracle as o
        m = args.verify_oracle
        got = msm(pts[:m], scalars[:m], c=c_arg)
        ks = [int(v) for v in scalars[:m].to_ints()]
        pa = pts[:m].to_ints()
        exp = o.IDENTITY
        for i in range(m):
            exp = o.point_add(exp, o.scalar_mul(
                (int(pa[0][i]), int(pa[1][i]), int(pa[2][i]), int(pa[3][i])), ks[i]))
        assert o.point_eq(tuple(int(c[()] if hasattr(c, 'shape') else c)
                                for c in got.to_ints()), exp)
        print(json.dumps({"oracle_verified_points": m}), flush=True)

    def run(c, **kw):
        out = msm(pts, scalars, c=c, **kw)
        return bytes(np.asarray(z.RistrettoPoint(out).compress()).tolist())

    # compile + consistency gate: the production route vs the OTHER
    # implementation (dense vs sort+scan) must agree bit-exactly
    t0 = time.perf_counter()
    enc_main = run(c_arg)
    print(json.dumps({"first_run_s": round(time.perf_counter() - t0, 3)}),
          flush=True)
    import jax as _jax
    on_tpu = _jax.default_backend() == "tpu"
    enc_x = run(6, dense=False) if on_tpu else run(6)
    assert enc_main == enc_x, "dense-vs-scan cross-check failed"
    print(json.dumps({"cross_check": "scan c=6 bit-exact",
                      "encoding": enc_main.hex()}), flush=True)

    ts = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        run(c_arg)
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[len(ts) // 2]
    print(json.dumps({"metric": "msm_wall_time", "points": n,
                      "c": c_arg if c_arg is not None else "auto",
                      "wall_s": round(t, 4),
                      "points_per_s": round(n / t, 1),
                      "platform": jax.devices()[0].platform}), flush=True)


if __name__ == "__main__":
    main()
