#!/usr/bin/env python
"""MSM scaling sweep: wall time and scaling efficiency vs mesh size
(BASELINE.json configs 4-5).

On a real pod slice this measures ICI-collective scaling; on a dev host run
it with the virtual CPU mesh to validate the harness:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python benchmarks/scaling.py --cpu --n 4096

Prints one JSON line per mesh size plus a summary with scaling efficiency
(T_1 / (N * T_N)); bit-exactness across mesh sizes is asserted on every run.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 12, help="number of points")
    ap.add_argument("--c", type=int, default=8, help="window bits")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from zerocaf_tpu import EdwardsPoint, Scalar
    from zerocaf_tpu.config import MeshConfig
    from zerocaf_tpu.parallel import batch_sharding, make_mesh, msm_sharded

    ndev_all = len(jax.devices())
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    pts = EdwardsPoint.basepoint_mul(Scalar.random(k1, (args.n,)))
    scalars = Scalar.random(k2, (args.n,))

    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev_all and args.n % d == 0]
    results = []
    ref_enc = None
    for nd in sizes:
        mesh = make_mesh(MeshConfig(n_devices=nd))
        sh = batch_sharding(mesh)
        pts_s = EdwardsPoint(*(jax.device_put(c, sh) for c in pts._tuple()))
        sc_s = Scalar(jax.device_put(scalars.limbs, sh))
        out = msm_sharded(pts_s, sc_s, mesh, c=args.c)  # compile
        jax.block_until_ready(out.X)
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = msm_sharded(pts_s, sc_s, mesh, c=args.c)
            jax.block_until_ready(out.X)
            ts.append(time.perf_counter() - t0)
        t = sorted(ts)[len(ts) // 2]
        enc = bytes(np.asarray(
            __import__("zerocaf_tpu").RistrettoPoint(out).compress()))
        if ref_enc is None:
            ref_enc = enc
        assert enc == ref_enc, f"mesh size {nd} result differs (not bit-exact!)"
        results.append({"devices": nd, "wall_s": round(t, 4),
                        "points": args.n, "window_bits": args.c})
        print(json.dumps(results[-1]))

    if len(results) > 1:
        t1 = results[0]["wall_s"]
        for r in results[1:]:
            r["scaling_efficiency"] = round(t1 / (r["devices"] * r["wall_s"]), 4)
        print(json.dumps({
            "metric": "msm_scaling",
            "bit_exact_across_meshes": True,
            "sweep": results,
        }))


if __name__ == "__main__":
    main()
