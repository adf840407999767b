#!/usr/bin/env python
"""Pod-slice MSM harness (BASELINE.json config 5): one command from
multi-host bring-up to the scaling-efficiency table.

The day real multi-host hardware exists, run ON EVERY HOST:

    python tools/pod_msm.py --log2n 20 \
        --coordinator <host0>:8476 --num-processes <H> --process-id <i>

(or rely on the TPU environment's auto-detection and pass no distributed
flags at all -- jax.distributed.initialize() with no arguments).  Until
then, the same script validates the full path on one host:

    # virtual 8-device CPU mesh (what CI runs; see tests/conftest.py)
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/pod_msm.py --cpu --log2n 14
    # --dense off-TPU runs the kernel INTERPRETED: practical only at tiny
    # sizes (the 2-device pod config is CI-covered in tests/test_sharding)

Flow: distributed init (multi-process only) -> global (hosts*chips) mesh
-> shard points/scalars over the batch axis -> msm_sharded (local
Pippenger per device, one 352-byte partial point all_gathered per device,
local tree-reduce) -> per-mesh-size wall times + scaling efficiency
table, with bit-exactness asserted across every mesh size.

The predicted efficiency for this decomposition is derived in
docs/SCALING.md (per-device ICI payload is ONE extended point = 4 x 22
int32 = 352 bytes; the only non-scaling term is the per-device window
combine).  The >= 85% BASELINE target is expected to hold to hundreds of
devices at 2^20 points -- this harness exists so the claim is one
command away from being a measurement.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2n", type=int, default=20)
    ap.add_argument("--c", type=int, default=0, help="window bits (0=auto)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dense", action="store_true",
                    help="dense VMEM bucket kernel per device (TPU pods)")
    ap.add_argument("--shard-combine", action="store_true",
                    help="window-sharded combine (docs/SCALING.md D>=4 fix)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (multi-host)")
    ap.add_argument("--num-processes", type=int, default=0)
    ap.add_argument("--process-id", type=int, default=-1)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))

    if args.coordinator or args.num_processes:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes or None,
            process_id=args.process_id if args.process_id >= 0 else None)
    elif os.environ.get("POD_AUTO_INIT"):
        jax.distributed.initialize()  # TPU pod auto-detection

    import numpy as np
    from zerocaf_tpu import EdwardsPoint, RistrettoPoint, Scalar
    from zerocaf_tpu.config import MeshConfig
    from zerocaf_tpu.parallel import batch_sharding, make_mesh, msm_sharded
    from zerocaf_tpu.parallel.msm import auto_c

    from zerocaf_tpu.parallel.msm import auto_c_dense
    n = 1 << args.log2n
    c = args.c or (auto_c_dense(n) if args.dense else auto_c(n))
    ndev = len(jax.devices())
    pid = jax.process_index()
    if pid == 0:
        print(json.dumps({"n": n, "c": c, "n_devices": ndev,
                          "n_processes": jax.process_count(),
                          "platform": jax.devices()[0].platform}), flush=True)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    pts = EdwardsPoint.basepoint_mul(Scalar.random(k1, (n,)))
    scalars = Scalar.random(k2, (n,))
    jax.block_until_ready(pts.X)

    sizes = [d for d in (1, 2, 4, 8, 16, 32, 64, 128, 256)
             if d <= ndev and n % d == 0]
    if jax.process_count() > 1:
        sizes = [ndev]  # multi-host: the global mesh only
    results = []
    ref_enc = None
    for nd in sizes:
        mesh = make_mesh(MeshConfig(n_devices=nd))
        sh = batch_sharding(mesh)
        pts_s = EdwardsPoint(*(jax.device_put(co, sh) for co in pts._tuple()))
        sc_s = Scalar(jax.device_put(scalars.limbs, sh))
        out = msm_sharded(pts_s, sc_s, mesh, c=c, dense=args.dense,
                          shard_combine=args.shard_combine)  # compile
        enc = bytes(np.asarray(RistrettoPoint(out).compress()).tolist())
        if ref_enc is None:
            ref_enc = enc
        assert enc == ref_enc, f"mesh size {nd}: result differs"
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = msm_sharded(pts_s, sc_s, mesh, c=c, dense=args.dense,
                              shard_combine=args.shard_combine)
            jax.block_until_ready(out.X)
            ts.append(time.perf_counter() - t0)
        t = sorted(ts)[len(ts) // 2]
        results.append((nd, t))
        if pid == 0:
            print(json.dumps({"mesh": nd, "wall_s": round(t, 4),
                              "points_per_s": round(n / t, 1)}), flush=True)

    if pid == 0 and len(results) > 1:
        t1 = results[0][1]
        for nd, t in results[1:]:
            eff = t1 / (nd * t)
            print(json.dumps({"mesh": nd,
                              "scaling_efficiency": round(eff, 4),
                              "note": ("oversubscribed-host artifact, not "
                                       "ICI" if args.cpu else "ICI")}),
                  flush=True)
        print(json.dumps({"bit_exact_across_meshes": True,
                          "encoding": ref_enc.hex()}), flush=True)


if __name__ == "__main__":
    main()
