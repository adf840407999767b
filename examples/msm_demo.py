#!/usr/bin/env python
"""Multi-scalar multiplication demo: Pippenger on one device, then sharded
over a mesh (BASELINE.json configs 3-5).

Run:  python examples/msm_demo.py
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python examples/msm_demo.py   # fake 8-chip mesh
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from zerocaf_tpu import EdwardsPoint, RistrettoPoint, Scalar
from zerocaf_tpu.config import MeshConfig
from zerocaf_tpu.parallel import batch_sharding, make_mesh, msm, msm_sharded


def main():
    n = int(os.environ.get("MSM_N", "1024"))
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)

    pts = EdwardsPoint.basepoint((n,)) * Scalar.random(k1, (n,))
    scalars = Scalar.random(k2, (n,))

    t0 = time.time()
    total = msm(pts, scalars, c=8)
    total.X.block_until_ready()
    print(f"single-device MSM of {n} points: {time.time()-t0:.2f}s (incl. compile)")
    print("result:", bytes(np.asarray(RistrettoPoint(total).compress())).hex())

    ndev = len(jax.devices())
    if ndev > 1 and n % ndev == 0:
        mesh = make_mesh(MeshConfig(n_devices=ndev))
        sh = batch_sharding(mesh)
        pts_s = EdwardsPoint(*(jax.device_put(c, sh) for c in pts._tuple()))
        sc_s = Scalar(jax.device_put(scalars.limbs, sh))
        t0 = time.time()
        total_s = msm_sharded(pts_s, sc_s, mesh, c=8)
        total_s.X.block_until_ready()
        print(f"{ndev}-device sharded MSM: {time.time()-t0:.2f}s (incl. compile)")
        same = (np.asarray(total.compress()) == np.asarray(total_s.compress())).all()
        print("bit-exact vs single device:", bool(same))


if __name__ == "__main__":
    main()
