#!/usr/bin/env python
"""Benchmark driver: batched Sonny-curve scalar multiplications per second
per chip (the BASELINE.json headline metric), plus secondary kernel metrics.

Prints ONE JSON line:
  {"metric": "scalar_mults_per_sec_per_chip", "value": N, "unit": "ops/s",
   "vs_baseline": N / 1e7, ...extras}

Runs on whatever jax.devices() provides (TPU under the driver; CPU locally
with JAX_PLATFORMS=cpu).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zerocaf_tpu import constants as C
    from zerocaf_tpu.models import edwards as ed
    from zerocaf_tpu.models import ristretto as ri
    from zerocaf_tpu.ops import limb as l

    dev = jax.devices()[0]
    platform = dev.platform
    batch = int(os.environ.get("BENCH_BATCH", "4096" if platform != "cpu" else "1024"))
    rng = np.random.default_rng(0)

    def timeit(fn, *args, iters=5, warmup=2):
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    # --- headline: batched variable-base scalar-mul (4-bit fixed windows)
    base = jnp.asarray(np.broadcast_to(C.BASEPOINT.astype(np.int32),
                                       (batch, 4, 22)).copy())
    bits = jnp.asarray(rng.integers(0, 2, size=(batch, 250)).astype(np.int32))
    win4 = jnp.asarray(rng.integers(0, 16, size=(batch, 63)).astype(np.int32))
    win8 = jnp.asarray(rng.integers(0, 256, size=(batch, 32)).astype(np.int32))
    pt = tuple(base[:, i] for i in range(4))

    smul = jax.jit(lambda p, w: ed._scalar_mul_windowed(p, w, 4))
    t_smul = timeit(smul, pt, win4)
    scalar_mults_per_sec = batch / t_smul

    ladder = jax.jit(lambda p, b: ed._scalar_mul(p, b))
    t_ladder = timeit(ladder, pt, bits)

    fixed = jax.jit(lambda w: ed._fixed_base_mul(w))
    t_fixed = timeit(fixed, win8)

    # --- secondary: field mul throughput (2^16 lanes)
    fb = 1 << 16
    A = jnp.asarray(rng.integers(0, 4096, size=(fb, 22)).astype(np.int32))
    B = jnp.asarray(rng.integers(0, 4096, size=(fb, 22)).astype(np.int32))
    fmul = jax.jit(lambda a, b: l.mul(a, b, l.FIELD))
    t_fmul = timeit(fmul, A, B)
    field_muls_per_sec = fb / t_fmul

    # --- secondary: ristretto encode throughput
    enc = jax.jit(lambda p: ri._compress(p))
    t_enc = timeit(enc, pt)
    encodes_per_sec = batch / t_enc

    result = {
        "metric": "scalar_mults_per_sec_per_chip",
        "value": round(scalar_mults_per_sec, 1),
        "unit": "ops/s",
        "vs_baseline": round(scalar_mults_per_sec / 1e7, 6),
        "platform": platform,
        "batch": batch,
        "field_muls_per_sec": round(field_muls_per_sec, 1),
        "ristretto_encodes_per_sec": round(encodes_per_sec, 1),
        "windowed_ms": round(t_smul * 1e3, 3),
        "ladder_ms": round(t_ladder * 1e3, 3),
        "ladder_mults_per_sec": round(batch / t_ladder, 1),
        "fixed_base_mults_per_sec": round(batch / t_fixed, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
