#!/usr/bin/env python
"""Criterion-equivalent microbenchmark suite (reference C12:
/root/reference/benchmarks/dusk_benchmarks.rs).

Covers the same groups -- field ops (:36-120), scalar ops (:139-216),
extended/projective point ops (:301-387), compression (:389-403), ristretto
ops+protocol (:418-484), scalar-mul algorithm comparison (:520-557), and the
ECDH macro-benchmark (:559-620) -- but batched: each op is timed over a lane
of B elements, reporting both latency per batch and throughput per second
per chip.

Run:  python benchmarks/microbench.py [--batch 4096] [--json out.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from zerocaf_tpu import constants as Cst
    from zerocaf_tpu.models import edwards as ed
    from zerocaf_tpu.models import ristretto as ri
    from zerocaf_tpu.ops import inv_sqrt as isq
    from zerocaf_tpu.ops import limb as l

    platform = jax.devices()[0].platform
    B = args.batch or (4096 if platform != "cpu" else 512)
    rng = np.random.default_rng(0)

    def timeit(fn, *xs, iters=5, warmup=2):
        f = jax.jit(fn)
        for _ in range(warmup):
            jax.block_until_ready(f(*xs))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*xs))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    results = {}

    def bench(name, fn, *xs, per=1):
        t = timeit(fn, *xs)
        results[name] = {"batch_ms": round(t * 1e3, 4),
                         "ops_per_sec": round(B * per / t, 1)}
        print(f"{name:34s} {t*1e3:10.3f} ms/batch   {B*per/t:14.0f} ops/s")

    A = jnp.asarray(rng.integers(0, 4096, (B, 22)).astype(np.int32))
    Bb = jnp.asarray(rng.integers(0, 4096, (B, 22)).astype(np.int32))
    bits = jnp.asarray(rng.integers(0, 2, (B, 250)).astype(np.int32))
    base = jnp.asarray(np.broadcast_to(Cst.BASEPOINT.astype(np.int32),
                                       (B, 4, 22)).copy())
    pt = tuple(base[:, i] for i in range(4))

    print(f"platform={platform} batch={B}")
    print("--- field ops (dusk_benchmarks.rs:36-120) ---")
    bench("field_add", lambda a, b: l.add(a, b), A, Bb)
    bench("field_sub", lambda a, b: l.sub(a, b), A, Bb)
    bench("field_mul", lambda a, b: l.mul(a, b, l.FIELD), A, Bb)
    bench("field_square", lambda a: l.square(a, l.FIELD), A)
    bench("field_pow(const p-2)=inverse", isq.inverse, A)
    bench("field_legendre", isq.legendre_is_qr, A)
    bench("field_mod_sqrt", lambda a: isq.sqrt_raw(a)[1], A)
    bench("field_inv_sqrt", lambda a: isq.inv_sqrt(a)[1], A)
    bench("field_sqrt_ratio_i", lambda a, b: isq.sqrt_ratio_i(a, b)[1], A, Bb)
    bench("field_to_bytes", lambda a: l.to_bytes(a, l.FIELD), A)

    print("--- scalar ops (:139-216) ---")
    bench("scalar_add", lambda a, b: l.add(a, b), A, Bb)
    bench("scalar_mul", lambda a, b: l.mul(a, b, l.SCALAR), A, Bb)
    bench("scalar_square", lambda a: l.square(a, l.SCALAR), A)
    bench("scalar_canonical", lambda a: l.canonical(a, l.SCALAR), A)
    bench("scalar_to_bits", lambda a: l.to_bits(a, l.SCALAR, 250), A)

    print("--- point ops (:301-403) ---")
    bench("edwards_add", lambda p: ed._add(p, p)[0], pt)
    bench("edwards_double", lambda p: ed._double(p)[0], pt)
    bench("edwards_scalar_mul(ladder)", lambda p, b: ed._scalar_mul(p, b)[0], pt, bits)
    bench("edwards_compress", lambda p: ed._compress(p), pt)

    print("--- ristretto (:418-484) ---")
    bench("ristretto_encode", lambda p: ri._compress(p), pt)
    enc = jax.jit(ri._compress)(pt)
    bench("ristretto_decode", lambda b: ri._decompress(b)[0][0], enc)
    bench("ristretto_elligator", lambda a: ri._elligator(a)[0], A)
    bench("ristretto_eq", lambda p: ri._ristretto_eq(p, p), pt)

    print("--- ECDH end-to-end (:559-620) ---")
    def ecdh(bits_a, bits_b):
        # keygen both parties + both shared secrets, batched
        pka = ed._scalar_mul(pt, bits_a)
        pkb = ed._scalar_mul(pt, bits_b)
        sa = ed._scalar_mul(pkb, bits_a)
        sb = ed._scalar_mul(pka, bits_b)
        return ri._compress(sa), ri._compress(sb)
    bits2 = jnp.asarray(rng.integers(0, 2, (B, 250)).astype(np.int32))
    bench("ecdh_full(4 ladders+2 encodes)", lambda a, b: ecdh(a, b)[0], bits, bits2)

    # roofline accounting: static cost model vs measured rates
    from zerocaf_tpu.utils import profiling as prof

    print("--- roofline accounting (utils/profiling.KernelCost) ---")
    print(prof.report())
    fm = results.get("field_mul")
    if fm and fm.get("ops_per_sec"):
        # implied VPU int-op rate = model ops/mul * measured muls/s
        gops = prof.FIELD_MUL.int_ops * fm["ops_per_sec"] / 1e9
        print(f"implied VPU int-op rate from field_mul: {gops:.1f} Gops/s "
              f"(model {prof.FIELD_MUL.int_ops} ops/mul)")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"platform": platform, "batch": B, "results": results}, f,
                      indent=2)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
