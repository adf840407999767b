"""Serving-engine demo: wire-bytes-in / wire-bytes-out pipelines.

Runs the four production workloads through the pinned-batch Engine
(zerocaf_tpu/serving.py): batched keygen, ECDH, hash-to-group, and an MSM
aggregate -- the macro-flows of the reference's ECDH benchmark
(/root/reference/benchmarks/dusk_benchmarks.rs:559-620) at serving shape.

    JAX_PLATFORMS=cpu python examples/serving.py     # quick CPU run
    python examples/serving.py                       # TPU under axon
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from zerocaf_tpu.serving import Engine, pad_msm

BATCH = int(os.environ.get("BATCH", 64))


def main():
    rng = np.random.default_rng(0)
    eng = Engine(batch=BATCH, donate=False)

    # keygen: uniform seeds -> (scalar bytes, Ristretto public keys)
    seeds_a = rng.integers(0, 256, (BATCH, 64), dtype=np.uint8)
    seeds_b = rng.integers(0, 256, (BATCH, 64), dtype=np.uint8)
    sk_a, pk_a = eng.keygen(jnp.asarray(seeds_a))
    sk_b, pk_b = eng.keygen(jnp.asarray(seeds_b))
    print(f"keygen: {BATCH} keypairs; pk[0] = {bytes(np.asarray(pk_a)[0]).hex()[:32]}…")

    # ECDH: both sides derive identical shared wire bytes
    shared_a, ok_a = eng.dh(sk_a, pk_b)
    shared_b, ok_b = eng.dh(sk_b, pk_a)
    assert bool(jnp.all(ok_a)) and bool(jnp.all(ok_b))
    assert (np.asarray(shared_a) == np.asarray(shared_b)).all()
    print(f"dh: {BATCH} shared secrets agree on both sides")

    # hash-to-group (Elligator x2, from_uniform_bytes)
    uni = rng.integers(0, 256, (BATCH, 64), dtype=np.uint8)
    pts = eng.hash_to_group(jnp.asarray(uni))
    print(f"hash_to_group: {BATCH} points; first = {bytes(np.asarray(pts)[0]).hex()[:32]}…")

    # MSM over a ragged request, padded to the engine batch
    n_req = BATCH - 3
    sc = rng.integers(0, 256, (n_req, 32), dtype=np.uint8)
    sc[:, 31] &= 0x03  # canonical scalars
    pw, sw, n_valid = pad_msm(np.asarray(pk_a)[:n_req], sc, BATCH)
    agg, ok = eng.msm(jnp.asarray(pw), jnp.asarray(sw), c=4)
    assert bool(ok)
    print(f"msm: aggregated {n_valid} (point, scalar) pairs -> "
          f"{bytes(np.asarray(agg)).hex()[:32]}…")
    print("compiled pipelines:", ", ".join(eng.compiled()))


if __name__ == "__main__":
    main()
