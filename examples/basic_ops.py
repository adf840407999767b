#!/usr/bin/env python
"""Basic usage example: batched G*k on TPU (the analogue of the reference's
examples/basic_ops.rs:19-64, but over a whole lane of scalars at once).

Run:  python examples/basic_ops.py           (TPU if available)
      JAX_PLATFORMS=cpu python examples/basic_ops.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from zerocaf_tpu import EdwardsPoint, RistrettoPoint, Scalar


def main():
    key = jax.random.PRNGKey(0)
    batch = 64

    # Generate a lane of random scalars over the subgroup field
    # (examples/basic_ops.rs:49-64 does one at a time with thread_rng).
    k = Scalar.random(key, (batch,))
    print("scalars:", k)

    # G*k, batched: the fixed double-and-add ladder runs once for all lanes.
    G = EdwardsPoint.basepoint((batch,))
    P = G * k
    print("points:", P)

    # Ristretto wire encoding of every result.
    wire = np.asarray(RistrettoPoint(P).compress())
    print("first three encodings:")
    for row in wire[:3]:
        print(" ", bytes(row).hex())

    # Round-trip check.
    back, ok = RistrettoPoint.decompress(wire)
    assert np.asarray(ok).all()
    assert np.asarray(back.eq(RistrettoPoint(P))).all()
    print(f"all {batch} encodings round-trip OK")


if __name__ == "__main__":
    main()
