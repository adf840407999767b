"""Serving-engine tests: wire-level pipelines vs the oracle."""

import numpy as np
import jax.numpy as jnp

from zerocaf_tpu import oracle as o
from zerocaf_tpu.serving import Engine, pad_batch

rng = np.random.default_rng(99)


def test_keygen_dh_roundtrip():
    eng = Engine(batch=8, donate=False)
    seeds = rng.integers(0, 256, (8, 64), dtype=np.uint8)
    sk, pk = eng.keygen(jnp.asarray(seeds))
    sk, pk = np.asarray(sk), np.asarray(pk)
    # oracle agreement on every lane
    for i in range(8):
        v = int.from_bytes(seeds[i].tobytes(), "little") % o.R
        assert sk[i].tobytes() == v.to_bytes(32, "little")
        assert pk[i].tobytes() == o.ristretto_compress(
            o.scalar_mul(o.BASEPOINT, v))

    # ECDH: both sides derive the same shared wire bytes
    seeds_b = rng.integers(0, 256, (8, 64), dtype=np.uint8)
    sk_b, pk_b = eng.keygen(jnp.asarray(seeds_b))
    s1, ok1 = eng.dh(jnp.asarray(sk), jnp.asarray(pk_b))
    s2, ok2 = eng.dh(jnp.asarray(np.asarray(sk_b)), jnp.asarray(pk))
    assert bool(jnp.all(ok1)) and bool(jnp.all(ok2))
    assert (np.asarray(s1) == np.asarray(s2)).all()


def test_dh_rejects_invalid_peer():
    eng = Engine(batch=4, donate=False)
    seeds = rng.integers(0, 256, (4, 64), dtype=np.uint8)
    sk, pk = eng.keygen(jnp.asarray(seeds))
    bad = np.asarray(pk).copy()
    bad[1] = 0xFF  # non-canonical field encoding
    _, ok = eng.dh(sk, jnp.asarray(bad))
    ok = np.asarray(ok)
    assert ok[0] and not ok[1]


def test_hash_to_group_matches_oracle():
    eng = Engine(batch=4, donate=False)
    b = rng.integers(0, 256, (4, 64), dtype=np.uint8)
    wire = np.asarray(eng.hash_to_group(jnp.asarray(b)))
    for i in range(4):
        want = o.ristretto_compress(o.from_uniform_bytes(b[i].tobytes()))
        assert wire[i].tobytes() == want


def test_msm_pipeline():
    eng = Engine(batch=8, donate=False)
    seeds = rng.integers(0, 256, (8, 64), dtype=np.uint8)
    sk, pk = eng.keygen(jnp.asarray(seeds))
    sc = rng.integers(0, 256, (8, 32), dtype=np.uint8)
    sc[:, 31] &= 0x03  # keep scalars canonical
    wire, ok = eng.msm(pk, jnp.asarray(sc), c=4)
    assert bool(ok)
    total = 0
    acc = o.IDENTITY
    for i in range(8):
        k_i = int.from_bytes(seeds[i].tobytes(), "little") % o.R
        s_i = int.from_bytes(sc[i].tobytes(), "little") % o.R
        acc = o.point_add(acc, o.scalar_mul(o.BASEPOINT, k_i * s_i % o.R))
    assert np.asarray(wire).tobytes() == o.ristretto_compress(acc)


def test_pad_batch():
    a = np.ones((3, 32), np.uint8)
    p, n = pad_batch(a, 8)
    assert p.shape == (8, 32) and n == 3 and (p[3:] == 0).all()
