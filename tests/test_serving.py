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


def test_pipeline_overlap_correctness():
    """Engine.pipeline (double-buffered serving, VERDICT r4 item 4):
    results come back in submission order, bit-identical to sequential
    calls, with never more than `depth` batches in flight."""
    eng = Engine(batch=4, donate=False)
    inputs = [rng.integers(0, 256, (4, 64), dtype=np.uint8)
              for _ in range(5)]
    seq = [np.asarray(eng.hash_to_group(jnp.asarray(b))) for b in inputs]

    pipe = eng.pipeline("hash_to_group", depth=2)
    got = []
    for i, b in enumerate(inputs):
        done = pipe.submit(jnp.asarray(b))
        assert len(pipe) <= 2
        assert (done is None) == (i < 2)  # fills to depth before yielding
        if done is not None:
            got.append(done)
    got.extend(pipe.drain())
    assert len(pipe) == 0 and len(got) == 5
    for a, b in zip(got, seq):
        assert (a == b).all()


def test_pipeline_map_and_validation():
    import pytest

    eng = Engine(batch=2, donate=False)
    with pytest.raises(ValueError):
        eng.pipeline("keygen", depth=0)
    pipe = eng.pipeline("keygen", depth=2)
    with pytest.raises(RuntimeError):
        pipe.collect()  # nothing submitted

    ins = [rng.integers(0, 256, (2, 64), dtype=np.uint8) for _ in range(3)]
    seq = [tuple(np.asarray(x) for x in eng.keygen(jnp.asarray(b)))
           for b in ins]
    outs = list(pipe.map((jnp.asarray(b),) for b in ins))
    assert len(outs) == 3
    for (sk_a, pk_a), (sk_b, pk_b) in zip(outs, seq):
        assert (sk_a == sk_b).all() and (pk_a == pk_b).all()


def test_msm_dense_branch_interpret():
    """Engine.msm's production TPU branch (dense VMEM bucket kernel),
    forced off-TPU via dense=True -> interpret mode: the fast CI coverage
    for serving.py's dense route (VERDICT r4 items 7/8)."""
    eng = Engine(batch=8, donate=False)
    seeds = rng.integers(0, 256, (8, 64), dtype=np.uint8)
    sk, pk = eng.keygen(jnp.asarray(seeds))
    sc = rng.integers(0, 256, (8, 32), dtype=np.uint8)
    sc[:, 31] &= 0x03
    wire_d, ok_d = eng.msm(pk, jnp.asarray(sc), c=4, dense=True)
    assert bool(ok_d)
    acc = o.IDENTITY
    for i in range(8):
        k_i = int.from_bytes(seeds[i].tobytes(), "little") % o.R
        s_i = int.from_bytes(sc[i].tobytes(), "little") % o.R
        acc = o.point_add(acc, o.scalar_mul(o.BASEPOINT, k_i * s_i % o.R))
    assert np.asarray(wire_d).tobytes() == o.ristretto_compress(acc)
    assert "msm_dense_c4" in eng.compiled()


def test_pad_batch():
    a = np.ones((3, 32), np.uint8)
    p, n = pad_batch(a, 8)
    assert p.shape == (8, 32) and n == 3 and (p[3:] == 0).all()


def test_msm_pinned_batch_and_caching():
    """Engine.msm enforces the pinned batch, caches its per-c stages (no
    new pipelines on a second call), and pad_msm padding is sum-neutral."""
    import pytest

    from zerocaf_tpu.serving import pad_msm

    eng = Engine(batch=8, donate=False)
    seeds = rng.integers(0, 256, (5, 64), dtype=np.uint8)
    seeds8 = np.concatenate([seeds, np.zeros((3, 64), np.uint8)])
    _, pk8 = eng.keygen(jnp.asarray(seeds8))
    pk = np.asarray(pk8)[:5]
    sc = rng.integers(0, 256, (5, 32), dtype=np.uint8)
    sc[:, 31] &= 0x03

    with pytest.raises(ValueError):
        eng.msm(jnp.asarray(pk), jnp.asarray(sc), c=4)  # ragged batch

    pw, sw, n = pad_msm(pk, sc, 8)
    assert n == 5
    wire, ok = eng.msm(jnp.asarray(pw), jnp.asarray(sw), c=4)
    assert bool(ok)
    compiled_after_first = set(eng.compiled())
    assert {"msm_decode_c4", "msm_encode_c4"} <= compiled_after_first
    wire2, ok2 = eng.msm(jnp.asarray(pw.copy()), jnp.asarray(sw.copy()), c=4)
    assert set(eng.compiled()) == compiled_after_first  # no new pipelines
    assert (np.asarray(wire) == np.asarray(wire2)).all() and bool(ok2)

    acc = o.IDENTITY
    for i in range(5):
        k_i = int.from_bytes(seeds[i].tobytes(), "little") % o.R
        s_i = int.from_bytes(sc[i].tobytes(), "little") % o.R
        acc = o.point_add(acc, o.scalar_mul(o.BASEPOINT, k_i * s_i % o.R))
    assert np.asarray(wire).tobytes() == o.ristretto_compress(acc)
