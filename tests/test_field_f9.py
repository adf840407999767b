"""Differential tests for the f32x29 limb backend (radix 2^9, float32 FMA).

The second entry in the backend registry (ops/limb.BACKENDS) -- the TPU
analogue of the reference's planned-but-absent u32 backend
(/root/reference/src/lib.rs:61-64, backend/mod.rs:9-16).  Same oracle, same
fixtures, different limb geometry: every op must agree bit-exactly with the
pure-Python oracle after canonicalization.

Measured on TPU v5e (benchmarks/probe_f9.py): f9 mul 10.6 ns vs i32 4.3 ns
at 2^16 lanes -- the int32+MXU-fold backend stays the default; this backend
exists for registry completeness and as the f32-exactness reference.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zerocaf_tpu.ops import limb as l
from zerocaf_tpu import oracle as o

RNG = np.random.default_rng(1234)
N = 32


def _rand_ints(n, bound):
    return [int.from_bytes(RNG.bytes(32), "little") % bound for _ in range(n)]


def _to_arr(vals, spec):
    return jnp.asarray(np.stack(
        [o.int_to_limbs(v, n=spec.nlimbs, w=spec.wbits) for v in vals]
    ).astype(spec.np_dtype))


def _to_ints(arr, spec):
    a = np.asarray(arr).astype(np.int64)
    return [o.limbs_to_int(a[i], w=spec.wbits) for i in range(a.shape[0])]


SPECS = [(l.FIELD_F9, o.P), (l.SCALAR_F9, o.R)]


@pytest.mark.parametrize("spec,mod", SPECS, ids=[s.name for s, _ in SPECS])
def test_ring_ops(spec, mod):
    xs, ys = _rand_ints(N, mod), _rand_ints(N, mod)
    X, Y = _to_arr(xs, spec), _to_arr(ys, spec)
    assert _to_ints(l.canonical(l.mul(X, Y, spec), spec), spec) == \
        [a * b % mod for a, b in zip(xs, ys)]
    assert _to_ints(l.canonical(l.square(X, spec), spec), spec) == \
        [a * a % mod for a in xs]
    assert _to_ints(l.canonical(l.add(X, Y), spec), spec) == \
        [(a + b) % mod for a, b in zip(xs, ys)]
    assert _to_ints(l.canonical(l.sub(X, Y), spec), spec) == \
        [(a - b) % mod for a, b in zip(xs, ys)]
    assert _to_ints(l.canonical(l.neg(X), spec), spec) == \
        [(-a) % mod for a in xs]


@pytest.mark.parametrize("spec,mod", SPECS, ids=[s.name for s, _ in SPECS])
def test_mul_chain_stays_semi(spec, mod):
    """Chained muls + adds never leave the semi-reduced envelope."""
    xs, ys = _rand_ints(N, mod), _rand_ints(N, mod)
    X, Y = _to_arr(xs, spec), _to_arr(ys, spec)
    acc, want = X, list(xs)
    for _ in range(5):
        acc = l.mul(l.add(acc, X), Y, spec)
        want = [(a + x) * y % mod for a, x, y in zip(want, xs, ys)]
        lim = np.asarray(acc)
        assert np.abs(lim).max() < (1 << 17)
    assert _to_ints(l.canonical(acc, spec), spec) == want


@pytest.mark.parametrize("spec,mod", SPECS, ids=[s.name for s, _ in SPECS])
def test_bytes_roundtrip_and_raw_decode(spec, mod):
    xs = _rand_ints(N, mod)
    X = _to_arr(xs, spec)
    got = np.asarray(l.to_bytes(X, spec))
    assert [got[i].tobytes() for i in range(N)] == \
        [v.to_bytes(32, "little") for v in xs]
    raw = RNG.integers(0, 256, (N, 32), dtype=np.uint8)
    E = l.from_bytes(jnp.asarray(raw), spec)
    assert _to_ints(l.canonical(E, spec), spec) == \
        [int.from_bytes(raw[i].tobytes(), "little") % mod for i in range(N)]


@pytest.mark.parametrize("spec,mod", SPECS, ids=[s.name for s, _ in SPECS])
def test_pow_eq_bits(spec, mod):
    xs = _rand_ints(8, mod)
    X = _to_arr(xs, spec)
    assert _to_ints(l.canonical(l.pow_const(X, 65537, spec), spec), spec) == \
        [pow(a, 65537, mod) for a in xs]
    assert bool(jnp.all(l.eq(X, X, spec)))
    assert not bool(jnp.any(l.eq(X, l.add(X, l.from_int(1, spec)), spec)))
    bits = np.asarray(l.to_bits(X, spec, 256))
    want = [[(v >> i) & 1 for i in range(256)] for v in xs]
    assert bits.tolist() == want


def test_cross_backend_agreement():
    """i32x22 and f32x29 produce identical canonical bytes on the same ops."""
    xs, ys = _rand_ints(N, o.P), _rand_ints(N, o.P)
    for (s1, s2) in ((l.FIELD, l.FIELD_F9), (l.SCALAR, l.SCALAR_F9)):
        X1, Y1 = _to_arr(xs, s1), _to_arr(ys, s1)
        X2, Y2 = _to_arr(xs, s2), _to_arr(ys, s2)
        b1 = np.asarray(l.to_bytes(l.mul(X1, Y1, s1), s1))
        b2 = np.asarray(l.to_bytes(l.mul(X2, Y2, s2), s2))
        assert (b1 == b2).all()
