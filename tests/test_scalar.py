"""Differential tests: batched Scalar kernels vs the oracle
(fixtures from scalar.rs:681-784)."""

import numpy as np
import jax
import jax.numpy as jnp

from zerocaf_tpu import Scalar
from zerocaf_tpu import oracle as o

rng = np.random.default_rng(7)

A = 182687704666362864775460604089535377456991567872
B = 904625697166532776746648320197686575422163851717637391703244652875051672039
X = 1809251394333065553493296640760748560207343510400633813116524750123642650623
Y = 717350576871794411262215878514291949349241575907629849852603275827191647632


def sc(vals):
    return Scalar.from_int(np.array(vals, dtype=object))


def rand_ints(n):
    return [int.from_bytes(rng.bytes(40), "little") % o.R for _ in range(n)]


class TestScalarOps:
    def test_add_sub(self):
        a, b = sc([A, B, B]), sc([B, A, B])
        assert list((a - b).to_ints()) == [o.ssub(A, B), o.ssub(B, A), 0]
        assert list((a + b).to_ints()) == [o.sadd(A, B)] * 2 + [o.sadd(B, B)]

    def test_mul_square_half(self):
        a = sc([X, Y, Y])
        b = sc([Y, Y, X])
        assert list((a * b).to_ints()) == [o.smul(X, Y), o.ssquare(Y), o.smul(X, Y)]
        assert list(a.square().to_ints()) == [o.ssquare(X), o.ssquare(Y), o.ssquare(Y)]
        assert int(sc([Y]).half().to_ints()[0]) == o.shalf(Y)

    def test_mul_random(self):
        xs, ys = rand_ints(64), rand_ints(64)
        got = (sc(xs) * sc(ys)).to_ints()
        assert all(int(g) == o.smul(x, y) for g, x, y in zip(got, xs, ys))

    def test_pow_and_inverse(self):
        assert int(sc([A]).pow(B).to_ints()[0]) == o.spow(A, B)
        inv = sc([X]).inverse()
        assert int((inv * sc([X])).to_ints()[0]) == 1

    def test_neg_eq_zero(self):
        a = sc([A, 0])
        assert list((-a).to_ints()) == [o.sneg(A), 0]
        assert list(np.asarray(a.is_zero())) == [False, True]
        assert np.asarray(a.eq(sc([A + o.R, 5]))).tolist() == [True, False]

    def test_is_even(self):
        # NOTE: the reference's X fixture (scalar.rs:723-730) is >= r; our
        # Scalar canonicalizes, so evenness is of the reduced value.
        expect = [(v % o.R) % 2 == 0 for v in (Y, X, 0, 3)]
        assert np.asarray(sc([Y, X, 0, 3]).is_even()).tolist() == expect

    def test_bytes(self):
        xs = rand_ints(8) + [0, o.R - 1]
        b = np.asarray(sc(xs).to_bytes())
        assert all(bytes(r) == o.scalar_to_bytes(v) for r, v in zip(b, xs))
        back, ok = Scalar.from_bytes(jnp.asarray(b))
        assert np.asarray(ok).all()
        assert list(back.to_ints()) == xs
        # non-canonical bytes flagged
        bad = np.asarray(sc([0]).to_bytes()).copy()
        bad[0] = np.frombuffer((o.R + 3).to_bytes(32, "little"), np.uint8)
        s, ok = Scalar.from_bytes(jnp.asarray(bad))
        assert not bool(np.asarray(ok)[0])
        assert int(s.to_ints()[0]) == 3  # reduced value

    def test_from_bytes_wide(self):
        raw = rng.bytes(64)
        s = Scalar.from_bytes_wide(jnp.asarray(np.frombuffer(raw, np.uint8)))
        assert int(s.to_ints()) == o.scalar_from_bytes_wide(raw)

    def test_into_bits(self):
        bits = np.asarray(sc([9, o.R - 1]).into_bits(250))
        assert bits[0][0] == 1 and bits[0][3] == 1 and bits[0].sum() == 2
        assert bits[1].tolist() == o.scalar_bits(o.R - 1, 250)

    def test_naf_recodings(self):
        s = sc([7, 1122334455])
        naf = s.compute_naf()
        assert naf[0][:4].tolist() == [-1, 0, 0, 1]
        wnaf5 = s.compute_window_naf(5)
        assert wnaf5[1][:32].tolist() == o.compute_window_naf(1122334455, 5)[:32]

    def test_windows(self):
        ks = rand_ints(4)
        w = np.asarray(sc(ks).windows(8, 32))
        for row, k in zip(w, ks):
            assert sum(int(d) << (8 * i) for i, d in enumerate(row)) == k

    def test_shr(self):
        # scalar.rs:962-977
        vals = [4, 1, 0, o.R - 1, 1 << 249]
        s = sc(vals)
        assert [int(v) for v in (s >> 1).to_ints()] == [(v % o.R) >> 1 for v in vals]
        assert [int(v) for v in (s >> 248).to_ints()] == [(v % o.R) >> 248 for v in vals]
        assert int(sc([6]).half_without_mod().to_ints()[0]) == 3

    def test_mods_2_pow_k(self):
        got = np.asarray(sc([3, 7, 15, 8]).mods_2_pow_k(4))
        assert got.tolist() == [3, 7, -1, -8]

    def test_mod_2_pow_k(self):
        got = np.asarray(sc([4, 3, 557, 42535295865117307932887201356513780707]).mod_2_pow_k(2))
        assert got.tolist() == [0, 3, 1, 3]

    def test_random(self):
        s = Scalar.random(jax.random.PRNGKey(0), (32,))
        vals = s.to_ints()
        assert len(set(int(v) for v in vals)) == 32
        assert all(0 <= int(v) < o.R for v in vals)

    def test_two_pow_k(self):
        assert int(Scalar.two_pow_k(249).to_ints()) == (1 << 249) % o.R
