"""Differential tests: batched FieldElement kernels vs the Python oracle.

Strategy mirrors the reference's fixture style (SURVEY.md section 4) plus
randomized differential testing at several lane widths.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zerocaf_tpu import oracle as o
from zerocaf_tpu.field import (EDWARDS_D, SQRT_M1, FieldElement)

rng = np.random.default_rng(42)


def rand_ints(n):
    return [int.from_bytes(rng.bytes(40), "little") % o.P for _ in range(n)]


def fe(vals):
    return FieldElement.from_int(np.array(vals, dtype=object))


# reference fixtures (field.rs:939-1132)
A = 182687704666362864775460604089535377456991567872
B = 904625697166532776746648320197686575422163851717637391703244652875051672039
C_ = 2009874587549


class TestRingOps:
    def test_add_fixtures(self):
        x = fe([o.P - 1, A, 2])
        y = fe([1, B, o.P])
        got = (x + y).to_ints()
        assert list(got) == [0, o.fadd(A, B), 2]

    def test_sub_neg(self):
        x, y = fe([A, B, B]), fe([B, A, B])
        assert list((x - y).to_ints()) == [o.fsub(A, B), o.fsub(B, A), 0]
        assert list((-fe([A, 0])).to_ints()) == [o.fneg(A), 0]

    def test_mul_fixtures(self):
        x, y = fe([A, A]), fe([B, C_])
        assert list((x * y).to_ints()) == [o.fmul(A, B), o.fmul(A, C_)]

    def test_square(self):
        assert list(fe([A, B, 0, 1]).square().to_ints()) == [
            o.fsquare(A), o.fsquare(B), 0, 1]

    def test_mul_random_batch(self):
        xs, ys = rand_ints(128), rand_ints(128)
        got = (fe(xs) * fe(ys)).to_ints()
        assert all(int(g) == o.fmul(x, y) for g, x, y in zip(got, xs, ys))

    def test_deep_chain_matches_oracle(self):
        # exercise lazy-reduction invariants: adds/subs/muls interleaved
        xs = rand_ints(8)
        x = fe(xs)
        acc_o = [o.fadd(o.fmul(v, v), v) for v in xs]
        acc = x.square() + x
        for _ in range(5):
            acc_o = [o.fsub(o.fmul(a, v), o.fadd(a, a)) for a, v in zip(acc_o, xs)]
            acc = acc * x - (acc + acc)
        assert all(int(g) == e for g, e in zip(acc.to_ints(), acc_o))

    def test_div(self):
        # field.rs:1242-1260
        got = (-fe([86649]) / fe([86650])).to_ints()
        assert int(got[0]) == o.fdiv(o.fneg(86649), 86650)

    def test_half(self):
        v = o.fsub(A, B)
        assert int(fe([v]).half().to_ints()[0]) == o.fhalf(v)

    def test_inverse_fixtures(self):
        got = fe([A, B, C_]).inverse().to_ints()
        assert list(got) == [o.finv(A), o.finv(B), o.finv(C_)]
        # a == 0 -> 0 (documented batched behavior)
        assert int(fe([0]).inverse().to_ints()[0]) == 0

    def test_pow(self):
        assert int(fe([A]).pow(C_).to_ints()[0]) == o.fpow(A, C_)
        assert int(fe([A]).pow(B).to_ints()[0]) == o.fpow(A, B)
        # batched exponent
        e = fe([B, C_])
        got = fe([A, A]).pow(e).to_ints()
        assert list(got) == [o.fpow(A, B), o.fpow(A, C_)]


class TestSqrt:
    def test_legendre(self):
        got = np.asarray(fe([A, 17, 1]).legendre_symbol())
        assert list(got) == [False, True, True]

    def test_legendre_value(self):
        """Field-value convention (field.rs:703-706): 1 / p-1 / 0 -- keeps
        zero distinguishable from a non-residue."""
        got = fe([A, 17, 1, 0]).legendre_symbol_value().to_ints()
        assert list(got) == [o.P - 1, 1, 1, 0]

    def test_mod_sqrt_signs(self):
        ok, r = fe([17, 17, 0]).mod_sqrt(jnp.array([0, 1, 0]))
        assert list(np.asarray(ok)) == [True, True, True]
        assert list(r.to_ints()) == [o.mod_sqrt(17, 0), o.mod_sqrt(17, 1), 0]

    def test_mod_sqrt_nonresidue(self):
        ok, _ = fe([A]).mod_sqrt(jnp.array([0]))
        assert not bool(np.asarray(ok)[0])

    def test_sqrt_random_matches_reference_raw(self):
        xs = [o.fsquare(v) for v in rand_ints(32)]  # guaranteed QRs
        ok, r = fe(xs).mod_sqrt(jnp.zeros(32, dtype=jnp.int32))
        assert np.asarray(ok).all()
        assert all(int(g) == o.mod_sqrt(x, 0) for g, x in zip(r.to_ints(), xs))

    def test_inv_sqrt(self):
        ok, r = fe([27]).inv_sqrt()
        assert bool(np.asarray(ok)[0])
        assert int((-r).to_ints()[0]) == o.fneg(o.inv_sqrt(27)[1])
        assert int(r.to_ints()[0]) == o.inv_sqrt(27)[1]

    def test_sqrt_ratio_contract(self):
        u = fe([0, 5, 4, A])
        v = fe([5, 0, 1, 1])
        ok, r = u.sqrt_ratio_i(v)
        expect = [o.sqrt_ratio_i(0, 5), o.sqrt_ratio_i(5, 0),
                  o.sqrt_ratio_i(4, 1), o.sqrt_ratio_i(A, 1)]
        assert list(np.asarray(ok)) == [e[0] for e in expect]
        assert list(r.to_ints()) == [e[1] for e in expect]

    def test_sqrt_ratio_random(self):
        us, vs = rand_ints(32), rand_ints(32)
        ok, r = fe(us).sqrt_ratio_i(fe(vs))
        for g_ok, g_r, u, v in zip(np.asarray(ok), r.to_ints(), us, vs):
            e_ok, e_r = o.sqrt_ratio_i(u, v)
            assert (bool(g_ok), int(g_r)) == (e_ok, e_r)


class TestObservation:
    def test_bytes_roundtrip(self):
        xs = rand_ints(16) + [0, 1, o.P - 1]
        x = fe(xs)
        b = np.asarray(x.to_bytes())
        assert all(bytes(row) == o.fe_to_bytes(v) for row, v in zip(b, xs))
        back = FieldElement.from_bytes(jnp.asarray(b))
        assert list(back.to_ints()) == [v % o.P for v in xs]

    def test_from_bytes_nonreduced(self):
        # raw 256-bit values reduce mod p, matching reference behavior-after-op
        raw = (o.P + 12345).to_bytes(32, "little")
        x = FieldElement.from_bytes(jnp.asarray(np.frombuffer(raw, np.uint8)))
        assert int(x.to_ints()) == 12345

    def test_eq_positive_even(self):
        x = fe([A, (o.P - 1) // 2, (o.P - 1) // 2 + 1, o.P - 1])
        pos = np.asarray(x.is_positive())
        assert list(pos) == [o.is_positive(A), True, False, False]
        ev = np.asarray(x.is_even())
        assert list(ev) == [A % 2 == 0, ((o.P - 1) // 2) % 2 == 0,
                            ((o.P - 1) // 2 + 1) % 2 == 0, (o.P - 1) % 2 == 0]

    def test_abs_conditional_negate(self):
        v = (o.P - 1) // 2 + 10  # negative per Decaf
        x = fe([v])
        assert int(x.abs().to_ints()[0]) == o.fabs(v)
        y = x.conditional_negate(jnp.array([True]))
        assert int(y.to_ints()[0]) == o.fneg(v)

    def test_random_uniformish(self):
        key = jax.random.PRNGKey(7)
        x = FieldElement.random(key, (64,))
        vals = x.to_ints()
        assert len(set(int(v) for v in vals)) == 64
        assert all(0 <= int(v) < o.P for v in vals)


class TestJitted:
    def test_ops_under_jit(self):
        @jax.jit
        def f(x: FieldElement, y: FieldElement):
            return (x * y + x.square()).to_bytes()

        xs, ys = rand_ints(8), rand_ints(8)
        got = np.asarray(f(fe(xs), fe(ys)))
        exp = [o.fe_to_bytes(o.fadd(o.fmul(x, y), o.fsquare(x))) for x, y in zip(xs, ys)]
        assert all(bytes(r) == e for r, e in zip(got, exp))

    def test_constants_available(self):
        assert int(EDWARDS_D.to_ints()) == o.EDWARDS_D
        assert int(SQRT_M1.to_ints()) == o.SQRT_M1


class TestMxuFold:
    """The int8-matmul reduction (ops/limb.reduce_to_semi) must agree with
    the all-VPU cascade (reduce_to_semi_cascade) and keep the semi-reduced
    contract, across widths and signs (the analogue of the reference's
    montgomery_reduce fixture tests, field.rs:1445-1470)."""

    def _vals(self, cols):
        return [sum(int(c) << (12 * i) for i, c in enumerate(row)) for row in cols]

    @pytest.mark.parametrize("width", [43, 34, 23, 22, 13, 5, 1])
    def test_matches_cascade_and_contract(self, width):
        from zerocaf_tpu.ops import limb as l

        for spec in (l.FIELD, l.SCALAR):
            hi = min(2**29, 2**31 // width)
            cols = rng.integers(-(2**21), hi, size=(32, width)).astype(np.int32)
            if width > 3:  # respect |value| < 2^(12*(n+1))
                cols[:, -3:] = rng.integers(-13, 4096, size=(32, 3)).astype(np.int32)
            out = np.asarray(l.reduce_to_semi(jnp.asarray(cols), spec))
            ref = np.asarray(l.reduce_to_semi_cascade(jnp.asarray(cols), spec))
            vin = self._vals(cols)
            vout = self._vals(out)
            vref = self._vals(ref)
            for vi, vo, vr in zip(vin, vout, vref):
                assert (vo - vi) % spec.m == 0
                assert (vr - vi) % spec.m == 0
                assert abs(vo) < 2**253
            assert out.min() >= -16 and out.max() <= 4112

    def test_product_columns_roundtrip(self):
        from zerocaf_tpu.ops import limb as l

        xs, ys = rand_ints(64), rand_ints(64)
        a = fe(xs).limbs
        b = fe(ys).limbs
        cols = l.school(a, b)
        got = np.asarray(l.canonical(l.reduce_to_semi(cols, l.FIELD), l.FIELD))
        for row, x, y in zip(got, xs, ys):
            assert sum(int(c) << (12 * i) for i, c in enumerate(row)) == o.fmul(x, y)


class TestNibbleCodec:
    def test_bytes_limbs_roundtrip_random(self):
        from zerocaf_tpu.ops import limb as l

        raw = rng.integers(0, 256, size=(64, 32)).astype(np.uint8)
        limbs = np.asarray(l.bytes_to_limbs(jnp.asarray(raw)))
        vals = [int.from_bytes(bytes(r.tolist()), "little") for r in raw]
        for row, v in zip(limbs, vals):
            assert sum(int(c) << (12 * i) for i, c in enumerate(row)) == v
        # inverse on canonical (sub-2^252) values
        canon = np.asarray([o.int_to_limbs(v % o.P) for v in vals], dtype=np.int32)
        back = np.asarray(l.limbs_to_bytes(jnp.asarray(canon)))
        for row, v in zip(back, vals):
            assert int.from_bytes(bytes(row.tolist()), "little") == v % o.P
