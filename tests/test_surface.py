"""Reference-surface parity tests added in round 3 (VERDICT r2 item 6):
public batched Ord/compare (field.rs:59-76, scalar.rs:48-59), the
Scalar-side Ristretto255Scalar interop alias (scalar.rs:112-113), and the
MINUS_SQRT_A named constant (constants.rs:114-120)."""

import jax.numpy as jnp
import numpy as np

import zerocaf_tpu
from zerocaf_tpu import FieldElement, Ristretto255Scalar, Scalar
from zerocaf_tpu import constants as C
from zerocaf_tpu import oracle as o


class TestOrd:
    def test_field_cmp_batched(self):
        avals = [0, 1, o.P - 1, 12345, 1 << 200, 7, o.P - 2, 99]
        bvals = [0, 2, 1, 12345, (1 << 200) - 1, o.P - 1, o.P - 2, 98]
        a = FieldElement.from_int(np.array(avals, dtype=object))
        b = FieldElement.from_int(np.array(bvals, dtype=object))
        expect = np.array([(x > y) - (x < y) for x, y in zip(avals, bvals)],
                          dtype=np.int32)
        np.testing.assert_array_equal(np.asarray(a.cmp(b)), expect)
        np.testing.assert_array_equal(np.asarray(a < b), expect < 0)
        np.testing.assert_array_equal(np.asarray(a >= b), expect >= 0)
        np.testing.assert_array_equal(np.asarray(a > b), expect > 0)
        np.testing.assert_array_equal(np.asarray(a <= b), expect <= 0)

    def test_field_cmp_semi_reduced_inputs(self):
        """cmp canonicalizes first: x and x+p compare equal (the reference
        compares canonical limb arrays, field.rs:65-76)."""
        x = FieldElement.from_int(np.array([5, 11, 0, 1, 2, 3, 4, 6]))
        shifted = x + FieldElement.from_int(0)  # same values, maybe semi form
        y = x + x - x
        np.testing.assert_array_equal(np.asarray(x.cmp(y)), 0)
        np.testing.assert_array_equal(np.asarray(shifted.cmp(x)), 0)

    def test_scalar_cmp_batched(self):
        avals = [0, 1, o.R - 1, 42, 1 << 100, o.R - 2, 5, 5]
        bvals = [1, 1, 0, 43, 1 << 100, o.R - 1, 4, 5]
        a = Scalar.from_int(np.array(avals, dtype=object))
        b = Scalar.from_int(np.array(bvals, dtype=object))
        expect = np.array([(x > y) - (x < y) for x, y in zip(avals, bvals)],
                          dtype=np.int32)
        np.testing.assert_array_equal(np.asarray(a.cmp(b)), expect)
        np.testing.assert_array_equal(np.asarray(a < b), expect < 0)
        np.testing.assert_array_equal(np.asarray(a > b), expect > 0)


class TestRistretto255ScalarInterop:
    def test_alias_is_field_element(self):
        """The ristretto255 scalar ring (mod the ed25519 group order) IS the
        Sonny base field; the alias makes that identification public."""
        assert Ristretto255Scalar is FieldElement
        assert "Ristretto255Scalar" in zerocaf_tpu.__all__

    def test_byte_roundtrip_matches_reference_semantics(self):
        """FieldElement <-> ristretto255-scalar bytes (field.rs:151-168):
        canonical byte strings convert losslessly in both directions."""
        vals = [0, 1, o.P - 1, 2**252, 12345, 7, 8, 9]
        fe = FieldElement.from_int(np.array(vals, dtype=object))
        b = fe.to_ristretto255_scalar_bytes()
        back = Ristretto255Scalar.from_ristretto255_scalar_bytes(b)
        assert np.asarray(fe.eq(back)).all()
        for row, v in zip(np.asarray(b), vals):
            assert int.from_bytes(bytes(row), "little") == v % o.P


class TestTraits:
    """The op-vocabulary protocols (traits.py, traits.rs:10-142) are wired:
    every concrete type satisfies its protocols, and the generic entry
    points enforce them (VERDICT r2 item 10)."""

    def test_concrete_types_satisfy_protocols(self):
        from zerocaf_tpu import EdwardsPoint, ProjectivePoint, RistrettoPoint
        from zerocaf_tpu import traits as t

        fe = FieldElement.from_int(4)
        sc = Scalar.from_int(4)
        for proto in (t.Square, t.Half, t.Pow, t.ModSqrt, t.InvSqrt,
                      t.SqrtRatioI):
            assert isinstance(fe, proto), proto
        for proto in (t.Square, t.Half, t.Pow):
            assert isinstance(sc, proto), proto
        for cls in (EdwardsPoint, ProjectivePoint, RistrettoPoint):
            p = cls.identity()
            assert isinstance(p, t.Identity), cls
            assert isinstance(p, t.ValidityCheck), cls
            assert isinstance(p, t.Double), cls

    def test_generic_entry_points_enforce_double(self):
        import pytest as _pytest

        from zerocaf_tpu import double_and_add, mul_by_cofactor

        with _pytest.raises(TypeError):
            double_and_add(object(), Scalar.from_int(3))
        with _pytest.raises(TypeError):
            mul_by_cofactor("not a point")

    def test_generic_mul_by_pow_2_via_trait(self):
        from zerocaf_tpu import EdwardsPoint, mul_by_pow_2

        p = EdwardsPoint.basepoint()
        got = mul_by_pow_2(p, 3)
        wx, _, wz, _ = o.scalar_mul(o.BASEPOINT, 8)
        gx = o.limbs_to_int(np.asarray(FieldElement(got.X).canonical().limbs))
        gz = o.limbs_to_int(np.asarray(FieldElement(got.Z).canonical().limbs))
        assert gx * wz % o.P == wx * gz % o.P


class TestProfilingAccounting:
    """utils/profiling.KernelCost is load-bearing: microbench prints the
    roofline report and derives the implied VPU rate from it."""

    def test_report_and_model_consistency(self):
        from zerocaf_tpu.utils import profiling as prof

        txt = prof.report()
        assert "field_mul" in txt and "scalar_mul_ladder" in txt
        # the composite models must be built from the primitive ones
        assert prof.POINT_ADD.int_ops == 10 * prof.FIELD_MUL.int_ops + \
            7 * prof.FIELD_ADD.int_ops
        assert prof.SCALAR_MUL.int_ops == 250 * (
            prof.POINT_ADD.int_ops + prof.POINT_DOUBLE.int_ops)
        assert prof.FIELD_MUL.arithmetic_intensity > 1  # compute-bound

    def test_timeit_runs(self):
        from zerocaf_tpu.utils.profiling import timeit

        t = timeit(lambda x: x + 1, jnp.ones((8,)), iters=3, warmup=1)
        assert t >= 0


class TestNamedConstants:
    def test_minus_sqrt_a(self):
        """constants.rs:114-120: -sqrt(a) with a = -1; equals INV_SQRT_A
        (both are -i mod p; the reference tables carry identical limbs)."""
        assert C.MINUS_SQRT_A == C.INV_SQRT_A
        assert pow(C.MINUS_SQRT_A, 2, C.P) == C.P - 1  # (-i)^2 == -1 == a
        got = o.limbs_to_int(np.asarray(C.MINUS_SQRT_A_LIMBS))
        assert got == C.MINUS_SQRT_A
        assert (C.P - C.MINUS_SQRT_A) == C.SQRT_M1  # -(-i) == i

    def test_inv_sqrt_a_limbs(self):
        assert o.limbs_to_int(np.asarray(C.INV_SQRT_A_LIMBS)) == C.INV_SQRT_A
