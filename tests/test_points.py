"""Differential tests for the batched point models vs oracle + reference
fixtures.  All device tests share batch shape (8,) to reuse compile caches
(this host has 2 vCPUs; XLA compiles dominate wall time)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zerocaf_tpu import (CompressedEdwardsY, EdwardsPoint, FieldElement,
                         ProjectivePoint, RistrettoPoint, Scalar,
                         binary_naf_mul, window_naf_mul)
from zerocaf_tpu import oracle as o
from zerocaf_tpu.models.montgomery import MontgomeryPoint

B = 8  # standard batch


def batch_points(pts):
    pts = (pts * ((B + len(pts) - 1) // len(pts)))[:B]
    arr = np.stack([[o.int_to_limbs(c) for c in p] for p in pts]).astype(np.int32)
    return EdwardsPoint(*(jnp.asarray(arr[:, i]) for i in range(4))), pts


def assert_points_eq(got: EdwardsPoint, expect_pts):
    xs, ys, zs, ts = got.to_ints()
    for i, e in enumerate(expect_pts):
        g = (int(xs[i]), int(ys[i]), int(zs[i]), int(ts[i]))
        assert o.point_eq(g, e), f"lane {i}"


# reference fixtures (edwards.rs:1145-1353)
P1 = (13, o.limbs52_to_int([606320128494542, 1597163540666577, 1835599237877421,
                            1667478411389512, 3232679738299]), 1,
      o.limbs52_to_int([2034732376387996, 3922598123714460, 1344791952818393,
                        3662820838581677, 6840464509059]))
P2 = (67, o.limbs52_to_int([2369245568431362, 2665603790611352, 3317390952748653,
                            1908583331312524, 8011773354506]), 1,
      o.limbs52_to_int([3474019263728064, 2548729061993416, 1588812051971430,
                        1774293631565269, 9023233419450]))

BASE_PTS = [P1, P2, o.BASEPOINT, o.IDENTITY, o.point_double(P1),
            o.point_add(P1, P2), o.point_neg(P2), o.scalar_mul(o.BASEPOINT, 12345)]


class TestEdwards:
    def test_add_double_neg_sub(self):
        p, pts = batch_points(BASE_PTS)
        q, qts = batch_points(list(reversed(BASE_PTS)))
        assert_points_eq(p + q, [o.point_add(a, b) for a, b in zip(pts, qts)])
        assert_points_eq(p.double(), [o.point_double(a) for a in pts])
        assert_points_eq(-p, [o.point_neg(a) for a in pts])
        assert_points_eq(p - q, [o.point_sub(a, b) for a, b in zip(pts, qts)])

    def test_validity_and_eq(self):
        p, pts = batch_points(BASE_PTS)
        assert np.asarray(p.is_valid()).all()
        assert np.asarray(p.eq(p)).all()
        q, _ = batch_points(list(reversed(BASE_PTS)))
        eqs = np.asarray(p.eq(q))
        expect = [o.point_eq(a, b) for a, b in zip(BASE_PTS, reversed(BASE_PTS))]
        assert list(eqs) == expect

    def test_scalar_mul(self):
        p, pts = batch_points(BASE_PTS)
        ks = [8, 1, 0, o.R - 1, (1 << 215), 12345, 7, 2]
        k = Scalar.from_int(np.array(ks, dtype=object))
        assert_points_eq(p * k, [o.scalar_mul(a, kk) for a, kk in zip(pts, ks)])

    def test_mul_cofactor_pow2(self):
        p, pts = batch_points(BASE_PTS)
        assert_points_eq(p.mul_by_cofactor(), [o.mul_by_cofactor(a) for a in pts])
        assert_points_eq(p.mul_by_pow_2(4), [o.mul_by_pow_2(a, 4) for a in pts])

    def test_basepoint_order(self):
        p = EdwardsPoint.basepoint((B,))
        rp = p.mul_raw_int(o.R)
        assert np.asarray(rp.eq(EdwardsPoint.identity((B,)))).all()

    def test_compress(self):
        p, pts = batch_points(BASE_PTS)
        got = np.asarray(p.compress())
        for row, e in zip(got, pts):
            assert bytes(row) == o.edwards_compress(e)

    def test_decompress(self):
        p, pts = batch_points(BASE_PTS)
        enc = np.asarray(p.compress())
        back, ok = CompressedEdwardsY(jnp.asarray(enc)).decompress()
        assert np.asarray(ok).all()
        assert_points_eq(back, pts)
        # invalid y (edwards.rs:1569-1577)
        bad = np.asarray(enc).copy()
        bad[0] = np.array(bytearray(
            bytes([250, 144, 188, 47, 13, 101, 118, 114, 201, 185, 169, 115, 255,
                   111, 40, 25, 69, 105, 170, 255, 113, 65, 120, 126, 170, 192, 48,
                   109, 112, 20, 221, 149])), dtype=np.uint8)
        _, ok = CompressedEdwardsY(jnp.asarray(bad)).decompress()
        assert not bool(np.asarray(ok)[0])
        assert np.asarray(ok)[1:].all()

    def test_new_from_y(self):
        ys = FieldElement.from_int(np.array([P1[1], P2[1], 15, o.fdiv(3, 5)] * 2,
                                            dtype=object))
        pt, ok = EdwardsPoint.new_from_y_coord(ys, jnp.zeros(B, jnp.int32))
        okh = np.asarray(ok)
        assert list(okh[:4]) == [True, True, False, True]
        xs, _, _, _ = pt.to_ints()
        assert int(xs[0]) == P1[0] and int(xs[1]) == P2[0]
        assert int(xs[3]) == o.BASEPOINT[0]

    def test_new_random_point(self):
        """Rejection-sampled constructor (edwards.rs:984-997): valid curve
        points that can land OUTSIDE the prime subgroup (unlike .random's
        k*B) -- with 8 lanes, P(all in the order-l subgroup) = 8^-8."""
        key = jax.random.PRNGKey(7)
        p, ok = EdwardsPoint.new_random_point(key, (B,))
        assert np.asarray(ok).all()
        assert np.asarray(p.is_valid()).all()
        lP = p.mul_raw_int(o.R)
        in_subgroup = np.asarray(lP.eq(EdwardsPoint.identity((B,))))
        assert not in_subgroup.all()
        # projective variant shares the sampler
        q, okq = ProjectivePoint.new_random_point(key, (B,))
        assert np.asarray(okq).all()
        assert np.asarray(q.is_valid()).all()
        assert np.asarray(q.eq(p.to_projective())).all()

    def test_projective(self):
        p, pts = batch_points(BASE_PTS)
        pp = p.to_projective()
        s = pp + pp
        d = pp.double()
        assert np.asarray(s.eq(d)).all()
        assert np.asarray(pp.is_valid()).all()
        assert np.asarray(
            d.to_extended().eq(p.double())).all()

    def test_affine(self):
        p, pts = batch_points(BASE_PTS)
        a = p.to_affine()
        assert np.asarray(a.is_valid()).all()
        exp = [o.point_to_affine(q) for q in pts]
        ax = FieldElement(a.X).to_ints()
        ay = FieldElement(a.Y).to_ints()
        # identity Z=1 inverse(0)... identity has Z=1 so fine
        assert all(int(x) == e[0] and int(y) == e[1]
                   for x, y, e in zip(ax, ay, exp))
        rt = a.to_extended()
        assert np.asarray(rt.eq(p)).all()

    def test_naf_muls(self):
        p, pts = batch_points(BASE_PTS)
        ks = [7, 1122334455, o.R - 1, 3, 8, 1, 0, 255]
        k = Scalar.from_int(np.array(ks, dtype=object))
        got = binary_naf_mul(p, k)
        assert_points_eq(got, [o.scalar_mul(a, kk) for a, kk in zip(pts, ks)])

    def test_windowed_variable_base(self):
        p, pts = batch_points(BASE_PTS)
        ks = [8, 1, 0, o.R - 1, (1 << 215), 12345, 7, 2]
        k = Scalar.from_int(np.array(ks, dtype=object))
        got = p.mul_windowed(k, 4)
        assert np.asarray(got.eq(p * k)).all()
        assert_points_eq(got, [o.scalar_mul(a, kk) for a, kk in zip(pts, ks)])

    def test_fixed_base_comb(self):
        ks = [0, 1, 8, o.R - 1, 12345, 2, 3, (1 << 249)]
        k = Scalar.from_int(np.array(ks, dtype=object))
        got = EdwardsPoint.basepoint_mul(k)
        assert_points_eq(got, [o.scalar_mul(o.BASEPOINT, kk % o.R) for kk in ks])

    def test_window_naf_fixed_base(self):
        ks = [7, 1122334455, o.R - 1, 3, 8, 1, 0, 255]
        k = Scalar.from_int(np.array(ks, dtype=object))
        for width in (4, 7):
            got = window_naf_mul(k, width)
            assert_points_eq(got, [o.scalar_mul(o.BASEPOINT, kk) for kk in ks])


# All 16 canonical small-multiple encodings (ristretto.rs:542-579), driven
# through the DEVICE kernels in two batch-8 calls (reusing the batch-8
# compiled graphs; VERDICT r2 item 6).
from test_oracle import RISTRETTO_SMALL_MULTIPLES as RISTRETTO_VECS  # noqa: E402


class TestRistretto:
    def test_small_multiple_encodings_all_16(self):
        for lo in (0, 8):
            ks = list(range(lo, lo + 8))
            k = Scalar.from_int(np.array(ks))
            p = RistrettoPoint.basepoint((B,)) * k
            got = np.asarray(p.compress())
            for i, (row, e) in enumerate(zip(got, RISTRETTO_VECS[lo:lo + 8])):
                assert bytes(row).hex() == e, f"multiple {lo + i}"

    def test_decompress_roundtrip_and_rejects(self):
        for lo in (0, 8):
            enc = np.stack([np.frombuffer(bytes.fromhex(v), np.uint8)
                            for v in RISTRETTO_VECS[lo:lo + 8]])
            pt, ok = RistrettoPoint.decompress(jnp.asarray(enc))
            assert np.asarray(ok).all()
            assert np.asarray(pt.eq(RistrettoPoint.basepoint((B,)) *
                                    Scalar.from_int(np.arange(lo, lo + 8)))).all()
        enc = np.stack([np.frombuffer(bytes.fromhex(v), np.uint8)
                        for v in RISTRETTO_VECS[:8]])
        # non-canonical / negative encodings must be rejected
        bad = enc.copy()
        bad[0] = np.frombuffer(o.fe_to_bytes(o.P - 1), np.uint8)  # negative s
        bad[1] = np.frombuffer((o.P + 2).to_bytes(32, "little"), np.uint8)
        bad[2] = 255 * np.ones(32, np.uint8)
        _, ok = RistrettoPoint.decompress(jnp.asarray(bad))
        okh = np.asarray(ok)
        assert not okh[0] and not okh[1] and not okh[2]
        assert okh[3:].all()

    def test_elligator_sage_vector(self):
        raw = bytes.fromhex("2e2d7c6f887c81c1593f32e2fa31a7b65d4fbbf38f8ab3045ead22fc45743219")
        r0 = FieldElement.from_bytes(jnp.asarray(
            np.broadcast_to(np.frombuffer(raw, np.uint8), (B, 32))))
        pt = RistrettoPoint.elligator(r0)
        expect = o.elligator_ristretto_flavor(o.fe_from_bytes(raw))
        got = np.asarray(pt.compress())
        assert bytes(got[0]) == o.ristretto_compress(expect)
        assert np.asarray(pt.point.is_valid()).all()

    def test_from_uniform_bytes(self):
        raw = np.frombuffer(bytes(range(64)), np.uint8)
        pt = RistrettoPoint.from_uniform_bytes(jnp.asarray(np.broadcast_to(raw, (B, 64))))
        expect = o.from_uniform_bytes(bytes(range(64)))
        got = np.asarray(pt.compress())
        assert bytes(got[0]) == o.ristretto_compress(expect)

    def test_coset_equality(self):
        bp = RistrettoPoint.basepoint((B,))
        for q in bp.coset4():
            assert np.asarray(RistrettoPoint(q).eq(bp)).all()

    def test_four_torsion_diff(self):
        bp = RistrettoPoint.basepoint((B,))
        rt, ok = RistrettoPoint.decompress(bp.compress())
        assert np.asarray(ok).all()
        diff = bp.point - rt.point
        assert np.asarray(diff.mul_by_pow_2(2).eq(
            __import__("zerocaf_tpu").EdwardsPoint.identity((B,)))).all()

    def test_random_roundtrip(self):
        key = jax.random.PRNGKey(3)
        pt = RistrettoPoint.random(key, (B,))
        rt, ok = RistrettoPoint.decompress(pt.compress())
        assert np.asarray(ok).all()
        assert np.asarray(rt.eq(pt)).all()


class TestMontgomery:
    def test_roundtrip(self):
        p, pts = batch_points(BASE_PTS[:2] * 4)
        m = MontgomeryPoint.from_edwards(p)
        exp_u = [o.edwards_to_montgomery_u(q) for q in pts]
        assert all(int(v) == e for v, e in zip(m.u().to_ints(), exp_u))
        back, ok = m.to_edwards(jnp.zeros(B, jnp.int32))
        assert np.asarray(ok).all()
        # same u -> same point up to x-sign: compare y coordinates
        ya = FieldElement(back.to_affine().Y).to_ints()
        yb = [o.point_to_affine(q)[1] for q in pts]
        assert all(int(a) == b for a, b in zip(ya, yb))

    def test_eq(self):
        p, _ = batch_points(BASE_PTS[:2] * 4)
        m = MontgomeryPoint.from_edwards(p)
        assert np.asarray(m.eq(m)).all()


class TestMixedBatch:
    """Unbatched point x batched scalar (and vice versa) must broadcast —
    the everyday shape for basepoint multiplication (regression: scan-carry
    shape mismatch in _scalar_mul)."""

    def test_unbatched_point_batched_scalar(self):
        ks = [3, 7, 12345, 1, 2, 9, 100, 250]
        s = Scalar.from_int(ks)
        got = EdwardsPoint.basepoint() * s  # basepoint has shape ()
        assert got.shape == (B,)
        assert_points_eq(got, [o.scalar_mul(o.BASEPOINT, k) for k in ks])
        gw = EdwardsPoint.basepoint().mul_windowed(s)
        assert np.asarray(gw.eq(got)).all()
        gn = binary_naf_mul(EdwardsPoint.basepoint(), s)
        assert np.asarray(gn.eq(got)).all()
        gr = RistrettoPoint.basepoint() * s
        assert np.asarray(gr.eq(RistrettoPoint(got))).all()

    def test_batched_point_unbatched_scalar(self):
        p, pts = batch_points(BASE_PTS)
        got = p * Scalar.from_int(29)
        assert got.shape == (B,)
        assert_points_eq(got, [o.scalar_mul(q, 29) for q in pts])
