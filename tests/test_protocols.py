"""Protocol-level integration tests: ECDH, signatures-shaped flows, and
randomized differential sweeps (the macro-benchmark flows of
dusk_benchmarks.rs:559-620 as correctness tests)."""

import numpy as np
import jax
import jax.numpy as jnp

from zerocaf_tpu import (CompressedRistretto, EdwardsPoint, FieldElement,
                         RistrettoPoint, Scalar)
from zerocaf_tpu import oracle as o

B = 8


class TestECDH:
    def test_batched_ecdh(self):
        """Both parties derive the same shared secret, batched, and it
        matches the oracle (bench_ecdh, dusk_benchmarks.rs:559-620)."""
        k1, k2 = jax.random.split(jax.random.PRNGKey(42))
        sk_a = Scalar.random(k1, (B,))
        sk_b = Scalar.random(k2, (B,))
        pk_a = EdwardsPoint.basepoint_mul(sk_a)
        pk_b = EdwardsPoint.basepoint_mul(sk_b)
        shared_a = RistrettoPoint(pk_b.mul_windowed(sk_a)).compress()
        shared_b = RistrettoPoint(pk_a.mul_windowed(sk_b)).compress()
        assert (np.asarray(shared_a) == np.asarray(shared_b)).all()
        # oracle cross-check on lane 0
        ka = int(sk_a.to_ints()[0])
        kb = int(sk_b.to_ints()[0])
        expect = o.ristretto_compress(o.scalar_mul(o.BASEPOINT, (ka * kb) % o.R))
        assert bytes(np.asarray(shared_a)[0]) == expect

    def test_wire_interop_with_oracle(self):
        """Points encoded by the oracle decode on device and vice versa."""
        ks = [3, 99, 12345, o.R - 2] * 2
        enc_oracle = np.stack([
            np.frombuffer(o.ristretto_compress(o.scalar_mul(o.BASEPOINT, k)), np.uint8)
            for k in ks])
        pt, ok = RistrettoPoint.decompress(jnp.asarray(enc_oracle))
        assert np.asarray(ok).all()
        back = np.asarray(pt.compress())
        assert (back == enc_oracle).all()


class TestRandomizedDifferential:
    """Random-input sweeps against the oracle: the 'property testing' tier
    the reference lacks (its rand-gated tests never run, SURVEY.md §4)."""

    def test_field_algebra_sweep(self):
        rng = np.random.default_rng(123)
        n = 32
        xs = [int.from_bytes(rng.bytes(40), "little") % o.P for _ in range(n)]
        ys = [int.from_bytes(rng.bytes(40), "little") % o.P for _ in range(n)]
        X = FieldElement.from_int(np.array(xs, dtype=object))
        Y = FieldElement.from_int(np.array(ys, dtype=object))
        # (x+y)(x-y) == x^2 - y^2
        lhs = (X + Y) * (X - Y)
        rhs = X.square() - Y.square()
        assert np.asarray(lhs.eq(rhs)).all()
        # x * x^-1 == 1 (x != 0)
        assert np.asarray((X * X.inverse()).eq(FieldElement.one().broadcast_to((n,)))).all()
        # sqrt(x^2) in {x, -x}
        ok, r = X.square().mod_sqrt(jnp.zeros(n, jnp.int32))
        assert np.asarray(ok).all()
        is_pm = np.asarray(r.eq(X)) | np.asarray(r.eq(-X))
        assert is_pm.all()

    def test_group_law_sweep(self):
        rng = np.random.default_rng(321)
        n = 8
        ks = [int.from_bytes(rng.bytes(31), "little") % o.R for _ in range(2 * n)]
        P = EdwardsPoint.basepoint_mul(Scalar.from_int(np.array(ks[:n], dtype=object)))
        Q = EdwardsPoint.basepoint_mul(Scalar.from_int(np.array(ks[n:], dtype=object)))
        # commutativity + associativity spot
        assert np.asarray((P + Q).eq(Q + P)).all()
        assert np.asarray(((P + Q) + P).eq(P + (Q + P))).all()
        # k1*B + k2*B == (k1+k2)*B
        s = Scalar.from_int(np.array([(a + b) % o.R for a, b in zip(ks[:n], ks[n:])],
                                     dtype=object))
        assert np.asarray((P + Q).eq(EdwardsPoint.basepoint_mul(s))).all()
        # all on curve
        assert np.asarray(P.is_valid()).all() and np.asarray(Q.is_valid()).all()

    def test_ristretto_roundtrip_sweep(self):
        pts = RistrettoPoint.random(jax.random.PRNGKey(77), (16,))
        enc = pts.compress()
        back, ok = RistrettoPoint.decompress(enc)
        assert np.asarray(ok).all()
        assert np.asarray(back.eq(pts)).all()
        # encodings are canonical: re-encode is identical
        enc2 = back.compress()
        assert (np.asarray(enc) == np.asarray(enc2)).all()

    def test_scalar_ring_sweep(self):
        rng = np.random.default_rng(55)
        n = 32
        xs = [int.from_bytes(rng.bytes(40), "little") % o.R for _ in range(n)]
        ys = [int.from_bytes(rng.bytes(40), "little") % o.R for _ in range(n)]
        X = Scalar.from_int(np.array(xs, dtype=object))
        Y = Scalar.from_int(np.array(ys, dtype=object))
        assert np.asarray(((X + Y) * (X - Y)).eq(X.square() - Y.square())).all()
        assert np.asarray((X * X.inverse()).eq(Scalar.one().broadcast_to((n,)))).all()
