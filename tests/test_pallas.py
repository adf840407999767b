"""Pallas kernel tests (interpret mode on CPU; bit-exact vs the jnp path).

On real TPU the same kernels compile natively; interpret mode validates the
kernel algebra on any backend.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zerocaf_tpu import oracle as o
from zerocaf_tpu.ops import limb as l
from zerocaf_tpu.ops.pallas import field_kernels as fk

rng = np.random.default_rng(21)


def rand_elems(n):
    return [int.from_bytes(rng.bytes(40), "little") % o.P for _ in range(n)]


class TestPallasFieldMul:
    def test_matches_jnp_path(self):
        n = 200  # deliberately not a multiple of 128 (padding path)
        xs, ys = rand_elems(n), rand_elems(n)
        A = jnp.asarray(np.stack([o.int_to_limbs(v) for v in xs]).astype(np.int32))
        B = jnp.asarray(np.stack([o.int_to_limbs(v) for v in ys]).astype(np.int32))
        got = fk.mul_tiled(A, B, l.FIELD, interpret=True)
        ref = l.mul(A, B, l.FIELD)
        ga = np.asarray(l.canonical(got, l.FIELD))
        rb = np.asarray(l.canonical(ref, l.FIELD))
        assert (ga == rb).all()
        assert all(o.limbs_to_int(row) == o.fmul(x, y)
                   for row, x, y in zip(ga, xs, ys))

    def test_scalar_modulus(self):
        xs, ys = rand_elems(64), rand_elems(64)
        A = jnp.asarray(np.stack([o.int_to_limbs(v % o.R) for v in xs]).astype(np.int32))
        B = jnp.asarray(np.stack([o.int_to_limbs(v % o.R) for v in ys]).astype(np.int32))
        got = fk.mul_tiled(A, B, l.SCALAR, interpret=True)
        ga = np.asarray(l.canonical(got, l.SCALAR))
        assert all(o.limbs_to_int(row) == o.smul(x % o.R, y % o.R)
                   for row, x, y in zip(ga, xs, ys))

    def test_semi_reduced_inputs(self):
        # feed semi-reduced (non-canonical) inputs: outputs must agree with
        # the jnp path bit-for-bit after canonicalization
        xs, ys = rand_elems(128), rand_elems(128)
        A = jnp.asarray(np.stack([o.int_to_limbs(v) for v in xs]).astype(np.int32))
        B = jnp.asarray(np.stack([o.int_to_limbs(v) for v in ys]).astype(np.int32))
        A2 = l.sub(l.mul(A, B, l.FIELD), A)  # semi-reduced, possibly negative
        got = fk.mul_tiled(A2, B, l.FIELD, interpret=True)
        ref = l.mul(A2, B, l.FIELD)
        assert (np.asarray(l.canonical(got, l.FIELD))
                == np.asarray(l.canonical(ref, l.FIELD))).all()


class TestFusedWindowedLadder:
    def test_matches_xla_windowed(self):
        """The fused whole-ladder kernel is bit-exact vs the XLA windowed
        path (compressed encodings compared)."""
        from zerocaf_tpu.models import edwards as ed
        from zerocaf_tpu.models.ristretto import _compress
        from zerocaf_tpu import constants as C

        n = 96
        base = np.broadcast_to(C.BASEPOINT.astype(np.int32), (n, 4, 22)).copy()
        pt = tuple(jnp.asarray(base[:, i]) for i in range(4))
        w = jnp.asarray(rng.integers(0, 16, (n, 63)).astype(np.int32))
        ref = ed._scalar_mul_windowed(pt, w, 4)
        got = fk.scalar_mul_windowed_fused(pt, w, 4, interpret=True)
        assert (np.asarray(_compress(got)) == np.asarray(_compress(ref))).all()

    def test_fixed_base_stepped_variants(self):
        """Both comb gather strategies (per-step take vs hoisted prefetch)
        are bit-exact vs the XLA comb (compressed encodings compared)."""
        from zerocaf_tpu.models import edwards as ed
        from zerocaf_tpu.models.ristretto import _compress

        cw = 8  # small width: fast oracle table on CPU
        # derive the window count from the real table geometry (ADVICE r2):
        # if the comb convention changes, this tracks the source of truth
        nwin = ed._fixed_base_table(cw).shape[0]
        w = jnp.asarray(rng.integers(0, 1 << cw, (48, nwin)).astype(np.int32))
        ref = _compress(ed._fixed_base_mul(w, cw))
        for pf in (True, False):
            got = _compress(fk.fixed_base_mul_stepped(
                w, cw, interpret=True, prefetch=pf))
            assert (np.asarray(got) == np.asarray(ref)).all(), pf

    def test_mul_windowed_use_fused_flag(self):
        """Public API: use_fused=True (interpret on CPU is implicit via
        jax.default_backend) must equal the plain path."""
        from zerocaf_tpu import EdwardsPoint, Scalar

        s = Scalar.from_int([5, 77, 123456789])
        B = EdwardsPoint.basepoint((3,))
        a = B.mul_windowed(s, use_fused=False)
        # fused path on CPU compiles through Pallas interpret=False on CPU
        # backend -- exercise only the dispatcher defaulting here
        b = B.mul_windowed(s)
        assert bool(jnp.all(a.eq(b)))


class TestPallasPowChain:
    def test_chain_exponents_match_oracle(self):
        """The fused windowed power chain is bit-exact vs the oracle for
        every production chain exponent (inverse / Legendre / Tonelli /
        sqrt_ratio_i)."""
        xs = rand_elems(96)
        A = jnp.asarray(np.stack([o.int_to_limbs(v) for v in xs]).astype(np.int32))
        for e in (o.P - 2, (o.P - 1) // 2, (o.P + 3) // 8, (o.P - 5) // 8):
            got = fk.pow_tiled(A, e, l.FIELD, interpret=True)
            ga = np.asarray(l.canonical(got, l.FIELD))
            assert all(o.limbs_to_int(row) == pow(x, e, o.P)
                       for row, x in zip(ga, xs)), hex(e)[:18]

    def test_small_and_zero_digit_windows(self):
        """Exponents that exercise single-window seeding and zero digits
        (digit 0 multiplies by the table's identity entry)."""
        xs = rand_elems(40)
        A = jnp.asarray(np.stack([o.int_to_limbs(v) for v in xs]).astype(np.int32))
        for e in (1, 2, 15, 16, 17, (1 << 32) + 1, (1 << 64) + (1 << 8),
                  0x10001000100010001):
            if e.bit_length() < 2:
                continue
            got = fk.pow_tiled(A, e, l.FIELD, interpret=True)
            ga = np.asarray(l.canonical(got, l.FIELD))
            assert all(o.limbs_to_int(row) == pow(x, e, o.P)
                       for row, x in zip(ga, xs)), e

    def test_scalar_spec(self):
        """Same kernel under the scalar modulus r."""
        xs = [v % o.R for v in rand_elems(32)]
        A = jnp.asarray(np.stack([o.int_to_limbs(v) for v in xs]).astype(np.int32))
        e = o.R - 2
        got = fk.pow_tiled(A, e, l.SCALAR, interpret=True)
        ga = np.asarray(l.canonical(got, l.SCALAR))
        assert all(o.limbs_to_int(row) == pow(x, e, o.R)
                   for row, x in zip(ga, xs))

    def test_semi_reduced_inputs(self):
        """Semi-reduced (lazy) inputs agree with the XLA pow_const path."""
        xs, ys = rand_elems(64), rand_elems(64)
        A = jnp.asarray(np.stack([o.int_to_limbs(v) for v in xs]).astype(np.int32))
        B = jnp.asarray(np.stack([o.int_to_limbs(v) for v in ys]).astype(np.int32))
        A2 = l.sub(l.mul(A, B, l.FIELD), A)  # possibly-negative semi form
        e = (o.P + 3) // 8
        got = fk.pow_tiled(A2, e, l.FIELD, interpret=True)
        ref = l.pow_const(A2, e, l.FIELD)
        assert (np.asarray(l.canonical(got, l.FIELD))
                == np.asarray(l.canonical(ref, l.FIELD))).all()


class TestSignedWindowedLadder:
    def test_signed_matches_unsigned(self):
        """Signed-digit stepped ladder == XLA windowed path for canonical
        scalars (compressed encodings compared)."""
        from zerocaf_tpu import Scalar
        from zerocaf_tpu.models import edwards as ed
        from zerocaf_tpu.models.ristretto import _compress
        from zerocaf_tpu import constants as C

        n = 64
        ks = [int.from_bytes(rng.bytes(32), "little") % o.R for k in range(n)]
        s = Scalar.from_int(ks)
        w = s.windows(4, 63)
        base = np.broadcast_to(C.BASEPOINT.astype(np.int32), (n, 4, 22)).copy()
        pt = tuple(jnp.asarray(base[:, i]) for i in range(4))
        ref = ed._scalar_mul_windowed(pt, w, 4)
        got = fk.scalar_mul_windowed_signed(pt, w, 4, interpret=True)
        assert (np.asarray(_compress(got)) == np.asarray(_compress(ref))).all()

    def test_signed_recode_roundtrip(self):
        """Recoded digits reconstruct the scalar: sum d_i * 16^i == k."""
        ks = [int.from_bytes(rng.bytes(32), "little") % o.R for _ in range(32)]
        from zerocaf_tpu import Scalar
        w = Scalar.from_int(ks).windows(4, 63)
        d = np.asarray(fk._signed_recode(w, 4)).astype(np.int64)
        for row, k in zip(d, ks):
            assert sum(int(v) << (4 * i) for i, v in enumerate(row)) == k


class TestSignedComb:
    def test_signed_comb_matches_unsigned(self):
        """Signed-digit fixed-base comb == unsigned XLA comb for canonical
        scalars (both as XLA and as the stepped Pallas path)."""
        from zerocaf_tpu import Scalar
        from zerocaf_tpu.models import edwards as ed
        from zerocaf_tpu.models.ristretto import _compress

        cw = 8
        nwin = ed._fixed_base_table(cw).shape[0]
        assert ed._fixed_base_table_signed(cw).shape[0] == nwin
        ks = [int.from_bytes(rng.bytes(32), "little") % o.R for _ in range(24)]
        w = Scalar.from_int(ks).windows(cw, nwin)
        ref = _compress(ed._fixed_base_mul(w, cw))
        got_xla = _compress(ed._fixed_base_mul_signed(w, cw))
        assert (np.asarray(got_xla) == np.asarray(ref)).all()
        got_pl = _compress(fk.fixed_base_mul_stepped(
            w, cw, interpret=True, signed=True))
        assert (np.asarray(got_pl) == np.asarray(ref)).all()
        # pre-transposed-table gather (glue="lanes") is bit-identical
        got_ln = _compress(fk.fixed_base_mul_stepped(
            w, cw, interpret=True, signed=True, glue="lanes"))
        assert (np.asarray(got_ln) == np.asarray(ref)).all()
        # packed-limb gather (glue="packed": 2 limbs/int32, in-kernel
        # unpack + sign select) is bit-identical
        got_pk = _compress(fk.fixed_base_mul_stepped(
            w, cw, interpret=True, signed=True, glue="packed"))
        assert (np.asarray(got_pk) == np.asarray(ref)).all()
        # two-windows-per-step packed kernel (glue="packed2"; cw=8 gives
        # nwin=32, even -- also check an odd-window width below)
        got_p2 = _compress(fk.fixed_base_mul_stepped(
            w, cw, interpret=True, signed=True, glue="packed2"))
        assert (np.asarray(got_p2) == np.asarray(ref)).all()

    def test_packed2_odd_windows(self):
        """glue=packed2 with an odd window count (width 9 -> 28 windows?
        width giving odd nwin: 250/width): width 9 -> ceil(250/9)=28
        (even); width 11 -> 23 windows (odd) exercises the pad window."""
        from zerocaf_tpu import Scalar
        from zerocaf_tpu.models import edwards as ed
        from zerocaf_tpu.models.ristretto import _compress

        cw = 11
        nwin = ed._fixed_base_table_signed(cw).shape[0]
        assert nwin % 2 == 1
        ks = [int.from_bytes(rng.bytes(32), "little") % o.R for _ in range(8)]
        w = Scalar.from_int(ks).windows(cw, nwin)
        ref = _compress(ed._fixed_base_mul(w, cw))
        got = _compress(fk.fixed_base_mul_stepped(
            w, cw, interpret=True, signed=True, glue="packed2"))
        assert (np.asarray(got) == np.asarray(ref)).all()

    def test_signed_table_geometry(self):
        from zerocaf_tpu.models import edwards as ed
        t = ed._fixed_base_table_signed(8)
        assert t.shape == (32, 129, 3, 22)
        # entry 0 is the Niels identity (1, 1, 0)
        one = o.int_to_limbs(1)
        assert (t[:, 0, 0] == one).all() and (t[:, 0, 1] == one).all()
        assert (t[:, 0, 2] == 0).all()
