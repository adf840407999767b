"""Differential tests: native C++ host engine vs the pure-Python fallback.

VERDICT r2 item 7: CI previously exercised only whichever engine loaded;
these tests force BOTH paths on the same inputs (canonical scalars plus
adversarial bit patterns) and require identical outputs, and pin the shared
domain contract for the NAF recodings (k < 2^(nbits-1), both engines raise
via the binding-layer guard instead of silently truncating).

Reference anchors: scalar recodings /root/reference/src/backend/u64/
scalar.rs:352-442; byte codecs field.rs:563-631.
"""

import numpy as np
import pytest

from zerocaf_tpu import native, oracle


def _bytes32(k: int) -> np.ndarray:
    return np.frombuffer(int(k).to_bytes(32, "little"), dtype=np.uint8).copy()


# canonical + adversarial inputs (all < 2^255 so NAF recoding is in-domain)
CASES = [
    0, 1, 2, 3, 7, 0xFF, 1 << 12, (1 << 64) - 1, 1 << 127,
    oracle.R - 1, oracle.R, oracle.P - 1, oracle.P,
    (1 << 249) + 12345, (1 << 255) - 1,
    int.from_bytes(b"\xaa" * 32, "little") >> 1,  # alternating bits, < 2^255
]
BATCH = np.stack([_bytes32(k) for k in CASES])


def _both(fn_args):
    """Run a native.py entry point with and without the C++ library."""
    fn, args = fn_args[0], fn_args[1:]
    got_native = fn(*args)
    real_load = native._load
    try:
        native._load = lambda: None
        got_python = fn(*args)
    finally:
        native._load = real_load
    return got_native, got_python


requires_native = pytest.mark.skipif(
    not native.available(), reason="native library not built")


class TestNativeVsPython:
    @requires_native
    def test_naf(self):
        n, p = _both((native.naf, BATCH, 256))
        np.testing.assert_array_equal(n, p)
        # digits reconstruct the value: sum d_i 2^i == k
        w = 1 << np.arange(256, dtype=object)
        for row, k in zip(n, CASES):
            assert int((row.astype(object) * w).sum()) == k

    @requires_native
    @pytest.mark.parametrize("width", [3, 5, 7])
    def test_wnaf(self, width):
        n, p = _both((native.wnaf, BATCH, width, 256))
        np.testing.assert_array_equal(n, p)
        w = 1 << np.arange(256, dtype=object)
        for row, k in zip(n, CASES):
            assert int((row.astype(object) * w).sum()) == k
            nz = row[row != 0].astype(int)
            assert (np.abs(nz) < (1 << (width - 1))).all()
            assert (nz % 2 == 1).all()  # wNAF digits are odd

    @requires_native
    def test_bits(self):
        n, p = _both((native.bits, BATCH, 256))
        np.testing.assert_array_equal(n, p)

    @requires_native
    @pytest.mark.parametrize("c", [4, 8, 12])
    def test_windows(self, c):
        nwin = -(-256 // c)
        n, p = _both((native.windows, BATCH, c, nwin))
        np.testing.assert_array_equal(n, p)
        for row, k in zip(n, CASES):
            v = sum(int(d) << (c * i) for i, d in enumerate(row))
            assert v == k

    @requires_native
    def test_byte_limb_codecs(self):
        limbs_n, limbs_p = _both((native.bytes_to_limbs, BATCH))
        np.testing.assert_array_equal(limbs_n, limbs_p)
        back_n, back_p = _both((native.limbs_to_bytes, limbs_n))
        np.testing.assert_array_equal(back_n, back_p)
        np.testing.assert_array_equal(back_n, BATCH)


class TestNafDomain:
    """Both engines reject k >= 2^(nbits-1) at the binding layer."""

    @pytest.mark.parametrize("use_native", [False, True])
    def test_naf_overflow_raises(self, use_native):
        if use_native and not native.available():
            pytest.skip("native library not built")
        big = _bytes32((1 << 255) + 7)[None]
        if use_native:
            with pytest.raises(ValueError):
                native.naf(big, 256)
            with pytest.raises(ValueError):
                native.wnaf(big, 5, 256)
        else:
            real_load = native._load
            try:
                native._load = lambda: None
                with pytest.raises(ValueError):
                    native.naf(big, 256)
                with pytest.raises(ValueError):
                    native.wnaf(big, 5, 256)
            finally:
                native._load = real_load

    def test_oracle_naf_overflow_raises(self):
        with pytest.raises(ValueError):
            oracle.compute_naf((1 << 255) + 1, 256)
        with pytest.raises(ValueError):
            oracle.compute_window_naf((1 << 255) + 1, 5, 256)

    def test_wide_nbits_accepts_256bit(self):
        big = _bytes32((1 << 255) + 5)[None]
        dn, dp = _both((native.naf, big, 257))
        np.testing.assert_array_equal(dn, dp)
        w = 1 << np.arange(257, dtype=object)
        assert int((dn[0].astype(object) * w).sum()) == (1 << 255) + 5

    def test_wide_nbits_near_2_256_rejected(self):
        """k close to 2^256 would wrap the C++ engine's u256 during the
        add-back step; the guard rejects it for both engines."""
        big = _bytes32((1 << 256) - 1)[None]
        with pytest.raises(ValueError):
            native.naf(big, 257)
