"""Constants verification: run the derivation/verification tool in-process."""

import numpy as np

import tools.constants_gen as gen
from zerocaf_tpu import constants as c
from zerocaf_tpu import oracle as o


def test_constants_gen_verifies():
    assert gen.main() == 0


def test_limb_roundtrip():
    for v in [0, 1, c.P - 1, c.EDWARDS_D, c.SQRT_M1]:
        limbs = c._limbs(v)
        assert limbs.dtype == np.int32
        assert o.limbs_to_int(limbs) == v
        assert (limbs >= 0).all() and (limbs < 4096).all()


def test_fold_constants():
    # 2^252 == -FOLD_C (mod m) is the whole reduction story.
    assert (1 << 252) % c.P == (-c.FOLD_C_P) % c.P
    assert (1 << 252) % c.R == (-c.FOLD_C_R) % c.R
    assert c.FOLD_C_P < 1 << 133 and c.FOLD_C_R < 1 << 133


def test_basepoint_table():
    assert c.BASEPOINT_MULTIPLES_TABLE.shape == (126, 4, 22)
    # spot-check entry 5 == 5*B
    entry = tuple(o.limbs_to_int(c.BASEPOINT_MULTIPLES_TABLE[5][i]) for i in range(4))
    assert o.point_eq(entry, o.scalar_mul(o.BASEPOINT, 5))


def test_compressed_basepoints():
    assert bytes(c.RISTRETTO_BASEPOINT_COMPRESSED) == bytes.fromhex(
        "0200000000000000000000000000000000000000000000000000000000000000")
