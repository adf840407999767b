"""Curve constants in the TPU limb representation.

Every value here is *derived* at import time from first principles via the
pure-Python oracle (see tools/constants_gen.py for the bit-exact verification
against the reference's radix-2^52 limb values in
/root/reference/src/backend/u64/constants.rs).  Nothing is hand-copied.

Limb layout: int32[..., 22], radix 2^12, little-endian limbs (limb i holds
bits 12i .. 12i+11).  See zerocaf_tpu/config.py for the carry-budget analysis.
"""

from __future__ import annotations

import numpy as np

from . import oracle
from .config import NUM_LIMBS, RADIX_BITS

# ---------------------------------------------------------------------------
# Integer-level constants (exact Python ints)
# ---------------------------------------------------------------------------

P = oracle.P                        # field prime (constants.rs:30-36)
R = oracle.R                        # subgroup order (constants.rs:9)
DELTA_P = oracle.DELTA_P            # p - 2^252
DELTA_R = oracle.DELTA_R            # r - 2^249
FOLD_C_P = DELTA_P                  # 2^252 == -FOLD_C_P (mod p)
FOLD_C_R = 8 * DELTA_R              # 2^252 == -FOLD_C_R (mod r)

EDWARDS_A = oracle.EDWARDS_A
EDWARDS_D = oracle.EDWARDS_D
SQRT_M1 = oracle.SQRT_M1
C6 = oracle.C6                      # 6^((p-1)/4): Tonelli-raw sqrt(-1)
INV_SQRT_A = oracle.INV_SQRT_A
# -sqrt(a) (constants.rs:114-120).  With a = -1, sqrt(a) = i and
# 1/sqrt(a) = 1/i = -i, so MINUS_SQRT_A and INV_SQRT_A are the same element
# (the reference's two tables carry identical limbs).
MINUS_SQRT_A = oracle.INV_SQRT_A
INV_SQRT_A_MINUS_D = oracle.INV_SQRT_A_MINUS_D
SQRT_AD_MINUS_ONE = oracle.SQRT_AD_MINUS_ONE
ONE_MINUS_D_SQ = oracle.ONE_MINUS_D_SQ
D_MINUS_ONE_SQ = oracle.D_MINUS_ONE_SQ
INVERSE_MOD_TWO = oracle.INVERSE_MOD_TWO
SCALAR_INVERSE_MOD_TWO = oracle.SCALAR_INVERSE_MOD_TWO
MINUS_ONE_HALF = oracle.MINUS_ONE_HALF
POS_RANGE = oracle.POS_RANGE
MONT_A = oracle.MONT_A              # Montgomery-form A = 505186 checked below
MONT_B = oracle.MONT_B

# Fixed exponents for the branch-free chains (ops/inv_sqrt.py).
EXP_INV = P - 2                     # Fermat inverse
EXP_LEGENDRE = (P - 1) // 2
EXP_SQRT = (P + 3) // 8             # p == 5 (mod 8) closed-form sqrt
EXP_SQRT_RATIO = (P - 5) // 8       # dalek sqrt_ratio exponent
EXP_SINV = R - 2


def _limbs(v: int, n: int = NUM_LIMBS) -> np.ndarray:
    return np.array(oracle.int_to_limbs(v % (1 << (RADIX_BITS * n)), n=n), dtype=np.int32)


def fold_limbs(c: int) -> np.ndarray:
    """Fold constants are < 2^133 -> 12 limbs."""
    assert c < 1 << (12 * RADIX_BITS)
    return np.array(oracle.int_to_limbs(c, n=12), dtype=np.int32)


# ---------------------------------------------------------------------------
# Limb-array constants (np.int32[22]); jnp broadcasts these against [..., 22]
# ---------------------------------------------------------------------------

P_LIMBS = _limbs(P)
R_LIMBS = _limbs(R)
FOLD_C_P_LIMBS = fold_limbs(FOLD_C_P)
FOLD_C_R_LIMBS = fold_limbs(FOLD_C_R)
DELTA_R_LIMBS = fold_limbs(DELTA_R)

# --- f32x29 backend (radix 2^9; arrays stay integer np.int32, runtime casts
# to float32 at use sites -- see ops/limb.ModSpec) -------------------------


def _limbs_f9(v: int, n: int = 29) -> np.ndarray:
    return np.array(oracle.int_to_limbs(v % (1 << (9 * n)), n=n, w=9),
                    dtype=np.int32)


def fold_limbs_f9(c: int) -> np.ndarray:
    """Fold constants are < 2^133 -> 15 limbs at radix 2^9."""
    assert c < 1 << (9 * 15)
    return np.array(oracle.int_to_limbs(c, n=15, w=9), dtype=np.int32)


P_LIMBS_F9 = _limbs_f9(P)
R_LIMBS_F9 = _limbs_f9(R)
FOLD_C_P_LIMBS_F9 = fold_limbs_f9(FOLD_C_P)
FOLD_C_R_LIMBS_F9 = fold_limbs_f9(FOLD_C_R)
DELTA_R_LIMBS_F9 = fold_limbs_f9(DELTA_R)

ZERO_LIMBS = _limbs(0)
ONE_LIMBS = _limbs(1)
EDWARDS_D_LIMBS = _limbs(EDWARDS_D)
EDWARDS_2D_LIMBS = _limbs(2 * EDWARDS_D % P)   # Niels-form table scale
EDWARDS_A_LIMBS = _limbs(EDWARDS_A)
SQRT_M1_LIMBS = _limbs(SQRT_M1)
INV_SQRT_A_LIMBS = _limbs(INV_SQRT_A)
MINUS_SQRT_A_LIMBS = _limbs(MINUS_SQRT_A)
C6_LIMBS = _limbs(C6)
INV_SQRT_A_MINUS_D_LIMBS = _limbs(INV_SQRT_A_MINUS_D)
SQRT_AD_MINUS_ONE_LIMBS = _limbs(SQRT_AD_MINUS_ONE)
ONE_MINUS_D_SQ_LIMBS = _limbs(ONE_MINUS_D_SQ)
D_MINUS_ONE_SQ_LIMBS = _limbs(D_MINUS_ONE_SQ)
POS_RANGE_LIMBS = _limbs(POS_RANGE)

# ---------------------------------------------------------------------------
# Points.  Stored as stacked [4, 22] int32 (X, Y, Z, T rows).
# ---------------------------------------------------------------------------


def point_limbs(p: oracle.ExtPoint) -> np.ndarray:
    return np.stack([_limbs(c) for c in p])


BASEPOINT = point_limbs(oracle.BASEPOINT)            # constants.rs:188-211
IDENTITY = point_limbs(oracle.IDENTITY)
FOUR_COSET_GROUP = np.stack(                          # constants.rs:141-184
    [point_limbs(p) for p in oracle.FOUR_COSET_GROUP]
)

# The 126-entry fixed-base table: TABLE[i] = i * BASEPOINT
# (regenerated, not copied; backs windowed fixed-base multiplication the way
# BASEPOINT_ODD_MULTIPLES_TABLE backs window_naf_mul, constants.rs:216-973).
_table_pts = [oracle.IDENTITY]
for _ in range(125):
    _table_pts.append(oracle.point_add(_table_pts[-1], oracle.BASEPOINT))
BASEPOINT_MULTIPLES_TABLE = np.stack([point_limbs(p) for p in _table_pts])  # [126, 4, 22]

# Compressed basepoint encodings (src/constants.rs:13-21).
BASEPOINT_COMPRESSED = np.frombuffer(
    oracle.edwards_compress(oracle.BASEPOINT), dtype=np.uint8
).copy()
RISTRETTO_BASEPOINT_COMPRESSED = np.frombuffer(
    oracle.ristretto_compress(oracle.BASEPOINT), dtype=np.uint8
).copy()

# Montgomery A derived in sage_codes/curve_derivation:1-35.
assert MONT_A == 505186, MONT_A
