#!/usr/bin/env python
"""Curve derivation & safety checks: the pure-Python equivalent of the
reference's SageMath scripts (/root/reference/sage_codes/: curve_derivation,
LFACTOR_comp, "Point computation ", "Safe Curve code").

Re-derives every structural fact of the Sonny curve from first principles and
verifies the SafeCurves-style criteria that are checkable without point
counting (the curve order 8r itself is taken as the defining input, as in
docs/"Safe Curve criteria").  Run in CI: exits non-zero on any failure.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from zerocaf_tpu import oracle as o  # noqa: E402


def is_probable_prime(n: int, rounds: int = 40) -> bool:
    """Deterministic-enough Miller-Rabin for 256-bit inputs."""
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    import random

    rng = random.Random(0xC0FFEE)
    for _ in range(rounds):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = (x * x) % n
            if x == n - 1:
                break
        else:
            return False
    return True


def main() -> int:
    failures = 0

    def check(name, cond):
        nonlocal failures
        print(("ok  " if cond else "FAIL") + " " + name)
        if not cond:
            failures += 1

    p, r = o.P, o.R

    # -- primality (SafeCurves: field prime, group order prime)
    check("p is prime", is_probable_prime(p))
    check("r is prime", is_probable_prime(r))
    check("p == 5 (mod 8) (closed-form sqrt structure)", p % 8 == 5)

    # -- curve coefficient derivation (sage curve_derivation:1-35)
    d = o.fmul(o.fneg(126296), o.finv(126297))
    check("d == -126296/126297 (mod p)", d == o.EDWARDS_D)
    check("a = -1 is a square (completeness)", o.legendre_symbol(p - 1) == 1)
    check("d is non-square (completeness)", o.legendre_symbol(d) == -1)
    check("d != -1 and d != 1", d not in (1, p - 1))

    # -- Montgomery form (A = 505186 from sage)
    A_m = o.fmul(2, o.fdiv(o.fadd(o.EDWARDS_A, d), o.fsub(o.EDWARDS_A, d)))
    check("Montgomery A == 505186", A_m == 505186)
    check("A^2 - 4 is non-square (single point of order 2 on Montgomery form)",
          o.legendre_symbol(o.fsub(o.fmul(A_m, A_m), 4)) == -1)

    # -- basepoint (sage "Point computation ": y = 3/5)
    y = o.fdiv(3, 5)
    bp = o.point_from_y(y, 0)
    check("basepoint on curve", o.point_is_valid(bp))
    check("basepoint has order r", o.point_eq(o.scalar_mul(bp, r), o.IDENTITY))
    check("basepoint does not have smaller order r/f",
          not o.point_eq(o.scalar_mul(bp, 1), o.IDENTITY))

    # -- cofactor structure: curve order n = 8r
    n = 8 * r
    t = p + 1 - n  # Frobenius trace
    check("Hasse bound |t| <= 2*sqrt(p)", t * t <= 4 * p)
    # 4-torsion points exist: (+-i, 0) with i = sqrt(-1); order-2: (0, -1)
    i_pt = (o.SQRT_M1, 0, 1, 0)
    check("(i, 0) on curve (order-4 torsion)", o.point_is_valid(i_pt))
    check("(i, 0) has order 4",
          o.point_eq(o.scalar_mul(i_pt, 4), o.IDENTITY)
          and not o.point_eq(o.scalar_mul(i_pt, 2), o.IDENTITY))

    # -- twist order: n' = 2(p+1) - n; quadratic twist security context
    n_twist = 2 * (p + 1) - n
    check("order + twist order == 2(p+1)", n + n_twist == 2 * (p + 1))
    # rho complexity ~ sqrt(pi*r/4) > 2^100 (docs/"Safe Curve criteria":6)
    check("rho cost sqrt(pi*r/4) > 2^100", (3.14159 * r / 4) ** 0.5 > 2 ** 100)

    # -- embedding degree check: r does not divide p^k - 1 for small k
    # (SafeCurves transfer criterion; k up to 30 suffices to rule out MOV)
    emb_ok = all(pow(p, k, r) != 1 for k in range(1, 31))
    check("no low embedding degree (k <= 30)", emb_ok)

    # -- Montgomery u-coordinate of the basepoint consistent with maps
    u = o.edwards_to_montgomery_u(bp)
    check("montgomery roundtrip of basepoint",
          o.montgomery_u_to_edwards_y(u) == o.point_to_affine(bp)[1])

    # -- LFACTOR derivation (sage LFACTOR_comp; constants.rs:15-18)
    check("LFACTOR: r * LFACTOR == -1 (mod 2^52)",
          (r * 1331240223835829) % (1 << 52) == (1 << 52) - 1)

    if failures:
        print(f"\n{failures} FAILURES")
        return 1
    print("\nAll curve derivations and safety criteria verified.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
