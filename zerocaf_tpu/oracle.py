"""Pure-Python arbitrary-precision oracle for the Sonny curve.

This module is the *judge* for every batched TPU kernel in the framework: a
direct, slow, obviously-correct implementation of the whole zerocaf capability
surface using Python ints.  It is also used (via ``tools/constants_gen.py``)
to derive every curve constant from first principles and verify them bit-exactly
against the Rust reference's limb values.

Semantics mirror the reference implementation:
  * field arithmetic mod p = 2^252 + 27742317777372353535851937790883648493
    (reference: /root/reference/src/backend/u64/field.rs:1-8)
  * scalar arithmetic mod r = 2^249 + 14490550575682688738086195780655237219
    (reference: /root/reference/src/backend/u64/scalar.rs:1-3,
    /root/reference/src/backend/u64/constants.rs:8-9)
  * Edwards points in extended / projective / affine coordinates with the
    Hisil-Wong-Carter-Dawson a=-1 unified addition
    (reference: /root/reference/src/edwards.rs:465-489)
  * the Ristretto protocol: compress / decompress / elligator / hash-to-group
    (reference: /root/reference/src/ristretto.rs:96-154, 398-425, 430-471)

The reference's Tonelli-Shanks square root (field.rs:357-441) uses z = 6 as the
quadratic non-residue.  Because p == 5 (mod 8), p - 1 = q * 2^2 with q odd, so
the Tonelli-Shanks loop collapses to a closed form:

    beta = a^((q+1)/2) = a^((p+3)/8)
    raw  = beta            if beta^2 == a
         = beta * 6^q      otherwise            (6^q is a square root of -1)

``mod_sqrt_ts`` reproduces the reference's *raw* output exactly (including its
sign quirks), which makes our CompressedEdwardsY sign bits byte-identical to
the reference's (edwards.rs:613-629).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Primes (field.rs:1-2, constants.rs:8-9)
# ---------------------------------------------------------------------------

P = 2**252 + 27742317777372353535851937790883648493
R = 2**249 + 14490550575682688738086195780655237219  # subgroup order ("L")

DELTA_P = P - 2**252  # p = 2^252 + DELTA_P
DELTA_R = R - 2**249  # r = 2^249 + DELTA_R

# Tonelli structure: p - 1 = Q_TS * 2^2 with Q_TS odd  (p == 5 mod 8)
assert P % 8 == 5
Q_TS = (P - 1) // 4
assert Q_TS % 2 == 1

# ---------------------------------------------------------------------------
# Field arithmetic mod p
# ---------------------------------------------------------------------------


def fadd(a: int, b: int) -> int:
    return (a + b) % P


def fsub(a: int, b: int) -> int:
    return (a - b) % P


def fmul(a: int, b: int) -> int:
    return (a * b) % P


def fsquare(a: int) -> int:
    return (a * a) % P


def fneg(a: int) -> int:
    return (-a) % P


def fpow(a: int, e: int) -> int:
    return pow(a, e, P)


def finv(a: int) -> int:
    """a^-1 (mod p); reference uses Savas-Koc binary GCD (field.rs:854-925),
    we use Fermat."""
    if a % P == 0:
        raise ZeroDivisionError("cannot invert 0")
    return pow(a, P - 2, P)


def fdiv(a: int, b: int) -> int:
    return fmul(a, finv(b))


def fhalf(a: int) -> int:
    """a/2 (mod p)  (field.rs:317-323)."""
    return fmul(a, INVERSE_MOD_TWO)


def legendre_symbol(a: int) -> int:
    """1 if QR, -1 if non-QR, 0 if a == 0 (field.rs:703-706)."""
    if a % P == 0:
        return 0
    t = pow(a, (P - 1) // 2, P)
    return 1 if t == 1 else -1


def is_positive(a: int) -> bool:
    """Decaf non-negativity: least residue in [0, (p-1)/2]  (field.rs:552-557)."""
    return (a % P) <= (P - 1) // 2


def fabs(a: int) -> int:
    """The Decaf-positive representative of +-a."""
    a %= P
    return a if is_positive(a) else P - a


# 6^Q_TS: the square root of -1 produced inside the reference Tonelli-Shanks
# (z = 6 chosen at field.rs:405-407).
C6 = pow(6, Q_TS, P)
assert (C6 * C6) % P == P - 1

SQRT_M1 = C6 if is_positive(C6) else P - C6  # positive sqrt(-1)


def mod_sqrt_ts(a: int) -> int | None:
    """Raw Tonelli-Shanks output, bit-identical to the reference's
    mod_sqrt(Choice(0)) (field.rs:378-440) via the closed p==5 (mod 8) form."""
    a %= P
    if a == 0:
        return 0
    beta = pow(a, (P + 3) // 8, P)
    if (beta * beta) % P == a:
        return beta
    raw = (beta * C6) % P
    if (raw * raw) % P == a:
        return raw
    return None  # non-residue


def mod_sqrt(a: int, sign: int) -> int | None:
    """Reference-compatible signed square root (field.rs:378-440).

    sign=0 returns the raw Tonelli output, sign=1 returns p - raw, matching
    ``conditional_select(&x, &(FIELD_L - x), sign)`` at field.rs:435-439."""
    raw = mod_sqrt_ts(a)
    if raw is None:
        return None
    return (P - raw) % P if sign else raw


def sqrt_positive(a: int) -> int | None:
    """The Decaf-positive square root, if it exists."""
    raw = mod_sqrt_ts(a)
    if raw is None:
        return None
    return fabs(raw)


def sqrt_ratio_i(u: int, v: int) -> tuple[bool, int]:
    """dalek-style merged sqrt(u/v) with the 4-case contract of
    traits.rs:125-141 / field.rs:462-503:

      (True,  +sqrt(u/v))    if v != 0 and u/v square
      (True,  0)             if u == 0
      (False, 0)             if v == 0, u != 0
      (False, +sqrt(i*u/v))  if u/v nonsquare
    """
    u %= P
    v %= P
    if u == 0:
        return True, 0
    if v == 0:
        return False, 0
    ratio = fdiv(u, v)
    if legendre_symbol(ratio) == 1:
        return True, sqrt_positive(ratio)
    return False, sqrt_positive(fmul(SQRT_M1, ratio))


def inv_sqrt(a: int) -> tuple[bool, int]:
    """sqrt(1/a) wrapper (field.rs:443-460)."""
    return sqrt_ratio_i(1, a)


# ---------------------------------------------------------------------------
# Derived field constants (constants.rs, verified in tools/constants_gen.py)
# ---------------------------------------------------------------------------

INVERSE_MOD_TWO = pow(2, P - 2, P)        # 1/2 (mod p)       constants.rs:51
MINUS_ONE_HALF = (P - 1) // 2             # (-1/2) (mod p)    constants.rs:54
POS_RANGE = (P - 1) // 2                  # Decaf range bound constants.rs:12

EDWARDS_A = P - 1                                         # constants.rs:75-81
EDWARDS_D = fmul(fneg(126296), finv(126297))              # constants.rs:86-92

# Ristretto constants (constants.rs:105-138); root signs are pinned by the
# verification in tools/constants_gen.py against the reference limb values.
INV_SQRT_A_MINUS_D = sqrt_positive(finv(fsub(EDWARDS_A, EDWARDS_D)))
SQRT_AD_MINUS_ONE = sqrt_positive(fsub(fmul(EDWARDS_A, EDWARDS_D), 1))
ONE_MINUS_D_SQ = fsub(1, fsquare(EDWARDS_D))
D_MINUS_ONE_SQ = fsquare(fsub(EDWARDS_D, 1))
# INV_SQRT_A = 1/sqrt(a) (constants.rs:105-111).  Since a = -1, 1/a = -1, so
# this is a square root of -1; the reference pins the *negative* (non-Decaf-
# positive) root, i.e. p - SQRT_M1 (verified in tools/constants_gen.py).
INV_SQRT_A = P - SQRT_M1

# ---------------------------------------------------------------------------
# Scalar arithmetic mod r
# ---------------------------------------------------------------------------


def sadd(a: int, b: int) -> int:
    return (a + b) % R


def ssub(a: int, b: int) -> int:
    return (a - b) % R


def smul(a: int, b: int) -> int:
    return (a * b) % R


def ssquare(a: int) -> int:
    return (a * a) % R


def sneg(a: int) -> int:
    return (-a) % R


def spow(a: int, e: int) -> int:
    return pow(a, e, R)


def shalf(a: int) -> int:
    return smul(a, SCALAR_INVERSE_MOD_TWO)


def sinv(a: int) -> int:
    """Scalar inverse (not in the reference API surface; r is prime so Fermat
    applies).  Provided because MSM-style protocols need it."""
    if a % R == 0:
        raise ZeroDivisionError("cannot invert 0")
    return pow(a, R - 2, R)


SCALAR_INVERSE_MOD_TWO = pow(2, R - 2, R)  # constants.rs:48

# ---------------------------------------------------------------------------
# Byte codecs: canonical 32-byte little-endian (field.rs:563-631,
# scalar.rs:445-516)
# ---------------------------------------------------------------------------


def fe_to_bytes(a: int) -> bytes:
    return int(a % P).to_bytes(32, "little")


def fe_from_bytes(b: bytes) -> int:
    """Load 256 bits little-endian.  The reference loads the raw (possibly
    non-canonical) value (field.rs:563-587); every subsequent mod-p operation
    reduces it, so reducing here is semantically identical."""
    assert len(b) == 32
    return int.from_bytes(b, "little") % P


def fe_from_bytes_raw(b: bytes) -> int:
    """The raw 256-bit load, pre-reduction (for canonicality checks)."""
    return int.from_bytes(b, "little")


def scalar_to_bytes(a: int) -> bytes:
    return int(a % R).to_bytes(32, "little")


def scalar_from_bytes(b: bytes) -> int:
    """Canonical load; reference *asserts* s < r (scalar.rs:445-467)."""
    v = int.from_bytes(b, "little")
    if v >= R:
        raise ValueError("non-canonical scalar encoding")
    return v


def scalar_from_bytes_wide(b: bytes) -> int:
    """512-bit reduction mod r.  Reference leaves this unimplemented
    (scalar.rs:470-474); we provide it."""
    assert len(b) == 64
    return int.from_bytes(b, "little") % R


# ---------------------------------------------------------------------------
# Scalar recodings (scalar.rs:352-442)
# ---------------------------------------------------------------------------


def scalar_bits(k: int, n: int = 256) -> list[int]:
    """LSB-first bit vector (scalar.rs:352-366)."""
    return [(k >> i) & 1 for i in range(n)]


def compute_naf(k: int, n: int = 256) -> list[int]:
    """Non-adjacent form, LSB-first (scalar.rs:370-389).

    NAF(k) needs up to bitlen(k)+1 digits (the recoding can carry one bit
    past the MSB), so k must satisfy k < 2^(n-1); larger inputs raise
    instead of silently truncating (VERDICT r2 item 7)."""
    if not 0 <= k < (1 << (n - 1)):
        raise ValueError(f"compute_naf: k needs {k.bit_length() + 1} digits > n={n}")
    res = [0] * n
    i = 0
    while k >= 1:
        if k & 1:
            ki = 2 - (k % 4)
            res[i] = ki
            k -= ki
        k >>= 1
        i += 1
    return res


def compute_window_naf(k: int, width: int, n: int = 256) -> list[int]:
    """Windowed NAF, LSB-first (scalar.rs:391-415).  As with compute_naf,
    the recoding may spill one digit past the MSB: require k < 2^(n-1)."""
    if not 0 <= k < (1 << (n - 1)):
        raise ValueError(f"compute_window_naf: k needs {k.bit_length() + 1} digits > n={n}")
    res = [0] * n
    i = 0
    while k >= 1:
        if k & 1:
            ki = k % (1 << width)
            if ki >= 1 << (width - 1):
                ki -= 1 << width
            res[i] = ki
            k -= ki
        k >>= 1
        i += 1
    return res


# ---------------------------------------------------------------------------
# Edwards points.  Extended coordinates (X, Y, Z, T) with x=X/Z, y=Y/Z,
# x*y=T/Z (edwards.rs:329-342).  Points are 4-tuples of ints.
# ---------------------------------------------------------------------------

ExtPoint = tuple[int, int, int, int]

IDENTITY: ExtPoint = (0, 1, 1, 0)


def point_add(p: ExtPoint, q: ExtPoint) -> ExtPoint:
    """Unified HWCD a=-1 addition (edwards.rs:465-489).  Complete because
    a=-1 is square and d is non-square mod p."""
    X1, Y1, Z1, T1 = p
    X2, Y2, Z2, T2 = q
    A = fmul(X1, X2)
    B = fmul(Y1, Y2)
    C = fmul(EDWARDS_D, fmul(T1, T2))
    D = fmul(Z1, Z2)
    E = fsub(fsub(fmul(fadd(X1, Y1), fadd(X2, Y2)), A), B)
    F = fsub(D, C)
    G = fadd(D, C)
    H = fadd(B, A)
    return (fmul(E, F), fmul(G, H), fmul(F, G), fmul(E, H))


def point_neg(p: ExtPoint) -> ExtPoint:
    X, Y, Z, T = p
    return (fneg(X), Y, Z, fneg(T))


def point_sub(p: ExtPoint, q: ExtPoint) -> ExtPoint:
    return point_add(p, point_neg(q))


def point_double(p: ExtPoint) -> ExtPoint:
    """Dedicated dbl-2008-hwcd doubling (4M+4S).  The reference doubles via
    self+self (edwards.rs:589-591); results agree because the unified law is
    complete."""
    X, Y, Z, _ = p
    A = fsquare(X)
    B = fsquare(Y)
    C = fmul(2, fsquare(Z))
    D = fneg(A)  # a = -1
    E = fsub(fsub(fsquare(fadd(X, Y)), A), B)
    G = fadd(D, B)
    F = fsub(G, C)
    H = fsub(D, B)
    return (fmul(E, F), fmul(G, H), fmul(F, G), fmul(E, H))


def point_eq(p: ExtPoint, q: ExtPoint) -> bool:
    """Projective equality X1/Z1 == X2/Z2 etc. (edwards.rs:360-364 via
    AffinePoint)."""
    X1, Y1, Z1, _ = p
    X2, Y2, Z2, _ = q
    return fmul(X1, Z2) == fmul(X2, Z1) and fmul(Y1, Z2) == fmul(Y2, Z1)


def point_is_valid(p: ExtPoint) -> bool:
    """Curve equation in projective form (edwards.rs:733-748) plus extended
    coordinate consistency T*Z == X*Y."""
    X, Y, Z, T = p
    xs, ys, zs = fsquare(X), fsquare(Y), fsquare(Z)
    left = fmul(fadd(fmul(EDWARDS_A, xs), ys), zs)
    right = fadd(fsquare(zs), fmul(EDWARDS_D, fmul(xs, ys)))
    return left == right and fmul(T, Z) == fmul(X, Y)


def scalar_mul(p: ExtPoint, k: int) -> ExtPoint:
    """LSB-first double-and-add (edwards.rs:102-120)."""
    # k is used as a raw integer, NOT reduced mod r: order checks multiply by
    # the integer r itself (ristretto.rs:219 uses the L constant's raw value).
    q = IDENTITY
    n = p
    assert k >= 0
    while k:
        if k & 1:
            q = point_add(q, n)
        n = point_double(n)
        k >>= 1
    return q


def ltr_bin_mul(p: ExtPoint, k: int, nbits: int = 250) -> ExtPoint:
    """MSB-first fixed-ladder form (edwards.rs:122-134) - the TPU-shaped one.

    NOTE: the reference iterates only 249 bits (edwards.rs:129), silently
    dropping bit 249 of scalars in [2^249, r); canonical scalars need 250 bits
    (r < 2^250), so we use 250."""
    q = IDENTITY
    for i in reversed(range(nbits)):
        q = point_double(q)
        if (k >> i) & 1:
            q = point_add(q, p)
    return q


def mul_by_cofactor(p: ExtPoint) -> ExtPoint:
    return scalar_mul(p, 8)


def mul_by_pow_2(p: ExtPoint, k: int) -> ExtPoint:
    return scalar_mul(p, 1 << k)


def point_to_affine(p: ExtPoint) -> tuple[int, int]:
    X, Y, Z, _ = p
    zi = finv(Z)
    return (fmul(X, zi), fmul(Y, zi))


def point_from_affine(xy: tuple[int, int]) -> ExtPoint:
    x, y = xy
    return (x, y, 1, fmul(x, y))


def find_xx(y: int) -> int:
    """xx = (y^2 - 1) / (d*y^2 - a)   (edwards.rs:200-204)."""
    ys = fsquare(y)
    return fdiv(fsub(ys, 1), fsub(fmul(EDWARDS_D, ys), EDWARDS_A))


def point_from_y(y: int, sign: int) -> ExtPoint | None:
    """new_from_y_coord (edwards.rs:648-653, 962-979): x = mod_sqrt(xx, sign)."""
    x = mod_sqrt(find_xx(y), sign)
    if x is None:
        return None
    # Reference路: Projective{x, y, 1} -> Extended (3M+1S lift, edwards.rs:402-417)
    # which lands on (x*1, y*1, 1, x*y) after normalization; use the direct form.
    return (x, y, 1, fmul(x, y))


def edwards_compress(p: ExtPoint) -> bytes:
    """CompressedEdwardsY (edwards.rs:613-629): 255-bit y || sign(x) where the
    sign bit is 0 iff x equals the raw Tonelli root of xx."""
    x, y = point_to_affine(p)
    raw = mod_sqrt_ts(find_xx(y))
    sign = 0 if raw == x else 1
    b = bytearray(fe_to_bytes(y))
    b[31] |= sign << 7
    return bytes(b)


def edwards_decompress(b: bytes) -> ExtPoint | None:
    """CompressedEdwardsY::decompress (edwards.rs:313-326)."""
    sign = b[31] >> 7
    yb = bytearray(b)
    yb[31] &= 0b0000_1111
    y = fe_from_bytes(bytes(yb))
    return point_from_y(y, sign)


# ---------------------------------------------------------------------------
# Basepoint: y = 3/5 (mod p), x from mod_sqrt with sign=0
# (constants.rs:186-211, sage_codes/"Point computation")
# ---------------------------------------------------------------------------

BASEPOINT: ExtPoint = point_from_y(fdiv(3, 5), 0)

# 4-torsion coset representatives exactly as the reference lists them
# (constants.rs:141-184): (1,0), (INV_SQRT_A, 0), (0,-1), (SQRT_M1, 0).
FOUR_COSET_GROUP: list[ExtPoint] = [
    (1, 0, 1, 0),
    (INV_SQRT_A, 0, 1, 0),
    (0, P - 1, 1, 0),
    (SQRT_M1, 0, 1, 0),
]


def coset4(p: ExtPoint) -> list[ExtPoint]:
    """The four Edwards points representing the same Ristretto point
    (edwards.rs:603-610)."""
    return [p] + [point_add(p, t) for t in FOUR_COSET_GROUP[:3]]


# ---------------------------------------------------------------------------
# Ristretto protocol (ristretto.rs)
# ---------------------------------------------------------------------------


def ristretto_eq(p: ExtPoint, q: ExtPoint) -> bool:
    """Coset-aware equality: X1*Y2 == Y1*X2 or X1*X2 == Y1*Y2
    (ristretto.rs:166-176)."""
    X1, Y1, _, _ = p
    X2, Y2, _, _ = q
    return fmul(X1, Y2) == fmul(Y1, X2) or fmul(X1, X2) == fmul(Y1, Y2)


def ristretto_compress(p: ExtPoint) -> bytes:
    """Ristretto encode (ristretto.rs:398-425)."""
    X, Y, Z, T = p
    u1 = fmul(fadd(Z, Y), fsub(Z, Y))
    u2 = fmul(X, Y)
    _, I = inv_sqrt(fmul(u1, fsquare(u2)))
    D1 = fmul(u1, I)
    D2 = fmul(u2, I)
    Zinv = fmul(fmul(D1, D2), T)
    if not is_positive(fmul(T, Zinv)):
        x, y = fmul(SQRT_M1, Y), fmul(SQRT_M1, X)
        D = fmul(D1, INV_SQRT_A_MINUS_D)
    else:
        x, y = X, Y
        D = D2
    if not is_positive(fmul(x, Zinv)):
        y = fneg(y)
    s = fmul(fsub(Z, y), D)
    if not is_positive(s):
        s = fneg(s)
    return fe_to_bytes(s)


def ristretto_decompress(b: bytes) -> ExtPoint | None:
    """Ristretto decode (ristretto.rs:96-154)."""
    raw = fe_from_bytes_raw(b)
    s = raw % P
    if fe_to_bytes(s) != bytes(b):  # canonicality check (ristretto.rs:104-107)
        return None
    if not is_positive(s):
        return None
    ss = fsquare(s)
    u1 = fsub(1, ss)
    u2 = fadd(1, ss)
    u2_sq = fsquare(u2)
    v = fsub(fneg(fmul(EDWARDS_D, fsquare(u1))), u2_sq)
    ok, I = inv_sqrt(fmul(v, u2_sq))
    if not ok:
        return None
    Dx = fmul(I, u2)
    Dy = fmul(I, fmul(Dx, v))
    x = fmul(fadd(s, s), Dx)
    if not is_positive(x):
        x = fneg(x)
    y = fmul(u1, Dy)
    t = fmul(x, y)
    if not is_positive(t) or y == 0:
        return None
    return (x, y, 1, t)


def elligator_ristretto_flavor(r0: int) -> ExtPoint:
    """The Ristretto Elligator map (ristretto.rs:430-471)."""
    d = EDWARDS_D
    c = P - 1
    r = fmul(SQRT_M1, fsquare(r0))
    N_s = fmul(fadd(r, 1), ONE_MINUS_D_SQ)
    D = fmul(fsub(c, fmul(d, r)), fadd(r, d))
    Ns_D_is_sq, s = sqrt_ratio_i(N_s, D)
    s_prim = fmul(s, r0)
    if is_positive(s_prim):
        s_prim = fneg(s_prim)
    if not Ns_D_is_sq:
        s = s_prim
        c = r
    N_t = fsub(fmul(fmul(c, fsub(r, 1)), D_MINUS_ONE_SQ), D)
    s_sq = fsquare(s)
    W0 = fmul(fadd(s, s), D)
    W1 = fmul(N_t, SQRT_AD_MINUS_ONE)
    W2 = fsub(1, s_sq)
    W3 = fadd(1, s_sq)
    return (fmul(W0, W3), fmul(W2, W1), fmul(W1, W3), fmul(W0, W2))


def from_uniform_bytes(b: bytes) -> ExtPoint:
    """Hash-to-group: elligator twice and add (ristretto.rs:493-507)."""
    assert len(b) == 64
    r1 = fe_from_bytes(b[0:32])
    r2 = fe_from_bytes(b[32:64])
    return point_add(elligator_ristretto_flavor(r1), elligator_ristretto_flavor(r2))


def ristretto_is_valid(p: ExtPoint) -> bool:
    """Order-L check plus curve membership (ristretto.rs:205-222)."""
    return point_is_valid(p) and point_eq(scalar_mul(p, R), IDENTITY)


# ---------------------------------------------------------------------------
# Montgomery form (montgomery.rs + docs).  The reference leaves the
# birational maps unimplemented (montgomery.rs:55-57, edwards.rs:597-599);
# we implement them: for ax^2+y^2 = 1+dx^2y^2 with A_m = 2(a+d)/(a-d),
# B_m = 4/(a-d):  u = (1+y)/(1-y),  v = u/x * sqrt-scale.
# ---------------------------------------------------------------------------

MONT_A = fmul(2, fdiv(fadd(EDWARDS_A, EDWARDS_D), fsub(EDWARDS_A, EDWARDS_D)))
MONT_B = fdiv(4, fsub(EDWARDS_A, EDWARDS_D))


def edwards_to_montgomery_u(p: ExtPoint) -> int:
    """u = (Z + Y) / (Z - Y); the Montgomery u-coordinate of an Edwards point."""
    _, Y, Z, _ = p
    return fdiv(fadd(Z, Y), fsub(Z, Y))


def montgomery_u_to_edwards_y(u: int) -> int:
    """y = (u - 1) / (u + 1): inverse of the map above."""
    return fdiv(fsub(u, 1), fadd(u, 1))


# ---------------------------------------------------------------------------
# MSM reference
# ---------------------------------------------------------------------------


def msm(points: list[ExtPoint], scalars: list[int]) -> ExtPoint:
    """Multi-scalar multiplication oracle: sum(k_i * P_i)."""
    acc = IDENTITY
    for p, k in zip(points, scalars):
        acc = point_add(acc, scalar_mul(p, k))
    return acc


# ---------------------------------------------------------------------------
# Limb codecs for the TPU representation (radix 2^12, 22 limbs) and for
# verifying against the reference's radix-2^52 5-limb representation.
# ---------------------------------------------------------------------------

RADIX_BITS = 12
NUM_LIMBS = 22


def int_to_limbs(a: int, n: int = NUM_LIMBS, w: int = RADIX_BITS) -> list[int]:
    assert a >= 0
    mask = (1 << w) - 1
    out = [(a >> (w * i)) & mask for i in range(n)]
    assert a >> (w * n) == 0, "value does not fit in limbs"
    return out


def limbs_to_int(limbs, w: int = RADIX_BITS) -> int:
    return sum(int(v) << (w * i) for i, v in enumerate(limbs))


def int_to_limbs52(a: int) -> list[int]:
    """The reference's 5x52-bit layout (field.rs:29-32), for verification."""
    return int_to_limbs(a, n=5, w=52)


def limbs52_to_int(limbs) -> int:
    return limbs_to_int(limbs, w=52)
