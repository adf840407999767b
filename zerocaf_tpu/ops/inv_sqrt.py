"""Branch-free inversion / Legendre / square-root chains for the field.

Replaces three data-dependent reference algorithms with fixed-trip
exponentiations (required for XLA's trace-once compilation model):

  * inverse:  Savas-Koc binary GCD (field.rs:854-925)  -> Fermat a^(p-2)
  * legendre: pow((p-1)/2) (field.rs:703-706)          -> same, batched
  * mod_sqrt: Tonelli-Shanks loop (field.rs:357-441)   -> closed form for
    p == 5 (mod 8): p-1 = q*2^2 with q odd, so the TS loop runs at most
    once and collapses to:  beta = a^((p+3)/8);  raw = beta or beta*6^q.
    6^q is a fixed constant square root of -1 (the reference picks z=6 at
    field.rs:405-407), so `raw` is bit-identical to the reference's raw
    Tonelli output -- compressed-point sign bits match byte-for-byte.
  * sqrt_ratio_i: Legendre + full Tonelli (field.rs:462-503) -> the dalek
    single-exponentiation trick (one pow((p-5)/8) total), same 4-case
    contract (traits.rs:125-141).

All functions take/return semi-reduced [..., nlimbs] limb arrays and are
parameterized by the limb backend (`spec`, default i32x22) -- the backend
registry (ops/limb.BACKENDS, the analogue of src/backend/mod.rs:9-16)
reaches these chains through FieldElement's spec routing.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as C
from . import limb
from .limb import FIELD, ModSpec

# Fixed exponents
_E_INV = C.P - 2
_E_LEGENDRE = (C.P - 1) // 2
_E_SQRT = (C.P + 3) // 8
_E_RATIO = (C.P - 5) // 8


def inverse(a: jnp.ndarray, spec: ModSpec = FIELD) -> jnp.ndarray:
    """a^-1 (mod p) by Fermat.  NOTE: returns 0 for a == 0 (batched kernels
    cannot raise; callers that need the reference's panic behavior check
    is_zero separately)."""
    return limb.pow_const(a, _E_INV, spec)


def legendre_is_qr(a: jnp.ndarray, spec: ModSpec = FIELD) -> jnp.ndarray:
    """True where a is a nonzero quadratic residue (mod p)."""
    sym = limb.pow_const(a, _E_LEGENDRE, spec)
    return limb.eq(sym, limb.from_int(1, spec), spec)


def is_positive(a: jnp.ndarray, spec: ModSpec = FIELD) -> jnp.ndarray:
    """Decaf non-negativity: canonical value <= (p-1)/2 (field.rs:552-557),
    branch-free."""
    ca = limb.canonical(a, spec)
    pos_plus_1 = limb.from_int(C.POS_RANGE + 1, spec)
    return ~limb.geq_const(ca, pos_plus_1)


def abs_positive(a: jnp.ndarray, spec: ModSpec = FIELD) -> jnp.ndarray:
    """The Decaf-positive representative of +-a."""
    return limb.select(is_positive(a, spec), a, limb.neg(a))


def conditional_negate(a: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
    return limb.select(cond, limb.neg(a), a)


def sqrt_raw(a: jnp.ndarray, spec: ModSpec = FIELD) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(exists, raw_root): raw_root is the reference's raw Tonelli output.
    exists is False for non-residues (raw is then garbage); a == 0 gives
    (True, 0)."""
    beta = limb.pow_const(a, _E_SQRT, spec)
    beta_sq = limb.square(beta, spec)
    t_is_one = limb.eq(beta_sq, a, spec)
    c6 = limb.from_int(C.C6, spec)
    raw = limb.select(t_is_one, beta, limb.mul(beta, c6, spec))
    exists = limb.eq(limb.square(raw, spec), a, spec)
    return exists, raw


def mod_sqrt(a: jnp.ndarray, sign: jnp.ndarray,
             spec: ModSpec = FIELD) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reference mod_sqrt semantics (field.rs:378-440): sign=0 -> raw root,
    sign=1 -> p - raw.  Returns (exists, root)."""
    exists, raw = sqrt_raw(a, spec)
    root = limb.select(jnp.asarray(sign, dtype=bool), limb.neg(raw), raw)
    # a == 0: both signs give 0
    return exists, limb.select(limb.is_zero(a, spec), jnp.zeros_like(root), root)


def sqrt_ratio_i(u: jnp.ndarray, v: jnp.ndarray,
                 spec: ModSpec = FIELD) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The 4-case contract of traits.rs:125-141:
      (True,  +sqrt(u/v))   if v != 0 and u/v square
      (True,  0)            if u == 0
      (False, 0)            if v == 0 and u != 0
      (False, +sqrt(i*u/v)) if u/v nonsquare
    via r = (u*v^3) * (u*v^7)^((p-5)/8) and one multiplicative fixup."""
    u, v = jnp.broadcast_arrays(u, v)
    v3 = limb.mul(limb.square(v, spec), v, spec)
    v7 = limb.mul(limb.square(v3, spec), v, spec)
    r = limb.mul(limb.mul(u, v3, spec),
                 limb.pow_const(limb.mul(u, v7, spec), _E_RATIO, spec), spec)
    check = limb.mul(v, limb.square(r, spec), spec)

    neg_u = limb.neg(u)
    sqrt_m1 = limb.from_int(C.SQRT_M1, spec)
    correct = limb.eq(check, u, spec)
    flipped = limb.eq(check, neg_u, spec)
    flipped_i = limb.eq(check, limb.mul(neg_u, sqrt_m1, spec), spec)

    r = limb.select(flipped | flipped_i, limb.mul(r, sqrt_m1, spec), r)
    r = abs_positive(r, spec)
    was_square = correct | flipped
    return was_square, r


def inv_sqrt(a: jnp.ndarray, spec: ModSpec = FIELD) -> tuple[jnp.ndarray, jnp.ndarray]:
    """sqrt(1/a) (field.rs:443-460)."""
    one = jnp.broadcast_to(limb.from_int(1, spec), a.shape).astype(a.dtype)
    return sqrt_ratio_i(one, a, spec)
