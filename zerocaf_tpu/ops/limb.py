"""Core multi-precision limb engine: radix-2^12 x 22-limb int32 arithmetic.

This is the TPU-native replacement for the reference's u64 backend
(/root/reference/src/backend/u64/field.rs, scalar.rs).  Design differences,
all driven by the hardware (see SURVEY.md section 7):

  * TPUs have no 64x64 multiplier.  12-bit limbs keep every schoolbook
    column sum strictly inside a signed int32 (22 partial products of
    <= 2^24 each: < 2^28.5), so all arithmetic runs on native 32-bit
    integer vector lanes.
  * The reference does two Montgomery reductions per multiplication
    (field.rs:258-261).  Here reduction exploits the pseudo-Mersenne shape
    of both moduli: p = 2^252 + dp and r = 2^249 + dr, so
    2^252 == -dp (mod p) and 2^252 == -8*dr (mod r), with dp, 8*dr < 2^133.
    A 506-bit product folds to 253 bits in three constant-multiplies --
    branch-free, fixed-shape, and it keeps values in the canonical domain
    (no Montgomery conversion at the I/O boundary).
  * Every data-dependent loop of the reference (binary-GCD inverse
    field.rs:854-925, Tonelli-Shanks field.rs:357-441, double_and_add
    edwards.rs:102-120) becomes a fixed-trip, select-based computation.
  * Carries are delayed: elements flow between ops in *semi-reduced* form
    (22 limbs, limbs in [-16, 4096+16], |value| < 2^253) and are only
    canonicalized at observation boundaries (bytes, comparisons, bit
    extraction).  Carry propagation itself is 3 data-parallel passes
    (shift+mask+add), not a sequential ripple.

Layout: limbs on the LAST axis, int32, little-endian (limb i holds bits
12i..12i+11).  All functions broadcast over arbitrary leading batch axes.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..config import LIMB_MASK, NUM_LIMBS, RADIX_BITS

MASK = LIMB_MASK
W = RADIX_BITS
L = NUM_LIMBS


# ---------------------------------------------------------------------------
# Modulus specification
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ModSpec:
    """A pseudo-Mersenne modulus m with 2^252 == -fold_c (mod m), plus the
    limb-backend parameters (the TPU analogue of the reference's cargo
    backend features, src/backend/mod.rs:9-16).  Two registered backends:

      * i32x22 (default): radix 2^12, 22 int32 limbs -- products ride the
        32-bit integer lanes; reduction fold rides the int8 MXU.
      * f32x29: radix 2^9, 29 float32 limbs -- every schoolbook partial
        product is one f32 FMA (exact: columns stay under 2^24), trading
        more limbs for the VPU's fused-multiply-add rate.
    """

    name: str
    m: int                      # python int modulus
    m_limbs: np.ndarray         # [nlimbs] canonical limbs of m
    fold_c_limbs: np.ndarray    # limbs of fold_c < 2^133
    # For the scalar field r = 2^249 + dr the canonical range is below
    # 2^249: final_fold_bits/final_c describe the last 2^249 fold.
    final_fold_bits: int | None = None
    final_c_limbs: np.ndarray | None = None
    # Backend geometry (defaults = the i32x22 backend).
    wbits: int = 12             # radix bits
    nlimbs: int = 22
    fold_limb: int = 21         # bit 252 == limb boundary fold_limb * wbits
    np_dtype: type = np.int32

    def __hash__(self):  # make usable as a jit static arg
        return hash(self.name)

    def __eq__(self, other):
        return isinstance(other, ModSpec) and self.name == other.name


FIELD = ModSpec("field", C.P, C.P_LIMBS, C.FOLD_C_P_LIMBS)
SCALAR = ModSpec("scalar", C.R, C.R_LIMBS, C.FOLD_C_R_LIMBS,
                 final_fold_bits=249, final_c_limbs=C.DELTA_R_LIMBS)

# f32x29 backend: radix 2^9 (252 = 9 * 28 keeps the fold limb-aligned).
FIELD_F9 = ModSpec("field_f9", C.P, C.P_LIMBS_F9, C.FOLD_C_P_LIMBS_F9,
                   wbits=9, nlimbs=29, fold_limb=28, np_dtype=np.float32)
SCALAR_F9 = ModSpec("scalar_f9", C.R, C.R_LIMBS_F9, C.FOLD_C_R_LIMBS_F9,
                    final_fold_bits=249, final_c_limbs=C.DELTA_R_LIMBS_F9,
                    wbits=9, nlimbs=29, fold_limb=28, np_dtype=np.float32)

BACKENDS = {"i32x22": (FIELD, SCALAR), "f32x29": (FIELD_F9, SCALAR_F9)}


def _wbits_of(x: jnp.ndarray) -> int:
    """Backend radix from the array dtype (f32 limbs are radix 2^9)."""
    return 9 if x.dtype == jnp.float32 else W


def _split(x: jnp.ndarray, w: int):
    """(remainder, carry) of each limb at radix 2^w, exact for both
    backends.  int32: arithmetic shift + mask.  float32: floor-division --
    exact because |x| < 2^24 at every call site and 2^-w scaling is lossless."""
    if x.dtype == jnp.float32:
        r = float(1 << w)
        car = jnp.floor(x * (1.0 / r))
        return x - car * r, car
    return x & ((1 << w) - 1), x >> w


# ---------------------------------------------------------------------------
# Carry propagation
# ---------------------------------------------------------------------------


def carry_keep_top(x: jnp.ndarray, extra: int = 1, passes: int = 2,
                   w: int | None = None) -> jnp.ndarray:
    """Data-parallel carry passes.  Pads `extra` zero limbs, then each pass
    splits limbs 0..n-2 into (rem, carry) and adds the carry one limb up;
    the top limb accumulates raw (it carries the sign for negative values).

    After 2 passes, non-top limbs are in [-13, radix+13] (pass-1 carries are
    <= 2^16.6, pass-2 carries small), which keeps every downstream schoolbook
    column inside the backend's exact range; the top limb is bounded by the
    caller's value bound.  Works for signed inputs: the int32 `>>` is
    arithmetic and the f32 floor-split matches it exactly."""
    w = _wbits_of(x) if w is None else w
    pad = [(0, 0)] * (x.ndim - 1) + [(0, extra)]
    x = jnp.pad(x, pad)
    for _ in range(passes):
        rem, car = _split(x, w)
        # keep the top limb unsplit, add the incoming carry to it
        rem = jnp.concatenate([rem[..., :-1], x[..., -1:]], axis=-1)
        car = jnp.concatenate([jnp.zeros_like(car[..., :1]), car[..., :-1]], axis=-1)
        x = rem + car
    return x


def carry_exact(x: jnp.ndarray, w: int | None = None) -> jnp.ndarray:
    """Exact sequential carry (lax.scan ripple).  Output limbs 0..n-2 are
    canonical in [0, radix); the top limb keeps the remaining signed value.
    Only used at observation boundaries, never in mul-heavy inner loops."""
    w = _wbits_of(x) if w is None else w
    xt = jnp.moveaxis(x, -1, 0)  # [n, ...batch]

    def step(c, xi):
        t = xi + c
        rem, car = _split(t, w)
        return car, rem

    c, rems = jax.lax.scan(step, jnp.zeros_like(xt[0]), xt[:-1])
    top = xt[-1] + c
    out = jnp.concatenate([rems, top[None]], axis=0)
    return jnp.moveaxis(out, 0, -1)


# ---------------------------------------------------------------------------
# Schoolbook products
# ---------------------------------------------------------------------------


def school(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full schoolbook product columns: out[k] = sum_{i+j=k} a_i * b_j.
    Shapes [..., na] x [..., nb] -> [..., na+nb-1].  Column sums stay inside
    int32 by the radix-2^12 carry budget (config.py)."""
    na = a.shape[-1]
    nb = b.shape[-1]
    ncols = na + nb - 1
    out = None
    for i in range(na):
        term = a[..., i : i + 1] * b  # [..., nb]
        term = jnp.pad(term, [(0, 0)] * (term.ndim - 1) + [(i, ncols - nb - i)])
        out = term if out is None else out + term
    return out


# ---------------------------------------------------------------------------
# Pseudo-Mersenne reduction
# ---------------------------------------------------------------------------

FOLD_LIMB = 21  # bit 252 == limb boundary 21 * 12 (i32x22 backend)


def _fold(x: jnp.ndarray, c_limbs, spec: ModSpec) -> jnp.ndarray:
    """One fold: value(x) == value(L) - c * value(H)  (mod m), where
    L = x[:fold_limb], H = x[fold_limb:].  Input must be semi-carried
    (|limbs| < ~2^17)."""
    fl = spec.fold_limb
    lo = x[..., :fl]
    hi = x[..., fl:]
    d = school(hi, jnp.asarray(c_limbs, dtype=x.dtype))
    ncols = max(fl, d.shape[-1])
    lo = jnp.pad(lo, [(0, 0)] * (lo.ndim - 1) + [(0, ncols - lo.shape[-1])])
    d = jnp.pad(d, [(0, 0)] * (d.ndim - 1) + [(0, ncols - d.shape[-1])])
    return carry_keep_top(lo - d, w=spec.wbits)


def reduce_to_semi_cascade(cols: jnp.ndarray, spec: ModSpec,
                           micro_fold: bool = False) -> jnp.ndarray:
    """Reduce product columns to the semi-reduced nlimbs form with
    |value| < 2^253.

    Width walk for a full 506-bit product (i32x22): 43 -> carry 44 ->
    fold 35 -> fold 26 -> fold 22.  Shorter inputs converge faster; the
    Python loop runs at trace time over static shapes.  This is the all-VPU
    cascade; for the i32x22 backend the default `reduce_to_semi` below moves
    the fold work onto the MXU instead.

    micro_fold=True additionally folds the bits >= 252 still sitting in the
    top limb(s) -- needed when the input VALUE may reach 2^(wbits*nlimbs)
    (raw byte decodes) rather than the < 2^253-ish mul-output bound."""
    n = spec.nlimbs
    x = carry_keep_top(cols, w=spec.wbits)
    while x.shape[-1] > n:
        x = _fold(x, spec.fold_c_limbs, spec)
    if x.shape[-1] < n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])])
    if micro_fold:
        fl = spec.fold_limb
        hi = x[..., fl:]
        d = school(hi, jnp.asarray(spec.fold_c_limbs, dtype=x.dtype))
        ncols = max(fl, d.shape[-1])
        lo = jnp.pad(x[..., :fl],
                     [(0, 0)] * (x.ndim - 1) + [(0, ncols - fl)])
        d = jnp.pad(d, [(0, 0)] * (d.ndim - 1) + [(0, ncols - d.shape[-1])])
        z = lo - d
        z = jnp.pad(z, [(0, 0)] * (z.ndim - 1) + [(0, n - z.shape[-1])]) \
            if z.shape[-1] < n else z[..., :n]
        x = carry_keep_top(z, extra=0, passes=2, w=spec.wbits)
    return x


# --- MXU fold: the whole high-limb reduction as ONE int8 matmul -------------
#
# For a carried input x of width n (limbs |x_i| <= ~2^12.1), the value is
#   value(x) = sum_{k<21} x_k 2^12k  +  sum_{j} hi_j 2^(12(21+j)),
# and each high limb splits into 6-bit digits hi_j = h0_j + 64*h1_j with
# h0 in [0,63], h1 in [-4,64] -- both int8-representable.  Precompute, per
# modulus, the canonical 22-limb rows
#   ROW0[j] = limbs(2^(12(21+j))   mod m)        (weight of h0_j)
#   ROW1[j] = limbs(2^(12(21+j)+6) mod m)        (weight of h1_j)
# and split each row entrywise into 6-bit digits ROW = RL + 64*RH.  Then
#   value(x) == lo + [h0 || h1] @ [RL; RH-block]  (mod m)
# as a single [batch, 2*nh] @ [2*nh, 44] int8 x int8 -> int32 dot, which XLA
# routes to the MXU (int8 systolic matmuls) instead of the VPU.  Bounds:
# d_lo <= 2*nh*64*64 < 2^18, d_hi<<6 < 2^24 -- exact in int32.
#
# The matmul output is mod-m correct but its *value* is only < ~2^265 (each
# row has value < m), so one cheap pseudo-Mersenne micro-fold of the two
# limbs above bit 252 (school 2x12) brings it under 2^253: semi-reduced.


def _fold_matrix(spec: ModSpec, nh: int) -> np.ndarray:
    """[2*nh, 44] int8: digit-split fold rows for high limbs 21..21+nh-1."""
    key = (spec.name, nh)
    mat = _FOLD_MATRIX_CACHE.get(key)
    if mat is None:
        from .. import oracle

        rows = []
        for shift in (0, 6):
            for j in range(nh):
                v = (1 << (W * (FOLD_LIMB + j) + shift)) % spec.m
                rows.append(oracle.int_to_limbs(v, n=L))
        rows = np.array(rows, dtype=np.int64)  # [2nh, 22], entries < 2^12
        mat = np.concatenate([rows & 63, rows >> 6], axis=1).astype(np.int8)
        _FOLD_MATRIX_CACHE[key] = mat
    return mat


_FOLD_MATRIX_CACHE: dict = {}


def reduce_to_semi(cols: jnp.ndarray, spec: ModSpec) -> jnp.ndarray:
    """Reduce product columns to semi-reduced 22 limbs (|value| < 2^253)
    via the int8 MXU fold (see block comment above).  Bit-identical to
    reduce_to_semi_cascade on all inputs satisfying the precondition; chosen
    as default because it moves ~500 of the ~950 per-element fold multiplies
    off the VPU.

    Precondition: |value(cols)| < 2^(12*(n+1)) for width-n input, so the
    carried top limb stays 6-bit-digit-splittable.  Every caller is far
    inside this: mul/square columns of semi-reduced operands have value
    < 2^506 (n=43), wide-byte decodes < 2^512 (n=43), byte decodes < 2^256
    (n=22).

    f32x29 inputs take the all-FMA cascade instead (no int8 digit split
    exists for float limbs; the cascade is pure fused multiply-add)."""
    if cols.dtype == jnp.float32:
        return reduce_to_semi_cascade(cols, spec, micro_fold=True)
    x = carry_keep_top(cols, extra=2)  # width n+2, limbs in [-53, ~4147]
    if x.shape[-1] > FOLD_LIMB + 2:
        nh = x.shape[-1] - FOLD_LIMB
        lo = x[..., :FOLD_LIMB]
        hi = x[..., FOLD_LIMB:]
        # 6-bit digit split: h0 in [0,63], h1 in [-1,64] -- int8-exact
        lhs = jnp.concatenate([hi & 63, hi >> 6], axis=-1).astype(jnp.int8)
        rhs = jnp.asarray(_fold_matrix(spec, nh))
        d = jax.lax.dot_general(
            lhs, rhs,
            (((lhs.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = d[..., :L] + (d[..., L:] << 6)  # [..., 22], |entries| < 2^24.1
        out = out.at[..., :FOLD_LIMB].add(lo)
        x = carry_keep_top(out)  # 23 limbs; |value| < 2^265 => top in [-4, 2]
    elif x.shape[-1] < FOLD_LIMB + 2:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, FOLD_LIMB + 2 - x.shape[-1])])
    # micro-fold of bits >= 252: value = lo + 2^252*H  ->  lo - c*H, |H| < 2^25
    hi2 = x[..., FOLD_LIMB:]  # [..., 2]
    d2 = school(hi2, jnp.asarray(spec.fold_c_limbs))  # [..., 13]
    z = x[..., :FOLD_LIMB].at[..., :13].add(-d2)
    z = jnp.pad(z, [(0, 0)] * (z.ndim - 1) + [(0, L - FOLD_LIMB)])
    return carry_keep_top(z, extra=0, passes=2)


# ---------------------------------------------------------------------------
# Semi-reduced ring ops.  Public entry points are jitted (spec is static):
# on this class of host, eager per-op dispatch dominates wall time by orders
# of magnitude, so even small compositions go through XLA.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=2)
def mul(a: jnp.ndarray, b: jnp.ndarray, spec: ModSpec) -> jnp.ndarray:
    """a * b (mod m), semi-reduced in, semi-reduced out."""
    return reduce_to_semi(school(a, b), spec)


def school_square(a: jnp.ndarray) -> jnp.ndarray:
    """Squaring columns with the symmetry optimization (~253 MACs vs 484):
    sum_i a_i * (2*a)_{j>=i} shifted by 2i, minus the double-counted
    diagonal a_i^2 (mirrors the reference's square_internal,
    field.rs:763-777).  Column bound: <= 23 * 2^25 < 2^29.6, still int32."""
    na = a.shape[-1]
    ncols = 2 * na - 1
    a2 = a * 2
    out = None
    for i in range(na):
        row = a[..., i : i + 1] * a2[..., i:]
        row = jnp.pad(row, [(0, 0)] * (row.ndim - 1) + [(2 * i, na - 1 - i)])
        out = row if out is None else out + row
    # subtract the double-counted diagonal: out[2i] -= a_i^2
    diag = a * a
    inter = jnp.stack([diag, jnp.zeros_like(diag)], axis=-1)
    inter = inter.reshape(*a.shape[:-1], 2 * na)[..., :ncols]
    return out - inter


@partial(jax.jit, static_argnums=1)
def square(a: jnp.ndarray, spec: ModSpec) -> jnp.ndarray:
    return reduce_to_semi(school_square(a), spec)


@jax.jit
def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a + b, lazy (no modular step needed: |value| grows by one bit and the
    next mul's fold absorbs it; limb slack is restored by one carry pass)."""
    s = a + b
    return carry_keep_top(s, extra=0, passes=1)


@jax.jit
def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = a - b
    return carry_keep_top(d, extra=0, passes=1)


@jax.jit
def neg(a: jnp.ndarray) -> jnp.ndarray:
    return carry_keep_top(-a, extra=0, passes=1)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Branch-free limbwise select: mask is a [...]-shaped bool (no limb
    axis); replaces the reference's subtle::ConditionallySelectable."""
    return jnp.where(mask[..., None], a, b)


# ---------------------------------------------------------------------------
# Canonicalization & observation
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=1)
def canonical(x: jnp.ndarray, spec: ModSpec) -> jnp.ndarray:
    """Semi-reduced -> canonical [0, m) with exact limbs in [0, 4096).

    Accepts any 22-limb value in (-2^255, 2^255) (a few adds/subs beyond the
    mul-output range):
      1. exact carry; if negative, add 64*m (64m > 2^255 for both moduli)
      2. fold the bits above the modulus' power (252 for p, 249 for r):
         v = low + h*2^k == low - h*c (mod m) with h small
      3. the result is in (-2^140, 2^k) subset (-m, m): one conditional add.
    """
    kbits = spec.final_fold_bits if spec.final_fold_bits is not None else 252
    c_limbs = spec.final_c_limbs if spec.final_c_limbs is not None else spec.fold_c_limbs
    w, n = spec.wbits, spec.nlimbs
    out_dtype = x.dtype

    x = carry_exact(x, w=w)
    negv = x[..., -1] < 0
    m64 = jnp.asarray(_shift_limbs(spec.m, 6, spec), dtype=x.dtype)
    x = x + jnp.where(negv[..., None], m64, jnp.zeros_like(m64))
    x = carry_exact(x, w=w)  # nonneg, < 2^255 + 64m < 2^259
    if x.dtype == jnp.float32:
        # exact cast: all limbs are canonical (< 2^9) except the top, which
        # holds < 2^(259-252) = 2^7 -- far inside int32
        x = x.astype(jnp.int32)

    # extract h = x >> kbits and low = x mod 2^kbits (kbits may straddle a limb)
    limb_i, bit_i = divmod(kbits, w)
    if bit_i == 0:
        h = x[..., limb_i]
        lo = jnp.concatenate(
            [x[..., :limb_i],
             jnp.zeros_like(x[..., : n - limb_i])], axis=-1)
    else:
        h = (x[..., limb_i] >> bit_i) + (x[..., limb_i + 1] << (w - bit_i))
        lo = jnp.concatenate(
            [x[..., :limb_i], (x[..., limb_i] & ((1 << bit_i) - 1))[..., None],
             jnp.zeros_like(x[..., : n - limb_i - 1])], axis=-1)
    # h < 2^10; c < 2^133 -> h*c < 2^143
    d = school(h[..., None], jnp.asarray(c_limbs, dtype=jnp.int32))
    d = jnp.pad(d, [(0, 0)] * (d.ndim - 1) + [(0, n - d.shape[-1])])
    y = carry_exact(lo - d, w=w)
    negv = y[..., -1] < 0
    m1 = jnp.asarray(spec.m_limbs, dtype=jnp.int32)
    y = y + jnp.where(negv[..., None], m1, jnp.zeros_like(m1))
    return carry_exact(y, w=w).astype(out_dtype)


def _shift_limbs(v: int, sh: int, spec: ModSpec | None = None) -> np.ndarray:
    from .. import oracle

    n = spec.nlimbs if spec is not None else L
    w = spec.wbits if spec is not None else W
    return np.array(oracle.int_to_limbs(v << sh, n=n, w=w), dtype=np.int32)


@partial(jax.jit, static_argnums=2)
def eq(a: jnp.ndarray, b: jnp.ndarray, spec: ModSpec) -> jnp.ndarray:
    """Canonical equality (the reference compares canonical bytes,
    field.rs:93-106)."""
    ca = canonical(a, spec)
    cb = canonical(b, spec)
    return jnp.all(ca == cb, axis=-1)


@partial(jax.jit, static_argnums=1)
def is_zero(a: jnp.ndarray, spec: ModSpec) -> jnp.ndarray:
    return jnp.all(canonical(a, spec) == 0, axis=-1)


def geq_const(x_canonical: jnp.ndarray, bound_limbs: np.ndarray) -> jnp.ndarray:
    """x >= bound for canonical x, branch-free lexicographic compare."""
    b = jnp.asarray(bound_limbs)
    gt = x_canonical > b
    lt = x_canonical < b
    # scan from most significant: first differing limb decides
    result = jnp.zeros(x_canonical.shape[:-1], dtype=bool)
    decided = jnp.zeros(x_canonical.shape[:-1], dtype=bool)
    for i in reversed(range(x_canonical.shape[-1])):
        result = jnp.where(~decided & gt[..., i], True, result)
        decided = decided | gt[..., i] | lt[..., i]
    return result | ~decided  # equal counts as >=


@partial(jax.jit, static_argnums=2)
def cmp(a: jnp.ndarray, b: jnp.ndarray, spec: ModSpec) -> jnp.ndarray:
    """Batched three-way compare of canonical values: -1 / 0 / +1 int32
    (Ord on FieldElement/Scalar, field.rs:65-76, scalar.rs:48-59 -- the
    reference compares limb arrays most-significant-first; here both sides
    are canonicalized first so semi-reduced inputs compare by value).
    Branch-free lexicographic scan, data-parallel over all batch lanes."""
    ca = canonical(a, spec)
    cb = canonical(b, spec)
    sign = jnp.sign(ca - cb)  # per-limb -1/0/1
    # most-significant differing limb decides: fold MSB-first, keeping the
    # first nonzero sign
    out = jnp.zeros(ca.shape[:-1], dtype=jnp.int32)
    for i in reversed(range(ca.shape[-1])):
        out = jnp.where(out == 0, sign[..., i], out)
    return out


# ---------------------------------------------------------------------------
# Byte codecs (canonical little-endian 32 bytes; field.rs:563-631)
# ---------------------------------------------------------------------------

def bytes_to_limbs(b: jnp.ndarray) -> jnp.ndarray:
    """[..., 32] uint8 -> [..., 22] int32 holding the raw 256-bit value
    (not reduced; limb 21 holds bits 252..255).

    Radix 2^12 = exactly 3 nibbles, so the regrouping is a cheap nibble
    shuffle (no bit expansion): limb k = nib[3k] + 16*nib[3k+1] +
    256*nib[3k+2]."""
    bi = b.astype(jnp.int32)
    nib = jnp.stack([bi & 15, bi >> 4], axis=-1).reshape(*b.shape[:-1], 64)
    nib = jnp.pad(nib, [(0, 0)] * (nib.ndim - 1) + [(0, 3 * L - 64)])
    g = nib.reshape(*b.shape[:-1], L, 3)
    return g[..., 0] + (g[..., 1] << 4) + (g[..., 2] << 8)


def limbs_to_bytes(x: jnp.ndarray) -> jnp.ndarray:
    """[..., 22] canonical int32 limbs -> [..., 32] uint8 little-endian
    (inverse nibble shuffle of bytes_to_limbs)."""
    nib = jnp.stack([x & 15, (x >> 4) & 15, x >> 8], axis=-1)
    nib = nib.reshape(*x.shape[:-1], 3 * L)[..., :64]
    g = nib.reshape(*x.shape[:-1], 32, 2)
    return (g[..., 0] + (g[..., 1] << 4)).astype(jnp.uint8)


def bytes_to_limbs_gen(b: jnp.ndarray, spec: ModSpec) -> jnp.ndarray:
    """[..., 32] uint8 -> [..., nlimbs] raw limbs at any radix, via a full
    bit expansion (boundary-only cost; the 12-bit backend keeps the cheaper
    nibble shuffle above)."""
    bi = b.astype(jnp.int32)
    bits = (bi[..., None] >> jnp.arange(8, dtype=jnp.int32)) & 1
    bits = bits.reshape(*b.shape[:-1], 256)
    w, n = spec.wbits, spec.nlimbs
    bits = jnp.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(0, w * n - 256)])
    g = bits.reshape(*b.shape[:-1], n, w)
    weights = jnp.asarray((1 << np.arange(w)).astype(np.int32))
    out = jnp.sum(g * weights, axis=-1, dtype=jnp.int32)
    return out.astype(spec.np_dtype)


def limbs_to_bytes_gen(x: jnp.ndarray, spec: ModSpec) -> jnp.ndarray:
    """[..., nlimbs] canonical limbs -> [..., 32] uint8 LE (generic radix)."""
    w, n = spec.wbits, spec.nlimbs
    xi = x.astype(jnp.int32)
    bits = (xi[..., None] >> jnp.arange(w, dtype=jnp.int32)) & 1
    bits = bits.reshape(*x.shape[:-1], n * w)[..., :256]
    g = bits.reshape(*x.shape[:-1], 32, 8)
    weights = jnp.asarray((1 << np.arange(8)).astype(np.int32))
    return jnp.sum(g * weights, axis=-1, dtype=jnp.int32).astype(jnp.uint8)


@partial(jax.jit, static_argnums=1)
def from_bytes(b: jnp.ndarray, spec: ModSpec) -> jnp.ndarray:
    """Decode 32 LE bytes to a semi-reduced element (reduces the raw 256-bit
    value mod m, matching the reference's behavior-after-first-op)."""
    if spec.wbits == 12:
        return reduce_to_semi(bytes_to_limbs(b), spec)
    return reduce_to_semi_cascade(bytes_to_limbs_gen(b, spec), spec,
                                  micro_fold=True)


@partial(jax.jit, static_argnums=1)
def to_bytes(x: jnp.ndarray, spec: ModSpec) -> jnp.ndarray:
    if spec.wbits == 12:
        return limbs_to_bytes(canonical(x, spec))
    return limbs_to_bytes_gen(canonical(x, spec), spec)


# ---------------------------------------------------------------------------
# Bit extraction (for ladders) and small-int embedding
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(1, 2))
def to_bits(x: jnp.ndarray, spec: ModSpec, nbits: int = 256) -> jnp.ndarray:
    """Canonical LSB-first bits [..., nbits] (scalar.rs:352-366)."""
    w, n = spec.wbits, spec.nlimbs
    xc = canonical(x, spec).astype(jnp.int32)
    bits = (xc[..., None] >> jnp.arange(w, dtype=jnp.int32)) & 1
    bits = bits.reshape(*x.shape[:-1], n * w)
    if bits.shape[-1] < nbits:
        bits = jnp.pad(bits, [(0, 0)] * (bits.ndim - 1)
                       + [(0, nbits - bits.shape[-1])])
    return bits[..., :nbits]


def from_int(v: int, spec: ModSpec) -> jnp.ndarray:
    """Embed a python int as a constant element (canonical limbs)."""
    from .. import oracle

    return jnp.asarray(np.array(
        oracle.int_to_limbs(v % spec.m, n=spec.nlimbs, w=spec.wbits),
        dtype=spec.np_dtype))


# ---------------------------------------------------------------------------
# Fixed-exponent powering (replaces every variable-trip loop)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(1, 2))
def pow_const(a: jnp.ndarray, e: int, spec: ModSpec) -> jnp.ndarray:
    """a^e for a Python-int exponent.  MSB-first square-and-multiply as a
    lax.scan over the (static) exponent bits: the compiled graph is one
    square+multiply body regardless of exponent size -- important because
    XLA compile time, not FLOPs, dominates 253-bit exponent chains.
    Replaces the reference's data-dependent pow loop (field.rs:325-355)."""
    assert e >= 0
    if e == 0:
        return jnp.broadcast_to(from_int(1, spec), a.shape).astype(a.dtype)
    # TPU: the fused Pallas windowed chain (table + 4-squarings-per-step
    # kernels) -- ~2.4x the XLA mul rate, and it converts the binary
    # square-AND-multiply into ~250 squares + ~63 table multiplies.  The
    # i32x22 specs only (the Pallas kernels are 22-limb int32).
    if (e.bit_length() >= 32 and spec.nlimbs == L
            and spec.np_dtype is np.int32
            and jax.default_backend() == "tpu"):
        from ..config import DEFAULT as _cfg
        if _cfg.use_pallas:
            from .pallas import field_kernels as _fk
            return _fk.pow_tiled(a, e, spec)
    bits = np.array([int(b) for b in bin(e)[2:]], dtype=np.int32)  # MSB-first

    def body(res, bit):
        res = square(res, spec)
        res = select(bit.astype(bool), mul(res, a, spec), res)
        return res, None

    one = jnp.broadcast_to(from_int(1, spec), a.shape).astype(a.dtype)
    res, _ = jax.lax.scan(body, one, jnp.asarray(bits))
    return res


@partial(jax.jit, static_argnums=2)
def pow_batched(a: jnp.ndarray, e_bits: jnp.ndarray, spec: ModSpec) -> jnp.ndarray:
    """a^e for per-element exponents given as LSB-first bits [..., nbits].
    Fixed 253-trip ladder with selects (constant trip count for XLA)."""
    nbits = e_bits.shape[-1]
    one = jnp.broadcast_to(from_int(1, spec), a.shape).astype(a.dtype)

    def body(carrystate, bit):
        res, base = carrystate
        res = select(bit.astype(bool), mul(res, base, spec), res)
        base = square(base, spec)
        return (res, base), None

    bits_first = jnp.moveaxis(e_bits, -1, 0)  # [nbits, ...]
    (res, _), _ = jax.lax.scan(body, (one, a), bits_first)
    return res
