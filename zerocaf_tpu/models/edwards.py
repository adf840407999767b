"""Batched Edwards points on the Sonny curve (TPU-native point models).

The analogue of the reference's point layer (/root/reference/src/edwards.rs):
four coordinate systems --

  * ``EdwardsPoint``      extended (X:Y:Z:T), the workhorse (edwards.rs:329-342)
  * ``ProjectivePoint``   (X:Y:Z) (edwards.rs:666-684)
  * ``AffinePoint``       (x, y), equality/validity only (edwards.rs:1000-1011)
  * ``CompressedEdwardsY``  32-byte wire format (edwards.rs:208-211)

-- but every point is a *batch*: coordinates are int32[..., 22] limb lanes and
all group operations are data-parallel.  Scalar multiplication is the
fixed-250-trip MSB-first ladder (the TPU-shaped form of edwards.rs:122-134)
running under lax.scan: constant trip count, select-by-bit, no data-dependent
control flow.  Unlike the reference (which doubles via self+self,
edwards.rs:589-591), doubling uses the dedicated dbl-2008-hwcd 4M+4S formula.

The unified a=-1 Hisil-Wong-Carter-Dawson addition (edwards.rs:465-489) is
complete on this curve (-1 is square, d is non-square; verified in
tools/constants_gen.py), so adding the identity or equal points needs no
special-casing -- exactly what a branch-free lane machine wants.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from .. import traits as _traits
from ..field import FieldElement
from ..scalar import Scalar
from ..ops import inv_sqrt as _isq
from ..ops import limb as _l
from ..ops.limb import FIELD as _F

# Limb-level point = tuple of 4 arrays (X, Y, Z, T), each [..., 22] int32.
_D = C.EDWARDS_D_LIMBS  # host numpy: no backend init at import


# ---------------------------------------------------------------------------
# Limb-level kernels (pytree in/out; jitted at the public wrappers)
# ---------------------------------------------------------------------------


def _add(p, q):
    """Unified HWCD a=-1 addition, 10M (edwards.rs:465-489)."""
    X1, Y1, Z1, T1 = p
    X2, Y2, Z2, T2 = q
    A = _l.mul(X1, X2, _F)
    B = _l.mul(Y1, Y2, _F)
    Cc = _l.mul(_D, _l.mul(T1, T2, _F), _F)
    Dd = _l.mul(Z1, Z2, _F)
    E = _l.sub(_l.sub(_l.mul(_l.add(X1, Y1), _l.add(X2, Y2), _F), A), B)
    F = _l.sub(Dd, Cc)
    G = _l.add(Dd, Cc)
    H = _l.add(B, A)
    return (_l.mul(E, F, _F), _l.mul(G, H, _F), _l.mul(F, G, _F), _l.mul(E, H, _F))


def _double(p, with_t: bool = True):
    """Dedicated dbl-2008-hwcd doubling, 4M+4S (a = -1).  Accepts a 3- or
    4-tuple (doubling never reads T); with_t=False skips the T output (1M
    saved) for dbl-dbl chains where only the final double feeds an add."""
    X, Y, Z = p[0], p[1], p[2]
    A = _l.square(X, _F)
    B = _l.square(Y, _F)
    Cc = _l.add(_l.square(Z, _F), _l.square(Z, _F))
    Dd = _l.neg(A)
    E = _l.sub(_l.sub(_l.square(_l.add(X, Y), _F), A), B)
    G = _l.add(Dd, B)
    F = _l.sub(G, Cc)
    H = _l.sub(Dd, B)
    out = (_l.mul(E, F, _F), _l.mul(G, H, _F), _l.mul(F, G, _F))
    return out + (_l.mul(E, H, _F),) if with_t else out


def _neg(p):
    X, Y, Z, T = p
    return (_l.neg(X), Y, Z, _l.neg(T))


def _select(mask, p, q):
    return tuple(_l.select(mask, a, b) for a, b in zip(p, q))


def _identity_like(p):
    X, Y, Z, T = p
    zero = jnp.zeros_like(X)
    one = jnp.zeros_like(X).at[..., 0].set(1)
    return (zero, one, one, zero)


def _broadcast_point(p, digit_batch: tuple[int, ...]):
    """Broadcast point coords to the combined batch of point and digits so
    a scan carry keeps a fixed shape (e.g. unbatched basepoint x batched
    scalar)."""
    batch = jnp.broadcast_shapes(p[0].shape[:-1], digit_batch)
    return tuple(jnp.broadcast_to(c, batch + c.shape[-1:]) for c in p)


@partial(jax.jit, static_argnames=("nbits",))
def _scalar_mul(p, bits, nbits: int = 250):
    """Fixed-ladder MSB-first double-and-add over lax.scan.

    bits: [..., nbits] LSB-first int32 (from Scalar.into_bits).  250 bits
    cover all canonical scalars; pass nbits=253 to multiply by raw integers
    up to 8r (order checks)."""
    p = _broadcast_point(p, bits.shape[:-1])
    bits_msb = jnp.moveaxis(bits, -1, 0)[::-1]  # [nbits, ...]

    def body(Q, bit):
        Q = _double(Q)
        Qp = _add(Q, p)
        return _select(bit.astype(bool), Qp, Q), None

    Q, _ = jax.lax.scan(body, _identity_like(p), bits_msb)
    return Q


@partial(jax.jit, static_argnames=("width",))
def _scalar_mul_windowed(p, windows, width: int = 4):
    """Fixed-window variable-base multiplication: per-lane table of the
    2^width small multiples, then ceil(250/width) rounds of (width doublings
    + one table-gather add).  ~1.7x fewer point ops than the plain ladder;
    the gather index is the (secret) digit, so prefer `_scalar_mul` when
    strict access-pattern obliviousness matters."""
    p = _broadcast_point(p, windows.shape[:-1])
    nbuckets = 1 << width
    tbl = [_identity_like(p), p]
    for _ in range(2, nbuckets):
        tbl.append(_add(tbl[-1], p))
    T = tuple(jnp.stack([t[i] for t in tbl], axis=-2) for i in range(4))  # [..., 2^w, 22]

    w_msb = jnp.moveaxis(windows, -1, 0)[::-1]

    def body(Q, d):
        for i in range(width):
            Q = _double(Q, with_t=(i == width - 1))
        entry = tuple(
            jnp.take_along_axis(Tc, d[..., None, None], axis=-2).squeeze(-2)
            for Tc in T)
        return _add(Q, entry), None

    Q, _ = jax.lax.scan(body, _identity_like(p), w_msb)
    return Q


_FIXED_BASE_TABLES: dict[int, np.ndarray] = {}

# Default comb width: 20 windows of 13 bits (measured fastest on v5e:
# 2.35M mults/s vs 2.0M at width 10 at batch 16384; the 43 MB table is a
# one-time ~25 s oracle build, then disk-cached).
COMB_WIDTH = 13
COMB_WIDTH_SIGNED = 14  # measured-fastest signed comb width on v5e (2.65M/s)


def _fixed_base_table(width: int = COMB_WIDTH) -> np.ndarray:
    """[nwin, 2^width, 3, 22] int32 affine-Niels comb table:
    T[w][d] = (y+x, y-x, 2d*x*y) of the affine point d * 2^(width*w) * B,
    computed once from the oracle and disk-cached.  This is the comb
    generalization of the reference's 126-entry fixed-base table
    (constants.rs:216-973), in the precomputed form that admits the 7M mixed
    addition below."""
    tbl = _FIXED_BASE_TABLES.get(width)
    if tbl is None:
        import os

        nwin = -(-250 // width)
        cache = os.path.expanduser(
            f"~/.cache/zerocaf_tpu/comb_niels_w{width}.npy")
        want_shape = (nwin, 1 << width, 3, 22)
        if os.path.exists(cache):
            try:
                tbl = np.load(cache)
            except (OSError, ValueError):
                tbl = None  # truncated/corrupt file: rebuild
            if tbl is not None and (tbl.shape != want_shape
                                    or tbl.dtype != np.int32):
                tbl = None  # stale format: rebuild
        if tbl is None:
            from .. import oracle as o

            tbl = np.zeros((nwin, 1 << width, 3, 22), dtype=np.int32)
            base_w = o.BASEPOINT
            for w in range(nwin):
                acc = o.IDENTITY
                for d in range(1 << width):
                    x, y = o.point_to_affine(acc)
                    tbl[w, d, 0] = o.int_to_limbs((y + x) % o.P)
                    tbl[w, d, 1] = o.int_to_limbs((y - x) % o.P)
                    tbl[w, d, 2] = o.int_to_limbs(2 * o.EDWARDS_D * x * y % o.P)
                    acc = o.point_add(acc, base_w)
                base_w = acc  # acc == 2^width * base_w
            try:
                # atomic publish: np.save to a temp file, then os.replace, so
                # a killed process never leaves a truncated cache behind
                os.makedirs(os.path.dirname(cache), exist_ok=True)
                tmp = f"{cache}.{os.getpid()}.tmp.npy"  # keep .npy: np.save appends it otherwise
                np.save(tmp, tbl)
                os.replace(tmp, cache)
            except OSError:
                pass
        _FIXED_BASE_TABLES[width] = tbl
    return tbl


_FIXED_BASE_TABLES_SIGNED: dict[int, np.ndarray] = {}


def _fixed_base_table_signed(width: int) -> np.ndarray:
    """[nwin, 2^(width-1)+1, 3, 22] affine-Niels comb table for SIGNED
    digits: only the non-negative multiples 0..2^(width-1); negation is
    free in Niels form (swap y+x / y-x, negate 2dxy), so a signed width-w
    comb covers 250 bits with ceil(250/width) windows at HALF the
    per-window table of the unsigned comb -- e.g. width 15 signed: 17
    mixed adds (vs 20 at unsigned width 13) with a 2^14-entry table."""
    tbl = _FIXED_BASE_TABLES_SIGNED.get(width)
    if tbl is None:
        import os

        nwin = -(-250 // width)
        nent = (1 << (width - 1)) + 1
        cache = os.path.expanduser(
            f"~/.cache/zerocaf_tpu/comb_niels_s_w{width}.npy")
        want_shape = (nwin, nent, 3, 22)
        if os.path.exists(cache):
            try:
                tbl = np.load(cache)
            except (OSError, ValueError):
                tbl = None
            if tbl is not None and (tbl.shape != want_shape
                                    or tbl.dtype != np.int32):
                tbl = None
        if tbl is None:
            from .. import oracle as o

            tbl = np.zeros(want_shape, dtype=np.int32)
            base_w = o.BASEPOINT
            for w in range(nwin):
                acc = o.IDENTITY
                for d in range(nent):
                    x, y = o.point_to_affine(acc)
                    tbl[w, d, 0] = o.int_to_limbs((y + x) % o.P)
                    tbl[w, d, 1] = o.int_to_limbs((y - x) % o.P)
                    tbl[w, d, 2] = o.int_to_limbs(2 * o.EDWARDS_D * x * y % o.P)
                    acc = o.point_add(acc, base_w)
                base_w = o.mul_by_pow_2(base_w, width)
            try:
                os.makedirs(os.path.dirname(cache), exist_ok=True)
                tmp = f"{cache}.{os.getpid()}.tmp.npy"
                np.save(tmp, tbl)
                os.replace(tmp, cache)
            except OSError:
                pass
        _FIXED_BASE_TABLES_SIGNED[width] = tbl
    return tbl


@partial(jax.jit, static_argnames=("width",))
def _fixed_base_mul_signed(windows, width: int):
    """Signed-digit comb: recode unsigned width-bit windows to digits in
    [-2^(width-1), 2^(width-1)), gather |d| from the half-size table, and
    apply the sign by the Niels swap/negate.  Degeneracy argument (same
    shape as _fixed_base_mul's): the partial sum before window w has
    |scalar| < sum_{j<w} 2^(width*j + width-1) < 2^(width*w), while a
    nonzero entry's |scalar| is >= 2^(width*w) -- so acc == +-entry forces
    the identity case, which _madd_niels handles.  The integer-magnitude
    argument is exact only while d*2^(width*w) < l (~2^249); for the top
    windows (width 14 reaches ~2^251) a mod-l collision acc == +-entry is
    satisfiable, but only by specific canonical scalars -- at most a few
    per table entry out of ~2^249, i.e. a ~2^-238 fraction -- none of which
    are reachable from the small-scalar test fixtures (differentially
    verified over random scalars vs the oracle)."""
    from ..ops.pallas.field_kernels import _signed_recode

    tbl = jnp.asarray(_fixed_base_table_signed(width))
    nwin = tbl.shape[0]
    assert windows.shape[-1] == nwin, (windows.shape, nwin)
    signed = _signed_recode(windows, width)

    def body(Q, wd):
        w, d = wd
        a = jnp.abs(d)
        neg = d < 0
        entry_all = tbl[w]  # [2^(width-1)+1, 3, 22]
        e = [jnp.take(entry_all[:, i], a, axis=0) for i in range(3)]
        e0 = _l.select(neg, e[1], e[0])
        e1 = _l.select(neg, e[0], e[1])
        e2 = _l.select(neg, _l.neg(e[2]), e[2])
        return _madd_niels(Q, (e0, e1, e2)), None

    batch = windows.shape[:-1]
    zero = jnp.zeros(batch + (22,), jnp.int32)
    one = zero.at[..., 0].set(1)
    Q0 = (zero, one, one, zero)
    ws = jnp.arange(0, nwin)
    ds = jnp.moveaxis(signed, -1, 0)
    Q, _ = jax.lax.scan(body, Q0, (ws, ds))
    return Q


def _madd_niels(Q, entry):
    """Mixed addition extended + affine-Niels (y+x, y-x, 2dxy), 7M -- the
    a=-1 analogue of curve25519-dalek's AffineNielsPoint addition.  Valid for
    every case the comb produces: entry may be the identity (1, 1, 0), Q may
    be the identity, and Q == +/-entry cannot occur for nonzero entries
    because every comb partial sum is strictly below the next table weight
    (see _fixed_base_mul)."""
    X1, Y1, Z1, T1 = Q
    PP = _l.mul(_l.add(Y1, X1), entry[0], _F)
    MM = _l.mul(_l.sub(Y1, X1), entry[1], _F)
    TT = _l.mul(T1, entry[2], _F)
    Z2 = _l.add(Z1, Z1)
    E = _l.sub(PP, MM)
    F = _l.sub(Z2, TT)
    G = _l.add(Z2, TT)
    H = _l.add(PP, MM)
    return (_l.mul(E, F, _F), _l.mul(G, H, _F), _l.mul(F, G, _F), _l.mul(E, H, _F))


@partial(jax.jit, static_argnames=("width",))
def _fixed_base_mul(windows, width: int = COMB_WIDTH):
    """Fixed-base comb multiplication: B*k = sum_w T[w][digit_w] -- nwin
    mixed 7M additions and nwin table gathers, no doublings.  windows:
    [..., nwin] int32 width-bit digits (LSB-first).

    Degeneracy argument for the non-unified mixed add: before adding window
    w the accumulator holds (k mod 2^(width*w)) * B and the entry is
    d_w * 2^(width*w) * B; their sum is (k mod 2^(width*(w+1))) * B with the
    scalar value < min(2^(width*(w+1)), r), so acc == -entry forces both to
    be the identity, which _madd_niels handles exactly.  As with the signed
    comb, the magnitude argument is exact only while d*2^(width*w) < l; the
    top-window mod-l collision set is a ~2^-238 fraction of canonical
    scalars (see _fixed_base_mul_signed)."""
    tbl = jnp.asarray(_fixed_base_table(width))  # [nwin, 2^width, 3, 22]
    nwin = tbl.shape[0]
    assert windows.shape[-1] == nwin, (windows.shape, nwin)

    def body(Q, wd):
        w, d = wd
        entry_all = tbl[w]  # [2^width, 3, 22]
        entry = tuple(jnp.take(entry_all[:, i], d, axis=0) for i in range(3))
        return _madd_niels(Q, entry), None

    batch = windows.shape[:-1]
    zero = jnp.zeros(batch + (22,), jnp.int32)
    one = zero.at[..., 0].set(1)
    Q0 = (zero, one, one, zero)
    ws = jnp.arange(0, nwin)
    ds = jnp.moveaxis(windows, -1, 0)
    Q, _ = jax.lax.scan(body, Q0, (ws, ds))
    return Q


@jax.jit
def _eq(p, q):
    """Projective equality: X1*Z2 == X2*Z1 and Y1*Z2 == Y2*Z1
    (the reference normalizes through AffinePoint, edwards.rs:360-364;
    cross-multiplying avoids the inversion)."""
    X1, Y1, Z1, _ = p
    X2, Y2, Z2, _ = q
    ex = _l.eq(_l.mul(X1, Z2, _F), _l.mul(X2, Z1, _F), _F)
    ey = _l.eq(_l.mul(Y1, Z2, _F), _l.mul(Y2, Z1, _F), _F)
    return ex & ey


@jax.jit
def _is_valid(p):
    """(a*X^2 + Y^2)*Z^2 == Z^4 + d*X^2*Y^2 plus T*Z == X*Y
    (edwards.rs:733-748)."""
    X, Y, Z, T = p
    xs = _l.square(X, _F)
    ys = _l.square(Y, _F)
    zs = _l.square(Z, _F)
    left = _l.mul(_l.sub(ys, xs), zs, _F)  # a = -1
    right = _l.add(_l.square(zs, _F), _l.mul(_D, _l.mul(xs, ys, _F), _F))
    curve = _l.eq(left, right, _F)
    ext = _l.eq(_l.mul(T, Z, _F), _l.mul(X, Y, _F), _F)
    return curve & ext


@jax.jit
def _compress(p):
    """CompressedEdwardsY encode (edwards.rs:613-629): canonical y bytes with
    the sign bit set iff x != raw_tonelli(x^2).  Bit-compatible with the
    reference (see ops/inv_sqrt.sqrt_raw)."""
    X, Y, Z, _ = p
    zinv = _isq.inverse(Z)
    x = _l.mul(X, zinv, _F)
    y = _l.mul(Y, zinv, _F)
    _, raw = _isq.sqrt_raw(_l.square(x, _F))
    sign = ~_l.eq(raw, x, _F)
    b = _l.to_bytes(y, _F)
    return b.at[..., 31].add(jnp.where(sign, 128, 0).astype(jnp.uint8))


@jax.jit
def _decompress(b):
    """CompressedEdwardsY decode (edwards.rs:313-326).  Returns (point, ok)."""
    sign = (b[..., 31] >> 7).astype(jnp.int32)
    yb = b.at[..., 31].set(b[..., 31] & 0x0F)
    y = _l.from_bytes(yb, _F)
    return _from_y(y, sign)


def _find_xx(y):
    """xx = (y^2 - 1)/(d*y^2 - a)  (edwards.rs:200-204)."""
    ys = _l.square(y, _F)
    one = jnp.zeros_like(y).at[..., 0].set(1)
    num = _l.sub(ys, one)
    den = _l.add(_l.mul(_D, ys, _F), one)  # d*y^2 - a = d*y^2 + 1
    return _l.mul(num, _isq.inverse(den), _F)


@jax.jit
def _from_y(y, sign):
    """new_from_y_coord (edwards.rs:648-653): x = mod_sqrt(xx, sign).
    Returns ((X, Y, Z, T), ok)."""
    ok, x = _isq.mod_sqrt(_find_xx(y), sign)
    one = jnp.zeros_like(y).at[..., 0].set(1)
    return (x, y, one, _l.mul(x, y, _F)), ok


@partial(jax.jit, static_argnames=("shape", "draws"))
def _new_random_point(key, shape, draws):
    """Reference-semantics random point (edwards.rs:984-997): rejection-
    sample y until xx = (y^2-1)/(d*y^2+1) is a square, then lift with a
    random x-sign.  Batched mask-retry over a fixed draw budget: `draws`
    candidate ys per lane; a cheap Legendre test (num*den has the same
    quadratic character as num/den for den != 0) picks the first valid
    draw per lane, and ONE full _from_y lift runs on the selection.
    Failure probability per lane ~2^-draws (non-residues occur w.p. ~1/2).
    Can land in any of the 8 cosets -- unlike EdwardsPoint.random's k*B,
    which stays in the prime subgroup.  Returns ((X, Y, Z, T), ok)."""
    ky, ks = jax.random.split(key)
    ys = FieldElement.random(ky, (draws,) + shape).limbs  # [draws, ..., 22]
    signs = (jax.random.bits(ks, (draws,) + shape, dtype=jnp.uint8)
             & 1).astype(jnp.int32)
    ys2 = _l.square(ys, _F)
    one = jnp.zeros_like(ys).at[..., 0].set(1)
    num = _l.sub(ys2, one)
    den = _l.add(_l.mul(_D, ys2, _F), one)  # d*y^2 - a = d*y^2 + 1
    # xx is QR  <=>  num*den is QR or num == 0 (y = +-1 gives x = 0)
    ok_d = (_isq.legendre_is_qr(_l.mul(num, den, _F), _F)
            | _l.eq(num, jnp.zeros_like(num), _F))
    idx = jnp.argmax(ok_d.astype(jnp.int8), axis=0)  # first valid draw
    y_sel = jnp.take_along_axis(ys, idx[None, ..., None], axis=0)[0]
    s_sel = jnp.take_along_axis(signs, idx[None], axis=0)[0]
    pt, _ = _from_y(y_sel, s_sel)
    return pt, ok_d.any(axis=0)


# ---------------------------------------------------------------------------
# Public classes
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EdwardsPoint:
    """Batch of points in extended coordinates; fields are int32[..., 22]."""

    X: jnp.ndarray
    Y: jnp.ndarray
    Z: jnp.ndarray
    T: jnp.ndarray

    # -- constructors -------------------------------------------------------
    @classmethod
    def identity(cls, shape: tuple[int, ...] = ()) -> "EdwardsPoint":
        pt = C.IDENTITY.astype(np.int32)
        arrs = [jnp.broadcast_to(jnp.asarray(pt[i]), shape + (22,)) for i in range(4)]
        return cls(*arrs)

    @classmethod
    def basepoint(cls, shape: tuple[int, ...] = ()) -> "EdwardsPoint":
        pt = C.BASEPOINT.astype(np.int32)
        arrs = [jnp.broadcast_to(jnp.asarray(pt[i]), shape + (22,)) for i in range(4)]
        return cls(*arrs)

    @classmethod
    def from_field_elements(cls, x: FieldElement, y: FieldElement) -> "EdwardsPoint":
        """Affine (x, y) -> extended (edwards.rs:419-438)."""
        one = jnp.zeros_like(x.limbs).at[..., 0].set(1)
        return cls(x.limbs, y.limbs, one, _l.mul(x.limbs, y.limbs, _F))

    @classmethod
    def new_from_y_coord(cls, y: FieldElement, sign) -> tuple["EdwardsPoint", jnp.ndarray]:
        """(point, ok): ok is False where x^2 is a non-residue
        (edwards.rs:648-653; batched kernels return a mask, not Option)."""
        (X, Y, Z, T), ok = _from_y(y.limbs, jnp.asarray(sign))
        return cls(X, Y, Z, T), ok

    @classmethod
    def basepoint_mul(cls, scalar: Scalar, width: int | None = None,
                      use_fused: bool | None = None) -> "EdwardsPoint":
        """B*k via the fixed-base affine-Niels comb table: ceil(250/width)
        mixed 7M adds, no doublings (the high-throughput keygen path;
        generalizes window_naf_mul + BASEPOINT_ODD_MULTIPLES_TABLE,
        edwards.rs:155-171).

        Production TPU path (r4): the SIGNED width-14 comb through the
        TWO-WINDOW PACKED Pallas kernel (glue="packed2": table limbs
        packed 2-per-int32 to halve the gather+transpose glue, two mixed
        adds per kernel step to halve the Q round-trips) -- measured
        2.856M mults/s on v5e at batch 16k vs 2.830M one-window packed,
        2.855M packed w15, 2.650M unpacked signed w14 (the r3 path),
        2.254M lanes-gather, 2.57M unsigned w13
        (benchmarks/diag_fixed_base.py, BASELINE.md r4).  Applies only
        when `width` is omitted (None); ANY explicit width -- including
        13 -- keeps the unsigned comb at that width and its
        caller-visible table.  CPU and use_fused=False take the XLA
        comb."""
        if use_fused is None:
            from ..config import DEFAULT as _cfg
            use_fused = _cfg.use_pallas and jax.default_backend() == "tpu"
        if use_fused:
            from ..ops.pallas import field_kernels as _fk
            if width is None:  # default: the measured-fastest config
                sw = COMB_WIDTH_SIGNED
                windows = scalar.windows(sw, -(-250 // sw))
                return cls(*_fk.fixed_base_mul_stepped(windows, sw,
                                                       signed=True,
                                                       glue="packed2"))
            windows = scalar.windows(width, -(-250 // width))
            return cls(*_fk.fixed_base_mul_stepped(windows, width))
        if width is None:
            width = COMB_WIDTH
        windows = scalar.windows(width, -(-250 // width))
        return cls(*_fixed_base_mul(windows, width))

    @classmethod
    def random(cls, key: jax.Array, shape: tuple[int, ...] = ()) -> "EdwardsPoint":
        """Random points: k*B for uniform k (always on-curve, in the prime
        subgroup).  For the reference's rejection-sampled constructor --
        which can land in any coset -- use `new_random_point`
        (edwards.rs:984-997)."""
        k = Scalar.random(key, shape)
        return cls.basepoint(shape) * k

    @classmethod
    def new_random_point(cls, key: jax.Array, shape: tuple[int, ...] = (),
                         draws: int = 16) -> tuple["EdwardsPoint", jnp.ndarray]:
        """Reference-semantics random point (edwards.rs:984-997): rejection-
        sample y (fixed `draws` budget, batched mask-retry) and lift with a
        random x-sign.  Returns (point, ok); ok is False on the ~2^-draws
        lanes where every candidate y was off-curve."""
        pt, ok = _new_random_point(key, shape, draws)
        return cls(*pt), ok

    # -- group ops ----------------------------------------------------------
    def _tuple(self):
        return (self.X, self.Y, self.Z, self.T)

    def __add__(self, other: "EdwardsPoint") -> "EdwardsPoint":
        return EdwardsPoint(*_add(self._tuple(), other._tuple()))

    def __sub__(self, other: "EdwardsPoint") -> "EdwardsPoint":
        return EdwardsPoint(*_add(self._tuple(), _neg(other._tuple())))

    def __neg__(self) -> "EdwardsPoint":
        return EdwardsPoint(*_neg(self._tuple()))

    def double(self) -> "EdwardsPoint":
        return EdwardsPoint(*_double(self._tuple()))

    def __mul__(self, scalar: Scalar) -> "EdwardsPoint":
        """Fixed-ladder scalar multiplication (constant 250 trips).

        On TPU this is the stepped Pallas kernel at width 1: per bit, one
        doubling plus a Niels addition of a one-hot-selected {identity, P}
        entry -- same access-oblivious contract as the XLA select ladder
        (docs/CONSTANT_TIME.md), ~1.6x faster."""
        bits = scalar.into_bits(250)
        from ..config import DEFAULT as _cfg
        if _cfg.use_pallas and jax.default_backend() == "tpu":
            from ..ops.pallas import field_kernels as _fk
            pt = _broadcast_point(self._tuple(), bits.shape[:-1])
            return EdwardsPoint(*_fk.scalar_mul_windowed_stepped(pt, bits, 1))
        return EdwardsPoint(*_scalar_mul(self._tuple(), bits))

    def mul_windowed(self, scalar: Scalar, width: int = 4,
                     use_fused: bool | None = None) -> "EdwardsPoint":
        """Faster fixed-window multiplication (see _scalar_mul_windowed).

        On TPU the whole ladder runs as one fused Pallas kernel per lane
        block (ops/pallas/field_kernels.scalar_mul_windowed_fused): table
        build, doublings and one-hot table selection all VMEM-resident.
        The one-hot select reads every table entry for every lane, so the
        fused path's memory access pattern is secret-independent (unlike
        the XLA path's take_along_axis gather)."""
        nwin = -(-250 // width)
        windows = scalar.windows(width, nwin)
        if use_fused is None:
            from ..config import DEFAULT as _cfg
            use_fused = (_cfg.use_pallas and width == 4
                         and jax.default_backend() == "tpu")
        if use_fused:
            # signed-digit stepped kernel: half-size table (entries 1..8),
            # negation by Niels coordinate swap in-kernel; measured 5.0%
            # over the unsigned stepped kernel on v5e (353.9k vs 336.9k
            # mults/s, benchmarks/diag_windowed.py --signed); access
            # pattern stays entry-uniform (every lane reads all entries)
            from ..ops.pallas import field_kernels as _fk
            pt = _broadcast_point(self._tuple(), windows.shape[:-1])
            return EdwardsPoint(*_fk.scalar_mul_windowed_signed(
                pt, windows, width))
        return EdwardsPoint(*_scalar_mul_windowed(
            self._tuple(), windows, width))

    def __rmul__(self, scalar: Scalar) -> "EdwardsPoint":
        return self.__mul__(scalar)

    def mul_by_cofactor(self) -> "EdwardsPoint":
        """8*P via three doublings (edwards.rs:174-179)."""
        return self.double().double().double()

    def mul_by_pow_2(self, k: int) -> "EdwardsPoint":
        """2^k * P (edwards.rs:186-191)."""
        p = self
        for _ in range(k):
            p = p.double()
        return p

    def mul_raw_int(self, k: int, nbits: int = 253) -> "EdwardsPoint":
        """Multiply by a raw python integer (order checks multiply by r
        itself, ristretto.rs:219)."""
        bits_np = np.array([(k >> i) & 1 for i in range(nbits)], dtype=np.int32)
        bits = jnp.broadcast_to(jnp.asarray(bits_np), self.shape + (nbits,))
        return EdwardsPoint(*_scalar_mul(self._tuple(), bits, nbits=nbits))

    # -- observation --------------------------------------------------------
    @property
    def shape(self):
        return self.X.shape[:-1]

    def __getitem__(self, idx) -> "EdwardsPoint":
        return EdwardsPoint(self.X[idx], self.Y[idx], self.Z[idx], self.T[idx])

    def eq(self, other: "EdwardsPoint") -> jnp.ndarray:
        return _eq(self._tuple(), other._tuple())

    def is_valid(self) -> jnp.ndarray:
        return _is_valid(self._tuple())

    def compress(self) -> jnp.ndarray:
        """[..., 32] uint8 CompressedEdwardsY bytes."""
        return _compress(self._tuple())

    def select(self, cond, other: "EdwardsPoint") -> "EdwardsPoint":
        return EdwardsPoint(*_select(jnp.asarray(cond), self._tuple(), other._tuple()))

    def to_affine(self) -> "AffinePoint":
        zinv = _isq.inverse(self.Z)
        return AffinePoint(_l.mul(self.X, zinv, _F), _l.mul(self.Y, zinv, _F))

    def to_projective(self) -> "ProjectivePoint":
        return ProjectivePoint(self.X, self.Y, self.Z)

    def coset4(self) -> list["EdwardsPoint"]:
        """The four Edwards representatives of this Ristretto coset
        (edwards.rs:603-610)."""
        out = [self]
        for i in range(3):
            t = C.FOUR_COSET_GROUP[i].astype(np.int32)
            q = EdwardsPoint(*[jnp.broadcast_to(jnp.asarray(t[j]), self.X.shape)
                               for j in range(4)])
            out.append(self + q)
        return out

    def field(self, name: str) -> FieldElement:
        return FieldElement(getattr(self, name))

    def to_ints(self):
        """Host pull: tuple of python-int coordinate arrays (tests only)."""
        return tuple(FieldElement(c).to_ints() for c in self._tuple())

    def __repr__(self):
        return f"EdwardsPoint(shape={self.shape})"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ProjectivePoint:
    """(X:Y:Z) points (edwards.rs:666-684).  Kept for API parity; compute
    favors extended coordinates."""

    X: jnp.ndarray
    Y: jnp.ndarray
    Z: jnp.ndarray

    @classmethod
    def identity(cls, shape: tuple[int, ...] = ()) -> "ProjectivePoint":
        e = EdwardsPoint.identity(shape)
        return cls(e.X, e.Y, e.Z)

    def to_extended(self) -> EdwardsPoint:
        """(X:Y:Z) -> extended via (XZ, YZ, Z^2, XY), 3M+1S
        (edwards.rs:402-417)."""
        return EdwardsPoint(
            _l.mul(self.X, self.Z, _F), _l.mul(self.Y, self.Z, _F),
            _l.square(self.Z, _F), _l.mul(self.X, self.Y, _F))

    def __add__(self, other: "ProjectivePoint") -> "ProjectivePoint":
        """Bernstein et al. 2008 projective addition (edwards.rs:809-834)."""
        A = _l.mul(self.Z, other.Z, _F)
        B = _l.square(A, _F)
        Cc = _l.mul(self.X, other.X, _F)
        Dd = _l.mul(self.Y, other.Y, _F)
        E = _l.mul(_D, _l.mul(Cc, Dd, _F), _F)
        F = _l.sub(B, E)
        G = _l.add(B, E)
        t = _l.sub(_l.sub(_l.mul(_l.add(self.X, self.Y),
                                 _l.add(other.X, other.Y), _F), Cc), Dd)
        return ProjectivePoint(
            _l.mul(A, _l.mul(F, t, _F), _F),
            _l.mul(A, _l.mul(G, _l.add(Dd, Cc, ), _F), _F),
            _l.mul(F, G, _F))

    def __neg__(self) -> "ProjectivePoint":
        return ProjectivePoint(_l.neg(self.X), self.Y, self.Z)

    def __sub__(self, other: "ProjectivePoint") -> "ProjectivePoint":
        return self + (-other)

    def double(self) -> "ProjectivePoint":
        """dbl-2008-bbjlp (edwards.rs:915-942), 3M+4S."""
        B = _l.square(_l.add(self.X, self.Y), _F)
        Cc = _l.square(self.X, _F)
        Dd = _l.square(self.Y, _F)
        E = _l.neg(Cc)  # a = -1
        F = _l.add(E, Dd)
        H = _l.square(self.Z, _F)
        J = _l.sub(F, _l.add(H, H))
        return ProjectivePoint(
            _l.mul(_l.sub(_l.sub(B, Cc), Dd), J, _F),
            _l.mul(F, _l.sub(E, Dd), _F),
            _l.mul(F, J, _F))

    def __mul__(self, scalar: Scalar) -> "ProjectivePoint":
        return (self.to_extended() * scalar).to_projective()

    def eq(self, other: "ProjectivePoint") -> jnp.ndarray:
        ex = _l.eq(_l.mul(self.X, other.Z, _F), _l.mul(other.X, self.Z, _F), _F)
        ey = _l.eq(_l.mul(self.Y, other.Z, _F), _l.mul(other.Y, self.Z, _F), _F)
        return ex & ey

    def is_valid(self) -> jnp.ndarray:
        xs = _l.square(self.X, _F)
        ys = _l.square(self.Y, _F)
        zs = _l.square(self.Z, _F)
        left = _l.mul(_l.sub(ys, xs), zs, _F)
        right = _l.add(_l.square(zs, _F), _l.mul(_D, _l.mul(xs, ys, _F), _F))
        return _l.eq(left, right, _F)

    @classmethod
    def new_from_y_coord(cls, y: FieldElement, sign) -> tuple["ProjectivePoint", jnp.ndarray]:
        (X, Y, Z, _), ok = _from_y(y.limbs, jnp.asarray(sign))
        return cls(X, Y, Z), ok

    @classmethod
    def new_random_point(cls, key: jax.Array, shape: tuple[int, ...] = (),
                         draws: int = 16) -> tuple["ProjectivePoint", jnp.ndarray]:
        """The reference's randomized constructor (edwards.rs:984-997),
        batched: rejection-sample y over a fixed draw budget, random x-sign.
        Returns (point, ok) -- see EdwardsPoint.new_random_point."""
        (X, Y, Z, _), ok = _new_random_point(key, shape, draws)
        return cls(X, Y, Z), ok

    @property
    def shape(self):
        return self.X.shape[:-1]

    def __repr__(self):
        return f"ProjectivePoint(shape={self.shape})"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AffinePoint:
    """(x, y) points, equality/validity only (edwards.rs:1000-1069)."""

    X: jnp.ndarray
    Y: jnp.ndarray

    @classmethod
    def identity(cls, shape: tuple[int, ...] = ()) -> "AffinePoint":
        e = EdwardsPoint.identity(shape)
        return cls(e.X, e.Y)

    def eq(self, other: "AffinePoint") -> jnp.ndarray:
        return _l.eq(self.X, other.X, _F) & _l.eq(self.Y, other.Y, _F)

    def is_valid(self) -> jnp.ndarray:
        xs = _l.square(self.X, _F)
        ys = _l.square(self.Y, _F)
        one = jnp.zeros_like(self.X).at[..., 0].set(1)
        left = _l.sub(ys, xs)  # a = -1
        right = _l.add(one, _l.mul(_D, _l.mul(xs, ys, _F), _F))
        return _l.eq(left, right, _F)

    def to_extended(self) -> EdwardsPoint:
        one = jnp.zeros_like(self.X).at[..., 0].set(1)
        return EdwardsPoint(self.X, self.Y, one, _l.mul(self.X, self.Y, _F))

    def __neg__(self) -> "AffinePoint":
        return AffinePoint(_l.neg(self.X), self.Y)

    @property
    def shape(self):
        return self.X.shape[:-1]

    def __repr__(self):
        return f"AffinePoint(shape={self.shape})"


class CompressedEdwardsY:
    """32-byte wire format helper (edwards.rs:208-327).  Wraps a uint8
    [..., 32] array."""

    def __init__(self, b: jnp.ndarray):
        self.bytes = jnp.asarray(b)

    @classmethod
    def identity(cls, shape: tuple[int, ...] = ()) -> "CompressedEdwardsY":
        b = np.zeros(shape + (32,), dtype=np.uint8)
        b[..., 0] = 1
        return cls(jnp.asarray(b))

    def decompress(self) -> tuple[EdwardsPoint, jnp.ndarray]:
        (X, Y, Z, T), ok = _decompress(self.bytes)
        return EdwardsPoint(X, Y, Z, T), ok

    def eq(self, other: "CompressedEdwardsY") -> jnp.ndarray:
        return jnp.all(self.bytes == other.bytes, axis=-1)

    def __repr__(self):
        return f"CompressedEdwardsY(shape={self.bytes.shape[:-1]})"


def double_and_add(point: _traits.Double, scalar: Scalar) -> EdwardsPoint:
    """Reference-named entry point (edwards.rs:102-120); on TPU both
    double_and_add and ltr_bin_mul lower to the same fixed ladder.

    Generic over the op vocabulary: any Double+Mul implementer works (the
    reference writes these against the traits, traits.rs:47-58)."""
    if not isinstance(point, _traits.Double):
        raise TypeError(f"{type(point).__name__} does not implement Double")
    return point * scalar


def ltr_bin_mul(point: _traits.Double, scalar: Scalar) -> EdwardsPoint:
    """edwards.rs:122-134 (see oracle.ltr_bin_mul for the 249-bit quirk we
    deliberately do not replicate)."""
    if not isinstance(point, _traits.Double):
        raise TypeError(f"{type(point).__name__} does not implement Double")
    return point * scalar


def mul_by_cofactor(point: _traits.Double) -> EdwardsPoint:
    """8*P (edwards.rs:174-179); needs only the Double trait."""
    if not isinstance(point, _traits.Double):
        raise TypeError(f"{type(point).__name__} does not implement Double")
    return point.double().double().double()


def mul_by_pow_2(point: _traits.Double, k: int) -> EdwardsPoint:
    """2^k * P (edwards.rs:186-191); needs only the Double trait."""
    if not isinstance(point, _traits.Double):
        raise TypeError(f"{type(point).__name__} does not implement Double")
    for _ in range(k):
        point = point.double()
    return point


@partial(jax.jit, static_argnames=("nbits",))
def _signed_digit_mul(p, digits, nbits: int):
    """MSB-first ladder over signed digits in {-1, 0, +1}."""
    p = _broadcast_point(p, digits.shape[:-1])
    d_msb = jnp.moveaxis(digits, -1, 0)[::-1]
    pn = _neg(p)

    def body(Q, d):
        Q = _double(Q)
        Qa = _add(Q, p)
        Qs = _add(Q, pn)
        Q = _select(d > 0, Qa, _select(d < 0, Qs, Q))
        return Q, None

    Q, _ = jax.lax.scan(body, _identity_like(p), d_msb)
    return Q


def binary_naf_mul(point: EdwardsPoint, scalar: Scalar, nbits: int = 256) -> EdwardsPoint:
    """NAF scalar-mul (edwards.rs:136-153).  Recoding runs host-side
    (Scalar.compute_naf); the ladder is a fixed 256-trip signed-digit scan."""
    digits = jnp.asarray(scalar.compute_naf(nbits).astype(np.int32))
    return EdwardsPoint(*_signed_digit_mul(point._tuple(), digits, nbits))


@partial(jax.jit, static_argnames=("nbits",))
def _window_naf_mul(digits, nbits: int):
    """Fixed-base windowed-NAF ladder over the regenerated basepoint
    multiples table (edwards.rs:155-171 + constants.rs:216-973)."""
    table = jnp.asarray(C.BASEPOINT_MULTIPLES_TABLE)  # [126, 4, 22]
    d_msb = jnp.moveaxis(digits, -1, 0)[::-1]

    def body(Q, d):
        Q = _double(Q)
        entry = tuple(jnp.take(table[:, i], jnp.abs(d), axis=0) for i in range(4))
        entry = _select(d < 0, _neg(entry), entry)
        return _add(Q, entry), None

    zero = jnp.zeros(digits.shape[:-1] + (22,), dtype=jnp.int32)
    Q, _ = jax.lax.scan(body, _identity_like((zero, zero, zero, zero)), d_msb)
    return Q


def window_naf_mul(scalar: Scalar, width: int, nbits: int = 256) -> EdwardsPoint:
    """Fixed-base windowed-NAF multiplication of the basepoint
    (edwards.rs:155-171).  width <= 7 (table holds multiples 0..125; wNAF
    digits are odd with |d| < 2^(width-1)).  Digit 0 adds the table's
    identity entry -- branch-free."""
    assert 2 <= width <= 7
    digits = jnp.asarray(scalar.compute_window_naf(width, nbits).astype(np.int32))
    return EdwardsPoint(*_window_naf_mul(digits, nbits))
