"""Batched Ristretto prime-order group over the Sonny curve.

The analogue of /root/reference/src/ristretto.rs: a prime-order group
abstraction over the cofactor-8 Edwards curve.  Every point is a batch
(coordinates are int32[..., 22] lanes); encode/decode/Elligator are a handful
of field muls plus one inv_sqrt chain each, so they vectorize cleanly
(SURVEY.md C9).  All encodings are byte-compatible with the reference's
test vectors (the 16 small-multiple encodings gate this in tests).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..field import FieldElement
from ..scalar import Scalar
from ..ops import inv_sqrt as _isq
from ..ops import limb as _l
from ..ops.limb import FIELD as _F
from . import edwards as _ed

# host numpy limbs: importing the package must not initialize the backend
_D = C.EDWARDS_D_LIMBS
_SQRT_M1 = C.SQRT_M1_LIMBS
_INV_SQRT_A_MINUS_D = C.INV_SQRT_A_MINUS_D_LIMBS
_SQRT_AD_MINUS_ONE = C.SQRT_AD_MINUS_ONE_LIMBS
_ONE_MINUS_D_SQ = C.ONE_MINUS_D_SQ_LIMBS
_D_MINUS_ONE_SQ = C.D_MINUS_ONE_SQ_LIMBS


def _one_like(x):
    return jnp.zeros_like(x).at[..., 0].set(1)


@jax.jit
def _compress(p):
    """Ristretto encode (ristretto.rs:398-425)."""
    X, Y, Z, T = p
    u1 = _l.mul(_l.add(Z, Y), _l.sub(Z, Y), _F)
    u2 = _l.mul(X, Y, _F)
    _, I = _isq.inv_sqrt(_l.mul(u1, _l.square(u2, _F), _F))
    D1 = _l.mul(u1, I, _F)
    D2 = _l.mul(u2, I, _F)
    Zinv = _l.mul(_l.mul(D1, D2, _F), T, _F)
    rotate = ~_isq.is_positive(_l.mul(T, Zinv, _F))
    x = _l.select(rotate, _l.mul(_SQRT_M1, Y, _F), X)
    y = _l.select(rotate, _l.mul(_SQRT_M1, X, _F), Y)
    Dde = _l.select(rotate, _l.mul(D1, _INV_SQRT_A_MINUS_D, _F), D2)
    y = _isq.conditional_negate(y, ~_isq.is_positive(_l.mul(x, Zinv, _F)))
    s = _l.mul(_l.sub(Z, y), Dde, _F)
    s = _isq.abs_positive(s)
    return _l.to_bytes(s, _F)


@jax.jit
def _decompress(b):
    """Ristretto decode (ristretto.rs:96-154).  Returns (point, ok)."""
    raw = _l.bytes_to_limbs(b)
    s = _l.reduce_to_semi(raw, _F)
    canonical_enc = jnp.all(_l.to_bytes(s, _F) == b, axis=-1)
    s_pos = _isq.is_positive(s)

    one = _one_like(s)
    ss = _l.square(s, _F)
    u1 = _l.sub(one, ss)
    u2 = _l.add(one, ss)
    u2_sq = _l.square(u2, _F)
    v = _l.sub(_l.neg(_l.mul(_D, _l.square(u1, _F), _F)), u2_sq)
    ok_sqrt, I = _isq.inv_sqrt(_l.mul(v, u2_sq, _F))
    Dx = _l.mul(I, u2, _F)
    Dy = _l.mul(I, _l.mul(Dx, v, _F), _F)
    x = _l.mul(_l.add(s, s), Dx, _F)
    x = _isq.abs_positive(x)
    y = _l.mul(u1, Dy, _F)
    t = _l.mul(x, y, _F)
    ok = (canonical_enc & s_pos & ok_sqrt
          & _isq.is_positive(t) & ~_l.is_zero(y, _F))
    return (x, y, one, t), ok


@jax.jit
def _elligator(r0):
    """The Ristretto Elligator map (ristretto.rs:430-471)."""
    one = _one_like(r0)
    c = _l.neg(one)
    r = _l.mul(_SQRT_M1, _l.square(r0, _F), _F)
    N_s = _l.mul(_l.add(r, one), _ONE_MINUS_D_SQ, _F)
    D = _l.mul(_l.sub(c, _l.mul(_D, r, _F)), _l.add(r, _D), _F)
    Ns_D_is_sq, s = _isq.sqrt_ratio_i(N_s, D)

    s_prim = _l.mul(s, r0, _F)
    s_prim = _isq.conditional_negate(s_prim, _isq.is_positive(s_prim))
    s = _l.select(Ns_D_is_sq, s, s_prim)
    c = _l.select(Ns_D_is_sq, c, r)

    N_t = _l.sub(_l.mul(_l.mul(c, _l.sub(r, one), _F), _D_MINUS_ONE_SQ, _F), D)
    s_sq = _l.square(s, _F)
    W0 = _l.mul(_l.add(s, s), D, _F)
    W1 = _l.mul(N_t, _SQRT_AD_MINUS_ONE, _F)
    W2 = _l.sub(one, s_sq)
    W3 = _l.add(one, s_sq)
    return (_l.mul(W0, W3, _F), _l.mul(W2, W1, _F),
            _l.mul(W1, W3, _F), _l.mul(W0, W2, _F))


@jax.jit
def _ristretto_eq(p, q):
    """Coset-aware equality: X1Y2 == Y1X2 or X1X2 == Y1Y2
    (ristretto.rs:166-176)."""
    X1, Y1, _, _ = p
    X2, Y2, _, _ = q
    a = _l.eq(_l.mul(X1, Y2, _F), _l.mul(Y1, X2, _F), _F)
    b = _l.eq(_l.mul(X1, X2, _F), _l.mul(Y1, Y2, _F), _F)
    return a | b


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RistrettoPoint:
    """A batch of Ristretto points, represented by Edwards points
    (ristretto.rs:157-158)."""

    point: _ed.EdwardsPoint

    # -- constructors -------------------------------------------------------
    @classmethod
    def identity(cls, shape: tuple[int, ...] = ()) -> "RistrettoPoint":
        return cls(_ed.EdwardsPoint.identity(shape))

    @classmethod
    def basepoint(cls, shape: tuple[int, ...] = ()) -> "RistrettoPoint":
        return cls(_ed.EdwardsPoint.basepoint(shape))

    @classmethod
    def elligator(cls, r0: FieldElement) -> "RistrettoPoint":
        """elligator_ristretto_flavor (ristretto.rs:430-471)."""
        return cls(_ed.EdwardsPoint(*_elligator(r0.limbs)))

    @classmethod
    def from_uniform_bytes(cls, b: jnp.ndarray) -> "RistrettoPoint":
        """Hash-to-group: [..., 64] uint8 -> points (ristretto.rs:493-507)."""
        b = jnp.asarray(b)
        r1 = _l.from_bytes(b[..., :32], _F)
        r2 = _l.from_bytes(b[..., 32:], _F)
        p1 = _elligator(r1)
        p2 = _elligator(r2)
        return cls(_ed.EdwardsPoint(*_ed._add(p1, p2)))

    @classmethod
    def random(cls, key: jax.Array, shape: tuple[int, ...] = ()) -> "RistrettoPoint":
        """Uniform random points via double-Elligator (ristretto.rs:519-523)."""
        raw = jax.random.bits(key, shape + (64,), dtype=jnp.uint8)
        return cls.from_uniform_bytes(raw)

    # -- group ops (delegate to Edwards, ristretto.rs:224-392) ---------------
    def __add__(self, other: "RistrettoPoint") -> "RistrettoPoint":
        return RistrettoPoint(self.point + other.point)

    def __sub__(self, other: "RistrettoPoint") -> "RistrettoPoint":
        return RistrettoPoint(self.point - other.point)

    def __neg__(self) -> "RistrettoPoint":
        return RistrettoPoint(-self.point)

    def double(self) -> "RistrettoPoint":
        return RistrettoPoint(self.point.double())

    def __mul__(self, scalar: Scalar) -> "RistrettoPoint":
        return RistrettoPoint(self.point * scalar)

    def __rmul__(self, scalar: Scalar) -> "RistrettoPoint":
        return self.__mul__(scalar)

    # -- wire format --------------------------------------------------------
    def compress(self) -> jnp.ndarray:
        """[..., 32] uint8 canonical encodings."""
        return _compress(self.point._tuple())

    @classmethod
    def decompress(cls, b: jnp.ndarray) -> tuple["RistrettoPoint", jnp.ndarray]:
        """(points, ok): ok False for non-canonical / invalid encodings."""
        (x, y, z, t), ok = _decompress(jnp.asarray(b))
        return cls(_ed.EdwardsPoint(x, y, z, t)), ok

    # -- observation --------------------------------------------------------
    @property
    def shape(self):
        return self.point.shape

    def __getitem__(self, idx) -> "RistrettoPoint":
        return RistrettoPoint(self.point[idx])

    def eq(self, other: "RistrettoPoint") -> jnp.ndarray:
        return _ristretto_eq(self.point._tuple(), other.point._tuple())

    def is_valid(self) -> jnp.ndarray:
        """Strict order-L validity (ristretto.rs:205-222): curve membership
        and r*P == identity."""
        rp = self.point.mul_raw_int(C.R)
        return self.point.is_valid() & rp.eq(_ed.EdwardsPoint.identity(self.shape))

    def coset4(self) -> list[_ed.EdwardsPoint]:
        return self.point.coset4()

    def __repr__(self):
        return f"RistrettoPoint(shape={self.shape})"


class CompressedRistretto:
    """Canonical 32-byte wire format (ristretto.rs:41-45); equality is byte
    equality."""

    def __init__(self, b: jnp.ndarray):
        self.bytes = jnp.asarray(b)

    @classmethod
    def identity(cls, shape: tuple[int, ...] = ()) -> "CompressedRistretto":
        return cls(jnp.zeros(shape + (32,), dtype=jnp.uint8))

    def decompress(self) -> tuple[RistrettoPoint, jnp.ndarray]:
        return RistrettoPoint.decompress(self.bytes)

    def eq(self, other: "CompressedRistretto") -> jnp.ndarray:
        return jnp.all(self.bytes == other.bytes, axis=-1)

    def __repr__(self):
        return f"CompressedRistretto(shape={self.bytes.shape[:-1]})"
