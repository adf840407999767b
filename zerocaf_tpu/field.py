"""Batched field elements mod p = 2^252 + 27742317777372353535851937790883648493.

The public facade over the limb engine -- the TPU analogue of the reference's
FieldElement (field.rs:83-141 facade over backend/u64/field.rs).  A
``FieldElement`` wraps a limb array (int32[..., 22] on the default i32x22
backend); all leading axes are batch axes, so one object is a whole lane of
field elements and every operation is data-parallel.

Backend selection (src/backend/mod.rs:9-16 analogue): each element carries
its ``ModSpec`` as static pytree metadata; constructors consult
``config.get_backend()`` (or take an explicit ``spec``), so the registered
backends (ops/limb.BACKENDS: i32x22 default, f32x29) are reachable from the
public API and jit caches per backend.

Elements circulate in semi-reduced form (|value| < 2^253, see ops/limb.py);
observation (bytes, equality, positivity, evenness) canonicalizes.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from . import config as _cfg
from . import constants as C
from . import oracle
from .ops import inv_sqrt as _isq
from .ops import limb as _l
from .ops.limb import FIELD as _SPEC
from .ops.limb import ModSpec


def _field_spec(spec: ModSpec | None) -> ModSpec:
    """Resolve the field-side ModSpec from the active backend."""
    return spec if spec is not None else _l.BACKENDS[_cfg.get_backend()][0]


@dataclasses.dataclass(frozen=True)
class FieldElement:
    limbs: jnp.ndarray  # [..., spec.nlimbs], dtype spec.np_dtype
    spec: ModSpec = dataclasses.field(default=_SPEC, metadata=dict(static=True))

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_int(cls, v: int | Any, spec: ModSpec | None = None) -> "FieldElement":
        """Embed python int(s) (From<u8..u128>, field.rs:97-149 -- any width)."""
        s = _field_spec(spec)
        if isinstance(v, (list, tuple, np.ndarray)):
            arr = np.stack([
                oracle.int_to_limbs(int(x) % C.P, n=s.nlimbs, w=s.wbits)
                for x in np.ravel(v)])
            arr = arr.reshape(*np.shape(v), s.nlimbs).astype(s.np_dtype)
            return cls(jnp.asarray(arr), s)
        return cls(jnp.asarray(np.array(
            oracle.int_to_limbs(int(v) % C.P, n=s.nlimbs, w=s.wbits),
            dtype=s.np_dtype)), s)

    @classmethod
    def zero(cls, spec: ModSpec | None = None) -> "FieldElement":
        return cls.from_int(0, spec)

    @classmethod
    def one(cls, spec: ModSpec | None = None) -> "FieldElement":
        return cls.from_int(1, spec)

    @classmethod
    def minus_one(cls, spec: ModSpec | None = None) -> "FieldElement":
        return cls.from_int(C.P - 1, spec)

    @classmethod
    def two_pow_k(cls, k: int, spec: ModSpec | None = None) -> "FieldElement":
        """2^k as a field element (field.rs:640-666)."""
        assert 0 <= k < 253
        return cls.from_int(1 << k, spec)

    @classmethod
    def from_bytes(cls, b: jnp.ndarray, spec: ModSpec | None = None) -> "FieldElement":
        """[..., 32] uint8 little-endian -> elements (field.rs:563-587; the
        raw 256-bit value is reduced mod p)."""
        s = _field_spec(spec)
        return cls(_l.from_bytes(jnp.asarray(b), s), s)

    @classmethod
    def from_ristretto255_scalar_bytes(cls, b: jnp.ndarray) -> "FieldElement":
        """curve25519-dalek Ristretto255Scalar interop (field.rs:151-168):
        a canonical ristretto255 scalar byte string IS a canonical element of
        this field (p equals the ristretto255 scalar-group order), so the
        conversion is the canonical byte decode."""
        return cls.from_bytes(b)

    def to_ristretto255_scalar_bytes(self) -> jnp.ndarray:
        """Inverse interop (field.rs:161-168): canonical bytes."""
        return self.to_bytes()

    @classmethod
    def random(cls, key: jax.Array, shape: tuple[int, ...] = (),
               spec: ModSpec | None = None) -> "FieldElement":
        """Uniform random elements via 512-bit reduction (stronger than the
        reference's top-bit masking, field.rs:126-141)."""
        s = _field_spec(spec)
        raw = jax.random.bits(key, shape + (64,), dtype=jnp.uint8)
        lo = _l.from_bytes(raw[..., :32], s)
        hi = _l.from_bytes(raw[..., 32:], s)
        shift = _l.from_int(pow(2, 256, C.P), s)
        return cls(_l.add(_l.mul(hi, shift, s), lo), s)

    # -- shape plumbing -----------------------------------------------------
    @property
    def shape(self) -> tuple[int, ...]:
        return self.limbs.shape[:-1]

    def __getitem__(self, idx) -> "FieldElement":
        return FieldElement(self.limbs[idx], self.spec)

    def broadcast_to(self, shape) -> "FieldElement":
        return FieldElement(
            jnp.broadcast_to(self.limbs, tuple(shape) + self.limbs.shape[-1:]),
            self.spec)

    # -- ring ops (field.rs:191-323) ---------------------------------------
    def __add__(self, other: "FieldElement") -> "FieldElement":
        return FieldElement(_l.add(self.limbs, other.limbs), self.spec)

    def __sub__(self, other: "FieldElement") -> "FieldElement":
        return FieldElement(_l.sub(self.limbs, other.limbs), self.spec)

    def __neg__(self) -> "FieldElement":
        return FieldElement(_l.neg(self.limbs), self.spec)

    def __mul__(self, other: "FieldElement") -> "FieldElement":
        return FieldElement(_l.mul(self.limbs, other.limbs, self.spec), self.spec)

    def __truediv__(self, other: "FieldElement") -> "FieldElement":
        """x * y^-1 (field.rs:277-300).  Division by zero yields zero (batched
        kernels cannot panic; use .is_zero() to detect)."""
        return self * other.inverse()

    def square(self) -> "FieldElement":
        return FieldElement(_l.square(self.limbs, self.spec), self.spec)

    def half(self) -> "FieldElement":
        """x/2 mod p (field.rs:317-323).  half_without_mod (field.rs:676-688)
        is not needed: this is already a single constant-multiply."""
        return self * FieldElement(_l.from_int(C.INVERSE_MOD_TWO, self.spec),
                                   self.spec)

    def __rshift__(self, k: int) -> "FieldElement":
        """Logical right shift of the canonical value (the field analogue of
        Scalar's Shr; backs half_without_mod, field.rs:676-688)."""
        assert 0 <= k
        if k >= 253:
            return FieldElement(jnp.zeros_like(self.limbs), self.spec)
        s = self.spec
        nw = s.nlimbs * s.wbits
        bits = _l.to_bits(self.limbs, s, 253)
        shifted = jnp.pad(bits[..., k:],
                          [(0, 0)] * (bits.ndim - 1) + [(0, k + nw - 253)])
        groups = shifted.reshape(*bits.shape[:-1], s.nlimbs, s.wbits)
        w = jnp.asarray((1 << np.arange(s.wbits)).astype(np.int32))
        out = jnp.sum(groups * w, axis=-1, dtype=jnp.int32)
        return FieldElement(out.astype(self.limbs.dtype), s)

    def half_without_mod(self) -> "FieldElement":
        """Exact halving of an even element (field.rs:676-688)."""
        return self >> 1

    def inverse(self) -> "FieldElement":
        """Fermat a^(p-2) (replaces the binary-GCD loop, field.rs:854-925)."""
        return FieldElement(_isq.inverse(self.limbs, self.spec), self.spec)

    def pow(self, exp) -> "FieldElement":
        """a^e: python-int exponent -> static chain; FieldElement/Scalar
        exponent -> fixed 253-trip batched ladder (field.rs:325-355)."""
        if isinstance(exp, int):
            return FieldElement(_l.pow_const(self.limbs, exp, self.spec), self.spec)
        bits = _l.to_bits(exp.limbs, exp.spec, 253)
        return FieldElement(_l.pow_batched(self.limbs, bits, self.spec), self.spec)

    # -- square roots -------------------------------------------------------
    def legendre_symbol(self) -> jnp.ndarray:
        """True = QR (Choice(1)), False = non-QR or zero (field.rs:703-706).

        NOTE: this boolean form conflates 0 with non-residue; use
        `legendre_symbol_value` for the three-way field-value convention."""
        return _isq.legendre_is_qr(self.limbs, self.spec)

    def legendre_symbol_value(self) -> "FieldElement":
        """The Legendre symbol as a field element: a^((p-1)/2), which is
        1 for a nonzero QR, p-1 (== -1) for a non-residue, and 0 for zero --
        the reference's underlying convention (field.rs:703-706 computes
        exactly this power before collapsing it to a Choice)."""
        return FieldElement(
            _l.pow_const(self.limbs, (C.P - 1) // 2, self.spec), self.spec)

    def mod_sqrt(self, sign) -> tuple[jnp.ndarray, "FieldElement"]:
        """(exists, root); sign semantics follow the reference exactly
        (field.rs:378-440): 0 -> raw Tonelli root, 1 -> its negation."""
        ok, root = _isq.mod_sqrt(self.limbs, jnp.asarray(sign), self.spec)
        return ok, FieldElement(root, self.spec)

    def inv_sqrt(self) -> tuple[jnp.ndarray, "FieldElement"]:
        ok, r = _isq.inv_sqrt(self.limbs, self.spec)
        return ok, FieldElement(r, self.spec)

    def sqrt_ratio_i(self, v: "FieldElement") -> tuple[jnp.ndarray, "FieldElement"]:
        ok, r = _isq.sqrt_ratio_i(self.limbs, v.limbs, self.spec)
        return ok, FieldElement(r, self.spec)

    # -- observation --------------------------------------------------------
    def canonical(self) -> "FieldElement":
        return FieldElement(_l.canonical(self.limbs, self.spec), self.spec)

    def to_bytes(self) -> jnp.ndarray:
        """Canonical 32-byte LE encoding [..., 32] uint8 (field.rs:591-631)."""
        return _l.to_bytes(self.limbs, self.spec)

    def eq(self, other: "FieldElement") -> jnp.ndarray:
        """Constant-time-style equality mask (field.rs:93-106)."""
        return _l.eq(self.limbs, other.limbs, self.spec)

    # -- Ord (field.rs:59-76): batched compare of canonical values ----------
    def cmp(self, other: "FieldElement") -> jnp.ndarray:
        """Three-way compare: -1 / 0 / +1 int32 per lane."""
        return _l.cmp(self.limbs, other.limbs, self.spec)

    def __lt__(self, other: "FieldElement") -> jnp.ndarray:
        return self.cmp(other) < 0

    def __le__(self, other: "FieldElement") -> jnp.ndarray:
        return self.cmp(other) <= 0

    def __gt__(self, other: "FieldElement") -> jnp.ndarray:
        return self.cmp(other) > 0

    def __ge__(self, other: "FieldElement") -> jnp.ndarray:
        return self.cmp(other) >= 0

    def is_zero(self) -> jnp.ndarray:
        return _l.is_zero(self.limbs, self.spec)

    def is_positive(self) -> jnp.ndarray:
        """Decaf criterion (field.rs:552-557)."""
        return _isq.is_positive(self.limbs, self.spec)

    def abs(self) -> "FieldElement":
        return FieldElement(_isq.abs_positive(self.limbs, self.spec), self.spec)

    def is_even(self) -> jnp.ndarray:
        """Low bit of the canonical value (field.rs:534-539)."""
        low = _l.canonical(self.limbs, self.spec)[..., 0].astype(jnp.int32)
        return (low & 1) == 0

    def conditional_negate(self, cond) -> "FieldElement":
        return FieldElement(_isq.conditional_negate(self.limbs, jnp.asarray(cond)),
                            self.spec)

    def select(self, cond, other: "FieldElement") -> "FieldElement":
        """where(cond, self, other), limbwise (ConditionallySelectable,
        field.rs:108-118)."""
        return FieldElement(_l.select(jnp.asarray(cond), self.limbs, other.limbs),
                            self.spec)

    # -- host-side helpers (tests / debugging) ------------------------------
    def to_ints(self):
        """Pull to host as python int(s) -- observation only."""
        arr = np.asarray(self.canonical().limbs).astype(np.int64)
        if arr.ndim == 1:
            return oracle.limbs_to_int(arr, w=self.spec.wbits)
        flat = arr.reshape(-1, self.spec.nlimbs)
        out = np.empty(flat.shape[0], dtype=object)
        for i, row in enumerate(flat):
            out[i] = oracle.limbs_to_int(row, w=self.spec.wbits)
        return out.reshape(arr.shape[:-1])

    def __repr__(self) -> str:
        return f"FieldElement(shape={self.shape}, backend={self.spec.name})"


jax.tree_util.register_dataclass(
    FieldElement, data_fields=("limbs",), meta_fields=("spec",))


# Module-level constants, mirroring the reference's constants module surface
# (instantiated on the default i32x22 backend, as the reference's constants
# tables instantiate u64 limbs).
# NOTE: held as host numpy limbs (not device arrays) so importing the
# package performs NO backend initialization -- required for multi-host
# jax.distributed startup (initialize must precede any XLA call).
EDWARDS_D = FieldElement(C.EDWARDS_D_LIMBS)
EDWARDS_A = FieldElement(C.EDWARDS_A_LIMBS)
SQRT_M1 = FieldElement(C.SQRT_M1_LIMBS)
INV_SQRT_A = FieldElement(C.INV_SQRT_A_LIMBS)
MINUS_SQRT_A = FieldElement(C.MINUS_SQRT_A_LIMBS)
INV_SQRT_A_MINUS_D = FieldElement(C.INV_SQRT_A_MINUS_D_LIMBS)
SQRT_AD_MINUS_ONE = FieldElement(C.SQRT_AD_MINUS_ONE_LIMBS)
ONE_MINUS_D_SQ = FieldElement(C.ONE_MINUS_D_SQ_LIMBS)
D_MINUS_ONE_SQ = FieldElement(C.D_MINUS_ONE_SQ_LIMBS)
