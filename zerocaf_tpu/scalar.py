"""Batched scalars mod r = 2^249 + 14490550575682688738086195780655237219.

The TPU analogue of the reference's Scalar (scalar.rs:61-113 facade over
backend/u64/scalar.rs).  Same limb machinery as the field, parameterized by
the subgroup prime; adds the scalar recodings (bits / NAF / windowed NAF,
scalar.rs:352-442) which run host-side as preprocessing that feeds
fixed-length digit arrays to the point-multiplication kernels.

Backend selection mirrors FieldElement: each scalar carries its ModSpec as
static pytree metadata; constructors consult ``config.get_backend()``.
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
from .ops import limb as _l
from .ops.limb import SCALAR as _SPEC
from .ops.limb import ModSpec


def _scalar_spec(spec: ModSpec | None) -> ModSpec:
    """Resolve the scalar-side ModSpec from the active backend."""
    return spec if spec is not None else _l.BACKENDS[_cfg.get_backend()][1]


@dataclasses.dataclass(frozen=True)
class Scalar:
    limbs: jnp.ndarray  # [..., spec.nlimbs], dtype spec.np_dtype
    spec: ModSpec = dataclasses.field(default=_SPEC, metadata=dict(static=True))

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_int(cls, v: int | Any, spec: ModSpec | None = None) -> "Scalar":
        s = _scalar_spec(spec)
        if isinstance(v, (list, tuple, np.ndarray)):
            arr = np.stack([
                oracle.int_to_limbs(int(x) % C.R, n=s.nlimbs, w=s.wbits)
                for x in np.ravel(v)])
            arr = arr.reshape(*np.shape(v), s.nlimbs).astype(s.np_dtype)
            return cls(jnp.asarray(arr), s)
        return cls(jnp.asarray(np.array(
            oracle.int_to_limbs(int(v) % C.R, n=s.nlimbs, w=s.wbits),
            dtype=s.np_dtype)), s)

    @classmethod
    def zero(cls, spec: ModSpec | None = None) -> "Scalar":
        return cls.from_int(0, spec)

    @classmethod
    def one(cls, spec: ModSpec | None = None) -> "Scalar":
        return cls.from_int(1, spec)

    @classmethod
    def minus_one(cls, spec: ModSpec | None = None) -> "Scalar":
        return cls.from_int(C.R - 1, spec)

    @classmethod
    def two_pow_k(cls, k: int, spec: ModSpec | None = None) -> "Scalar":
        assert 0 <= k < 250
        return cls.from_int(1 << k, spec)

    @classmethod
    def from_bytes(cls, b: jnp.ndarray,
                   spec: ModSpec | None = None) -> tuple["Scalar", jnp.ndarray]:
        """[..., 32] uint8 LE -> (scalars, canonical_mask).  The reference
        *asserts* canonicality (scalar.rs:445-467); batched kernels return a
        mask instead (the value is reduced mod r either way)."""
        s = _scalar_spec(spec)
        b = jnp.asarray(b)
        v = _l.from_bytes(b, s)
        # canonical iff re-encoding reproduces the input bytes
        mask = jnp.all(_l.to_bytes(v, s) == b, axis=-1)
        return cls(v, s), mask

    @classmethod
    def from_bytes_wide(cls, b: jnp.ndarray, spec: ModSpec | None = None) -> "Scalar":
        """[..., 64] uint8 -> 512-bit reduction mod r.  Unimplemented in the
        reference (scalar.rs:470-474); provided here."""
        s = _scalar_spec(spec)
        b = jnp.asarray(b)
        lo = _l.from_bytes(b[..., :32], s)
        hi = _l.from_bytes(b[..., 32:], s)
        shift = _l.from_int(pow(2, 256, C.R), s)
        return cls(_l.add(_l.mul(hi, shift, s), lo), s)

    @classmethod
    def random(cls, key: jax.Array, shape: tuple[int, ...] = (),
               spec: ModSpec | None = None) -> "Scalar":
        """Uniform scalars via wide reduction (the reference masks top bits,
        scalar.rs:95-110 -- approximate; this is exact-uniform)."""
        raw = jax.random.bits(key, shape + (64,), dtype=jnp.uint8)
        return cls.from_bytes_wide(raw, spec)

    # -- shape plumbing -----------------------------------------------------
    @property
    def shape(self) -> tuple[int, ...]:
        return self.limbs.shape[:-1]

    def __getitem__(self, idx) -> "Scalar":
        return Scalar(self.limbs[idx], self.spec)

    def broadcast_to(self, shape) -> "Scalar":
        return Scalar(
            jnp.broadcast_to(self.limbs, tuple(shape) + self.limbs.shape[-1:]),
            self.spec)

    # -- ring ops (scalar.rs:184-322) --------------------------------------
    def __add__(self, other: "Scalar") -> "Scalar":
        return Scalar(_l.add(self.limbs, other.limbs), self.spec)

    def __sub__(self, other: "Scalar") -> "Scalar":
        return Scalar(_l.sub(self.limbs, other.limbs), self.spec)

    def __neg__(self) -> "Scalar":
        return Scalar(_l.neg(self.limbs), self.spec)

    def __mul__(self, other: "Scalar") -> "Scalar":
        return Scalar(_l.mul(self.limbs, other.limbs, self.spec), self.spec)

    def square(self) -> "Scalar":
        return Scalar(_l.square(self.limbs, self.spec), self.spec)

    def half(self) -> "Scalar":
        """x/2 mod r (scalar.rs:285-291)."""
        return self * Scalar(_l.from_int(C.SCALAR_INVERSE_MOD_TWO, self.spec),
                             self.spec)

    def inverse(self) -> "Scalar":
        """r is prime, so Fermat applies (no inverse in the reference API;
        needed by protocol layers)."""
        return Scalar(_l.pow_const(self.limbs, C.R - 2, self.spec), self.spec)

    def pow(self, exp) -> "Scalar":
        if isinstance(exp, int):
            return Scalar(_l.pow_const(self.limbs, exp, self.spec), self.spec)
        bits = _l.to_bits(exp.limbs, exp.spec, 250)
        return Scalar(_l.pow_batched(self.limbs, bits, self.spec), self.spec)

    # -- observation --------------------------------------------------------
    def canonical(self) -> "Scalar":
        return Scalar(_l.canonical(self.limbs, self.spec), self.spec)

    def to_bytes(self) -> jnp.ndarray:
        return _l.to_bytes(self.limbs, self.spec)

    def eq(self, other: "Scalar") -> jnp.ndarray:
        return _l.eq(self.limbs, other.limbs, self.spec)

    # -- Ord (scalar.rs:48-59): batched compare of canonical values ---------
    def cmp(self, other: "Scalar") -> jnp.ndarray:
        """Three-way compare: -1 / 0 / +1 int32 per lane."""
        return _l.cmp(self.limbs, other.limbs, self.spec)

    def __lt__(self, other: "Scalar") -> jnp.ndarray:
        return self.cmp(other) < 0

    def __le__(self, other: "Scalar") -> jnp.ndarray:
        return self.cmp(other) <= 0

    def __gt__(self, other: "Scalar") -> jnp.ndarray:
        return self.cmp(other) > 0

    def __ge__(self, other: "Scalar") -> jnp.ndarray:
        return self.cmp(other) >= 0

    def is_zero(self) -> jnp.ndarray:
        return _l.is_zero(self.limbs, self.spec)

    def is_even(self) -> jnp.ndarray:
        """scalar.rs:346-348."""
        low = _l.canonical(self.limbs, self.spec)[..., 0].astype(jnp.int32)
        return (low & 1) == 0

    def select(self, cond, other: "Scalar") -> "Scalar":
        return Scalar(_l.select(jnp.asarray(cond), self.limbs, other.limbs),
                      self.spec)

    # -- recodings: device bits, host NAF ------------------------------------
    def into_bits(self, nbits: int = 250) -> jnp.ndarray:
        """LSB-first bits [..., nbits] int32, on device (scalar.rs:352-366).
        250 bits cover every canonical scalar (r < 2^250)."""
        return _l.to_bits(self.limbs, self.spec, nbits)

    def to_ints(self):
        arr = np.asarray(self.canonical().limbs).astype(np.int64)
        if arr.ndim == 1:
            return oracle.limbs_to_int(arr, w=self.spec.wbits)
        flat = arr.reshape(-1, self.spec.nlimbs)
        out = np.empty(flat.shape[0], dtype=object)
        for i, row in enumerate(flat):
            out[i] = oracle.limbs_to_int(row, w=self.spec.wbits)
        return out.reshape(arr.shape[:-1])

    def compute_naf(self, nbits: int = 256) -> np.ndarray:
        """Host-side NAF recoding [..., nbits] int8 (scalar.rs:370-389).
        Recoding is sequential preprocessing that feeds fixed-length digit
        arrays to the device kernels; it runs in the native C++ engine when
        built (native/recode.cpp), else pure Python."""
        from . import native
        return native.naf(np.asarray(self.to_bytes()), nbits)

    def compute_window_naf(self, width: int, nbits: int = 256) -> np.ndarray:
        """Host-side windowed NAF [..., nbits] int8 (scalar.rs:391-415)."""
        from . import native
        return native.wnaf(np.asarray(self.to_bytes()), width, nbits)

    def __rshift__(self, k: int) -> "Scalar":
        """Logical right shift of the canonical value (scalar.rs:165-182)."""
        assert 0 <= k
        if k >= 250:
            return Scalar(jnp.zeros_like(self.limbs), self.spec)
        s = self.spec
        nw = s.nlimbs * s.wbits
        bits = self.into_bits(250)
        shifted = jnp.pad(bits[..., k:],
                          [(0, 0)] * (bits.ndim - 1) + [(0, k + nw - 250)])
        groups = shifted.reshape(*bits.shape[:-1], s.nlimbs, s.wbits)
        w = jnp.asarray((1 << np.arange(s.wbits)).astype(np.int32))
        out = jnp.sum(groups * w, axis=-1, dtype=jnp.int32)
        return Scalar(out.astype(self.limbs.dtype), s)

    def half_without_mod(self) -> "Scalar":
        """Exact halving of an even scalar (scalar.rs:562-574); here simply
        value >> 1 (callers guarantee evenness, as in the reference)."""
        return self >> 1

    def mod_2_pow_k(self, k: int) -> jnp.ndarray:
        """scalar (mod 2^k), k <= radix bits (scalar.rs:423-425)."""
        assert 0 < k <= self.spec.wbits
        low = _l.canonical(self.limbs, self.spec)[..., 0].astype(jnp.int32)
        return low & ((1 << k) - 1)

    def mods_2_pow_k(self, w: int) -> jnp.ndarray:
        """Signed residue in [-2^(w-1), 2^(w-1)) (scalar.rs:433-442)."""
        assert 0 < w <= self.spec.wbits
        m = self.mod_2_pow_k(w)
        return jnp.where(m >= (1 << (w - 1)), m - (1 << w), m)

    def windows(self, width: int, nwin: int | None = None) -> jnp.ndarray:
        """Unsigned fixed-width windows [..., nwin] int32 (digit i = bits
        [i*w, (i+1)*w)), on device -- the Pippenger digit decomposition.

        Extracted directly from the canonical limbs with static per-window
        shift/or (each width<=19 window straddles limbs without int32
        overflow: limb < 2^12 shifted by < width).  The r4 form expanded
        to an [..., nwin*width] int32 BIT tensor first -- 4.2 GB of HBM at
        N = 2^22, the allocation that OOMed the at-scale MSM."""
        if nwin is None:
            nwin = -(-250 // width)
        if width > 19:  # shifted limb would overflow int32; no caller does
            bits = self.into_bits(nwin * width)
            groups = bits.reshape(*bits.shape[:-1], nwin, width)
            w = jnp.asarray((1 << np.arange(width)).astype(np.int32))
            return jnp.sum(groups * w, axis=-1, dtype=jnp.int32)
        wb = self.spec.wbits
        lc = _l.canonical(self.limbs, self.spec).astype(jnp.int32)
        mask = (1 << width) - 1
        outs = []
        for i in range(nwin):
            base = i * width
            d = None
            for j in range(base // wb,
                           min((base + width - 1) // wb + 1,
                               self.spec.nlimbs)):
                sh = wb * j - base
                v = lc[..., j]
                t = (v << sh) if sh >= 0 else (v >> -sh)
                d = t if d is None else d | t
            outs.append((d if d is not None else jnp.zeros_like(lc[..., 0]))
                        & mask)
        return jnp.stack(outs, axis=-1)

    def __repr__(self) -> str:
        return f"Scalar(shape={self.shape}, backend={self.spec.name})"


jax.tree_util.register_dataclass(
    Scalar, data_fields=("limbs",), meta_fields=("spec",))


# ---------------------------------------------------------------------------
# curve25519-dalek interop (scalar.rs:112-113).  The reference aliases
# `Ristretto255Scalar = curve25519_dalek::scalar::Scalar`; in this framework
# the ristretto255 scalar ring -- integers mod the ed25519 group order
# p = 2^252 + 27742... -- IS the Sonny base field, so the alias points at
# FieldElement (whose canonical 32-byte encoding is byte-compatible with
# dalek scalars; see FieldElement.from_ristretto255_scalar_bytes,
# field.rs:151-168).
# ---------------------------------------------------------------------------
from .field import FieldElement as Ristretto255Scalar  # noqa: E402
