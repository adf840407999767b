"""Montgomery form of the Sonny curve.

The reference ships a stub (/root/reference/src/montgomery.rs: the
Edwards<->Montgomery conversions are `unimplemented!()`, montgomery.rs:55-57,
edwards.rs:597-599).  We implement the standard birational maps the paper
claims (docs/"Safe Curve criteria":16): for the Montgomery curve
B*v^2 = u^3 + A*u^2 + u with A = 2(a+d)/(a-d) = 505186 (derived in
sage_codes/curve_derivation:1-35, verified in constants.py):

    u = (Z + Y) / (Z - Y)            (Edwards -> Montgomery)
    y = (u - 1) / (u + 1)            (Montgomery -> Edwards y)

A ``MontgomeryPoint`` batch stores u-coordinates as [..., 32] uint8, like the
reference's wire-format wrapper (montgomery.rs:13-16); equality is mod-p
field equality of the decoded u values (montgomery.rs:19-26).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as C
from ..field import FieldElement
from ..ops import inv_sqrt as _isq
from ..ops import limb as _l
from ..ops.limb import FIELD as _F
from . import edwards as _ed

MONT_A = C.MONT_A  # 505186
MONT_B = C.MONT_B


class MontgomeryPoint:
    """u-coordinate byte wrapper (montgomery.rs:13-58)."""

    def __init__(self, b: jnp.ndarray):
        self.bytes = jnp.asarray(b)

    @classmethod
    def from_edwards(cls, p: _ed.EdwardsPoint) -> "MontgomeryPoint":
        """u = (Z + Y)/(Z - Y).  (The reference leaves to_montgomery
        unimplemented, edwards.rs:597-599.)  The 2-torsion point y = Z
        (i.e. the identity) maps to the point at infinity; we encode it as
        u = 0 like the curve25519 convention."""
        num = _l.add(p.Z, p.Y)
        den = _l.sub(p.Z, p.Y)
        u = _l.mul(num, _isq.inverse(den), _F)  # inverse(0) = 0 -> u = 0
        return cls(_l.to_bytes(u, _F))

    def u(self) -> FieldElement:
        return FieldElement(_l.from_bytes(self.bytes, _F))

    def to_edwards(self, sign) -> tuple[_ed.EdwardsPoint, jnp.ndarray]:
        """y = (u - 1)/(u + 1), then lift by x-sign.  (Reference stub:
        montgomery.rs:55-57.)  Returns (points, ok); ok is False where no
        curve point has that u."""
        uu = self.u().limbs
        one = jnp.zeros_like(uu).at[..., 0].set(1)
        y = _l.mul(_l.sub(uu, one), _isq.inverse(_l.add(uu, one)), _F)
        return _ed.EdwardsPoint.new_from_y_coord(FieldElement(y), sign)

    def eq(self, other: "MontgomeryPoint") -> jnp.ndarray:
        """Equality mod p of the decoded u values (montgomery.rs:19-26)."""
        return _l.eq(self.u().limbs, other.u().limbs, _F)

    def __repr__(self):
        return f"MontgomeryPoint(shape={self.bytes.shape[:-1]})"
