"""zerocaf-tpu: a TPU-native elliptic-curve framework for the Sonny curve.

A from-scratch JAX/XLA/Pallas implementation of the capability surface of
dusk-network/dusk-zerocaf (reference at /root/reference): field and scalar
arithmetic over the Ristretto-scalar-field prime, four Edwards point models,
the Ristretto prime-order group protocol, and batched/sharded multi-scalar
multiplication -- all as data-parallel lane kernels with fixed-shape,
branch-free control flow.

Public API (mirrors the reference's module layout, lib.rs:166-173):

    from zerocaf_tpu import FieldElement, Scalar, EdwardsPoint, RistrettoPoint
"""

from .field import FieldElement
from .scalar import Ristretto255Scalar, Scalar
from .models import (AffinePoint, CompressedEdwardsY, CompressedRistretto,
                     EdwardsPoint, MontgomeryPoint, ProjectivePoint,
                     RistrettoPoint, binary_naf_mul, double_and_add,
                     ltr_bin_mul, mul_by_cofactor, mul_by_pow_2,
                     window_naf_mul)
from . import constants
from . import oracle
from . import traits

__version__ = "0.1.0"

__all__ = [
    "FieldElement", "Scalar", "Ristretto255Scalar",
    "AffinePoint", "CompressedEdwardsY", "CompressedRistretto", "EdwardsPoint",
    "MontgomeryPoint", "ProjectivePoint", "RistrettoPoint",
    "binary_naf_mul", "double_and_add", "ltr_bin_mul", "mul_by_cofactor",
    "mul_by_pow_2", "window_naf_mul",
    "constants", "oracle", "traits",
]
