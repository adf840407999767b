"""Pallas TPU kernel for Pippenger bucket accumulation (dense, sort-free).

The scan-based MSM (parallel/msm.py `_bucket_table`) pays for its buckets
outside the EC math: per-window argsort over N digits, a [N, 352-byte]
point gather, and 2*log2(N) Blelloch rounds whose strided col/setcol
updates round-trip the full point array through HBM every round.  At 2^20
points that overhead held the flagship workload to ~7% of the chip's own
measured field-mul rate (VERDICT r3 item 1; measured breakdown in
BASELINE.md round 4).

This kernel removes all of it.  TPUs have no scatter, but they do have
enough VMEM to hold a whole signed-digit bucket table per lane:

  * points stream through VMEM ONCE per window in [128, DENSE_LANES]
    chunks (coords stacked on sublanes like padd_tiled);
  * each of the DENSE_LANES lanes owns a private bucket table -- entry k
    coord j lives at sublane rows (k*4+j)*PITCH -- held in the OUTPUT
    block, whose constant index map keeps it VMEM-resident across all
    grid steps (the standard Pallas reduction pattern);
  * per chunk, every lane folds its point into its bucket |d|: one-hot
    read of the bucket entry (compare+select over nb entries), ONE
    unified extended addition, one-hot write back.  Signed digits: the
    point is conditionally negated (-X, -T) before the add, halving nb.
    Digit 0 matches no k >= 1, so zero-digit lanes leave the table
    untouched (bucket 0 is never read or written -- uniform work, no
    branches);
  * the per-lane tables are tree-reduced across lanes and fed to the
    unchanged _combine_windows (suffix scan + Horner).

Work model (el-ops/point/window, c the window width, nb = 2^(c-1)+1):
one-hot read+write ~ 2*(nb-1)*5*22 plus one ~10.5-mul unified add
~ 16k; c=5..6 minimizes the total at ~1M el-ops/point for 251 bits --
~3.4x less than the per-point windowed ladder, with zero sort/gather
bytes.  The reference's closest seed is the serial wNAF bucket idea
(/root/reference/src/edwards.rs:155-171, constants.rs:216-973).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import constants as C
from ..limb import FIELD
from .field_kernels import L, _padd_ext_block

PITCH = 24          # sublane pitch per coord (22 limbs padded to 8k)
DENSE_LANES = 512   # lanes per accumulator block (VMEM: nb*4*PITCH*4B/lane)
# nb = 2^(c-1)+1 <= 33 keeps the accumulator block under ~6.5 MB VMEM
MAX_DENSE_C = 6


def dense_pad(n: int) -> int:
    return -(-n // DENSE_LANES) * DENSE_LANES


def _accum_one(out_ref, base, P, d8, c_limbs, d_limbs, nb):
    """Fold each lane's point P into bucket |digit| of the table half at
    sublane offset `base` (entry k coord j at rows base + (k*4+j)*PITCH).
    Signed digit: negate (X, T) -- plain limb negation; the carry algebra
    is sign-exact (arithmetic >> plus & MASK), precedent
    _step_kernel_signed."""
    X, Y, Z, T = P
    d22 = jnp.concatenate([d8, d8, d8[: L - 16]], axis=0)
    a22 = jnp.where(d22 < 0, -d22, d22)
    s22 = d22 < 0
    Xe = jnp.where(s22, -X, X)
    Te = jnp.where(s22, -T, T)

    def ent(k):
        r0 = base + k * 4 * PITCH
        return tuple(out_ref[r0 + j * PITCH:r0 + j * PITCH + L]
                     for j in range(4))

    e = ent(1)
    for k in range(2, nb):
        m = a22 == k
        e = tuple(jnp.where(m, nk, ec) for nk, ec in zip(ent(k), e))
    R = _padd_ext_block(e, (Xe, Y, Z, Te), d_limbs, c_limbs)
    for k in range(1, nb):
        m = a22 == k
        for j in range(4):
            r = base + (k * 4 + j) * PITCH
            out_ref[r:r + L] = jnp.where(m, R[j], out_ref[r:r + L])


def _init_tables(out_ref, i, halves, nb, shape):
    zero = jnp.zeros(shape, jnp.int32)
    one = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) == 0).astype(
        jnp.int32)

    @pl.when(i == 0)
    def _init():
        for h in range(halves):
            for k in range(nb):
                for j, v in enumerate((zero, one, one, zero)):  # identity
                    r = (h * nb + k) * 4 * PITCH + j * PITCH
                    out_ref[r:r + PITCH] = v


def _bucket_kernel(pt_ref, dig_ref, out_ref, *, c_limbs, d_limbs, nb):
    """One grid step: fold DENSE_LANES points into the per-lane tables.

    pt_ref:  [128, B] int32 -- rows 0:22 X, 32:54 Y, 64:86 Z, 96:118 T
    dig_ref: [8, B] int32 -- signed digit in [-(nb-1), nb-1], replicated
             over 8 sublanes (mask source, like the ladder kernels)
    out_ref: [nb*4*PITCH, B] -- the resident bucket table."""
    i = pl.program_id(0)
    _init_tables(out_ref, i, 1, nb, (PITCH,) + pt_ref.shape[1:])
    P = (pt_ref[0:L], pt_ref[32:32 + L], pt_ref[64:64 + L],
         pt_ref[96:96 + L])
    _accum_one(out_ref, 0, P, dig_ref[0:8], c_limbs, d_limbs, nb)


def _bucket2_kernel(pt_ref, dig_ref, out_ref, *, c_limbs, d_limbs, nb):
    """TWO windows per pass (half the outer-scan iterations; same VMEM at
    half the lane width): dig_ref rows 0:8 = window A digits, 8:16 =
    window B; out_ref holds both tables ([2*nb*4*PITCH, B], window h's
    entry k coord j at rows (h*nb + k)*4*PITCH + j*PITCH)."""
    i = pl.program_id(0)
    _init_tables(out_ref, i, 2, nb, (PITCH,) + pt_ref.shape[1:])
    P = (pt_ref[0:L], pt_ref[32:32 + L], pt_ref[64:64 + L],
         pt_ref[96:96 + L])
    _accum_one(out_ref, 0, P, dig_ref[0:8], c_limbs, d_limbs, nb)
    _accum_one(out_ref, nb * 4 * PITCH, P, dig_ref[8:16], c_limbs,
               d_limbs, nb)


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def bucket_accum(pt_stack, dig8, nb: int, interpret: bool = False):
    """Accumulate per-lane bucket tables for one Pippenger window.

    pt_stack: [128, n_pad] stacked coords (prep_points); dig8: [8, n_pad]
    signed digits replicated over sublanes.  Returns the
    [nb*4*PITCH, DENSE_LANES] resident table (entry k coord j at rows
    (k*4+j)*PITCH, rows 22:PITCH zero)."""
    n_pad = pt_stack.shape[1]
    cl = tuple(int(v) for v in FIELD.fold_c_limbs)
    dl = tuple(int(v) for v in np.asarray(C.EDWARDS_D_LIMBS))
    return pl.pallas_call(
        functools.partial(_bucket_kernel, c_limbs=cl, d_limbs=dl, nb=nb),
        out_shape=jax.ShapeDtypeStruct((nb * 4 * PITCH, DENSE_LANES), jnp.int32),
        grid=(n_pad // DENSE_LANES,),
        in_specs=[
            pl.BlockSpec((128, DENSE_LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, DENSE_LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb * 4 * PITCH, DENSE_LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pt_stack, dig8)


PAIR_LANES = 256  # lane width of the paired (2-window) accumulator


def pair_pad(n: int) -> int:
    return -(-n // PAIR_LANES) * PAIR_LANES


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def bucket_accum2(pt_stack, dig16, nb: int, interpret: bool = False):
    """Paired-window bucket accumulation: dig16 [16, n_pad] carries two
    windows' signed digits (rows 0:8 / 8:16); returns the
    [2*nb*4*PITCH, PAIR_LANES] resident tables (window h's entry k coord
    j at rows (h*nb+k)*4*PITCH + j*PITCH)."""
    n_pad = pt_stack.shape[1]
    cl = tuple(int(v) for v in FIELD.fold_c_limbs)
    dl = tuple(int(v) for v in np.asarray(C.EDWARDS_D_LIMBS))
    return pl.pallas_call(
        functools.partial(_bucket2_kernel, c_limbs=cl, d_limbs=dl, nb=nb),
        out_shape=jax.ShapeDtypeStruct((2 * nb * 4 * PITCH, PAIR_LANES),
                                       jnp.int32),
        grid=(n_pad // PAIR_LANES,),
        in_specs=[
            pl.BlockSpec((128, PAIR_LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, PAIR_LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * nb * 4 * PITCH, PAIR_LANES),
                               lambda i: (0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pt_stack, dig16)


def prep_points_to(pt, n_pad):
    """4-tuple of [N, 22] coords -> [128, n_pad] stacked layout
    (identity-padded tail lanes never matter: their digits are 0)."""
    n = pt[0].shape[0]
    cols = []
    for c in pt:
        c2 = jnp.pad(c, [(0, n_pad - n), (0, 0)])
        cols.append(jnp.pad(c2.T, [(0, 32 - L), (0, 0)]))
    return jnp.concatenate(cols, axis=0)


@jax.jit
def prep_points(pt):
    """4-tuple of [N, 22] coords -> [128, dense_pad(N)] stacked layout."""
    return prep_points_to(pt, dense_pad(pt[0].shape[0]))
