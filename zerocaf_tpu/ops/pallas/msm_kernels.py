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
from .field_kernels import (L, _identity_blocks, _padd_ext_block,
                            _pdbl_block)

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
    """Fill the whole accumulator with identity points at grid step 0.

    One [4*PITCH, B] iota pattern (coord j's limb 0 = 1 iff j in {Y, Z};
    identity = (0, 1, 1, 0)), stored once per entry.  Two rejected
    forms: a full-table iota pattern OOMs scoped VMEM (Mosaic
    materializes each elementwise intermediate at table size, ~4x9.7 MB
    at K=6), and a trace-time constant column is rejected by pallas_call
    (kernels cannot capture array constants)."""
    ent = 4 * PITCH
    r = jax.lax.broadcasted_iota(jnp.int32, (ent,) + shape[1:], 0)
    pat = ((r == PITCH) | (r == 2 * PITCH)).astype(jnp.int32)

    @pl.when(i == 0)
    def _init():
        for e in range(halves * nb):
            out_ref[e * ent:(e + 1) * ent] = pat


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


def _combine_kernel(tbl_ref, out_ref, *, c_limbs, d_limbs, nb, nwin, c):
    """Fused window combine: bucket totals + Horner in ONE kernel.

    The XLA _combine_windows costs ~30 ms at c=6 (r5 measured,
    benchmarks/diag_fixed_r5.py): its Horner is 251 sequential doublings
    on a SINGLE point -- pure XLA op latency.  Here windows live on
    LANES (lane w = window nwin-1-w, pre-reversed by the wrapper), so:

      * bucket totals are the classic descending running sum
        (acc += S_b; tot += acc for b = nb-1..1 -- 2*(nb-1) block padds,
        lane-parallel over all windows at once);
      * Horner rolls the totals block one lane left per step, so lane 0
        accumulates sum_w 2^(cw) tot_w; other lanes compute don't-care
        wrap-around Horners.

    tbl_ref: [nb*4*PITCH, 128] -- entry e coord j at rows (e*4+j)*PITCH,
    lane w = window nwin-1-w.  out_ref: [128, 128], point layout (rows
    0:22 X, 32:54 Y, 64:86 Z, 96:118 T), result in lane 0."""
    lanes = tbl_ref.shape[1]
    ident = _identity_blocks((L,) + tbl_ref.shape[1:])
    acc = ident
    tot = ident

    def ent(e):
        r0 = e * 4 * PITCH
        return tuple(tbl_ref[r0 + j * PITCH:r0 + j * PITCH + L]
                     for j in range(4))

    for e in range(nb - 1, 0, -1):
        acc = _padd_ext_block(acc, ent(e), d_limbs, c_limbs)
        tot = _padd_ext_block(tot, acc, d_limbs, c_limbs)

    def step(s, carry):
        T, W = carry
        for i in range(c - 1):
            T = _pdbl_block(T, c_limbs, with_t=False)
        T = _pdbl_block(T, c_limbs, with_t=True)
        T = _padd_ext_block(T, W, d_limbs, c_limbs)
        W = tuple(pltpu.roll(w, lanes - 1, axis=1) for w in W)
        return T, W

    T, _ = jax.lax.fori_loop(0, nwin, step, (ident, tot))
    for j in range(4):
        out_ref[j * 32:j * 32 + L] = T[j]


@functools.partial(jax.jit, static_argnames=("nb", "nwin", "c", "interpret"))
def combine_tables(tables, nb: int, nwin: int, c: int,
                   interpret: bool = False):
    """Fused bucket-combine + Horner: tables (tuple of [nwin, nb, 22])
    -> one extended point (tuple of [22]).  TPU replacement for the XLA
    _combine_windows on the dense path."""
    cl = tuple(int(v) for v in FIELD.fold_c_limbs)
    dl = tuple(int(v) for v in np.asarray(C.EDWARDS_D_LIMBS))
    lanes = 128
    cols = []
    for t in tables:  # [nwin, nb, 22] -> [nb, 4x(22->PITCH), nwin->lanes]
        rev = t[::-1]
        x = jnp.moveaxis(rev, 0, -1)  # [nb, 22, nwin]
        x = jnp.pad(x, [(0, 0), (0, PITCH - 22), (0, lanes - nwin)])
        cols.append(x)
    stacked = jnp.stack(cols, axis=1)  # [nb, 4, PITCH, lanes]
    tbl = stacked.reshape(nb * 4 * PITCH, lanes)
    out = pl.pallas_call(
        functools.partial(_combine_kernel, c_limbs=cl, d_limbs=dl, nb=nb,
                          nwin=nwin, c=c),
        out_shape=jax.ShapeDtypeStruct((128, lanes), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tbl)
    return tuple(out[j * 32:j * 32 + L, 0] for j in range(4))


GROUP_LANES = 128  # lane width of the K-window grouped accumulator


def grp_pad(n: int) -> int:
    return -(-n // GROUP_LANES) * GROUP_LANES


def _fold_lanes(out_ref, nentries, rounds, lanes, c_limbs, d_limbs):
    """In-kernel tree-fold of each entry's lane axis: after `rounds`
    roll+padd rounds, lanes 0:lanes>>rounds of every entry hold the
    folded sums (upper lanes are don't-care partials).

    This replaces the out-of-kernel XLA lane reduce, whose [..., 22]
    limbs-minor layout pads 22 -> 128 lanes (~17% utilization) and pays
    a moveaxis relayout per scan iteration -- the dominant share of the
    r4 72 ms fixed term.  A lax.fori_loop over entries keeps the Mosaic
    trace at ONE entry's worth of padds (k*nb unrolled copies wedge the
    remote compiler; cf. the 42-kernel unroll trap, msm_dense_r4.md).
    Entry strides are 8-sublane-aligned (4*PITCH = 96)."""
    ent = 4 * PITCH

    def body(e, carry):
        r0 = e * ent
        blk = out_ref[pl.ds(r0, ent)]  # [96, B]
        P = tuple(blk[j * PITCH:j * PITCH + L] for j in range(4))
        for r in range(rounds):
            half = lanes >> (r + 1)
            # out[l] = in[(l + half) mod lanes] (pltpu.roll wants a
            # non-negative shift); lanes 0:half then hold a[l] + a[l+half]
            S = tuple(pltpu.roll(cc, lanes - half, axis=1) for cc in P)
            P = _padd_ext_block(P, S, d_limbs, c_limbs)
        for j in range(4):
            out_ref[pl.ds(r0 + j * PITCH, L)] = P[j]
        return carry

    jax.lax.fori_loop(0, nentries, body, 0)


def _bucketk_kernel(pt_ref, dig_ref, out_ref, *, c_limbs, d_limbs, nb, k,
                    fold):
    """K windows' tables per pass at GROUP_LANES lanes (r5 fixed-term fix:
    ceil(nwin/K) outer-scan iterations instead of nwin/2, and the 128-lane
    accumulator halves the out-of-kernel lane-reduce adds vs 256 lanes).

    dig_ref rows 8h:8h+8 hold window h's signed digits; out_ref is
    [k*nb*4*PITCH, B] with window h's entry j coord at rows
    (h*nb + entry)*4*PITCH + j*PITCH.  VMEM budget: k*nb*4*PITCH*4B per
    lane -- k<=6 at nb=33 stays under ~10 MB of the ~16 MB/core.
    fold > 0 tree-folds the lane axis in-kernel after the last point
    chunk (see _fold_lanes)."""
    i = pl.program_id(0)
    _init_tables(out_ref, i, k, nb, (PITCH,) + pt_ref.shape[1:])
    P = (pt_ref[0:L], pt_ref[32:32 + L], pt_ref[64:64 + L],
         pt_ref[96:96 + L])
    for h in range(k):
        _accum_one(out_ref, h * nb * 4 * PITCH, P, dig_ref[8 * h:8 * h + 8],
                   c_limbs, d_limbs, nb)
    if fold:
        @pl.when(i == pl.num_programs(0) - 1)
        def _epilogue():
            _fold_lanes(out_ref, k * nb, fold, pt_ref.shape[1], c_limbs,
                        d_limbs)


@functools.partial(jax.jit, static_argnames=("nb", "k", "fold", "interpret"))
def bucket_accum_k(pt_stack, digk8, nb: int, k: int, fold: int = 0,
                   interpret: bool = False):
    """K-window grouped bucket accumulation: digk8 [k*8, n_pad] carries k
    windows' signed digits (rows 8h:8h+8 = window h, sublane-replicated);
    returns the [k*nb*4*PITCH, GROUP_LANES] resident tables.  With
    fold=f, only lanes 0:GROUP_LANES>>f of each entry are meaningful."""
    n_pad = pt_stack.shape[1]
    cl = tuple(int(v) for v in FIELD.fold_c_limbs)
    dl = tuple(int(v) for v in np.asarray(C.EDWARDS_D_LIMBS))
    return pl.pallas_call(
        functools.partial(_bucketk_kernel, c_limbs=cl, d_limbs=dl, nb=nb,
                          k=k, fold=fold),
        out_shape=jax.ShapeDtypeStruct((k * nb * 4 * PITCH, GROUP_LANES),
                                       jnp.int32),
        grid=(n_pad // GROUP_LANES,),
        in_specs=[
            pl.BlockSpec((128, GROUP_LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * k, GROUP_LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * nb * 4 * PITCH, GROUP_LANES),
                               lambda i: (0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pt_stack, digk8)


def _bucketall_kernel(pt_ref, dig_ref, out_ref, *, c_limbs, d_limbs, nb, k,
                      fold):
    """2D-grid form of _bucketk_kernel: grid = (ngrp, nsteps).  Window
    group g's accumulator block is revisited across all point chunks i
    (out index map (g, i) -> (g, 0, 0): written back to HBM only when g
    advances), so the WHOLE tables phase is ONE pallas_call -- the
    lax.scan-over-groups form pays a ~4 ms per-call overhead per group
    (r5 measured, benchmarks/diag_fixed_r5.py), the dominant fixed term
    after the fused combine."""
    i = pl.program_id(1)
    _init_tables(out_ref, i, k, nb, (PITCH,) + pt_ref.shape[1:])
    P = (pt_ref[0:L], pt_ref[32:32 + L], pt_ref[64:64 + L],
         pt_ref[96:96 + L])
    for h in range(k):
        # one digit row per window (an [8, B]-replicated layout would
        # cost 8x the HBM -- ~6 GB at 2^22); sublane-broadcast here
        d8 = jnp.broadcast_to(dig_ref[h:h + 1], (8,) + pt_ref.shape[1:])
        _accum_one(out_ref, h * nb * 4 * PITCH, P, d8, c_limbs, d_limbs, nb)
    if fold:
        @pl.when(i == pl.num_programs(1) - 1)
        def _epilogue():
            _fold_lanes(out_ref, k * nb, fold, pt_ref.shape[1], c_limbs,
                        d_limbs)


@functools.partial(jax.jit, static_argnames=("nb", "k", "fold", "interpret"))
def bucket_accum_all(pt_stack, dig_g, nb: int, k: int, fold: int = 0,
                     interpret: bool = False):
    """All window groups' bucket tables in one kernel.

    dig_g: [ngrp, k, n_pad] signed digits (group g window h at row h; the
    kernel sublane-broadcasts each row).  Returns [ngrp, k*nb*4*PITCH,
    GROUP_LANES] resident tables (same per-group layout as
    bucket_accum_k)."""
    ngrp, _, n_pad = dig_g.shape
    cl = tuple(int(v) for v in FIELD.fold_c_limbs)
    dl = tuple(int(v) for v in np.asarray(C.EDWARDS_D_LIMBS))
    R = k * nb * 4 * PITCH
    return pl.pallas_call(
        functools.partial(_bucketall_kernel, c_limbs=cl, d_limbs=dl, nb=nb,
                          k=k, fold=fold),
        out_shape=jax.ShapeDtypeStruct((ngrp, R, GROUP_LANES), jnp.int32),
        grid=(ngrp, n_pad // GROUP_LANES),
        in_specs=[
            pl.BlockSpec((128, GROUP_LANES), lambda g, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k, GROUP_LANES), lambda g, i: (g, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, R, GROUP_LANES), lambda g, i: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pt_stack, dig_g)


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
