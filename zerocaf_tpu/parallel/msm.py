"""Multi-scalar multiplication: batched Pippenger, sharded over a device mesh.

The reference has no MSM; its closest seeds are per-point double_and_add
(edwards.rs:102-120) and the wNAF + table machinery (edwards.rs:155-171,
constants.rs:216-973).  This module is the flagship multi-chip workload
(BASELINE.json configs 4-5): sum(k_i * P_i) over up to 2^20 points.

TPU shape of the algorithm (SURVEY.md section 7 "Pippenger bucket scatter"):

  * scalars decompose into `nwin` unsigned windows of `c` bits (device-side
    bit slicing, no host recoding);
  * per window, points are *sorted by digit* (TPUs have no efficient
    scatter; sort + segmented scan replaces atomics/buckets);
  * a segmented inclusive scan with the EC unified addition as the monoid
    (jax.lax.associative_scan over the point pytree) produces each digit
    group's sum at its segment end -- log2(N) batched-add rounds;
  * segment ends scatter (duplicate-free) into the [nwin, 2^c] bucket table;
  * the classic descending running-sum turns buckets into window sums,
    batched across all windows at once (2*(2^c-1) steps of [nwin]-lane adds);
  * Horner over windows merges into the final point.

Sharding: each device runs local Pippenger on its shard of points for all
windows, producing ONE partial point; partials are all_gathered (4x22 int32
per device -- bytes, not megabytes, over ICI) and tree-reduced locally.
EC arithmetic is exact integer math, so any reduction order is bit-exact.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models import edwards as _ed
from ..models.edwards import EdwardsPoint
from ..scalar import Scalar
from .comm import Communicator

# Default window width: 250 bits / 8 -> 32 windows, 256 buckets.
DEFAULT_C = 8

# Route wide batched adds through the fused Pallas kernel on TPU (one
# VMEM-resident kernel vs ~10 XLA fusions per add); narrow adds keep the
# XLA path (lane padding to the Pallas block would dominate).
_PALLAS_MIN_LANES = 4096


def _padd(p, q):
    """Batched unified add with automatic Pallas routing."""
    n = 1
    for s in p[0].shape[:-1]:
        n *= int(s)
    if n >= _PALLAS_MIN_LANES and jax.default_backend() == "tpu":
        from ..config import DEFAULT as _cfg
        if _cfg.use_pallas:
            from ..ops.pallas import field_kernels as _fk
            return _fk.padd_tiled(p, q)
    return _ed._add(p, q)


def auto_c(n: int) -> int:
    """Window width minimizing measured wall time for the sort+scan
    formulation: per-point work scales with nwin = ceil(250/c), so larger N
    (which amortizes the nwin * 2^(c-1) bucket-combine) wants bigger c."""
    if n <= 1 << 12:
        return 8
    if n <= 1 << 14:
        return 10
    if n <= 1 << 16:
        return 12
    return 14


def auto_c_dense(n: int) -> int:
    """Window width for the dense VMEM bucket kernel.  Unlike the scan
    path (whose per-window sort/scan overhead pushes c up), dense cost is
    ~(2*(nb-1)*select + 1 padd) * ceil(251/c) per point: c=5/6 minimize
    it on paper, and c=6 measured faster than c=5 at every size swept
    (2^14..2^18, v5e -- BASELINE.md r4: fewer kernel passes win over the
    2x-smaller select loop).  c=7's accumulator would leave the safe VMEM
    budget (MAX_DENSE_C)."""
    return 6


@partial(jax.jit, static_argnames=("c",))
def signed_digits(windows: jnp.ndarray, c: int):
    """Recode unsigned c-bit windows into signed digits in
    [-(2^(c-1)-1), 2^(c-1)] (the batched mods_2_pow_k, scalar.rs:433-442).

    Returns (mag, sign): mag in [0, 2^(c-1)], sign True where the digit is
    negative.  Halves the Pippenger bucket count: bucket tables index |d|
    and the point is conditionally negated instead.  The carry out of the
    top window is always zero for canonical scalars (value < 2^250 <=
    2^(c * nwin) / 2).

    The carry recurrence flip_w = g_w | (p_w & flip_{w-1}) -- with
    g = (digit > half) "generates" and p = (digit == half) "propagates",
    exactly carry-lookahead addition -- runs as a log-depth
    associative_scan over the window axis.  The r4 sequential lax.scan
    form cost ~30 ms of pure step latency per MSM on v5e (N-independent;
    the single largest fixed-term component after the r5 kernel fixes)."""
    half = 1 << (c - 1)
    g = windows > half
    p = windows == half

    def comb(a, b):
        ga, pa = a
        gb, pb = b
        return gb | (pb & ga), pa & pb

    flips, _ = jax.lax.associative_scan((lambda a, b: comb(a, b)), (g, p),
                                        axis=-1)
    carry = jnp.concatenate(
        [jnp.zeros_like(flips[..., :1]), flips[..., :-1]],
        axis=-1).astype(windows.dtype)
    d = windows + carry
    ds = jnp.where(d > half, d - 2 * half, d)
    return jnp.abs(ds), ds < 0


def _shift_down(arr, dist, fill):
    """arr[i] <- arr[i - dist] with `fill` rows shifted in; dist is traced."""
    n = arr.shape[0]
    pad = jnp.broadcast_to(fill, (n,) + arr.shape[1:]).astype(arr.dtype)
    padded = jnp.concatenate([pad, arr], axis=0)
    return jax.lax.dynamic_slice_in_dim(padded, n - dist, n, axis=0)


def _segmented_scan_points(pts, starts):
    """Inclusive segmented sum-scan with the EC addition monoid.

    Hillis-Steele over lax.fori_loop: the compiled graph holds ONE combine
    (an associative_scan would inline ~2N EC adds and blow up XLA compile
    time); runtime does ceil(log2(N)) batched rounds.

    pts: point pytree with [N, 22] coords; starts: [N] int32 segment-start
    flags.  Returns pts' where each segment's last element holds its sum."""
    n = starts.shape[0]
    nsteps = max(1, (n - 1).bit_length())
    ident = _ed._identity_like(pts)

    def body(d, carry):
        p, f = carry
        dist = jnp.int32(1) << d
        p_l = tuple(_shift_down(c, dist, ic[0]) for c, ic in zip(p, ident))
        f_l = _shift_down(f, dist, jnp.zeros((), jnp.int32))
        merged = _padd(p_l, p)
        keep = f.astype(bool)  # element starts a segment: do not accumulate
        p = _ed._select(keep, p, merged)
        return p, f | f_l

    pts, _ = jax.lax.fori_loop(0, nsteps, body, (pts, starts))
    return pts


def _seg_exclusive_scan(pts, starts):
    """Work-efficient (Blelloch) segmented EXCLUSIVE sum-scan with the EC
    addition monoid (Sengupta et al., "Scan primitives for GPU computing").

    Total work ~2N adds with geometrically shrinking round widths -- vs the
    Hillis-Steele inclusive scan's log2(N) full-width rounds (~18N adds at
    2^18, which measured as 97% of MSM wall time on v5e).

    pts: point pytree, coords [N, 22]; starts: [N] int32 segment-start flags
    (starts[0] must be 1).  Returns the exclusive scan: out[i] = sum of the
    elements of i's segment strictly before i (identity at segment starts).
    Pads internally to a power of two."""
    n0 = starts.shape[0]
    n = 1 << max(1, (n0 - 1).bit_length())
    ident = _ed._identity_like(tuple(c[:1] for c in pts))
    if n != n0:
        pts = tuple(
            jnp.concatenate([c, jnp.broadcast_to(ic[0], (n - n0, 22))], 0)
            for c, ic in zip(pts, ident))
        starts = jnp.concatenate(
            [starts, jnp.ones((n - n0,), starts.dtype)])
    logn = n.bit_length() - 1
    f_orig = starts
    f2 = starts
    v = pts

    def col(c, d, j):
        """Column j of the [m, 2^(d+1)] block view of a [n, ...] array."""
        return c.reshape((n >> (d + 1), 1 << (d + 1)) + c.shape[1:])[:, j]

    def setcol(c, d, j, val):
        m = n >> (d + 1)
        b = c.reshape((m, 1 << (d + 1)) + c.shape[1:])
        return b.at[:, j].set(val).reshape((n,) + c.shape[1:])

    # up-sweep: v[r] += v[l] where r's running flag is clear
    for d in range(logn):
        l, r = (1 << d) - 1, (1 << (d + 1)) - 1
        vL = tuple(col(c, d, l) for c in v)
        vR = tuple(col(c, d, r) for c in v)
        f2L, f2R = col(f2, d, l), col(f2, d, r)
        merged = _padd(vR, vL)
        vR = _ed._select(f2R == 0, merged, vR)
        v = tuple(setcol(c, d, r, nc) for c, nc in zip(v, vR))
        f2 = setcol(f2, d, r, f2R | f2L)

    # clear the root, then down-sweep
    v = tuple(c.at[n - 1].set(ic[0]) for c, ic in zip(v, ident))
    for d in reversed(range(logn)):
        l, r = (1 << d) - 1, (1 << (d + 1)) - 1
        vL = tuple(col(c, d, l) for c in v)
        vR = tuple(col(c, d, r) for c in v)
        f_next = col(f_orig, d, l + 1)   # right half's first element
        f2L = col(f2, d, l)
        summed = _padd(vL, vR)
        new_r = _ed._select(f_next == 1, _ed._identity_like(vL),
                            _ed._select(f2L == 1, vL, summed))
        v = tuple(setcol(c, d, l, nc) for c, nc in zip(v, vR))   # v[l] = v[r]
        v = tuple(setcol(c, d, r, nc) for c, nc in zip(v, new_r))
        f2 = setcol(f2, d, l, jnp.zeros_like(f2L))

    if n != n0:
        v = tuple(c[:n0] for c in v)
    return v


def _tree_reduce(points):
    """Reduce [M, ..., 22] stacked points with balanced batched adds."""
    m = points[0].shape[0]
    while m > 1:
        half = m // 2
        even = tuple(c[: 2 * half : 2] for c in points)
        odd = tuple(c[1 : 2 * half : 2] for c in points)
        merged = _padd(even, odd)
        if m % 2:
            merged = tuple(jnp.concatenate([mc, c[-1:]], axis=0)
                           for mc, c in zip(merged, points))
        points = merged
        m = points[0].shape[0]
    return tuple(c[0] for c in points)


def _msm_local_tables(pt, windows, c: int, nwin: int, signed: bool):
    """Scan-path bucket tables for one shard: tuple of [nwin, nb, 22]."""
    if signed:
        mag, sgn = signed_digits(windows, c)
        nbuckets = (1 << (c - 1)) + 1

        def one_window(w):
            return _bucket_table(pt, mag[:, w], nbuckets, sign=sgn[:, w])
    else:
        nbuckets = 1 << c

        def one_window(w):
            return _bucket_table(pt, windows[:, w], nbuckets)

    # [nwin, nbuckets, 22] bucket tables, all windows batched
    return jax.vmap(one_window, out_axes=0)(jnp.arange(nwin))


@partial(jax.jit, static_argnames=("c", "nwin", "signed"))
def _msm_local(pt, windows, c: int = DEFAULT_C, nwin: int = 32,
               signed: bool = True):
    """Local Pippenger over one shard.

    pt: point pytree, coords [N, 22]; windows: [N, nwin] int32 unsigned
    digits (recoded to signed form in-graph when signed=True, which halves
    the bucket count).  Returns a single point pytree ([22] coords)."""
    nbuckets = (1 << (c - 1)) + 1 if signed else 1 << c
    tables = _msm_local_tables(pt, windows, c, nwin, signed)
    # log-depth bucket combine + Horner (see _combine_windows)
    return _combine_windows(tables, c, nbuckets)


def _bucket_table(pt, digits, nbuckets: int, sign=None):
    """One Pippenger window: sort by digit, work-efficient segmented
    exclusive scan, then scatter BOTH the exclusive prefix and the original
    point at each segment end and add the two [nbuckets]-wide tables --
    bucket[d] = exclusive[end_d] + point[end_d] = that segment's sum.
    (Adding post-scatter avoids an N-wide inclusive-fixup add.)

    sign (optional [N] bool): conditionally negate each point (signed-digit
    Pippenger; digits are then magnitudes in [0, 2^(c-1)])."""
    order = jnp.argsort(digits)
    d_sorted = digits[order]
    p_sorted = tuple(coord[order] for coord in pt)
    if sign is not None:
        s = sign[order]
        neg = _ed._neg(p_sorted)
        p_sorted = _ed._select(s, neg, p_sorted)
    starts = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (d_sorted[1:] != d_sorted[:-1]).astype(jnp.int32)])
    excl = _seg_exclusive_scan(p_sorted, starts)
    ends = jnp.concatenate([(d_sorted[1:] != d_sorted[:-1]), jnp.ones((1,), bool)])
    # scatter: indices are duplicate-free by construction (one end per digit
    # value); unwritten buckets stay identity; parked rows (idx=nbuckets) drop.
    idx = jnp.where(ends, d_sorted, nbuckets)

    def scatter(coords):
        return tuple(
            jnp.zeros((nbuckets + 1, 22), jnp.int32)
            .at[:, 0].set(ident_limb0)  # identity coords: (0, 1, 1, 0)
            .at[idx].set(coord)[:nbuckets]
            for coord, ident_limb0 in zip(coords, (0, 1, 1, 0)))

    return _padd(scatter(excl), scatter(p_sorted))


def _lane_reduce(v, pallas_rounds: int = 1):
    """Tree-reduce the lane axis (axis 1) of [E, W, 22] coord tuples down
    to [E, 22].

    At most `pallas_rounds` leading rounds may route through padd_tiled;
    every later round forces the XLA add: two or more chained padd_tiled
    calls through moveaxis/slice glue inside one jit MISCOMPILE on v5e
    (benchmarks/results/msm_dense_r4.md; the r4 paired path at c=6 ran
    rounds 1-2 both >= _PALLAS_MIN_LANES and relied on the bench-time
    bit-exactness gate -- ADVICE r4)."""
    w = v[0].shape[1]
    r = 0
    while w > 1:
        half = w // 2
        a = tuple(cv[:, :half] for cv in v)
        b = tuple(cv[:, half:w] for cv in v)
        v = (_padd if r < pallas_rounds else _ed._add)(a, b)
        r += 1
        w = half
    return tuple(cv[:, 0] for cv in v)


@partial(jax.jit, static_argnames=("nb", "interpret"))
def _window_buckets_dense(pt_stack, dsigned, nb: int, interpret: bool = False):
    """One Pippenger window via the dense VMEM bucket kernel: no sort, no
    gather -- the kernel streams points once and scatters by one-hot into
    per-lane tables (ops/pallas/msm_kernels.py).  The DENSE_LANES per-lane
    tables are then tree-reduced across the lane axis (exact integer EC
    math: any reduction order is bit-exact).  Returns [nb, 22] coords."""
    from ..ops.pallas import msm_kernels as _mk

    dig8 = jnp.broadcast_to(dsigned[None, :], (8, dsigned.shape[0]))
    tbl = _mk.bucket_accum(pt_stack, dig8, nb, interpret=interpret)
    arr = tbl.reshape(nb, 4, _mk.PITCH, _mk.DENSE_LANES)[:, :, :22]
    v = tuple(jnp.moveaxis(arr[:, j], -1, 1) for j in range(4))  # [nb, B, 22]
    return _lane_reduce(v)


def _msm_dense_tables(pt, windows, c: int, nwin: int,
                      interpret: bool = False):
    """Dense-kernel bucket tables: lax.scan over the window axis with a
    single bucket-kernel + lane-reduction instance in the body (one
    Mosaic kernel, one dispatch).  Returns tuple of [nwin, nb, 22].

    (Dispatching each window as its own jit call measured a ~5 ms fixed
    cost per window on v5e -- dispatch and reduce tails -- which dominated
    below 2^18; unrolling all nwin kernels into one graph instead wedged
    the remote Mosaic compiler.  The scan form keeps the graph as small as
    one window while paying the dispatch cost once.  Two rejected
    alternatives for the lane reduce, both measured in benchmarks/
    results/msm_dense_r4.md: hoisting it out of the scan and batching
    over all windows through padd_tiled MISCOMPILES when the rounds fuse
    in one jit, and the same hoist through the XLA add is bit-exact but
    3x slower than reducing in-scan.)"""
    from ..ops.pallas import msm_kernels as _mk

    nb = (1 << (c - 1)) + 1
    mag, sgn = signed_digits(windows, c)
    dsig = jnp.where(sgn, -mag, mag)  # [N, nwin]
    n = dsig.shape[0]
    n_pad = _mk.dense_pad(n)
    dsig = jnp.pad(dsig, [(0, n_pad - n), (0, 0)])
    pt_stack = _mk.prep_points(pt)
    dsig_w = jnp.moveaxis(dsig, -1, 0)  # [nwin, n_pad]

    def body(_, dw):
        return None, _window_buckets_dense(pt_stack, dw, nb,
                                           interpret=interpret)

    _, tables = jax.lax.scan(body, None, dsig_w)
    return tables


def _msm_dense_tables_paired(pt, windows, c: int, nwin: int,
                             interpret: bool = False):
    """Paired-window variant of _msm_dense_tables: the scan walks WINDOW
    PAIRS with the 2-table kernel (ops/pallas/msm_kernels.bucket_accum2),
    halving the outer-scan iterations and their per-iteration reduce
    tails (the measured ~79 ms fixed-term share, BASELINE.md r4).  Odd
    nwin pads with a zero-digit window whose table stays all-identity."""
    from ..ops.pallas import msm_kernels as _mk

    nb = (1 << (c - 1)) + 1
    mag, sgn = signed_digits(windows, c)
    dsig = jnp.where(sgn, -mag, mag)  # [N, nwin]
    n = dsig.shape[0]
    n_pad = _mk.pair_pad(n)
    dsig = jnp.pad(dsig, [(0, n_pad - n), (0, 0)])
    pt_stack = _mk.prep_points_to(pt, n_pad)
    npairs = (nwin + 1) // 2
    dsig_w = jnp.moveaxis(dsig, -1, 0)  # [nwin, n_pad]
    if nwin % 2:
        dsig_w = jnp.concatenate(
            [dsig_w, jnp.zeros((1, n_pad), dsig_w.dtype)], axis=0)
    dsig_p = dsig_w.reshape(npairs, 2, n_pad)

    def body(_, dpair):
        d16 = jnp.concatenate(
            [jnp.broadcast_to(dpair[0][None], (8, n_pad)),
             jnp.broadcast_to(dpair[1][None], (8, n_pad))], axis=0)
        tbl = _mk.bucket_accum2(pt_stack, d16, nb, interpret=interpret)
        arr = tbl.reshape(2 * nb, 4, _mk.PITCH, _mk.PAIR_LANES)[:, :, :22]
        v = tuple(jnp.moveaxis(arr[:, j], -1, 1) for j in range(4))
        red = _lane_reduce(v)
        return None, tuple(cv.reshape(2, nb, 22) for cv in red)

    _, tabs = jax.lax.scan(body, None, dsig_p)  # [npairs, 2, nb, 22]
    return tuple(t.reshape(npairs * 2, nb, 22)[:nwin] for t in tabs)


# Production window-group size for the dense kernel: K windows' tables per
# kernel pass at 128 lanes.  K=4 is the VMEM ceiling for the single-call
# 2D-grid form (Mosaic double-buffers the revisited output block across
# group transitions: 2 x K*nb*4*PITCH*4B*128 must stay under ~16 MB;
# K=6 fits the scan form's single-buffered block but OOMs here).  K only
# sets the group count -- per-point work is K-independent -- so the
# smaller K costs just extra point re-streams (~0.5 ms at 2^16).
DENSE_K = 4


# In-kernel lane-fold rounds for the grouped kernel (0 = none: the
# out-of-kernel XLA reduce at pallas_rounds=1 measured FASTER than the
# roll+padd epilogue -- 9 vs 16 ms at 2^16/k=6, r5
# benchmarks/diag_fixed_r5.py -- because the epilogue's per-entry
# fori_loop serializes full-width padds while the XLA rounds are wide
# and fuse; the fold path remains for sweeps via fold=1..7).
DENSE_FOLD = 0


def _msm_dense_tables_k(pt, windows, c: int, nwin: int, k: int = DENSE_K,
                        interpret: bool = False, pallas_rounds: int = 1,
                        fold: int = DENSE_FOLD):
    """K-window grouped dense tables (the r5 fixed-term fix): the scan
    walks ceil(nwin/k) window GROUPS with the k-table 128-lane kernel
    (ops/pallas/msm_kernels.bucket_accum_k).  vs the r4 paired form this
    cuts the outer-scan iterations (and their per-iteration dispatch/
    reduce tails) by k/2, and the in-kernel lane-fold epilogue (fold
    rounds; default all 7) replaces the out-of-kernel XLA lane reduce.
    Missing windows pad with zero digits -> all-identity tables, dropped
    on return."""
    from ..ops.pallas import msm_kernels as _mk

    nb = (1 << (c - 1)) + 1
    mag, sgn = signed_digits(windows, c)
    dsig = jnp.where(sgn, -mag, mag)  # [N, nwin]
    n = dsig.shape[0]
    n_pad = _mk.grp_pad(n)
    dsig = jnp.pad(dsig, [(0, n_pad - n), (0, 0)])
    pt_stack = _mk.prep_points_to(pt, n_pad)
    ngrp = -(-nwin // k)
    dsig_w = jnp.moveaxis(dsig, -1, 0)  # [nwin, n_pad]
    pad_w = ngrp * k - nwin
    if pad_w:
        dsig_w = jnp.concatenate(
            [dsig_w, jnp.zeros((pad_w, n_pad), dsig_w.dtype)], axis=0)
    dsig_g = dsig_w.reshape(ngrp, k, n_pad)
    width = _mk.GROUP_LANES >> fold

    def body(_, dgrp):
        dk8 = jnp.repeat(dgrp, 8, axis=0)  # [k*8, n_pad], rows 8h:8h+8 = win h
        tbl = _mk.bucket_accum_k(pt_stack, dk8, nb, k, fold=fold,
                                 interpret=interpret)
        arr = tbl.reshape(k * nb, 4, _mk.PITCH, _mk.GROUP_LANES)[:, :, :22]
        arr = arr[..., :width]  # lanes beyond the fold are don't-care
        v = tuple(jnp.moveaxis(arr[:, j], -1, 1) for j in range(4))
        red = (_lane_reduce(v, pallas_rounds) if width > 1
               else tuple(cv[:, 0] for cv in v))
        return None, tuple(cv.reshape(k, nb, 22) for cv in red)

    _, tabs = jax.lax.scan(body, None, dsig_g)  # [ngrp, k, nb, 22]
    return tuple(t.reshape(ngrp * k, nb, 22)[:nwin] for t in tabs)


def _msm_dense_tables_all(pt, windows, c: int, nwin: int, k: int = DENSE_K,
                          interpret: bool = False, pallas_rounds: int = 1,
                          fold: int = 0):
    """All-groups dense tables: ONE pallas_call with grid (ngrp, nsteps)
    (msm_kernels.bucket_accum_all) instead of a lax.scan of per-group
    kernels -- kills the measured ~4 ms per-pallas_call overhead per
    group (r5, benchmarks/diag_fixed_r5.py).  The lane reduce runs once
    over ALL windows (wider rounds, same math)."""
    from ..ops.pallas import msm_kernels as _mk

    nb = (1 << (c - 1)) + 1
    mag, sgn = signed_digits(windows, c)
    dsig = jnp.where(sgn, -mag, mag)  # [N, nwin]
    n = dsig.shape[0]
    n_pad = _mk.grp_pad(n)
    dsig = jnp.pad(dsig, [(0, n_pad - n), (0, 0)])
    pt_stack = _mk.prep_points_to(pt, n_pad)
    ngrp = -(-nwin // k)
    dsig_w = jnp.moveaxis(dsig, -1, 0)  # [nwin, n_pad]
    pad_w = ngrp * k - nwin
    if pad_w:
        dsig_w = jnp.concatenate(
            [dsig_w, jnp.zeros((pad_w, n_pad), dsig_w.dtype)], axis=0)
    dig_g = dsig_w.reshape(ngrp, k, n_pad)
    tbl = _mk.bucket_accum_all(pt_stack, dig_g, nb, k, fold=fold,
                               interpret=interpret)
    width = _mk.GROUP_LANES >> fold
    arr = tbl.reshape(ngrp * k * nb, 4, _mk.PITCH, _mk.GROUP_LANES)[:, :, :22]
    arr = arr[..., :width]
    v = tuple(jnp.moveaxis(arr[:, j], -1, 1) for j in range(4))
    red = (_lane_reduce(v, pallas_rounds) if width > 1
           else tuple(cv[:, 0] for cv in v))
    return tuple(cv.reshape(ngrp * k, nb, 22)[:nwin] for cv in red)


@partial(jax.jit, static_argnames=("c", "nwin", "interpret", "k",
                                   "pallas_rounds", "fold", "fused_combine",
                                   "single_call"))
def _msm_dense(pt, windows, c: int, nwin: int, interpret: bool = False,
               k: int = DENSE_K, pallas_rounds: int = 1,
               fold: int = DENSE_FOLD, fused_combine: bool = True,
               single_call: bool = True):
    """Dense-kernel MSM body in ONE jitted graph: bucket tables + window
    combine.  k sets the window-group size: k>=3 takes the grouped
    128-lane kernel (production default DENSE_K; the r5 fixed-term fix),
    k=2 the r4 paired 256-lane kernel, k=1 the single-window 512-lane
    kernel.  single_call=True (production) runs ALL window groups in one
    2D-grid pallas_call (_msm_dense_tables_all); False keeps the
    lax.scan-of-kernels form.  fused_combine=True (default) runs the
    bucket totals + Horner as ONE Pallas kernel with windows on lanes
    (msm_kernels.combine_tables) instead of the latency-bound XLA chain
    (~30 ms at c=6, r5 benchmarks/diag_fixed_r5.py)."""
    nb = (1 << (c - 1)) + 1
    if k >= 3 and single_call:
        tables = _msm_dense_tables_all(pt, windows, c, nwin, k=k,
                                       interpret=interpret,
                                       pallas_rounds=pallas_rounds,
                                       fold=fold)
    elif k >= 3:
        tables = _msm_dense_tables_k(pt, windows, c, nwin, k=k,
                                     interpret=interpret,
                                     pallas_rounds=pallas_rounds,
                                     fold=fold)
    elif k == 2:
        tables = _msm_dense_tables_paired(pt, windows, c, nwin,
                                          interpret=interpret)
    else:
        tables = _msm_dense_tables(pt, windows, c, nwin, interpret=interpret)
    if fused_combine:
        from ..ops.pallas import msm_kernels as _mk
        return _mk.combine_tables(tables, nb, nwin, c, interpret=interpret)
    return _combine_windows(tables, c, nb)


@partial(jax.jit, static_argnames=("nbuckets",))
def _window_buckets(pt, digits, nbuckets: int):
    """One Pippenger window as a small standalone graph: compiled once and
    reused for every window (the fused _msm_local graph is too large for this
    rig's remote TPU compiler; see CLAUDE.md)."""
    return _bucket_table(pt, digits, nbuckets)


@partial(jax.jit, static_argnames=("nbuckets",))
def _window_buckets_signed(pt, mag, sign, nbuckets: int):
    """Signed-digit variant of _window_buckets."""
    return _bucket_table(pt, mag, nbuckets, sign=sign)


def _ident_fill(like, rows):
    """[nwin, rows, 22] identity-point coords matching `like`'s component
    order (X, Y, Z, T) -- produced positionally by the caller."""
    nwin = like[0].shape[0]
    out = []
    for i, l0 in enumerate((0, 1, 1, 0)):
        z = jnp.zeros((nwin, rows, 22), jnp.int32)
        if l0:
            z = z.at[..., 0].set(1)
        out.append(z)
    return tuple(out)


def _bucket_totals(tables, nbuckets: int):
    """Per-window bucket totals: tot_w = sum_b b * S_b, log-depth.

    The classic descending running sum (W = sum_b b*S_b via acc/tot) is a
    2*(nbuckets-1)-step SEQUENTIAL scan -- latency-bound on TPU and
    dominant for wide windows (measured: c=14 slower than c=8 at 2^16).
    Rewritten log-depth: W = sum_{b>=1} A_b with A = suffix-inclusive-scan
    of S over the bucket axis (Hillis-Steele, log2 rounds of full-width
    batched adds) followed by a pairwise tree reduction.

    tables: tuple of [nwin, nbuckets, 22] arrays -> tuple of [nwin, 22]."""
    m = nbuckets - 1
    S = tuple(t[:, 1:] for t in tables)  # buckets 1..nb-1

    # suffix inclusive scan: S[b] <- sum_{j >= b} S[j]
    d = 1
    while d < m:
        fill = _ident_fill(S, min(d, m))
        shifted = tuple(
            jnp.concatenate([t[:, d:], f[:, :min(d, m)]], axis=1)
            for t, f in zip(S, fill))
        S = _padd(S, shifted)
        d <<= 1

    # tot_w = sum_b A_b: pairwise tree reduction over the bucket axis
    while m > 1:
        half = m // 2
        even = tuple(t[:, : 2 * half : 2] for t in S)
        odd = tuple(t[:, 1 : 2 * half : 2] for t in S)
        merged = _padd(even, odd)
        if m % 2:
            merged = tuple(jnp.concatenate([mc, t[:, -1:]], axis=1)
                           for mc, t in zip(merged, S))
        S = merged
        m = S[0].shape[1]
    return tuple(t[:, 0] for t in S)  # [nwin, 22]


def _horner(tot, c: int, stride: int = 1):
    """T = sum_w (2^(c*stride))^w * tot_w over the leading window axis
    (MSB-first Horner: c*stride doublings per step)."""
    nwin = tot[0].shape[0]

    def horner_step(T, w_rev):
        for i in range(c * stride):
            T = _ed._double(T, with_t=(i == c * stride - 1))
        Ww = tuple(t[w_rev] for t in tot)
        return _ed._add(T, Ww), None

    ident1 = _ed._identity_like(tuple(t[0] for t in tot))
    T, _ = jax.lax.scan(horner_step, ident1, jnp.arange(nwin - 1, -1, -1))
    return T


@partial(jax.jit, static_argnames=("c", "nbuckets"))
def _combine_windows(tables, c: int, nbuckets: int):
    """Bucket combine + Horner merge, batched over windows.

    tables: tuple of [nwin, nbuckets, 22] arrays."""
    return _horner(_bucket_totals(tables, nbuckets), c)


def _use_dense(n: int, c, fused: bool, signed: bool,
               dense: bool | None) -> bool:
    """Route to the dense VMEM bucket kernel?  TPU + Pallas + signed only;
    explicit c wider than MAX_DENSE_C keeps the scan path (the dense
    accumulator block is VMEM-sized for nb <= 2^(MAX_DENSE_C-1)+1).

    Explicit dense=True is VALIDATED, not trusted (ADVICE r4): off-TPU it
    would dispatch a non-interpret pallas_call and c > MAX_DENSE_C would
    build an accumulator block past the VMEM budget -- both raise."""
    from ..ops.pallas.msm_kernels import MAX_DENSE_C

    if dense is not None:
        if dense:
            if jax.default_backend() != "tpu":
                raise ValueError(
                    "msm(dense=True) requires a TPU backend (the dense "
                    "bucket kernel is a Mosaic kernel); use dense=False "
                    "or the interpret-mode _msm_dense directly")
            if c is not None and c > MAX_DENSE_C:
                raise ValueError(
                    f"msm(dense=True) supports c <= {MAX_DENSE_C} "
                    f"(VMEM-sized accumulator); got c={c}")
            if not signed:
                raise ValueError(
                    "msm(dense=True) always uses signed digits; "
                    "signed=False is not supported on the dense path")
        return dense
    if fused or not signed or n < 1 << 12:
        return False
    if jax.default_backend() != "tpu":
        return False
    from ..config import DEFAULT as _cfg
    if not _cfg.use_pallas:
        return False
    return c is None or c <= MAX_DENSE_C


def msm(points: EdwardsPoint, scalars: Scalar, c: int | None = None,
        fused: bool = False, signed: bool = True,
        dense: bool | None = None) -> EdwardsPoint:
    """Single-device MSM: sum(k_i * P_i) (BASELINE.json config 3-4).

    On TPU the default is the DENSE VMEM bucket kernel (no sort, no
    gather; ops/pallas/msm_kernels.py) at width auto_c_dense(n) --
    measured 5.1x/9.0x/12.6x over the r3 scan path at 2^16/2^18/2^20
    (0.786 s for 2^20, ~the chip's full field-mul roofline; BASELINE.md
    round 4).  dense=False
    (or an explicit c > MAX_DENSE_C, or CPU) takes the sort+scan path: one
    small jitted kernel per window plus one combine kernel.  fused=True
    uses the single-graph _msm_local (what shard_map traces).  c=None
    picks the window width by N; signed digits halve the bucket count
    (standard mods recoding, scalar.rs:433-442)."""
    n = int(np.prod(points.shape))
    if _use_dense(n, c, fused, signed, dense):
        cd = c if c is not None else auto_c_dense(n)
        nwin = -(-251 // cd)
        windows = scalars.windows(cd, nwin)
        return EdwardsPoint(*_msm_dense(points._tuple(), windows, cd, nwin))
    if c is None:
        c = auto_c(n)
    # 251 bits of window coverage: the signed recode's carry out of window
    # w lands in window w+1, and canonical scalars reach 2^250 - 1.
    nwin = -(-251 // c)
    windows = scalars.windows(c, nwin)
    pt = points._tuple()
    if fused:
        return EdwardsPoint(*_msm_local(pt, windows, c=c, nwin=nwin,
                                        signed=signed))
    if signed:
        mag, sgn = signed_digits(windows, c)
        nbuckets = (1 << (c - 1)) + 1
        per_w = [_window_buckets_signed(pt, mag[:, w], sgn[:, w], nbuckets)
                 for w in range(nwin)]
    else:
        nbuckets = 1 << c
        per_w = [_window_buckets(pt, windows[:, w], nbuckets)
                 for w in range(nwin)]
    tables = tuple(jnp.stack([pw[i] for pw in per_w]) for i in range(4))
    return EdwardsPoint(*_combine_windows(tables, c, nbuckets))


def _sharded_combine(tables, c: int, nbuckets: int, comm: Communicator,
                     ndev: int):
    """Window-sharded bucket combine (the Amdahl fix for wide meshes,
    docs/SCALING.md): instead of every device combining ALL nwin windows
    of its LOCAL tables, devices all_gather the per-device tables
    (~nwin * nb * 352 B, still KB-scale over ICI), EC-sum them per
    window, and each device combines only the windows w with
    w % ndev == axis_index():

        total = sum_d 2^(c*d) * Horner_{stride=ndev}(tot_{d::ndev})

    The final 2^(c*d) weighting runs a FIXED c*(ndev-1) doubling chain
    with a capture-select at step c*d (shard_map traces one program for
    all devices -- no data-dependent trip counts).  Returns this device's
    weighted partial ([22] coords); caller gathers + tree-reduces."""
    nwin = tables[0].shape[0]
    k = -(-nwin // ndev)
    pad = k * ndev - nwin
    if pad:
        # padded windows hold all-identity tables: their bucket total is
        # the identity and contributes nothing at any weight
        fill = []
        for l0 in (0, 1, 1, 0):
            z = jnp.zeros((pad, nbuckets, 22), jnp.int32)
            if l0:
                z = z.at[..., 0].set(1)
            fill.append(z)
        tables = tuple(jnp.concatenate([t, f], axis=0)
                       for t, f in zip(tables, fill))
    g = comm.all_gather_points(tuple(t[None] for t in tables))
    # [ndev, k*ndev, nb, 22] -> this device's window subset, summed over
    # devices (exact integer EC math: any order is bit-exact)
    my = comm.axis_index()
    idx = my + ndev * jnp.arange(k)
    sub = tuple(jnp.take(t.reshape(ndev, k * ndev, nbuckets, 22), idx,
                         axis=1) for t in g)
    loc = _tree_reduce(sub)                      # [k, nb, 22]
    tot = _bucket_totals(loc, nbuckets)          # [k, 22]
    H = _horner(tot, c, stride=ndev)             # sum_j 2^(c*ndev*j) tot_j
    out = H
    S = H
    for j in range(1, c * (ndev - 1) + 1):
        S = _ed._double(S)
        out = _ed._select(jnp.equal(c * my, j), S, out)
    return out


def msm_sharded(points: EdwardsPoint, scalars: Scalar, mesh,
                c: int | None = None, axis: str = "data",
                signed: bool = True, dense: bool = False,
                shard_combine: bool = False) -> EdwardsPoint:
    """Mesh-sharded MSM: points/scalars sharded over `axis`, one partial
    point per device, all_gather + tree-reduce (bit-exact in any order).

    N must be divisible by the mesh size.  dense=True routes each device's
    local Pippenger through the dense VMEM bucket kernel (TPU pods only --
    Pallas inside shard_map; the CPU-mesh dryrun keeps the XLA scan path).
    shard_combine=True splits the window combine across devices
    (_sharded_combine) -- divides the per-device fixed term by the mesh
    size for an extra ~nwin*nb*352 B all_gather (docs/SCALING.md's D >= 4
    efficiency fix).  Per-device ICI payload otherwise: ONE extended
    point = 352 bytes."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    if c is None:
        c = (auto_c_dense if dense else auto_c)(int(np.prod(points.shape)))
    nwin = -(-251 // c)  # see msm(): signed-carry coverage
    if dense and not signed:
        # the dense kernel always builds signed tables with 2^(c-1)+1
        # buckets; an unsigned nbuckets here would shape-mismatch the
        # shard_combine path at trace time (ADVICE r4)
        raise ValueError("msm_sharded(dense=True) requires signed=True")
    nbuckets = (1 << (c - 1)) + 1 if signed else 1 << c
    ndev = int(np.prod(mesh.devices.shape))
    windows = scalars.windows(c, nwin)
    pt = points._tuple()
    comm = Communicator(axis)

    # dense off-TPU (the CPU-mesh dryrun) runs the kernel interpreted
    interp = jax.default_backend() != "tpu"

    def local(pt_shard, win_shard):
        if dense:
            if shard_combine:
                tables = _msm_dense_tables_k(pt_shard, win_shard, c,
                                             nwin, interpret=interp)
            else:
                tables = None
                partial_pt = _msm_dense(pt_shard, win_shard, c, nwin,
                                        interpret=interp)
        elif shard_combine:
            tables = _msm_local_tables(pt_shard, win_shard, c, nwin, signed)
        else:
            tables = None
            partial_pt = _msm_local(pt_shard, win_shard, c=c, nwin=nwin,
                                    signed=signed)
        if tables is not None:
            partial_pt = _sharded_combine(tables, c, nbuckets, comm, ndev)
        gathered = comm.all_gather_points(tuple(x[None] for x in partial_pt))
        gathered = tuple(g.reshape(-1, 22) for g in gathered)
        return _tree_reduce(gathered)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(tuple(P(axis) for _ in range(4)), P(axis)),
        out_specs=tuple(P() for _ in range(4)),
        check_vma=False)
    return EdwardsPoint(*fn(pt, windows))


def msm_naive(points: EdwardsPoint, scalars: Scalar) -> EdwardsPoint:
    """Ladder-per-point + tree reduction; O(N * 250) adds.  Used as a
    cross-check and as the baseline the Pippenger path must beat."""
    prods = points * scalars
    return EdwardsPoint(*_tree_reduce(prods._tuple()))
