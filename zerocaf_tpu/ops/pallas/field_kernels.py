"""Pallas TPU kernels for batched field arithmetic.

Layout: limb-major [22, N] tiles -- the batch axis N lands on the 128-wide
lane dimension of the VPU and the 22 limbs on sublanes, so every limb op is
a full-width vector op.  The kernel fuses schoolbook multiply + carries +
pseudo-Mersenne folds + final carry into one VMEM-resident pass (the XLA
path materializes the 43-column intermediate through HBM for large batches).

Semantics are identical to ops/limb.mul (same school/carry/fold algebra) --
the differential tests drive both paths against the oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import constants as C
from ..limb import FIELD, SCALAR, ModSpec

L = 22
W = 12
MASK = (1 << W) - 1
LANES = 2048  # lanes per grid block; large blocks amortize per-program overhead
SUBLANE_PAD = 24  # pad 22 limbs to a multiple of 8 for clean (8, 128) tiles


def _school_cols(a, b, na, nb):
    """Full product columns on [rows, N] blocks: out[k] = sum a_i*b_{k-i}.
    Pad-and-sum form (Mosaic has no scatter-add).

    Sequential pad-to-full-and-accumulate is the MEASURED-fastest form: a
    pairwise tree merge padding each pair only to the union of spans (fewer
    add rows on paper) ran 6% SLOWER end-to-end on v5e (318.5k/313.9k vs
    336.9k windowed mults/s) -- Mosaic's sublane-offset pads cost more than
    the full-height adds they save.  Keep this form."""
    ncols = na + nb - 1
    out = None
    for i in range(na):
        term = a[i : i + 1] * b[:nb]
        term = jnp.pad(term, [(i, ncols - nb - i)] + [(0, 0)] * (term.ndim - 1))
        out = term if out is None else out + term
    return out


def _carry3(x, keep_top=True):
    """Two data-parallel carry passes on [rows, N]; the top row stays
    unsplit (sign carrier).

    Two passes suffice for every call site (|columns| < 2^30):
      pass 1: rem < 2^12, carry <= 2^18  ->  limbs <= 2^12 + 2^18
      pass 2: carry <= 2^18 >> 12 = 2^6  ->  limbs <= 2^12 + 2^6 < 2^12.1
    which meets the semi envelope the laziness discipline assumes; a third
    pass only tightened 2^6 to ~1 (measured ~8% of ladder-kernel time for
    no bound improvement -- r3 optimization, bit-exact by the differential
    tests)."""
    for _ in range(2):
        rem = x & MASK
        car = x >> W
        rem = jnp.concatenate([rem[:-1], x[-1:]], axis=0)
        car = jnp.concatenate([jnp.zeros_like(car[:1]), car[:-1]], axis=0)
        x = rem + car
    return x


def _fold_once(x, c_limbs):
    """One pseudo-Mersenne fold at limb 21 on [rows, N].  The fold constant
    is baked as python-int scalar multiplies (Pallas kernels cannot capture
    array constants)."""
    lo = x[:21]
    hi = x[21:]
    nh = hi.shape[0]
    nd = len(c_limbs) + nh - 1
    d = None
    for i, ci in enumerate(c_limbs):
        if ci:
            term = jnp.pad(ci * hi, [(i, nd - nh - i)] + [(0, 0)] * (hi.ndim - 1))
            d = term if d is None else d + term
    ncols = max(21, d.shape[0])
    lo = jnp.pad(lo, [(0, ncols - lo.shape[0])] + [(0, 0)] * (lo.ndim - 1))
    d = jnp.pad(d, [(0, ncols - d.shape[0])] + [(0, 0)] * (d.ndim - 1))
    y = lo - d
    y = jnp.pad(y, [(0, 1)] + [(0, 0)] * (y.ndim - 1))
    return _carry3(y)


def _mul_block(a, b, c_limbs):
    """Fused semi-reduced multiply on [22, N] blocks."""
    cols = _school_cols(a, b, L, L)                      # [43, N]
    cols = jnp.pad(cols, [(0, 1)] + [(0, 0)] * (cols.ndim - 1))
    x = _carry3(cols)                                    # [44, N]
    while x.shape[0] > L:
        x = _fold_once(x, c_limbs)
    return x[:L]


def _mul_kernel(a_ref, b_ref, out_ref, *, c_limbs):
    a = a_ref[:L]
    b = b_ref[:L]
    out = _mul_block(a, b, c_limbs)
    out_ref[:L] = out
    out_ref[L:] = jnp.zeros_like(out_ref[L:])


# ---------------------------------------------------------------------------
# Fused point kernels: the whole variable-base scalar multiplication ladder
# runs inside ONE Pallas program per lane block -- table build, doublings,
# one-hot table selection and additions all VMEM-resident.  Measured basis:
# a lone Pallas field mul is 1.77 ns vs 4.34 ns for the XLA path on v5e
# (benchmarks/probe_f9.py), and the fused ladder removes the remaining
# HBM round-trips between point ops.
#
# Laziness discipline (bounds for int32 schoolbook columns, radix 2^12):
#   * semi limbs are < 2^12.1 (after a carry pass)
#   * mul operands may be ONE add deep (<= 2^13.1): 22*2^13.1*2^13.1 < 2^30.7
#   * square operands must be semi:      23*2^12.1*2^13.1 < 2^29.8
#   * anything deeper gets one _c1 pass (a single split+add round)
# ---------------------------------------------------------------------------


def _c1(x):
    """One keep-top carry pass on [rows, N] (limbs |x| < 2^17 -> semi)."""
    rem = x & MASK
    car = x >> W
    rem = jnp.concatenate([rem[:-1], x[-1:]], axis=0)
    car = jnp.concatenate([jnp.zeros_like(car[:1]), car[:-1]], axis=0)
    return rem + car


def _sq_cols(a):
    """Squaring columns on [22, N] blocks (school_square, limb-major)."""
    na = a.shape[0]
    ncols = 2 * na - 1
    a2 = a * 2
    out = None
    for i in range(na):
        row = a[i : i + 1] * a2[i:]
        row = jnp.pad(row, [(2 * i, na - 1 - i)] + [(0, 0)] * (row.ndim - 1))
        out = row if out is None else out + row
    diag = a * a
    z = jnp.zeros_like(diag)
    inter = jnp.stack([diag, z], axis=1).reshape(2 * na, *a.shape[1:])[:ncols]
    return out - inter


def _reduce_block(cols, c_limbs):
    """Carry + cascade-fold product columns to semi [22, N]."""
    cols = jnp.pad(cols, [(0, 1)] + [(0, 0)] * (cols.ndim - 1))
    x = _carry3(cols)
    while x.shape[0] > L:
        x = _fold_once(x, c_limbs)
    return x[:L]


def _sqb(a, c_limbs):
    """Square a semi operand -> semi."""
    return _reduce_block(_sq_cols(a), c_limbs)


def _mulb(a, b, c_limbs):
    """Multiply (each operand at most one add deep) -> semi."""
    return _reduce_block(_school_cols(a, b, L, L), c_limbs)


def _mul_const(a, k_limbs, c_limbs):
    """Multiply a semi operand by a compile-time constant (python-int
    limbs), like _fold_once's baked scalar multiplies."""
    nk = len(k_limbs)
    nd = L + nk - 1
    d = None
    for i, ki in enumerate(k_limbs):
        if ki:
            term = jnp.pad(ki * a, [(i, nd - L - i)] + [(0, 0)] * (a.ndim - 1))
            d = term if d is None else d + term
    return _reduce_block(d, c_limbs)


def _pdbl_block(P, c_limbs, with_t=True):
    """dbl-2008-hwcd doubling (a=-1) on block tuples (X, Y, Z[, T])."""
    X, Y, Z = P[0], P[1], P[2]
    A = _sqb(X, c_limbs)
    B = _sqb(Y, c_limbs)
    Zs = _sqb(Z, c_limbs)
    Cc = Zs + Zs                       # 2-deep
    S = _c1(X + Y)                     # semi (square operand)
    E = _c1(_sqb(S, c_limbs) - A - B)  # 3-deep -> carry
    G = B - A                          # 2-deep (ok for mul)
    F = _c1(G - Cc)                    # 4-deep -> carry
    H = (-A) - B                       # 2-deep
    out = (_mulb(E, F, c_limbs), _mulb(G, H, c_limbs), _mulb(F, G, c_limbs))
    if with_t:
        out = out + (_mulb(E, H, c_limbs),)
    return out


def _madd_block(Q, e, c_limbs):
    """Extended + projective-Niels addition, 8M (the a=-1 analogue of
    curve25519-dalek's ProjectiveNielsPoint add).  e = (Y+X, Y-X, Z, 2d*T),
    all semi.  Unified: identity entries (1, 1, 1, 0) and Q == +-e work."""
    X1, Y1, Z1, T1 = Q
    PP = _mulb(Y1 + X1, e[0], c_limbs)
    MM = _mulb(Y1 - X1, e[1], c_limbs)
    TT = _mulb(T1, e[3], c_limbs)
    ZZ = _mulb(Z1, e[2], c_limbs)
    ZZ2 = ZZ + ZZ
    E = _c1(PP - MM)                   # carried: E*H below needs semi x 2-deep
    F = _c1(ZZ2 - TT)
    G = _c1(ZZ2 + TT)
    H = PP + MM                        # 2-deep
    return (_mulb(E, F, c_limbs), _mulb(G, H, c_limbs),
            _mulb(F, G, c_limbs), _mulb(E, H, c_limbs))


def _padd_ext_block(P, Q, d_limbs, c_limbs):
    """Unified extended-extended HWCD addition (table build only)."""
    X1, Y1, Z1, T1 = P
    X2, Y2, Z2, T2 = Q
    A = _mulb(X1, X2, c_limbs)
    B = _mulb(Y1, Y2, c_limbs)
    Cc = _mul_const(_mulb(T1, T2, c_limbs), d_limbs, c_limbs)
    Dd = _mulb(Z1, Z2, c_limbs)
    S = _mulb(X1 + Y1, X2 + Y2, c_limbs)
    E = _c1(S - A - B)
    F = _c1(Dd - Cc)
    G = _c1(Dd + Cc)
    H = A + B
    return (_mulb(E, F, c_limbs), _mulb(G, H, c_limbs),
            _mulb(F, G, c_limbs), _mulb(E, H, c_limbs))


def _identity_blocks(shape2d):
    zero = jnp.zeros(shape2d, jnp.int32)
    # no .at[].set -- Mosaic has no scatter; build the 1-in-limb-0 pattern
    # from an iota compare instead
    one = (jax.lax.broadcasted_iota(jnp.int32, shape2d, 0) == 0).astype(jnp.int32)
    return (zero, one, one, zero)


def _windowed_kernel(pt_ref, dig_ref, out_ref, *, d2_limbs, c_limbs,
                     nwin, width, d_limbs):
    """Whole windowed variable-base ladder for one lane block.

    pt_ref:  [128, B] int32 -- rows 0:22 X, 32:54 Y, 64:86 Z, 96:118 T
    dig_ref: [nwin_pad, B] int32 -- row i = digit of window (nwin-1-i)
             (MSB-first, pre-reversed by the wrapper)
    out_ref: [128, B] like pt_ref."""
    X = pt_ref[0:L]
    Y = pt_ref[32:32 + L]
    Z = pt_ref[64:64 + L]
    T = pt_ref[96:96 + L]
    nb = 1 << width

    # table of small multiples in extended form, then Niels form.  Entry 0
    # (identity) is literal constants: running block math on trace-time
    # constants crashes the Mosaic backend (splat-slicing bug).
    ext = [(X, Y, Z, T)]
    for _ in range(2, nb):
        ext.append(_padd_ext_block(ext[-1], (X, Y, Z, T), d_limbs, c_limbs))
    zero, one, _, _ = _identity_blocks(X.shape)
    niels = [(one, one, one, zero)]
    niels += [(_c1(y + x), _c1(y - x), z, _mul_const(t, d2_limbs, c_limbs))
              for (x, y, z, t) in ext]
    # keep table entries as 2D values (a [nb, 22, B] stack compiles
    # pathologically in Mosaic); the one-hot select walks the python list

    def step(i, Q):
        for j in range(width):
            Q = _pdbl_block(Q, c_limbs, with_t=(j == width - 1))
        # digits replicated over 8 sublanes per window (see wrapper); build
        # a [22, B] mask source -- no 1-extent dims (Mosaic select crash)
        d8 = dig_ref[pl.ds(i * 8, 8), :]
        d22 = jnp.concatenate([d8, d8, d8[: L - 16]], axis=0)
        e = niels[0]
        for k in range(1, nb):
            m = d22 == k
            e = tuple(jnp.where(m, nk, ec) for nk, ec in zip(niels[k], e))
        return _madd_block(Q, e, c_limbs)

    Q = jax.lax.fori_loop(0, nwin, step, _identity_blocks(X.shape))

    out_ref[0:L] = Q[0]
    out_ref[32:32 + L] = Q[1]
    out_ref[64:64 + L] = Q[2]
    out_ref[96:96 + L] = Q[3]
    for lo in (L, 32 + L, 64 + L, 96 + L):
        pad = 32 - L if lo != 96 + L else 128 - (96 + L)
        out_ref[lo:lo + pad] = jnp.zeros((pad,) + Q[0].shape[1:], jnp.int32)


def _padd_kernel(p_ref, q_ref, out_ref, *, d_limbs, c_limbs):
    """Unified extended-extended addition on [128, B] stacked coords."""
    P = tuple(p_ref[lo:lo + L] for lo in (0, 32, 64, 96))
    Q = tuple(q_ref[lo:lo + L] for lo in (0, 32, 64, 96))
    R = _padd_ext_block(P, Q, d_limbs, c_limbs)
    zpad = jnp.zeros((32 - L,) + R[0].shape[1:], jnp.int32)
    for j, lo in enumerate((0, 32, 64, 96)):
        out_ref[lo:lo + L] = R[j]
        out_ref[lo + L:lo + 32] = zpad


PADD_LANES = 1024
# fixed_base_mul_stepped prefetch cap: above this lane count the hoisted
# [nwin, 96, n_pad] gather tensor (~nwin * 384 B per lane) dominates HBM.
_PREFETCH_MAX_LANES = 1 << 17


@functools.partial(jax.jit, static_argnames=("interpret",))
def padd_tiled(p, q, interpret: bool = False):
    """Batched unified point addition via one fused Pallas kernel.

    p, q: 4-tuples of [..., 22] int32 extended coords (same batch shape).
    Drop-in for models.edwards._add on the TPU hot paths (MSM scans): one
    kernel does all 10 field muls VMEM-resident instead of ~10 separate
    XLA fusions with HBM round-trips."""
    from ... import constants as C

    shape = p[0].shape[:-1]
    n = int(np.prod(shape)) if shape else 1
    n_pad = -(-n // PADD_LANES) * PADD_LANES

    def prep(pt):
        cols = []
        for c in pt:
            c2 = jnp.broadcast_to(c, shape + (L,)).reshape(n, L)
            c2 = jnp.pad(c2, [(0, n_pad - n), (0, 0)])
            cols.append(jnp.pad(c2.T, [(0, 32 - L), (0, 0)]))
        return jnp.concatenate(cols, axis=0)  # [128, n_pad]

    dl = tuple(int(v) for v in np.asarray(C.EDWARDS_D_LIMBS))
    cl = tuple(int(v) for v in FIELD.fold_c_limbs)
    out = pl.pallas_call(
        functools.partial(_padd_kernel, d_limbs=dl, c_limbs=cl),
        out_shape=jax.ShapeDtypeStruct((128, n_pad), jnp.int32),
        grid=(n_pad // PADD_LANES,),
        in_specs=[
            pl.BlockSpec((128, PADD_LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, PADD_LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((128, PADD_LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(prep(p), prep(q))

    def unprep(lo):
        return out[lo:lo + L].T[:n].reshape(*shape, L)

    return tuple(unprep(lo) for lo in (0, 32, 64, 96))


def _madd_affine_kernel(q_ref, e_ref, out_ref, *, c_limbs):
    """Mixed addition extended + affine-Niels entry (y+x, y-x, 2dxy), 7M --
    the Pallas form of models.edwards._madd_niels.  e_ref rows: 0:22 y+x,
    32:54 y-x, 64:86 2dxy."""
    X1, Y1, Z1, T1 = (q_ref[lo:lo + L] for lo in (0, 32, 64, 96))
    PP = _mulb(Y1 + X1, e_ref[0:L], c_limbs)
    MM = _mulb(Y1 - X1, e_ref[32:32 + L], c_limbs)
    TT = _mulb(T1, e_ref[64:64 + L], c_limbs)
    Z2 = Z1 + Z1
    E = _c1(PP - MM)
    F = _c1(Z2 - TT)
    G = _c1(Z2 + TT)
    H = PP + MM
    R = (_mulb(E, F, c_limbs), _mulb(G, H, c_limbs),
         _mulb(F, G, c_limbs), _mulb(E, H, c_limbs))
    zpad = jnp.zeros((32 - L,) + R[0].shape[1:], jnp.int32)
    for j, lo in enumerate((0, 32, 64, 96)):
        out_ref[lo:lo + L] = R[j]
        out_ref[lo + L:lo + 32] = zpad


def _madd_packed_core(Q, e_ref, base, c_limbs):
    """One mixed affine-Niels add from packed entry rows at `base`:
    coord j's 22 limbs as 11 int32s (limb i | limb (i+11) << 12) at rows
    base+j*16 .. +11; rows base+48:56 = sign mask replicated over 8
    sublanes (nonzero = negate: Niels swap + 2dxy negation in-kernel, so
    the sign never touches packed ints)."""
    X1, Y1, Z1, T1 = Q

    def unpack(r0):
        v = e_ref[base + r0:base + r0 + 11]
        return jnp.concatenate([v & MASK, v >> W], axis=0)

    ep = unpack(0)
    em = unpack(16)
    et = unpack(32)
    s8 = e_ref[base + 48:base + 56]
    s22 = jnp.concatenate([s8, s8, s8[: L - 16]], axis=0) != 0
    E0 = jnp.where(s22, em, ep)
    E1 = jnp.where(s22, ep, em)
    E2 = jnp.where(s22, -et, et)
    PP = _mulb(Y1 + X1, E0, c_limbs)
    MM = _mulb(Y1 - X1, E1, c_limbs)
    TT = _mulb(T1, E2, c_limbs)
    Z2 = Z1 + Z1
    E = _c1(PP - MM)
    F = _c1(Z2 - TT)
    G = _c1(Z2 + TT)
    H = PP + MM
    return (_mulb(E, F, c_limbs), _mulb(G, H, c_limbs),
            _mulb(F, G, c_limbs), _mulb(E, H, c_limbs))


def _madd_affine_packed_kernel(q_ref, e_ref, out_ref, *, c_limbs):
    """One packed mixed add per step (glue="packed"): halves the per-step
    XLA gather + transpose volume -- the measured comb bottleneck
    (BASELINE.md r4)."""
    Q = tuple(q_ref[lo:lo + L] for lo in (0, 32, 64, 96))
    R = _madd_packed_core(Q, e_ref, 0, c_limbs)
    zpad = jnp.zeros((32 - L,) + R[0].shape[1:], jnp.int32)
    for j, lo in enumerate((0, 32, 64, 96)):
        out_ref[lo:lo + L] = R[j]
        out_ref[lo + L:lo + 32] = zpad


def _madd2_affine_packed_kernel(q_ref, e_ref, out_ref, *, c_limbs):
    """TWO packed mixed adds per step (glue="packed2"): entry A at rows
    0:56, entry B at rows 64:120 of e_ref.  Halves the scan length and
    the Q-state HBM round-trips on top of the packed-gather saving."""
    Q = tuple(q_ref[lo:lo + L] for lo in (0, 32, 64, 96))
    Q = _madd_packed_core(Q, e_ref, 0, c_limbs)
    R = _madd_packed_core(Q, e_ref, 64, c_limbs)
    zpad = jnp.zeros((32 - L,) + R[0].shape[1:], jnp.int32)
    for j, lo in enumerate((0, 32, 64, 96)):
        out_ref[lo:lo + L] = R[j]
        out_ref[lo + L:lo + 32] = zpad


@functools.partial(jax.jit, static_argnames=("width", "interpret", "prefetch",
                                             "signed", "glue"))
def fixed_base_mul_stepped(windows, width, interpret: bool = False,
                           prefetch: bool = False, signed: bool = False,
                           glue: str = "rows"):
    """Fixed-base comb multiplication with the 7M mixed adds fused in
    Pallas.  The per-window gather from the (shared, 2^width-entry) comb
    table stays in XLA -- per-lane gathers from large shared tables are
    XLA's strength and Mosaic's weakness; only the field math moves into
    the kernel.  Bit-compatible with models.edwards._fixed_base_mul.

    signed=True recodes the unsigned windows to digits in
    [-2^(width-1), 2^(width-1)) and gathers |d| from the HALF-size signed
    table (models/edwards._fixed_base_table_signed), applying the sign by
    the Niels swap/negate in the XLA glue; a signed width-15 comb covers
    250 bits in 17 mixed adds vs 20 for the unsigned width-13 comb.

    glue="lanes" (signed only) stores the table PRE-TRANSPOSED as
    [nwin, 3, 22, 2^(w-1)+1] so the per-step gather indexes the LAST
    (lane) axis and lands directly in the kernel's [3, 22, n_pad] layout
    -- no per-step lane<->sublane transpose of the 4-MB gathered entry
    tensor (VERDICT r3 item 3: ~42% of the comb's ceiling was gather
    glue).

    prefetch=True hoists ALL nwin gathers out of the scan into one batched
    take (flat index w * 2^width + digit) and pre-transposes the entries to
    the kernel's [96, n_pad] layout, so the scan body is just the Pallas
    madd -- no per-step gather/transpose ops.

    MEASURED (v5e, width 13, batch 16k -- benchmarks/diag_fixed_base.py):
    prefetch=False sustains 2.57M mults/s (the fastest comb path, 9% over
    the XLA comb's 2.35M/s); prefetch=True materializes an
    [nwin, 96, n_pad] entry tensor (~86 MB/iteration) and collapsed to
    575k/s in the r2 driver run (BENCH_r02) -- hence prefetch defaults to
    OFF and is additionally capped at _PREFETCH_MAX_LANES lanes."""
    from ...models import edwards as _edm

    if signed:
        assert not prefetch, "signed comb implements the per-step path only"
        tbl = jnp.asarray(_edm._fixed_base_table_signed(width))
    else:
        tbl = jnp.asarray(_edm._fixed_base_table(width))  # [nwin, 2^w, 3, 22]
    nwin = tbl.shape[0]
    shape = windows.shape[:-1]
    n = int(np.prod(shape)) if shape else 1
    B = PADD_LANES
    n_pad = -(-n // B) * B
    win = windows.reshape(n, nwin)
    if signed:
        win = _signed_recode(win, width)
    win = jnp.pad(win, [(0, n_pad - n), (0, 0)])

    cl = tuple(int(v) for v in FIELD.fold_c_limbs)
    madd = pl.pallas_call(
        functools.partial(_madd_affine_kernel, c_limbs=cl),
        out_shape=jax.ShapeDtypeStruct((128, n_pad), jnp.int32),
        grid=(n_pad // B,),
        in_specs=[
            pl.BlockSpec((128, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((96, B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((128, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )

    iota = jax.lax.broadcasted_iota(jnp.int32, (128, n_pad), 0)
    q0 = ((iota == 32) | (iota == 64)).astype(jnp.int32)

    ds = jnp.moveaxis(win, 0, -1)                    # [nwin, n_pad]
    if prefetch and n_pad > _PREFETCH_MAX_LANES:
        prefetch = False  # gathered tensor would be ~nwin * 0.4 KB/lane
    if prefetch:
        flat = tbl.reshape(nwin << width, 3, L)
        idx = (jnp.arange(nwin, dtype=jnp.int32)[:, None] << width) + ds
        ent = jnp.take(flat, idx, axis=0)            # [nwin, n_pad, 3, 22]
        ent = ent.transpose(0, 2, 3, 1)              # [nwin, 3, 22, n_pad]
        ent = jnp.pad(ent, [(0, 0), (0, 0), (0, 32 - L), (0, 0)])
        ent = ent.reshape(nwin, 96, n_pad)

        def body(q, e):
            return madd(q, e), None

        qf, _ = jax.lax.scan(body, q0, ent)
    elif signed and glue == "packed2":
        tnp = np.asarray(_edm._fixed_base_table_signed(width)).astype(np.int64)
        packed = (tnp[..., :11] | (tnp[..., 11:] << W)).astype(np.int32)
        npairs = (nwin + 1) // 2
        if nwin % 2:
            # pad with a copy of window 0: its digits are forced to 0
            # below, and entry 0 of every window is the Niels identity
            packed = np.concatenate([packed, packed[:1]], axis=0)
        tblP = jnp.asarray(packed)               # [2*npairs, nbe, 3, 11]
        dsp = ds                                  # [nwin, n_pad]
        if nwin % 2:
            dsp = jnp.concatenate(
                [dsp, jnp.zeros((1, n_pad), dsp.dtype)], axis=0)
        dsp = dsp.reshape(npairs, 2, n_pad)
        madd2 = pl.pallas_call(
            functools.partial(_madd2_affine_packed_kernel, c_limbs=cl),
            out_shape=jax.ShapeDtypeStruct((128, n_pad), jnp.int32),
            grid=(n_pad // B,),
            in_specs=[
                pl.BlockSpec((128, B), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, B), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((128, B), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )

        def pack_half(w_idx, d):
            a = jnp.where(d < 0, -d, d)
            ent = jnp.take(tblP[w_idx], a, axis=0)   # [n_pad, 3, 11]
            ent = ent.transpose(1, 2, 0)             # [3, 11, n_pad]
            ent = jnp.pad(ent, [(0, 0), (0, 5), (0, 0)]).reshape(48, n_pad)
            sg = jnp.broadcast_to((d < 0)[None, :], (8, n_pad))
            return jnp.concatenate(
                [ent, sg.astype(jnp.int32),
                 jnp.zeros((8, n_pad), jnp.int32)], axis=0)  # [64, n_pad]

        def body(q, wd):
            p_idx, d2 = wd
            e = jnp.concatenate([pack_half(2 * p_idx, d2[0]),
                                 pack_half(2 * p_idx + 1, d2[1])], axis=0)
            return madd2(q, e), None

        qf, _ = jax.lax.scan(body, q0, (jnp.arange(npairs), dsp))
    elif signed and glue == "packed":
        tnp = np.asarray(_edm._fixed_base_table_signed(width)).astype(np.int64)
        packed = (tnp[..., :11] | (tnp[..., 11:] << W)).astype(np.int32)
        tblP = jnp.asarray(packed)               # [nwin, nbe, 3, 11]
        madd_p = pl.pallas_call(
            functools.partial(_madd_affine_packed_kernel, c_limbs=cl),
            out_shape=jax.ShapeDtypeStruct((128, n_pad), jnp.int32),
            grid=(n_pad // B,),
            in_specs=[
                pl.BlockSpec((128, B), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((64, B), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((128, B), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )

        def body(q, wd):
            w_idx, d = wd
            a = jnp.where(d < 0, -d, d)
            ent = jnp.take(tblP[w_idx], a, axis=0)   # [n_pad, 3, 11]
            ent = ent.transpose(1, 2, 0)             # [3, 11, n_pad]
            ent = jnp.pad(ent, [(0, 0), (0, 5), (0, 0)]).reshape(48, n_pad)
            sg = jnp.broadcast_to((d < 0)[None, :], (8, n_pad))
            e = jnp.concatenate(
                [ent, sg.astype(jnp.int32),
                 jnp.zeros((8, n_pad), jnp.int32)], axis=0)  # [64, n_pad]
            return madd_p(q, e), None

        qf, _ = jax.lax.scan(body, q0, (jnp.arange(nwin), ds))
    elif signed and glue == "lanes":
        tblT = jnp.asarray(
            np.transpose(np.asarray(_edm._fixed_base_table_signed(width)),
                         (0, 2, 3, 1)))               # [nwin, 3, 22, nbe]

        def body(q, wd):
            w_idx, d = wd
            a = jnp.where(d < 0, -d, d)
            ent = jnp.take(tblT[w_idx], a, axis=-1)  # [3, 22, n_pad]
            neg = d < 0                              # [n_pad] -> bcast rows
            e0 = jnp.where(neg, ent[1], ent[0])
            e1 = jnp.where(neg, ent[0], ent[1])
            e2 = jnp.where(neg, -ent[2], ent[2])
            e = jnp.stack([e0, e1, e2], axis=0)      # [3, 22, n_pad]
            e = jnp.pad(e, [(0, 0), (0, 32 - L), (0, 0)]).reshape(96, n_pad)
            return madd(q, e), None

        qf, _ = jax.lax.scan(body, q0, (jnp.arange(nwin), ds))
    elif signed:
        def body(q, wd):
            w_idx, d = wd
            a = jnp.where(d < 0, -d, d)
            entry = jnp.take(tbl[w_idx], a, axis=0)  # [n_pad, 3, 22]
            neg = (d < 0)[:, None]
            e0 = jnp.where(neg, entry[:, 1], entry[:, 0])
            e1 = jnp.where(neg, entry[:, 0], entry[:, 1])
            e2 = jnp.where(neg, -entry[:, 2], entry[:, 2])
            e = jnp.stack([e0, e1, e2], axis=0)      # [3, n_pad, 22]
            e = e.transpose(0, 2, 1)                 # [3, 22, n_pad]
            e = jnp.pad(e, [(0, 0), (0, 32 - L), (0, 0)]).reshape(96, n_pad)
            return madd(q, e), None

        qf, _ = jax.lax.scan(body, q0, (jnp.arange(nwin), ds))
    else:
        def body(q, wd):
            w_idx, d = wd
            entry = jnp.take(tbl[w_idx], d, axis=0)  # [n_pad, 3, 22]
            e = entry.transpose(1, 2, 0)             # [3, 22, n_pad]
            e = jnp.pad(e, [(0, 0), (0, 32 - L), (0, 0)]).reshape(96, n_pad)
            return madd(q, e), None

        qf, _ = jax.lax.scan(body, q0, (jnp.arange(nwin), ds))

    def unprep(lo):
        return qf[lo:lo + L].T[:n].reshape(*shape, L)

    return tuple(unprep(lo) for lo in (0, 32, 64, 96))


# --- fallback: per-step kernels with the Niels table staged in HBM --------
# The monolithic ladder kernel above stresses the remote Mosaic compiler;
# this variant compiles two small kernels (table build; one window step)
# and drives the 63 steps from a lax.scan.  Extra cost: the Q state and the
# table round-trip HBM between steps (~2.3 MB per block-step, ~10 ms per
# 16k-lane call at v5e bandwidth -- small vs the compute).


def _table_kernel(pt_ref, tbl_ref, *, d2_limbs, c_limbs, d_limbs, nb):
    """Build the Niels table: tbl rows [(k*4 + j)*32 : +22] = coord j of
    entry k (coords: Y+X, Y-X, Z, 2dT)."""
    X = pt_ref[0:L]
    Y = pt_ref[32:32 + L]
    Z = pt_ref[64:64 + L]
    T = pt_ref[96:96 + L]
    # entry 0 (identity) is written as literal constants -- running the
    # block math on trace-time constants crashes the Mosaic backend
    # (multi-lane-tile splat slicing); entries >= 1 are variable data.
    ext = [(X, Y, Z, T)]
    for _ in range(2, nb):
        ext.append(_padd_ext_block(ext[-1], (X, Y, Z, T), d_limbs, c_limbs))
    zpad = jnp.zeros((32 - L,) + X.shape[1:], jnp.int32)
    zero, one, _, _ = _identity_blocks(X.shape)
    for j, e0 in enumerate((one, one, one, zero)):  # Niels identity
        tbl_ref[j * 32:j * 32 + L] = e0
        tbl_ref[j * 32 + L:j * 32 + 32] = zpad
    for k1, (x, y, z, t) in enumerate(ext):
        k = k1 + 1
        e = (_c1(y + x), _c1(y - x), z, _mul_const(t, d2_limbs, c_limbs))
        for j in range(4):
            lo = (k * 4 + j) * 32
            tbl_ref[lo:lo + L] = e[j]
            tbl_ref[lo + L:lo + 32] = zpad


def _step_kernel(q_ref, tbl_ref, dig_ref, out_ref, *, c_limbs, width, nb):
    """One windowed-ladder step: width doublings + one-hot Niels add."""
    Q = tuple(q_ref[lo:lo + L] for lo in (0, 32, 64, 96))
    for j in range(width):
        Q = _pdbl_block(Q, c_limbs, with_t=(j == width - 1))
    # digits arrive replicated across 8 sublanes; assemble a full-height
    # [22, B] copy so the select mask has no 1-extent dims (the remote
    # Mosaic backend crashes on selects with [1, B]-broadcast predicates)
    d8 = dig_ref[0:8, :]
    d22 = jnp.concatenate([d8, d8, d8[: L - 16]], axis=0)
    e = tuple(tbl_ref[j * 32:j * 32 + L] for j in range(4))
    for k in range(1, nb):
        m = d22 == k
        e = tuple(jnp.where(m, tbl_ref[(k * 4 + j) * 32:(k * 4 + j) * 32 + L],
                            ec) for j, ec in enumerate(e))
    Q = _madd_block(Q, e, c_limbs)
    zpad = jnp.zeros((32 - L,) + Q[0].shape[1:], jnp.int32)
    for j, lo in enumerate((0, 32, 64, 96)):
        out_ref[lo:lo + L] = Q[j]
        out_ref[lo + L:lo + 32] = zpad


@functools.partial(jax.jit, static_argnames=("width", "interpret"))
def scalar_mul_windowed_stepped(pt, windows, width: int = 4,
                                interpret: bool = False):
    """Windowed variable-base multiplication from two small Pallas kernels
    (table build + per-step), scanned over windows.  Same math as
    scalar_mul_windowed_fused; trades HBM round-trips between steps for a
    compiler-friendly kernel size."""
    from ... import constants as C

    X = pt[0]
    shape = X.shape[:-1]
    n = int(np.prod(shape)) if shape else 1
    nwin = windows.shape[-1]
    nb = 1 << width
    B = WIN_LANES
    n_pad = -(-n // B) * B

    def prep(c):
        c2 = jnp.broadcast_to(c, shape + (L,)).reshape(n, L)
        c2 = jnp.pad(c2, [(0, n_pad - n), (0, 0)])
        return jnp.pad(c2.T, [(0, 32 - L), (0, 0)])

    pt_stack = jnp.concatenate([prep(c) for c in pt], axis=0)  # [128, n_pad]
    d2 = tuple(int(v) for v in np.asarray(C.EDWARDS_2D_LIMBS))
    dl = tuple(int(v) for v in np.asarray(C.EDWARDS_D_LIMBS))
    cl = tuple(int(v) for v in FIELD.fold_c_limbs)
    grid = (n_pad // B,)

    tbl = pl.pallas_call(
        functools.partial(_table_kernel, d2_limbs=d2, c_limbs=cl,
                          d_limbs=dl, nb=nb),
        out_shape=jax.ShapeDtypeStruct((nb * 4 * 32, n_pad), jnp.int32),
        grid=grid,
        in_specs=[pl.BlockSpec((128, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nb * 4 * 32, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pt_stack)

    step_call = pl.pallas_call(
        functools.partial(_step_kernel, c_limbs=cl, width=width, nb=nb),
        out_shape=jax.ShapeDtypeStruct((128, n_pad), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((128, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * 4 * 32, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((128, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )

    # identity start state, [128, n_pad]
    iota = jax.lax.broadcasted_iota(jnp.int32, (128, n_pad), 0)
    q0 = ((iota == 32) | (iota == 64)).astype(jnp.int32)

    dig = windows.reshape(n, nwin)[:, ::-1].T  # [nwin, n] MSB-first
    dig = jnp.pad(dig, [(0, 0), (0, n_pad - n)])
    dig8 = jnp.broadcast_to(dig[:, None, :], (nwin, 8, n_pad))

    def body(q, d_row):
        return step_call(q, tbl, d_row), None

    qf, _ = jax.lax.scan(body, q0, dig8)

    def unprep(lo):
        return qf[lo:lo + L].T[:n].reshape(*shape, L)

    return tuple(unprep(lo) for lo in (0, 32, 64, 96))


def _step_kernel_signed(q_ref, tbl_ref, dig_ref, out_ref, *, c_limbs, width,
                        nb):
    """One signed-window step: digits in [-2^(w-1), 2^(w-1)); the table
    holds entries 1..2^(w-1) only (half of the unsigned variant's), and
    negation is free in Niels form: swap (Y+X, Y-X) and negate 2dT."""
    Q = tuple(q_ref[lo:lo + L] for lo in (0, 32, 64, 96))
    for j in range(width):
        Q = _pdbl_block(Q, c_limbs, with_t=(j == width - 1))
    d8 = dig_ref[0:8, :]
    d22 = jnp.concatenate([d8, d8, d8[: L - 16]], axis=0)
    a22 = jnp.where(d22 < 0, -d22, d22)
    s22 = d22 < 0
    e = tuple(tbl_ref[j * 32:j * 32 + L] for j in range(4))
    for k in range(1, nb):
        m = a22 == k
        e = tuple(jnp.where(m, tbl_ref[(k * 4 + j) * 32:(k * 4 + j) * 32 + L],
                            ec) for j, ec in enumerate(e))
    ep = jnp.where(s22, e[1], e[0])
    em = jnp.where(s22, e[0], e[1])
    et = jnp.where(s22, -e[3], e[3])
    Q = _madd_block(Q, (ep, em, e[2], et), c_limbs)
    zpad = jnp.zeros((32 - L,) + Q[0].shape[1:], jnp.int32)
    for j, lo in enumerate((0, 32, 64, 96)):
        out_ref[lo:lo + L] = Q[j]
        out_ref[lo + L:lo + 32] = zpad


def _signed_recode(win, width):
    """Unsigned width-w windows (LSB-first) -> signed digits in
    [-2^(w-1), 2^(w-1)).  The final carry out is zero for canonical
    scalars (< r < 2^250 with 63 width-4 windows: the top window is <= 3);
    for adversarial window vectors it is dropped -- callers outside the
    canonical-scalar contract (bench chaining) are throughput-only."""
    h = 1 << (width - 1)
    full = 1 << width

    def body(carry, d):
        d = d + carry
        neg = d >= h
        out = jnp.where(neg, d - full, d)
        return neg.astype(d.dtype), out

    win_f = jnp.moveaxis(win, -1, 0)
    _, out = jax.lax.scan(body, jnp.zeros(win.shape[:-1], win.dtype), win_f)
    return jnp.moveaxis(out, 0, -1)


@functools.partial(jax.jit, static_argnames=("width", "interpret"))
def scalar_mul_windowed_signed(pt, windows, width: int = 4,
                               interpret: bool = False):
    """Signed-digit windowed variable-base multiplication: the stepped
    Pallas ladder with a half-size table (2^(w-1) entries vs 2^w-1) --
    the signed-digit trick of the Pippenger path (parallel/msm.py) applied
    to the dense ladder.  Bit-compatible with scalar_mul_windowed_stepped
    for canonical scalars (tests/test_pallas.py)."""
    from ... import constants as C

    X = pt[0]
    shape = X.shape[:-1]
    n = int(np.prod(shape)) if shape else 1
    nwin = windows.shape[-1]
    nb = (1 << (width - 1)) + 1      # identity + entries 1..2^(w-1)
    B = WIN_LANES
    n_pad = -(-n // B) * B

    def prep(c):
        c2 = jnp.broadcast_to(c, shape + (L,)).reshape(n, L)
        c2 = jnp.pad(c2, [(0, n_pad - n), (0, 0)])
        return jnp.pad(c2.T, [(0, 32 - L), (0, 0)])

    pt_stack = jnp.concatenate([prep(c) for c in pt], axis=0)
    d2 = tuple(int(v) for v in np.asarray(C.EDWARDS_2D_LIMBS))
    dl = tuple(int(v) for v in np.asarray(C.EDWARDS_D_LIMBS))
    cl = tuple(int(v) for v in FIELD.fold_c_limbs)
    grid = (n_pad // B,)

    tbl = pl.pallas_call(
        functools.partial(_table_kernel, d2_limbs=d2, c_limbs=cl,
                          d_limbs=dl, nb=nb),
        out_shape=jax.ShapeDtypeStruct((nb * 4 * 32, n_pad), jnp.int32),
        grid=grid,
        in_specs=[pl.BlockSpec((128, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nb * 4 * 32, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pt_stack)

    step_call = pl.pallas_call(
        functools.partial(_step_kernel_signed, c_limbs=cl, width=width,
                          nb=nb),
        out_shape=jax.ShapeDtypeStruct((128, n_pad), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((128, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * 4 * 32, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((128, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )

    iota = jax.lax.broadcasted_iota(jnp.int32, (128, n_pad), 0)
    q0 = ((iota == 32) | (iota == 64)).astype(jnp.int32)

    signed = _signed_recode(windows.reshape(n, nwin), width)
    dig = signed[:, ::-1].T                   # [nwin, n] MSB-first
    dig = jnp.pad(dig, [(0, 0), (0, n_pad - n)])
    dig8 = jnp.broadcast_to(dig[:, None, :], (nwin, 8, n_pad))

    def body(q, d_row):
        return step_call(q, tbl, d_row), None

    qf, _ = jax.lax.scan(body, q0, dig8)

    def unprep(lo):
        return qf[lo:lo + L].T[:n].reshape(*shape, L)

    return tuple(unprep(lo) for lo in (0, 32, 64, 96))


# Lane block for the stepped/fused ladders (VMEM: tables + temps).
# Env-overridable for A/B sweeps (benchmarks/diag_windowed.py); 256 is
# the measured default on v5e (r4 sweep in BASELINE.md).
import os as _os

WIN_LANES = int(_os.environ.get("ZEROCAF_WIN_LANES", "256"))


@functools.partial(jax.jit, static_argnames=("width", "interpret"))
def scalar_mul_windowed_fused(pt, windows, width: int = 4,
                              interpret: bool = False):
    """Fused-ladder windowed scalar multiplication.

    pt: 4-tuple of [N, 22] int32 (broadcasting batches NOT supported here --
    the caller broadcasts first); windows: [N, nwin] int32 LSB-first digits.
    Returns the 4-tuple of [N, 22] semi-reduced coordinates."""
    from ... import constants as C

    X = pt[0]
    shape = X.shape[:-1]
    n = int(np.prod(shape)) if shape else 1
    nwin = windows.shape[-1]
    n_pad = -(-n // WIN_LANES) * WIN_LANES

    def prep(c):
        c2 = jnp.broadcast_to(c, shape + (L,)).reshape(n, L)
        c2 = jnp.pad(c2, [(0, n_pad - n), (0, 0)])
        return jnp.pad(c2.T, [(0, 32 - L), (0, 0)])  # [32, n_pad]

    pt_stack = jnp.concatenate([prep(c) for c in pt], axis=0)  # [128, n_pad]
    dig = windows.reshape(n, nwin)[:, ::-1].T  # MSB-first rows
    dig = jnp.pad(dig, [(0, 0), (0, n_pad - n)])
    # replicate each window's digit row over 8 sublanes (kernel mask source)
    dig = jnp.broadcast_to(dig[:, None, :], (nwin, 8, n_pad)).reshape(
        nwin * 8, n_pad)
    nwin_pad = nwin * 8

    kern = functools.partial(
        _windowed_kernel,
        d2_limbs=tuple(int(v) for v in np.asarray(C.EDWARDS_2D_LIMBS)),
        d_limbs=tuple(int(v) for v in np.asarray(C.EDWARDS_D_LIMBS)),
        c_limbs=tuple(int(v) for v in FIELD.fold_c_limbs),
        nwin=nwin, width=width)
    grid = (n_pad // WIN_LANES,)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((128, n_pad), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((128, WIN_LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nwin_pad, WIN_LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((128, WIN_LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pt_stack, dig)

    def unprep(lo):
        return out[lo:lo + L].T[:n].reshape(*shape, L)

    return tuple(unprep(lo) for lo in (0, 32, 64, 96))


# --- fixed-exponent power chains ------------------------------------------
# a^e for a STATIC python-int exponent, windowed square-and-multiply with
# the whole field math fused in Pallas.  This is the engine under the
# Fermat inverse / Legendre / Tonelli / sqrt_ratio_i chains
# (ops/inv_sqrt.py) -- each is a ~253-bit exponentiation, i.e. ~250 squares
# + ~63 table multiplies, and those chains dominate the Ristretto
# encode/decode roundtrip.  Two small kernels (power table; one window
# step) mirror scalar_mul_windowed_stepped's compiler-friendly shape.
# Semantics match ops/limb.pow_const (differential tests in
# tests/test_pallas.py).  Reference chains: field.rs:854-925 (inverse),
# field.rs:462-503 (sqrt_ratio_i) -- both replaced by fixed-trip
# exponentiations per docs/DESIGN.md.


POW_LANES = 1024
POW_WIDTH = 4


def _pow_table_kernel(a_ref, tbl_ref, *, c_limbs, nb):
    """tbl rows [k*32 : k*32+22] = a^k, k in [0, nb)."""
    a = a_ref[0:L]
    zpad = jnp.zeros((32 - L,) + a.shape[1:], jnp.int32)
    one = (jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) == 0).astype(jnp.int32)
    tbl_ref[0:L] = one
    tbl_ref[L:32] = zpad
    cur = a
    for k in range(1, nb):
        if k > 1:
            cur = _mulb(cur, a, c_limbs)
        tbl_ref[k * 32:k * 32 + L] = cur
        tbl_ref[k * 32 + L:k * 32 + 32] = zpad


def _pow_sq_kernel(r_ref, out_ref, *, c_limbs, width):
    """width squarings, no multiply -- the step for ZERO exponent windows.
    The chain exponents are pseudo-Mersenne-shaped (2^249 + d, d < 2^125),
    so ~half the width-4 windows are zero; the exponent is static, so the
    skip happens at trace time (uniform per-lane work is preserved: every
    lane runs the same step sequence)."""
    r = r_ref[0:L]
    for _ in range(width):
        r = _sqb(r, c_limbs)
    out_ref[0:L] = r
    out_ref[L:32] = jnp.zeros((32 - L,) + r.shape[1:], jnp.int32)


def _pow_step_kernel(r_ref, tbl_ref, dig_ref, out_ref, *, c_limbs, width, nb):
    """One window step: width squarings, then multiply by the one-hot
    selected table entry (digit 0 multiplies by 1 -- uniform work, and the
    access pattern is exponent-independent like the point ladder's)."""
    r = r_ref[0:L]
    for _ in range(width):
        r = _sqb(r, c_limbs)
    d8 = dig_ref[0:8, :]
    d22 = jnp.concatenate([d8, d8, d8[: L - 16]], axis=0)
    e = tbl_ref[0:L]
    for k in range(1, nb):
        m = d22 == k
        e = jnp.where(m, tbl_ref[k * 32:k * 32 + L], e)
    r = _mulb(r, e, c_limbs)
    out_ref[0:L] = r
    out_ref[L:32] = jnp.zeros((32 - L,) + r.shape[1:], jnp.int32)


@functools.partial(jax.jit, static_argnames=("e", "spec", "interpret"))
def pow_tiled(a, e: int, spec: ModSpec = FIELD, interpret: bool = False):
    """a^e (mod spec.m) for a static exponent, fused in Pallas.

    a: [..., 22] int32 semi-reduced; returns semi-reduced [..., 22].
    Windowed (width 4) square-and-multiply: table of a^0..a^15 built in
    VMEM, then ceil(bits/4)-1 scanned steps of 4 squarings + one-hot
    multiply; the first window seeds the accumulator directly from the
    table (a static slice -- the exponent is compile-time)."""
    assert e > 0
    width = POW_WIDTH
    nb = 1 << width
    bits = e.bit_length()
    nwin = -(-bits // width)
    digits = [(e >> (width * (nwin - 1 - i))) & (nb - 1) for i in range(nwin)]

    shape = a.shape[:-1]
    n = int(np.prod(shape)) if shape else 1
    B = POW_LANES
    n_pad = -(-n // B) * B
    a2 = a.reshape(n, L)
    a2 = jnp.pad(a2, [(0, n_pad - n), (0, 0)])
    at = jnp.pad(a2.T, [(0, 32 - L), (0, 0)])            # [32, n_pad]

    cl = tuple(int(v) for v in spec.fold_c_limbs)
    grid = (n_pad // B,)
    tbl = pl.pallas_call(
        functools.partial(_pow_table_kernel, c_limbs=cl, nb=nb),
        out_shape=jax.ShapeDtypeStruct((nb * 32, n_pad), jnp.int32),
        grid=grid,
        in_specs=[pl.BlockSpec((32, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nb * 32, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(at)

    # seed from the first (static) window digit; remaining windows scan
    r0 = tbl[digits[0] * 32:digits[0] * 32 + 32]
    rest = digits[1:]
    if not rest:
        return r0[:L].T[:n].reshape(*shape, L)

    step_call = pl.pallas_call(
        functools.partial(_pow_step_kernel, c_limbs=cl, width=width, nb=nb),
        out_shape=jax.ShapeDtypeStruct((32, n_pad), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((32, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * 32, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((32, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    sq_call = pl.pallas_call(
        functools.partial(_pow_sq_kernel, c_limbs=cl, width=width),
        out_shape=jax.ShapeDtypeStruct((32, n_pad), jnp.int32),
        grid=grid,
        in_specs=[pl.BlockSpec((32, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((32, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )

    # split the static digit string into maximal zero / nonzero runs:
    # zero windows need no table multiply, and the exponent is compile-time
    # so the skip is free (the chain exponents are 2^249 + d with
    # d < 2^125 -- about half their windows are zero)
    segs = []
    i = 0
    while i < len(rest):
        j = i
        if rest[i] == 0:
            while j < len(rest) and rest[j] == 0:
                j += 1
            segs.append(("z", j - i))
        else:
            while j < len(rest) and rest[j] != 0:
                j += 1
            segs.append(("m", rest[i:j]))
        i = j

    def mbody(r, d_row):
        return step_call(r, tbl, d_row), None

    def zbody(r, _):
        return sq_call(r), None

    rf = r0
    for kind, v in segs:
        if kind == "z":
            rf, _ = jax.lax.scan(zbody, rf, None, length=v)
        else:
            dig = jnp.asarray(np.asarray(v, np.int32))
            dig8 = jnp.broadcast_to(dig[:, None, None], (len(v), 8, n_pad))
            rf, _ = jax.lax.scan(mbody, rf, dig8)
    return rf[:L].T[:n].reshape(*shape, L)


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def mul_tiled(a, b, spec: ModSpec = FIELD, interpret: bool = False):
    """Batched modular multiply via Pallas.

    a, b: [..., 22] int32 (semi-reduced).  The batch is flattened and padded
    to a multiple of 128 lanes; limbs move to the sublane axis inside the
    kernel.  Returns semi-reduced [..., 22]."""
    shape = a.shape[:-1]
    n = int(np.prod(shape)) if shape else 1
    n_pad = -(-n // LANES) * LANES
    a2 = a.reshape(n, L)
    b2 = jnp.broadcast_to(b, a.shape).reshape(n, L)
    a2 = jnp.pad(a2, [(0, n_pad - n), (0, 0)])
    b2 = jnp.pad(b2, [(0, n_pad - n), (0, 0)])
    at = jnp.pad(a2.T, [(0, SUBLANE_PAD - L), (0, 0)])   # [24, n_pad]
    bt = jnp.pad(b2.T, [(0, SUBLANE_PAD - L), (0, 0)])

    kern = functools.partial(_mul_kernel, c_limbs=tuple(int(v) for v in spec.fold_c_limbs))
    grid = (n_pad // LANES,)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((SUBLANE_PAD, n_pad), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((SUBLANE_PAD, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANE_PAD, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUBLANE_PAD, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(at, bt)
    return out[:L].T[:n].reshape(*shape, L)
