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
    Pad-and-sum form (Mosaic has no scatter-add)."""
    ncols = na + nb - 1
    out = None
    for i in range(na):
        term = a[i : i + 1] * b[:nb]
        term = jnp.pad(term, [(i, ncols - nb - i)] + [(0, 0)] * (term.ndim - 1))
        out = term if out is None else out + term
    return out


def _carry3(x, keep_top=True):
    """Three data-parallel carry passes on [rows, N]; the top row stays
    unsplit (sign carrier)."""
    for _ in range(3):
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
