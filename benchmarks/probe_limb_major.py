#!/usr/bin/env python
"""Layout experiment: limb-major [22, N] vs limb-minor [N, 22] field mul.

Hypothesis (ROADMAP item 1/4): [N, 22] puts the 22-limb axis in the 128-wide
lane dimension (17% utilization + 5.8x pad memory); [22, N] puts the batch in
the lanes.  Measures chained muls per second for both and checks limb-major
results bit-exactly against the oracle.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("BENCH_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from zerocaf_tpu.ops import limb as l
import zerocaf_tpu.oracle as o

W, MASK, L = 12, 4095, 22
ITERS = 64
LANES = 1 << int(os.environ.get("PROBE_LOG2_LANES", 16))


# --- limb-major kernels (rows = limbs, lanes = elements) --------------------

def carry_lm(x, extra=1, passes=2):
    """[n, N] -> [n+extra, N], same contract as limb.carry_keep_top."""
    x = jnp.concatenate([x, jnp.zeros((extra,) + x.shape[1:], x.dtype)], 0)
    for _ in range(passes):
        rem = x & MASK
        car = x >> W
        rem = jnp.concatenate([rem[:-1], x[-1:]], 0)
        car = jnp.concatenate([jnp.zeros_like(car[:1]), car[:-1]], 0)
        x = rem + car
    return x


def school_lm(a, b):
    """[na, N] x [nb, N] -> [na+nb-1, N] product columns."""
    na, nb = a.shape[0], b.shape[0]
    cols = [None] * (na + nb - 1)
    for i in range(na):
        for j in range(nb):
            t = a[i] * b[j]
            k = i + j
            cols[k] = t if cols[k] is None else cols[k] + t
    return jnp.stack(cols)


def fold_lm(x, c_limbs):
    lo = x[:21]
    hi = x[21:]
    d = school_lm(hi, jnp.asarray(c_limbs)[:, None] * jnp.ones((1, x.shape[1]), x.dtype))
    ncols = max(21, d.shape[0])
    lo = jnp.concatenate([lo, jnp.zeros((ncols - lo.shape[0],) + lo.shape[1:], x.dtype)], 0)
    d = jnp.concatenate([d, jnp.zeros((ncols - d.shape[0],) + d.shape[1:], x.dtype)], 0)
    return carry_lm(lo - d)


def fold_lm_const(x, c_limbs):
    """Fold where the constant is broadcast per-row (cheaper than school with
    a materialized constant matrix): d[k] = sum_i hi[i] * c[k-i]."""
    lo = x[:21]
    hi = x[21:]
    nh, nc = hi.shape[0], len(c_limbs)
    cols = [None] * (nh + nc - 1)
    for i in range(nh):
        for j in range(nc):
            t = hi[i] * int(c_limbs[j])
            k = i + j
            cols[k] = t if cols[k] is None else cols[k] + t
    d = jnp.stack(cols)
    ncols = max(21, d.shape[0])
    lo = jnp.concatenate([lo, jnp.zeros((ncols - lo.shape[0],) + lo.shape[1:], x.dtype)], 0)
    d = jnp.concatenate([d, jnp.zeros((ncols - d.shape[0],) + d.shape[1:], x.dtype)], 0)
    return carry_lm(lo - d)


def reduce_lm(cols, spec):
    x = carry_lm(cols)
    while x.shape[0] > L:
        x = fold_lm_const(x, spec.fold_c_limbs)
    if x.shape[0] < L:
        x = jnp.concatenate([x, jnp.zeros((L - x.shape[0],) + x.shape[1:], x.dtype)], 0)
    return x


def mul_lm(a, b, spec):
    return reduce_lm(school_lm(a, b), spec)


# --- tiled layout: [N/128, 22, 128] (limbs on sublanes, batch tile on lanes)

def carry_tl(x, extra=1, passes=2):
    """[..., n, 128] -> [..., n+extra, 128]."""
    pad = [(0, 0)] * (x.ndim - 2) + [(0, extra), (0, 0)]
    x = jnp.pad(x, pad)
    for _ in range(passes):
        rem = x & MASK
        car = x >> W
        rem = jnp.concatenate([rem[..., :-1, :], x[..., -1:, :]], -2)
        car = jnp.concatenate([jnp.zeros_like(car[..., :1, :]), car[..., :-1, :]], -2)
        x = rem + car
    return x


def school_tl(a, b):
    na, nb = a.shape[-2], b.shape[-2]
    ncols = na + nb - 1
    out = None
    for i in range(na):
        term = a[..., i : i + 1, :] * b
        term = jnp.pad(term, [(0, 0)] * (term.ndim - 2) + [(i, ncols - nb - i), (0, 0)])
        out = term if out is None else out + term
    return out


def fold_tl_const(x, c_limbs):
    lo = x[..., :21, :]
    hi = x[..., 21:, :]
    nh, nc = hi.shape[-2], len(c_limbs)
    cols = [None] * (nh + nc - 1)
    for i in range(nh):
        for j in range(nc):
            t = hi[..., i, :] * int(c_limbs[j])
            k = i + j
            cols[k] = t if cols[k] is None else cols[k] + t
    d = jnp.stack(cols, axis=-2)
    ncols = max(21, d.shape[-2])
    lo = jnp.pad(lo, [(0, 0)] * (lo.ndim - 2) + [(0, ncols - lo.shape[-2]), (0, 0)])
    d = jnp.pad(d, [(0, 0)] * (d.ndim - 2) + [(0, ncols - d.shape[-2]), (0, 0)])
    return carry_tl(lo - d)


def reduce_tl(cols, spec):
    x = carry_tl(cols)
    while x.shape[-2] > L:
        x = fold_tl_const(x, spec.fold_c_limbs)
    if x.shape[-2] < L:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, L - x.shape[-2]), (0, 0)])
    return x


def mul_tl(a, b, spec):
    return reduce_tl(school_tl(a, b), spec)


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()], "lanes": LANES}),
          flush=True)
    rng = np.random.default_rng(0)
    vals = [int.from_bytes(rng.bytes(31), "little") for _ in range(64)]
    xs = np.stack([o.int_to_limbs(v) for v in vals]).astype(np.int32)
    x_bm = jnp.asarray(np.tile(xs, (LANES // 64, 1)))          # [N, 22]
    y_bm = jnp.asarray(np.tile(xs[::-1], (LANES // 64, 1)))
    x_lm = jnp.asarray(np.tile(xs, (LANES // 64, 1)).T.copy())  # [22, N]
    y_lm = jnp.asarray(np.tile(xs[::-1], (LANES // 64, 1)).T.copy())

    x_tl = jnp.asarray(np.tile(xs, (LANES // 64, 1)).reshape(-1, 128, 22)
                       .transpose(0, 2, 1).copy())              # [N/128, 22, 128]
    y_tl = jnp.asarray(np.tile(xs[::-1], (LANES // 64, 1)).reshape(-1, 128, 22)
                       .transpose(0, 2, 1).copy())

    # correctness: one limb-major + one tiled mul vs oracle
    got = np.asarray(jax.jit(lambda a, b: mul_lm(a, b, l.FIELD))(x_lm, y_lm))
    got_tl = np.asarray(jax.jit(lambda a, b: mul_tl(a, b, l.FIELD))(x_tl, y_tl))
    for lane in range(64):
        v = sum(int(c) << (12 * i) for i, c in enumerate(got[:, lane]))
        vt = sum(int(c) << (12 * i) for i, c in enumerate(got_tl[0, :, lane]))
        exp = o.fmul(vals[lane], vals[63 - lane])
        assert (v - exp) % o.P == 0 and abs(v) < 2**253, lane
        assert (vt - exp) % o.P == 0 and abs(vt) < 2**253, lane
    print(json.dumps({"check": "limb-major + tiled muls match oracle (64 lanes)"}),
          flush=True)

    @jax.jit
    def chain_bm(x, y):
        return jax.lax.fori_loop(0, ITERS, lambda _, x: l.mul(x, y, l.FIELD), x)

    @jax.jit
    def chain_lm(x, y):
        return jax.lax.fori_loop(0, ITERS, lambda _, x: mul_lm(x, y, l.FIELD), x)

    @jax.jit
    def chain_tl(x, y):
        return jax.lax.fori_loop(0, ITERS, lambda _, x: mul_tl(x, y, l.FIELD), x)

    for name, fn, a, b in (("batch_major", chain_bm, x_bm, y_bm),
                           ("limb_major", chain_lm, x_lm, y_lm),
                           ("tiled_22x128", chain_tl, x_tl, y_tl)):
        t = timeit(fn, a, b)
        print(json.dumps({"layout": name,
                          "ns_per_mul": round(t / ITERS / LANES * 1e9, 3),
                          "gmuls_per_s": round(ITERS * LANES / t / 1e9, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
