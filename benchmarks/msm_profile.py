#!/usr/bin/env python
"""Stage-level timing of the production MSM at one size: argsort, gather,
Blelloch segmented scan, scatter, whole window, combine -- plus the dense
VMEM bucket kernel for comparison.  Decides where MSM optimization effort
goes (VERDICT r3 item 1: record the breakdown).

Env: PROF_LOG2N (default 16), PROF_C (default auto_c), PROF_DENSE_C
(default auto_c_dense).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("BENCH_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

import zerocaf_tpu as z
from zerocaf_tpu.models import edwards as _ed
import importlib

M = importlib.import_module("zerocaf_tpu.parallel.msm")

LOG2N = int(os.environ.get("PROF_LOG2N", 16))
N = 1 << LOG2N


def timeit(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    c = int(os.environ.get("PROF_C", M.auto_c(N)))
    dc = int(os.environ.get("PROF_DENSE_C", M.auto_c_dense(N)))
    nwin = -(-251 // c)
    nb = (1 << (c - 1)) + 1
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    pts = z.EdwardsPoint.basepoint_mul(z.Scalar.random(k1, (N,)))
    scalars = z.Scalar.random(k2, (N,))
    windows = scalars.windows(c, nwin)
    mag, sgn = M.signed_digits(windows, c)
    pt = pts._tuple()
    digits, sign0 = mag[:, 0], sgn[:, 0]
    emit(n=N, c=c, nwin=nwin, nb=nb,
         platform=jax.devices()[0].platform)

    t = timeit(jax.jit(jnp.argsort), digits)
    emit(stage="argsort", s=round(t, 4), per_window=True)

    order = jnp.argsort(digits)

    @jax.jit
    def gather(pt, order):
        return tuple(co[order] for co in pt)

    t = timeit(gather, pt, order)
    emit(stage="gather_points", s=round(t, 4), per_window=True)

    p_sorted = gather(pt, order)
    d_sorted = digits[order]
    starts = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (d_sorted[1:] != d_sorted[:-1]).astype(jnp.int32)])

    t = timeit(jax.jit(M._seg_exclusive_scan), p_sorted, starts)
    emit(stage="blelloch_scan", s=round(t, 4), per_window=True,
         rounds=2 * max(1, (N - 1).bit_length()))

    t = timeit(lambda: M._window_buckets_signed(pt, digits, sign0, nb))
    emit(stage="window_total_scan", s=round(t, 4), per_window=True)

    # combine at this (c, nb): same shape the production run uses
    one_w = M._window_buckets_signed(pt, digits, sign0, nb)
    tables = tuple(jnp.stack([co] * nwin) for co in one_w)
    t = timeit(lambda: M._combine_windows(tables, c, nb))
    emit(stage="combine_windows", s=round(t, 4), per_window=False)

    # dense VMEM bucket kernel (one window), production dense width
    from zerocaf_tpu.ops.pallas import msm_kernels as _mk
    nb_d = (1 << (dc - 1)) + 1
    nwin_d = -(-251 // dc)
    mag_d, sgn_d = M.signed_digits(scalars.windows(dc, nwin_d), dc)
    dsig = jnp.where(sgn_d, -mag_d, mag_d)
    n_pad = _mk.dense_pad(N)
    dsig = jnp.pad(dsig, [(0, n_pad - N), (0, 0)])
    pt_stack = _mk.prep_points(pt)
    interp = jax.devices()[0].platform != "tpu"
    t = timeit(lambda: M._window_buckets_dense(pt_stack, dsig[:, 0], nb_d,
                                               interpret=interp))
    emit(stage="window_total_dense", s=round(t, 4), per_window=True,
         dense_c=dc, nwin=nwin_d)

    t = timeit(jax.jit(lambda p: _ed._add(p, p)), pt)
    emit(stage="one_nwide_add", s=round(t, 5))


if __name__ == "__main__":
    main()
