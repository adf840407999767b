#!/usr/bin/env python
"""Decompose the dense-MSM fixed term (r5): time, as REAL jitted graphs
at the same N,

  kernel_only   -- scan over bucket_accum_k with fold=0, lane-0 slice,
                   NO reduce (tables numerically wrong; timing only)
  kernel_fold   -- same with fold=F (adds the in-kernel roll+padd fold)
  tables_xla    -- production tables path with fold=0 (XLA lane reduce)
  tables_fold   -- production tables path with fold=F (no XLA reduce)
  full          -- _msm_dense (adds the window combine + Horner)

Differences isolate: in-kernel fold cost, XLA reduce cost, combine cost.
Usage: python benchmarks/diag_fixed_r5.py [log2n] [k] [fold]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from zerocaf_tpu import EdwardsPoint, Scalar
import importlib

M = importlib.import_module("zerocaf_tpu.parallel.msm")
MK = importlib.import_module("zerocaf_tpu.ops.pallas.msm_kernels")


def timeit(fn, iters=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(jax.tree_util.tree_leaves(fn())[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0])[..., :1]
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def _prep(pt, windows, c, nwin, k):
    mag, sgn = M.signed_digits(windows, c)
    dsig = jnp.where(sgn, -mag, mag)
    n = dsig.shape[0]
    n_pad = MK.grp_pad(n)
    dsig = jnp.pad(dsig, [(0, n_pad - n), (0, 0)])
    pt_stack = MK.prep_points_to(pt, n_pad)
    ngrp = -(-nwin // k)
    dsig_w = jnp.moveaxis(dsig, -1, 0)
    pad_w = ngrp * k - nwin
    if pad_w:
        dsig_w = jnp.concatenate(
            [dsig_w, jnp.zeros((pad_w, n_pad), dsig_w.dtype)], axis=0)
    dig_g = dsig_w.reshape(ngrp, k, n_pad)
    return pt_stack, dig_g


def prep_only_graph(c, nwin, k):
    """signed_digits + point/digit relayout only (no kernel)."""
    @jax.jit
    def run(pt, windows):
        return _prep(pt, windows, c, nwin, k)
    return run


def kernel_only_graph(c, nwin, k, fold):
    """Single-call tables path with the lane reduce REPLACED by a lane-0
    slice -- numerically wrong unless fold covers all lanes; timing
    only."""
    nb = (1 << (c - 1)) + 1

    @jax.jit
    def run(pt, windows):
        pt_stack, dig_g = _prep(pt, windows, c, nwin, k)
        tbl = MK.bucket_accum_all(pt_stack, dig_g, nb, k, fold=fold)
        ngrp = dig_g.shape[0]
        arr = tbl.reshape(ngrp * k * nb, 4, MK.PITCH,
                          MK.GROUP_LANES)[:, :, :22]
        return tuple(arr[:, j, :, 0] for j in range(4))

    return run


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    k = int(sys.argv[2]) if len(sys.argv) > 2 else M.DENSE_K
    fold = int(sys.argv[3]) if len(sys.argv) > 3 else M.DENSE_FOLD
    n = 1 << log2n
    c = M.auto_c_dense(n)
    nwin = -(-251 // c)
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    pts = EdwardsPoint.basepoint_mul(Scalar.random(k1, (n,)))
    sc = Scalar.random(k2, (n,))
    windows = sc.windows(c, nwin)
    pt = pts._tuple()
    jax.block_until_ready(pt[0])
    out = {"n": n, "c": c, "nwin": nwin, "k": k, "fold": fold,
           "platform": jax.devices()[0].platform}

    p0 = prep_only_graph(c, nwin, k)
    k0 = kernel_only_graph(c, nwin, k, 0)
    out["prep_only_s"] = round(timeit(lambda: p0(pt, windows)), 4)
    out["kernel_only_s"] = round(timeit(lambda: k0(pt, windows)), 4)
    tx = jax.jit(lambda p, w: M._msm_dense_tables_all(p, w, c, nwin, k=k,
                                                      fold=0))
    out["tables_xla_s"] = round(timeit(lambda: tx(pt, windows)), 4)
    out["full_s"] = round(timeit(
        lambda: M._msm_dense(pt, windows, c, nwin, k=k)), 4)
    out["full_xla_combine_s"] = round(timeit(
        lambda: M._msm_dense(pt, windows, c, nwin, k=k,
                             fused_combine=False)), 4)

    out["xla_reduce_cost_s"] = round(
        out["tables_xla_s"] - out["kernel_only_s"], 4)
    out["fused_combine_cost_s"] = round(
        out["full_s"] - out["tables_xla_s"], 4)
    out["xla_combine_cost_s"] = round(
        out["full_xla_combine_s"] - out["tables_xla_s"], 4)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
