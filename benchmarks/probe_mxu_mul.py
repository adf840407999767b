"""MXU data*data multiplication feasibility probe (VERDICT r2 item 2,
ROADMAP item 2): measure the achievable MXU matmul rate AT THE TRANSFORM
SHAPES a CRT-NTT/evaluation-domain field multiplier would actually use,
so the go/no-go analysis rests on measured numbers, not the peak-rate
(4.6 T int8 MACs/s at 4096x1024x1024) that small contractions cannot reach.

Why these shapes (see BASELINE.md "MXU route" for the full argument):
a batched data*data limb product can only ride the MXU through a CONSTANT
transform matrix (shared LHS): Y = W @ X with W [K, D] fixed and X [D, N]
the batch.  Exactness forces the configurations probed here:

  * cfg "2p_6bit":  6-bit digit split, D = 44, K = 128, 2 CRT primes,
    int8 twiddle hi/lo split (x2): >= 8 matmuls [128, 44] per mul pair
    + 2 inverse [22, 128] -- ~56k MACs/mul.
  * cfg "1p_4bit":  4-bit nibbles, D = 66, K = 256, single prime
    q = 40961 = 5*2^13 + 1: ~79k MACs/mul.

The probe times chained int8 (and f32) matmuls at [K, D] @ [D, N] and
reports ns/mul-equivalent for each configuration, to compare against the
measured VPU schoolbook (1.41-1.77 ns/mul fused, 3.66 ns XLA sustained).

Run: python benchmarks/probe_mxu_mul.py  (TPU; CPU gives shape sanity only)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def _readback(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1)])


def time_chain(step, init, iters, reps=3):
    def mk(k):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, k, lambda i, x: step(x), x)
        return run
    r1, r2 = mk(iters), mk(2 * iters)
    _readback(r1(init)); _readback(r2(init))
    def med(run):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _readback(run(init))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]
    t1, t2 = med(r1), med(r2)
    return max(t2 - t1, 1e-12) / iters


def probe_matmul(K, D, N, dtype):
    """ns per [K,D]@[D,N] matmul, chained with a data dependency."""
    rng = np.random.default_rng(0)
    if dtype == "int8":
        W = jnp.asarray(rng.integers(-100, 100, (K, D)).astype(np.int8))
        X0 = jnp.asarray(rng.integers(-100, 100, (D, N)).astype(np.int8))

        def step(X):
            Y = jax.lax.dot_general(
                W, X, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)  # [K, N] int32
            # fold back to [D, N] int8 (cheap VPU) to keep the chain shaped
            return (Y[:D] & 127).astype(jnp.int8)
    else:
        W = jnp.asarray(rng.integers(-100, 100, (K, D)).astype(np.float32))
        X0 = jnp.asarray(rng.integers(-100, 100, (D, N)).astype(np.float32))

        def step(X):
            Y = W @ X
            return Y[:D] * jnp.float32(1e-4)

    t = time_chain(step, X0, 16)
    macs = K * D * N
    return t, macs / t


def main():
    N = 16384
    out = {"platform": jax.devices()[0].platform, "batch": N, "shapes": {}}
    # transform shapes for the exact configurations + a big-shape control
    for name, (K, D) in {
        "fwd_2p_6bit": (128, 44),
        "inv_2p_6bit": (128, 24),   # padded 22 -> 24 output rows
        "fwd_1p_4bit": (256, 66),
        "control_big": (1024, 1024),
    }.items():
        for dt in ("int8", "f32"):
            t, rate = probe_matmul(K, D, N if name != "control_big" else 4096,
                                   dt)
            out["shapes"][f"{name}_{dt}"] = {
                "K": K, "D": D, "sec": t, "tera_macs_per_sec": rate / 1e12}

    # per-mul MAC budgets of the exact configurations (see module docstring)
    i8 = out["shapes"]
    def rate(nm):
        return i8[nm]["tera_macs_per_sec"] * 1e12

    cfg = {}
    # 2 primes, 6-bit digits: 2 ops x 2 primes x 2 (int8 split) forward
    # [128,44] + 2 primes x 2 split inverse [24,128]
    fwd_macs = 2 * 2 * 2 * 128 * 44
    inv_macs = 2 * 2 * 128 * 24
    cfg["2p_6bit_ns_per_mul"] = (fwd_macs / rate("fwd_2p_6bit_int8")
                                 + inv_macs / rate("inv_2p_6bit_int8")) * 1e9
    # single prime q=40961, 4-bit nibbles: 2 ops x 2 split x [256,66]
    # + 2 split x [24,256]
    fwd1 = 2 * 2 * 256 * 66
    inv1 = 2 * 256 * 24
    cfg["1p_4bit_ns_per_mul"] = (fwd1 / rate("fwd_1p_4bit_int8")
                                 + inv1 / rate("fwd_1p_4bit_int8")) * 1e9
    out["mxu_transform_cost"] = cfg
    out["vpu_schoolbook_ns_per_mul"] = {"fused_pallas": 1.77, "xla": 3.66,
                                        "ladder_effective": 1.41}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
