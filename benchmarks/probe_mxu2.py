#!/usr/bin/env python
"""Second-generation hardware probes: MXU matmul rates at honest sizes with
tunnel-proof differenced chained timing.

Round-1 probes (probe_roofline.py) reported MXU int8 at 4.6 T MACs/s and
bf16 at 5.0 T MACs/s -- ~2.5% of the v5e spec sheet (394 TOPS int8 / 197
TFLOPS bf16).  Either the XLA lowering, the loop-carried dependency, or the
measurement was off; this probe isolates each factor:

  * bf16/int8/f32 matmul at 512/2048/4096 square, acc-only dependency
  * the same with a mutated-lhs dependency (round-1 style) for comparison
  * the fold-shaped int8 dot [N, 44] @ [44, 44] actually used by ops/limb
  * VPU int32 mul / f32 fma on big arrays

Timing = (T(2k) - T(k)) / k over fori_loop graphs, so dispatch, tunnel and
readback costs cancel.  Prints one JSON line per probe.
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


def _readback(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def time_chain(step, init, iters, reps=3):
    """Per-iteration time of `step` chained inside one jit graph, differenced
    across two graph sizes so fixed dispatch/tunnel cost cancels."""
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


def report(name, macs_per_iter, t, note=""):
    print(json.dumps({"probe": name, "t_per_iter_us": round(t * 1e6, 2),
                      "rate_G_per_s": round(macs_per_iter / t / 1e9, 1),
                      "note": note}), flush=True)


def probe_matmul(name, m, k, n, in_dtype, acc_dtype, iters=32):
    """Chained A@B with acc-only dependency: acc = tanh-free acc + (A+eps)@B
    where eps depends on acc's first element cheaply to defeat hoisting."""
    rng = np.random.default_rng(0)
    if in_dtype == jnp.int8:
        A = jnp.asarray(rng.integers(-64, 64, (m, k), dtype=np.int8))
        B = jnp.asarray(rng.integers(-64, 64, (k, n), dtype=np.int8))

        def step(carry):
            A_, acc = carry
            d = jax.lax.dot_general(A_, B, (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc_dtype)
            # cheap dependency: flip sign of A via xor with low bit of acc
            return A_ ^ 1, acc + d
        init = (A, jnp.zeros((m, n), acc_dtype))
    else:
        A = jnp.asarray(rng.random((m, k)), dtype=in_dtype)
        B = jnp.asarray(rng.random((k, n)), dtype=in_dtype)

        def step(carry):
            A_, acc = carry
            d = jax.lax.dot_general(A_, B, (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc_dtype)
            return -A_, acc + d
        init = (A, jnp.zeros((m, n), acc_dtype))

    t = time_chain(step, init, iters)
    report(name, m * k * n, t, f"{m}x{k}x{n}")


def probe_fold_dot(iters=64):
    """The exact int8 fold dot used in ops/limb.reduce_to_semi."""
    rng = np.random.default_rng(0)
    N = 1 << 16
    lhs = jnp.asarray(rng.integers(-64, 64, (N, 44), dtype=np.int8))
    B = jnp.asarray(rng.integers(-64, 64, (44, 44), dtype=np.int8))

    def step(carry):
        lhs_, acc = carry
        d = jax.lax.dot_general(lhs_, B, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return lhs_ ^ 1, acc + d

    t = time_chain(step, (lhs, jnp.zeros((N, 44), jnp.int32)), iters)
    print(json.dumps({"probe": "fold_dot_65536x44x44",
                      "t_per_iter_us": round(t * 1e6, 2),
                      "ns_per_row": round(t / N * 1e9, 3)}), flush=True)


def probe_vpu(iters=256):
    rng = np.random.default_rng(0)
    shape = (2048, 1024)
    xi = jnp.asarray(rng.integers(0, 1 << 20, shape, dtype=np.int32))
    t = time_chain(lambda x: x * x + 1, xi, iters)
    report("vpu_i32_mul", shape[0] * shape[1], t, "x*x+1 per elem")
    xf = jnp.asarray(rng.random(shape, dtype=np.float32))
    t = time_chain(lambda x: x * x + 1.0, xf, iters)
    report("vpu_f32_fma", shape[0] * shape[1], t, "fma per elem")
    t = time_chain(lambda x: (x & 4095) + (x >> 12), xi, iters)
    report("vpu_i32_carrymix", shape[0] * shape[1] * 3, t, "and+shift+add")


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "platform": jax.devices()[0].platform}), flush=True)
    probes = [
        ("bf16_512", lambda: probe_matmul("mxu_bf16_512", 512, 512, 512, jnp.bfloat16, jnp.float32, 128)),
        ("bf16_2048", lambda: probe_matmul("mxu_bf16_2048", 2048, 2048, 2048, jnp.bfloat16, jnp.float32, 32)),
        ("bf16_4096", lambda: probe_matmul("mxu_bf16_4096", 4096, 4096, 4096, jnp.bfloat16, jnp.float32, 16)),
        ("i8_2048", lambda: probe_matmul("mxu_i8_2048", 2048, 2048, 2048, jnp.int8, jnp.int32, 32)),
        ("i8_4096", lambda: probe_matmul("mxu_i8_4096", 4096, 4096, 4096, jnp.int8, jnp.int32, 16)),
        ("f32_2048", lambda: probe_matmul("mxu_f32_2048", 2048, 2048, 2048, jnp.float32, jnp.float32, 32)),
        ("fold_dot", probe_fold_dot),
        ("vpu", probe_vpu),
    ]
    only = set(sys.argv[1:])
    for name, p in probes:
        if only and name not in only:
            continue
        try:
            p()
        except Exception as e:
            print(json.dumps({"probe": name, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
