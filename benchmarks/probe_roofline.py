#!/usr/bin/env python
"""Hardware roofline probes: measure the primitive-op throughputs that decide
the limb-multiplication design (SURVEY.md section 7 "hard parts").

Measures, on whatever jax.devices() provides:
  * VPU int32 add/shift chain         (ops/s)
  * VPU int32 multiply chain          (ops/s)
  * VPU f32 fused multiply-add chain  (flops/s)
  * MXU int8 x int8 -> int32 matmul   (MACs/s)
  * MXU bf16 x bf16 -> f32 matmul     (MACs/s)

Each probe is one jit graph with a fori_loop of K data-dependent iterations,
so dispatch overhead amortizes and XLA cannot hoist the body.  Prints one
JSON line per probe.
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

K = int(os.environ.get("PROBE_K", 2048))     # loop trips inside the graph
SHAPE = (2048, 1024)  # 8 MB int32: VMEM-resident once loaded
MM_M, MM_K, MM_N = 4096, 1024, 1024


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


def report(name, value, unit, note=""):
    print(json.dumps({"probe": name, "value": round(value / 1e9, 2),
                      "unit": f"G {unit}/s", "note": note}), flush=True)


def probe_i32_addshift():
    @jax.jit
    def f(x):
        def body(_, x):
            return x + (x >> 1)
        return jax.lax.fori_loop(0, K, body, x)

    x = jnp.asarray(np.random.randint(0, 1 << 20, SHAPE, dtype=np.int32))
    t = timeit(f, x)
    n = K * SHAPE[0] * SHAPE[1] * 2  # shift + add
    report("vpu_i32_add_shift", n / t, "ops", f"{t*1e3:.2f} ms/graph")


def probe_i32_mul():
    @jax.jit
    def f(x):
        def body(_, x):
            return x * x + 1
        return jax.lax.fori_loop(0, K, body, x)

    x = jnp.asarray(np.random.randint(0, 1 << 20, SHAPE, dtype=np.int32))
    t = timeit(f, x)
    n = K * SHAPE[0] * SHAPE[1]  # count multiplies only
    report("vpu_i32_mul", n / t, "mults", f"{t*1e3:.2f} ms/graph")


def probe_i32_mask12():
    """The carry-pass op mix: mask + shift + 2 adds."""
    @jax.jit
    def f(x):
        def body(_, x):
            return (x & 4095) + (x >> 12) + 3
        return jax.lax.fori_loop(0, K, body, x)

    x = jnp.asarray(np.random.randint(0, 1 << 26, SHAPE, dtype=np.int32))
    t = timeit(f, x)
    n = K * SHAPE[0] * SHAPE[1] * 4
    report("vpu_i32_carrymix", n / t, "ops", f"{t*1e3:.2f} ms/graph")


def probe_f32_fma():
    @jax.jit
    def f(x):
        def body(_, x):
            return x * x + 1.0
        return jax.lax.fori_loop(0, K, body, x)

    x = jnp.asarray(np.random.random(SHAPE).astype(np.float32))
    t = timeit(f, x)
    n = K * SHAPE[0] * SHAPE[1] * 2  # fma = 2 flops
    report("vpu_f32_fma", n / t, "flops", f"{t*1e3:.2f} ms/graph")


def _matmul_probe(name, lhs_np, rhs_np, pet, post):
    """Accumulating matmul loop; the lhs dependency is one cheap xor so the
    MXU pipeline, not the chain, sets the rate."""
    rhs = jnp.asarray(rhs_np)
    iters = max(8, K // 64)

    @jax.jit
    def f(lhs):
        acc0 = jnp.zeros((MM_M, MM_N), pet)

        def body(_, carry):
            lhs, acc = carry
            d = jax.lax.dot_general(lhs, rhs, (((1,), (0,)), ((), ())),
                                    preferred_element_type=pet)
            return post(lhs), acc + d

        _, acc = jax.lax.fori_loop(0, iters, body, (lhs, acc0))
        return acc

    t = timeit(f, jnp.asarray(lhs_np))
    n = iters * MM_M * MM_K * MM_N
    report(name, n / t, "MACs", f"{t*1e3:.2f} ms/graph, {iters} matmuls")


def probe_i8_matmul():
    lhs = np.random.randint(0, 64, (MM_M, MM_K), dtype=np.int8)
    rhs = np.random.randint(-64, 64, (MM_K, MM_N), dtype=np.int8)
    _matmul_probe("mxu_i8_matmul", lhs, rhs, jnp.int32, lambda l: l ^ 1)


def probe_bf16_matmul():
    lhs = np.random.randint(0, 64, (MM_M, MM_K)).astype(jnp.bfloat16)
    rhs = np.random.randint(0, 64, (MM_K, MM_N)).astype(jnp.bfloat16)
    _matmul_probe("mxu_bf16_matmul", lhs, rhs, jnp.float32, lambda l: -l)


def probe_field_mul():
    """The actual limb-mul kernel, chained: true per-field-mul cost."""
    from zerocaf_tpu.ops import limb as l

    lanes = 1 << 16
    iters = 64

    @jax.jit
    def f(x, y):
        def body(_, x):
            return l.mul(x, y, l.FIELD)
        return jax.lax.fori_loop(0, iters, body, x)

    rng = np.random.default_rng(0)
    import zerocaf_tpu.oracle as o
    xs = np.stack([o.int_to_limbs(int.from_bytes(rng.bytes(31), "little"))
                   for _ in range(64)]).astype(np.int32)
    x = jnp.asarray(np.tile(xs, (lanes // 64, 1)))
    y = jnp.asarray(np.tile(xs[::-1], (lanes // 64, 1)))
    t = timeit(f, x, y)
    n = iters * lanes
    report("field_mul_chained", n / t, "muls",
           f"{t*1e3:.2f} ms/graph; {t/iters/lanes*1e9:.2f} ns/mul")


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    for p in (probe_i32_addshift, probe_i32_mul, probe_i32_mask12,
              probe_f32_fma, probe_i8_matmul, probe_bf16_matmul,
              probe_field_mul):
        try:
            p()
        except Exception as e:  # keep going if one probe wedges/fails
            print(json.dumps({"probe": p.__name__, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
