"""Time the variable-base windowed ladder (the headline metric) standalone:

    python benchmarks/diag_windowed.py [width]

Same honest chained methodology as bench.py; used for kernel A/B runs
(e.g. the r3 2-pass carry change)."""

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

from zerocaf_tpu import constants as C


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


def main():
    signed = "--signed" in sys.argv
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    width = int(argv[0]) if argv else 4
    batch = int(os.environ.get("BENCH_BATCH", "16384"))
    rng = np.random.default_rng(0)
    base = jnp.asarray(np.broadcast_to(C.BASEPOINT.astype(np.int32),
                                       (batch, 4, 22)).copy())
    pt = tuple(base[:, i] for i in range(4))
    nwin = -(-250 // width)
    w = jnp.asarray(rng.integers(0, 1 << width, (batch, nwin)).astype(np.int32))

    if jax.devices()[0].platform == "tpu":
        from zerocaf_tpu.ops.pallas import field_kernels as fk
        kern = (fk.scalar_mul_windowed_signed if signed
                else fk.scalar_mul_windowed_stepped)
        t = time_chain(lambda p: kern(p, w, width), pt, 2)
    else:
        from zerocaf_tpu.models import edwards as ed
        t = time_chain(lambda p: ed._scalar_mul_windowed(p, w, width), pt, 1)

    print(json.dumps({
        "metric": "windowed_signed" if signed else "windowed", "width": width,
        "platform": jax.devices()[0].platform, "batch": batch,
        "sec_per_call": t, "mults_per_sec": round(batch / t, 1),
    }))


if __name__ == "__main__":
    main()
