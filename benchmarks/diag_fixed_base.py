"""Diagnose the round-2 fixed-base regression (VERDICT item 1).

BENCH_r02 recorded 575.5k fixed-base mults/s via fk.fixed_base_mul_stepped
(prefetch=True) while round 1's XLA comb measured 2.34M/s.  This script
times all three comb variants with the bench's honest chained methodology
(one variant per invocation so a wedged compile doesn't kill the rest):

    python benchmarks/diag_fixed_base.py xla|pallas_prefetch|pallas_step

Prints one JSON line {"variant": ..., "sec_per_call": ..., "mults_per_sec": ...}.
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

from zerocaf_tpu.models import edwards as ed


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
    variant = sys.argv[1]
    # "signed14" / "signed15" / "signed16": the signed-digit comb at that
    # width through the stepped Pallas path (half-size table per window,
    # fewer windows at larger width)
    # "lanesN": signed width-N comb with the pre-transposed-table gather
    # (glue="lanes": entries on the lane axis, no per-step transpose)
    batch = int(os.environ.get("BENCH_BATCH", "16384"))
    lanes = variant.startswith("lanes")
    packed2 = variant.startswith("packed2_")
    packed = variant.startswith("packed") and not packed2
    signed = variant.startswith("signed") or lanes or packed or packed2
    cw = (int(variant[5:]) if lanes
          else int(variant[8:]) if packed2
          else int(variant[6:]) if packed or variant.startswith("signed")
          else ed.COMB_WIDTH)
    nwin = (ed._fixed_base_table_signed(cw) if signed
            else ed._fixed_base_table(cw)).shape[0]
    rng = np.random.default_rng(0)
    w0 = jnp.asarray(rng.integers(0, 1 << cw, (batch, nwin)).astype(np.int32))

    if variant == "xla":
        comb = lambda w: ed._fixed_base_mul(w, cw)
    elif signed:
        from zerocaf_tpu.ops.pallas import field_kernels as fk
        g = ("lanes" if lanes else "packed2" if packed2
             else "packed" if packed else "rows")
        comb = lambda w: fk.fixed_base_mul_stepped(w, cw, signed=True, glue=g)
    else:
        from zerocaf_tpu.ops.pallas import field_kernels as fk
        pf = variant == "pallas_prefetch"
        comb = lambda w: fk.fixed_base_mul_stepped(w, cw, prefetch=pf)

    def step(w):
        Q = comb(w)
        mixed = jnp.concatenate([Q[0], Q[1], Q[2]], axis=-1)[..., :nwin]
        return (w + mixed) & ((1 << cw) - 1)

    t = time_chain(step, w0, 8)
    print(json.dumps({
        "variant": variant,
        "platform": jax.devices()[0].platform,
        "batch": batch,
        "width": cw,
        "sec_per_call": t,
        "mults_per_sec": round(batch / t, 1),
    }))


if __name__ == "__main__":
    main()
