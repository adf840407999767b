"""Steady-state serving throughput: keygen / dh / hash_to_group / msm
through the pinned-batch Engine (zerocaf_tpu/serving.py).

The analogue of the reference's ECDH macro-bench
(/root/reference/benchmarks/dusk_benchmarks.rs:559-620) at serving shape:
wire bytes in, wire bytes out, cached jit pipelines, donation on.

Methodology: the Engine pipelines take/return device arrays; under the
axon tunnel a lone block_until_ready can return early (CLAUDE.md), so each
op is timed over `reps` back-to-back calls with a host readback of a few
bytes per call, reported as the median steady-state rate.  Calls are
genuinely sequential (each readback completes before the next dispatch).

Run: python benchmarks/serving_bench.py  (TPU; BENCH_FORCE_CPU=1 for CPU)
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

from zerocaf_tpu.serving import Engine

BATCH = int(os.environ.get("BENCH_BATCH", 32768))  # Engine's default batch
REPS = int(os.environ.get("BENCH_REPS", 8))


def steady_rate(call, fresh_input, reps=REPS):
    """Median per-call wall time over sequential call->readback rounds."""
    out = call(fresh_input(0))
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # warm + sync
    ts = []
    for i in range(reps):
        x = fresh_input(i + 1)
        t0 = time.perf_counter()
        out = call(x)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # full completion
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def pipelined_rate(pipe, fresh_input, reps=REPS):
    """Per-call wall time through the PUBLIC Engine.pipeline API (r5:
    the double-buffered path is a product capability, not a bench
    construct): dispatch of call i+1 overlaps the device execution +
    full-wire readback of call i.  The sequential `steady_rate` above
    remains the conservative number."""
    pipe.submit(*fresh_input(0))
    pipe.drain()  # warm + sync
    t0 = time.perf_counter()
    for i in range(reps):
        pipe.submit(*fresh_input(i + 1))
    pipe.drain()
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    # donation consumes input buffers -- feed fresh arrays each call
    eng = Engine(batch=BATCH, donate=True)
    out = {"platform": jax.devices()[0].platform, "batch": BATCH}

    seeds = [jnp.asarray(rng.integers(0, 256, (BATCH, 64), dtype=np.uint8))
             for _ in range(REPS + 2)]
    t = steady_rate(eng.keygen, lambda i: seeds[i])
    out["keygen_ops_per_sec"] = round(BATCH / t, 1)

    # dh needs valid sk/pk wire arrays; reuse one keygen result
    sk, pk = eng.keygen(jnp.asarray(
        rng.integers(0, 256, (BATCH, 64), dtype=np.uint8)))
    sk_h, pk_h = np.asarray(sk), np.asarray(pk)
    t = steady_rate(lambda x: eng.dh(*x),
                    lambda i: (jnp.asarray(sk_h), jnp.asarray(pk_h)))
    out["dh_ops_per_sec"] = round(BATCH / t, 1)
    t = pipelined_rate(eng.pipeline("dh", depth=2),
                       lambda i: (jnp.asarray(sk_h), jnp.asarray(pk_h)))
    out["dh_pipelined_ops_per_sec"] = round(BATCH / t, 1)

    uni = [jnp.asarray(rng.integers(0, 256, (BATCH, 64), dtype=np.uint8))
           for _ in range(REPS + 2)]
    t = steady_rate(eng.hash_to_group, lambda i: uni[i])
    out["hash_to_group_ops_per_sec"] = round(BATCH / t, 1)

    sc = rng.integers(0, 256, (BATCH, 32), dtype=np.uint8)
    sc[:, 31] &= 0x03
    t = steady_rate(lambda x: eng.msm(*x),
                    lambda i: (jnp.asarray(pk_h), jnp.asarray(sc)))
    out["msm_points_per_sec"] = round(BATCH / t, 1)
    out["msm_wall_s"] = round(t, 4)
    out["compiled_pipelines"] = eng.compiled()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
