#!/usr/bin/env python
"""Benchmark driver: batched Sonny-curve scalar multiplications per second
per chip (the BASELINE.json headline metric), plus secondary kernel metrics.

Prints ONE JSON line:
  {"metric": "scalar_mults_per_sec_per_chip", "value": N, "unit": "ops/s",
   "vs_baseline": N / 1e7, ...extras}

Resilience: the TPU remote-compile service on this rig can wedge on new
graphs, so each metric runs in its own subprocess with a timeout; a wedged
metric is reported as null instead of hanging the whole bench.  Compiled
executables persist in a local cache, so retries get cheaper.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(sys.argv[0])) or "."

CHILD = r"""
import json, os, sys, time
from functools import partial
sys.path.insert(0, {repo!r})
import jax
if os.environ.get("BENCH_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from zerocaf_tpu import constants as C
from zerocaf_tpu.models import edwards as ed
from zerocaf_tpu.models import ristretto as ri
from zerocaf_tpu.ops import limb as l

metric = {metric!r}
batch = {batch}
rng = np.random.default_rng(0)

# HONEST TIMING on the remote-tunnel device: block_until_ready can return at
# the ~0.1 ms dispatch floor before the remote execution finishes, so single
# dispatches measure as dispatch latency.  Instead: chain `iters` steps
# inside ONE graph with a data dependency, force a (tiny) host readback, and
# difference two graph sizes so the fixed dispatch+readback+tunnel cost
# cancels:  per_iter = (T(2k) - T(k)) / k.

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
    _readback(r1(init)); _readback(r2(init))  # compile + warm
    def med(run):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _readback(run(init))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]
    t1, t2 = med(r1), med(r2)
    return max(t2 - t1, 1e-12) / iters

base = jnp.asarray(np.broadcast_to(C.BASEPOINT.astype(np.int32), (batch, 4, 22)).copy())
pt = tuple(base[:, i] for i in range(4))

if metric == "windowed":
    w = jnp.asarray(rng.integers(0, 16, (batch, 63)).astype(np.int32))
    if jax.devices()[0].platform == "tpu":
        # signed-digit stepped Pallas ladder (the production TPU path of
        # EdwardsPoint.mul_windowed; 353.9k/s vs 336.9k unsigned on v5e)
        from zerocaf_tpu.ops.pallas import field_kernels as fk
        # iters=2 matches benchmarks/probe_f9.py's graphs: warm-cache hit
        t = time_chain(lambda p: fk.scalar_mul_windowed_signed(p, w, 4), pt, 2)
    else:
        t = time_chain(lambda p: ed._scalar_mul_windowed(p, w, 4), pt, 1)
elif metric == "ladder":
    b = jnp.asarray(rng.integers(0, 2, (batch, 250)).astype(np.int32))
    if jax.devices()[0].platform == "tpu":
        # oblivious ladder = stepped Pallas kernel at width 1 (the
        # EdwardsPoint.__mul__ production path)
        from zerocaf_tpu.ops.pallas import field_kernels as fk
        t = time_chain(lambda p: fk.scalar_mul_windowed_stepped(p, b, 1), pt, 2)
    else:
        t = time_chain(lambda p: ed._scalar_mul(p, b), pt, 1)
elif metric == "fixed_base":
    # Measured fastest on v5e (benchmarks/diag_fixed_base.py, r4): the
    # SIGNED width-14 comb through the two-window PACKED kernel
    # (glue="packed2"), 2.856M/s vs 2.830M one-window packed, 2.650M
    # unpacked signed (r3 path), 2.57M unsigned w13, 2.254M lanes-gather.
    if jax.devices()[0].platform == "tpu":
        from zerocaf_tpu.ops.pallas import field_kernels as fk
        cw = ed.COMB_WIDTH_SIGNED
        nwin = ed._fixed_base_table_signed(cw).shape[0]
        _comb = lambda w: fk.fixed_base_mul_stepped(w, cw, signed=True,
                                                    glue="packed2")
    else:
        cw = ed.COMB_WIDTH
        nwin = ed._fixed_base_table(cw).shape[0]
        _comb = lambda w: ed._fixed_base_mul(w, cw)
    w = jnp.asarray(rng.integers(0, 1 << cw, (batch, nwin)).astype(np.int32))
    def step(w):
        # Bench-only chaining: the mangled digits are arbitrary width-cw
        # vectors (values up to ~2^260), OUTSIDE the canonical-scalar
        # precondition documented for _fixed_base_mul's non-unified
        # _madd_niels.  Fine for throughput (op mix and memory traffic are
        # digit-independent); the chained points are NOT correctness-bearing.
        Q = _comb(w)
        mixed = jnp.concatenate([Q[0], Q[1], Q[2]], axis=-1)[..., :nwin]
        return (w + mixed) & ((1 << cw) - 1)
    t = time_chain(step, w, 8)
elif metric == "field_mul":
    n = 1 << 16
    A = jnp.asarray(rng.integers(0, 4096, (n, 22)).astype(np.int32))
    B = jnp.asarray(rng.integers(0, 4096, (n, 22)).astype(np.int32))
    if jax.devices()[0].platform == "tpu":
        # the Pallas bulk-mul kernel (production path for large batches;
        # public API ops/pallas/field_kernels.mul_tiled, differential-
        # tested) -- measured 1.77 ns vs 4.34 ns for the XLA mul (probe_f9)
        from zerocaf_tpu.ops.pallas import field_kernels as fk
        t = time_chain(lambda a: fk.mul_tiled(a, B, l.FIELD), A, 64)
    else:
        t = time_chain(lambda a: l.mul(a, B, l.FIELD), A, 64)
    batch = n
elif metric == "ristretto_encode":
    def step(p):
        bts = ri._compress(p)
        (x, y, z, tt), ok = ri._decompress(bts)
        return (x, y, z, tt)
    # one step = encode + decode; report the roundtrip rate
    t = time_chain(step, pt, 8)
elif metric == "chain_roofline":
    # Calibrate the FUSED-CHAIN roofline (VERDICT r4 item 5): time
    # pow_tiled -- the fused Pallas square/mul chain, the same op blend
    # as the ladder kernels -- at three static exponents and solve for
    # the in-chain per-square and per-mul times:
    #   e240 = 2^240: table build + 240 squarings
    #   e120 = 2^120: table build + 120 squarings
    #   e_mix: same squarings as e240 plus 60 extra nonzero windows
    # t_sq = (T(e240) - T(e120)) / 120;  t_mul = (T(mix) - T(e240)) / 60.
    # These are the DENOMINATOR constants for the MFU model: unlike the
    # lone mul_tiled rate (whose dispatch-free in-kernel ops are ~1.4x
    # cheaper, making r4 MFUs land above 1.0), they price ops as the
    # fused kernels actually pay them.
    if jax.devices()[0].platform != "tpu":
        # the fused chain is a Mosaic kernel; on CPU report nothing and
        # let the MFU block fall back to absent
        print(json.dumps({{"metric": metric, "sec": None, "batch": 0,
                           "platform": jax.devices()[0].platform}}))
        raise SystemExit(0)
    from zerocaf_tpu.ops.pallas import field_kernels as fk
    n = 1 << 14
    A = jnp.asarray(rng.integers(0, 4096, (n, 22)).astype(np.int32))
    e240 = 1 << 240
    e120 = 1 << 120
    e_mix = 0
    for wdx in range(60):   # 60 nonzero 4-bit windows, LSB-aligned
        e_mix |= 3 << (4 * wdx)
    e_mix |= 1 << 240       # same top structure as e240
    def t_of(e):
        return time_chain(lambda a: fk.pow_tiled(a, e), A, 4)
    t240, t120, tmix = t_of(e240), t_of(e120), t_of(e_mix)
    t_sq = max(t240 - t120, 1e-12) / 120 / n
    t_mul = max(tmix - t240, 1e-12) / 60 / n
    print(json.dumps({{"metric": metric, "sec": t240, "batch": n,
                       "t_sq_ns": t_sq * 1e9, "t_mul_ns": t_mul * 1e9,
                       "platform": jax.devices()[0].platform}}))
    raise SystemExit(0)
elif metric == "msm":
    from zerocaf_tpu.parallel import msm as _msm
    from zerocaf_tpu import EdwardsPoint, Scalar
    # flagship scale by default (BASELINE config 4/5): the dense kernel
    # runs 2^20 in ~0.8 s on v5e, so the full-size number is affordable;
    # CPU CI overrides with a small BENCH_MSM_N
    n = int(os.environ.get("BENCH_MSM_N",
                           1 << 20 if jax.devices()[0].platform == "tpu"
                           else 1 << 16))
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    pts = EdwardsPoint.basepoint_mul(Scalar.random(k1, (n,)))
    sc = Scalar.random(k2, (n,))
    def run_msm():
        out = _msm(pts, sc)  # auto window width + signed digits
        np.asarray(out.X[0])  # host readback: full completion
        return out
    run_msm()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_msm()
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[len(ts) // 2]
    batch = n
else:
    raise SystemExit(2)

print(json.dumps({{"metric": metric, "sec": t, "batch": batch,
                   "platform": jax.devices()[0].platform}}))
"""


def run_metric(metric: str, batch: int, timeout: int) -> dict | None:
    code = CHILD.format(repo=REPO, metric=metric, batch=batch)
    try:
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
    return None


PROBE = """
import jax, jax.numpy as jnp
print((jnp.ones(8, jnp.int32) * 3).sum(), jax.devices()[0].platform)
"""


def tunnel_ready(timeout: int = 90) -> bool:
    """Cheap interpreter-start + tiny-compute probe; the axon tunnel wedge
    blocks at interpreter start, so this fails fast when the TPU grant is
    stranded (killing a wedged probe strands less than killing a compile)."""
    try:
        out = subprocess.run([sys.executable, "-c", PROBE], capture_output=True,
                             text=True, timeout=timeout)
        return out.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    # batch 16384 amortizes per-scan-step overheads (measured: 3x the
    # throughput of 4096 on v5e); CPU CI overrides via BENCH_BATCH.
    batch = int(os.environ.get("BENCH_BATCH", "16384"))
    timeout = int(os.environ.get("BENCH_TIMEOUT", "1200"))
    force_cpu = bool(os.environ.get("BENCH_FORCE_CPU"))

    results = {}
    platform = None
    for metric in ("windowed", "ladder", "fixed_base", "field_mul",
                   "chain_roofline", "ristretto_encode", "msm"):
        if not force_cpu:
            # wait for a healthy tunnel before each compile-heavy child
            import time as _t
            for _ in range(4):
                if tunnel_ready():
                    break
                _t.sleep(60)
        r = run_metric(metric, batch, timeout)
        if r:
            results[metric] = r
            platform = r.get("platform", platform)

    def rate(m):
        r = results.get(m)
        return round(r["batch"] / r["sec"], 1) if r else None

    # --- MFU attribution (the 10^7 north-star gap, made auditable) -------
    # SELF-NORMALIZED model (VERDICT r4 item 5, final form): two absolute
    # calibrations failed to bound the stepped-ladder kernels -- the r4
    # lone-mul_tiled roofline read MFU 1.3-1.4 (in-kernel fused ops are
    # cheaper than a lone mul dispatch) and the r5 pow_tiled chain
    # roofline read 1.8-2.0 (the pow chain's marginal in-chain mul costs
    # ~2.8 ns while the ladder kernels demonstrably pay ~1.2 ns; the pow
    # kernel's per-step select/table overhead lands in its differenced
    # per-op costs).  No measured single-op rate on this rig prices what
    # a fused kernel pays, so the denominator is now the best
    # DEMONSTRATED fused mul-equivalent rate across the measured paths
    # of the same run:
    #   mul_equiv(m)  = n_mul + kappa * n_sq    (kappa = t_sq/t_mul from
    #                   chain_roofline: the sq:mul cost RATIO is the one
    #                   robust output of the chain probe; ~0.43 on v5e)
    #   R_me(m)       = rate(m) * mul_equiv(m)
    #   MFU[m]        = R_me(m) / max_m' R_me(m')   in (0, 1]
    # The best path reads 1.0 by construction (it IS the demonstrated
    # ceiling); every other value reads as "fraction of the chip's best
    # fused-kernel rate this run".  Op mixes (muls, squares) per op;
    # selects/adds/carries excluded, so select-heavy paths (msm's
    # one-hot bucket kernel) legitimately read below 1 -- the gap IS the
    # select/glue share:
    #   windowed w4:  63 x (3 dbl@3M4S + dbl@4M4S + madd@8M) + build
    #   ladder w1:    250 x (dbl@4M4S + madd@8M)
    #   fixed_base:   18 signed-w14 comb steps x 7M mixed adds
    #   ristretto:    2 pow chains (~246 sq + ~30 mul each) + glue
    #   msm dense c6: 42 windows x unified add @10.5M per point
    # Same-run normalization handles the +-15% tunnel variance: rates and
    # the ratio come from one bench invocation.
    OPS_PER_OP = {  # (n_mul, n_sq)
        "windowed": (1386, 1008), "ladder": (3000, 1000),
        "fixed_base": (126, 0), "ristretto_encode": (160, 492),
        "msm": (441, 0)}
    cr = results.get("chain_roofline") or {}
    t_mul_ns, t_sq_ns = cr.get("t_mul_ns"), cr.get("t_sq_ns")
    mfu = {}
    if t_mul_ns and t_sq_ns:
        kappa = t_sq_ns / t_mul_ns
        r_me = {m: rate(m) * (nm + kappa * ns)
                for m, (nm, ns) in OPS_PER_OP.items() if rate(m)}
        ceiling = max(r_me.values(), default=None)
        if ceiling:
            mfu = {m: round(v / ceiling, 4) for m, v in r_me.items()}
    else:
        kappa = ceiling = None

    headline = rate("windowed") or rate("ladder") or rate("fixed_base") or 0.0
    out = {
        "metric": "scalar_mults_per_sec_per_chip",
        "value": headline,
        "unit": "ops/s",
        "vs_baseline": round(headline / 1e7, 6) if headline else 0.0,
        "platform": platform,
        "batch": batch,
        "ladder_mults_per_sec": rate("ladder"),
        "fixed_base_mults_per_sec": rate("fixed_base"),
        "field_muls_per_sec": rate("field_mul"),
        "ristretto_roundtrips_per_sec": rate("ristretto_encode"),
        "msm_points_per_sec": rate("msm"),
        "msm_points": results.get("msm", {}).get("batch"),
        "msm_wall_s": round(results["msm"]["sec"], 4) if "msm" in results else None,
        "mfu": mfu,
        "mfu_model_ops_per_op": {m: {"mul": v[0], "sq": v[1]}
                                 for m, v in OPS_PER_OP.items()},
        "mfu_ceiling_mul_equiv_per_sec": round(ceiling, 1) if ceiling else None,
        "mfu_sq_mul_cost_ratio": round(kappa, 4) if kappa else None,
        "chain_probe_ns": {"t_mul": round(t_mul_ns, 4) if t_mul_ns else None,
                           "t_sq": round(t_sq_ns, 4) if t_sq_ns else None},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
