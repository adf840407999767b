"""Serving-shape API: fixed-batch, donation-friendly, wire-in/wire-out.

The reference is a library of single-value ops; the production TPU shape is
a pinned-batch pipeline: 32-byte wire arrays in, 32-byte wire arrays out,
one jitted graph per (op, batch), input buffers donated so steady-state
serving allocates nothing.  This module packages the four protocol
workloads a zerocaf user deploys:

  * keygen:        seed bytes -> (secret scalar bytes, Ristretto public key)
  * dh:            secret bytes + peer public key -> shared secret
  * hash_to_group: 64 uniform bytes -> Ristretto point (Elligator x2)
  * msm:           points + scalars -> aggregate point (batch verification)

Ragged traffic pads to the pinned batch (`pad_batch`) -- XLA recompiles per
shape otherwise.  All graphs are compiled lazily on first use and cached on
the instance.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .models.edwards import EdwardsPoint
from .models import ristretto as _ri
from .scalar import Scalar
from .ops import limb as _l


def pad_batch(arr: np.ndarray, batch: int):
    """Pad axis 0 up to `batch`; returns (padded, n_valid)."""
    n = arr.shape[0]
    if n > batch:
        raise ValueError(f"batch {n} exceeds engine batch {batch}")
    if n == batch:
        return arr, n
    pad = np.zeros((batch - n,) + arr.shape[1:], arr.dtype)
    return np.concatenate([arr, pad], axis=0), n


def pad_msm(points_wire: np.ndarray, scalar32: np.ndarray, batch: int):
    """Pad an MSM request to the engine batch: identity wire (32 zero
    bytes, the canonical Ristretto identity encoding) + zero scalars, which
    contribute the identity to the aggregate.  Returns (points, scalars,
    n_valid)."""
    p, n = pad_batch(points_wire, batch)
    s, _ = pad_batch(scalar32, batch)
    return p, s, n


class Engine:
    """Pinned-batch serving engine.

    batch:    the compiled lane count (pad ragged requests with pad_batch).
              Default 32768: the measured v5e sweet spot across every
              pipeline (r4 sweep -- dh 127.7k/143.2k/142.4k ops/s and
              keygen 281k/353k/223k at 16k/32k/64k; 64k lanes regress on
              HBM pressure).
    donate:   donate input device buffers (steady-state zero-alloc).
    """

    def __init__(self, batch: int = 32768, donate: bool = True):
        self.batch = batch
        self._jit = partial(jax.jit, donate_argnums=(0,)) if donate else jax.jit
        self._fns: dict[str, callable] = {}

    # -- pipelines (built lazily, cached) -----------------------------------

    def _fn(self, name, build):
        f = self._fns.get(name)
        if f is None:
            f = self._fns[name] = build()
        return f

    def keygen(self, seed64: jnp.ndarray):
        """[batch, 64] uniform seed bytes -> (sk [batch,32], pk [batch,32]).

        sk is the canonical scalar encoding of the wide-reduced seed; pk is
        the Ristretto wire encoding of sk * B (fixed-base comb)."""
        def build():
            def f(seed):
                sk = Scalar.from_bytes_wide(seed)
                pk = _ri._compress(
                    EdwardsPoint.basepoint_mul(sk)._tuple())
                return sk.to_bytes(), pk
            return self._jit(f)
        return self._fn("keygen", build)(seed64)

    def dh(self, sk32: jnp.ndarray, peer32: jnp.ndarray):
        """[batch, 32] scalar bytes + [batch, 32] peer Ristretto wire ->
        ([batch, 32] shared wire, ok mask).  Invalid peer encodings report
        ok=False (their lanes hold garbage, as the decode mask dictates).

        The secret-scalar multiply uses the signed windowed Pallas path
        (`mul_windowed(use_fused=True)`): its one-hot table select reads
        every entry for every lane, so the access pattern is
        secret-independent -- same constant-time contract as the width-1
        ladder but ~1.6x faster (docs/CONSTANT_TIME.md path table).
        Where that fused path is unavailable (CPU, or use_pallas off) dh
        falls back to the oblivious select-by-bit ladder (`__mul__`) --
        NEVER to the XLA windowed gather, whose take_along_axis access
        pattern is not audited for secret scalars (ADVICE r4)."""
        def build():
            import jax as _jax
            from .config import DEFAULT as _cfg
            fused_ok = _cfg.use_pallas and _jax.default_backend() == "tpu"

            def f(sk, peer):
                s, _ = Scalar.from_bytes(sk)
                p, ok = _ri._decompress(peer)
                if fused_ok:
                    q = EdwardsPoint(*p).mul_windowed(s, use_fused=True)
                else:
                    q = EdwardsPoint(*p) * s  # oblivious select ladder
                return _ri._compress(q._tuple()), ok
            # peer buffer also consumed
            return (jax.jit(f, donate_argnums=(0, 1))
                    if self._jit is not jax.jit else jax.jit(f))
        return self._fn("dh", build)(sk32, peer32)

    def hash_to_group(self, uniform64: jnp.ndarray):
        """[batch, 64] uniform bytes -> [batch, 32] Ristretto wire
        (from_uniform_bytes, ristretto.rs:493-507)."""
        def build():
            def f(b):
                p = _ri.RistrettoPoint.from_uniform_bytes(b)
                return p.compress()
            return self._jit(f)
        return self._fn("hash_to_group", build)(uniform64)

    def msm(self, points_wire: jnp.ndarray, scalar32: jnp.ndarray,
            c: int | None = None, dense: bool | None = None):
        """[batch, 32] Ristretto wire + [batch, 32] scalar bytes ->
        ([32] wire, ok).

        Decodes, checks validity, runs Pippenger, re-encodes.  Lanes with
        invalid point encodings make ok False for the whole aggregate (the
        caller must reject the batch -- matching verifier semantics).

        Pinned-batch pipeline like keygen/dh: the batch axis must equal the
        engine batch (pad ragged traffic with `pad_msm` -- identity wire +
        zero scalars contribute nothing to the sum).

        On TPU the whole pipeline -- decode, dense VMEM bucket MSM
        (parallel/msm._msm_dense), encode -- is ONE jitted graph (one
        dispatch per call); the scan fallback uses three cached jit
        stages per window width c: donated decode, the per-window
        Pippenger kernels (module-level jits, cached by (batch, c)
        shapes), and the combine+encode -- steady-state calls re-trace
        nothing."""
        from .parallel.msm import (_combine_windows, _msm_dense, _use_dense,
                                   _window_buckets_signed, auto_c,
                                   auto_c_dense, signed_digits)

        n = points_wire.shape[0]
        if n != self.batch:
            raise ValueError(
                f"msm batch {n} != engine batch {self.batch}; pad with pad_msm")
        # dense=True off-TPU runs the bucket kernel in interpret mode --
        # the CI escape hatch that keeps the production TPU branch
        # regression-covered without hardware (VERDICT r4 item 7; the
        # bare msm(dense=True) raises off-TPU instead because it cannot
        # set interpret itself).
        interp = jax.default_backend() != "tpu"
        if dense if dense is not None else _use_dense(n, c, False, True, None):
            cd = c if c is not None else auto_c_dense(n)
            nwin_d = -(-251 // cd)

            def build_dense():
                # ONE jitted graph end-to-end (r5): decode + dense MSM +
                # encode.  The r4 three-stage split paid two extra
                # dispatch round trips (~40-60 ms under the tunnel) per
                # call; the dense body is an ordinary jittable function,
                # so there is nothing to stage
                def f(wire, sk):
                    pts, okp = _ri._decompress(wire)
                    s, _ = Scalar.from_bytes(sk)
                    win = s.windows(cd, nwin_d)
                    total = _msm_dense(pts, win, cd, nwin_d,
                                       interpret=interp)
                    return _ri._compress(total), jnp.all(okp)
                return (jax.jit(f, donate_argnums=(0, 1))
                        if self._jit is not jax.jit else jax.jit(f))

            return self._fn(f"msm_dense_c{cd}", build_dense)(
                points_wire, scalar32)
        if c is None:
            c = auto_c(n)
        nwin = -(-251 // c)  # signed-carry coverage (parallel/msm.msm)
        nbuckets = (1 << (c - 1)) + 1

        def build_decode():
            def f(wire, sk):
                pts, okp = _ri._decompress(wire)
                s, _ = Scalar.from_bytes(sk)
                windows = s.windows(c, nwin)
                mag, sgn = signed_digits(windows, c)
                return pts, mag, sgn, jnp.all(okp)
            return (jax.jit(f, donate_argnums=(0, 1))
                    if self._jit is not jax.jit else jax.jit(f))

        def build_encode():
            def f(tables):
                total = _combine_windows(tables, c, nbuckets)
                return _ri._compress(total)
            return jax.jit(f)

        pts, mag, sgn, ok = self._fn(f"msm_decode_c{c}", build_decode)(
            points_wire, scalar32)
        per_w = [_window_buckets_signed(pts, mag[:, w], sgn[:, w], nbuckets)
                 for w in range(nwin)]
        tables = tuple(jnp.stack([pw[i] for pw in per_w]) for i in range(4))
        wire = self._fn(f"msm_encode_c{c}", build_encode)(tables)
        return wire, ok

    # -- pipelined (double-buffered) serving ---------------------------------

    def pipeline(self, name: str, depth: int = 2) -> "Pipeline":
        """Double-buffered wrapper around one Engine op ("keygen", "dh",
        "hash_to_group", "msm"): keeps up to `depth` batches in flight so
        the dispatch of call i+1 overlaps device execution + readback of
        call i.

        This is the product form of the r4 `pipelined_rate` benchmark
        construct (VERDICT r4 item 4): measured v5e dh at batch 32768 is
        143k ops/s strictly sequential vs 230k with two calls in flight --
        the ~4 us/op wire+dispatch cost hides behind execution whenever
        the caller does not serialize readbacks."""
        return Pipeline(getattr(self, name), depth)

    # -- introspection -------------------------------------------------------

    def compiled(self):
        """Names of the pipelines compiled so far."""
        return sorted(self._fns)


class Pipeline:
    """Keeps up to `depth` Engine calls in flight (jax dispatch is async;
    only readback blocks).  Results come back in submission order as host
    numpy arrays (full wire readback -- the serving contract).

    Usage:
        pipe = engine.pipeline("dh", depth=2)
        for req in traffic:
            done = pipe.submit(req.sk, req.peer)   # oldest result or None
            if done is not None:
                emit(done)
        for done in pipe.drain():
            emit(done)
    """

    def __init__(self, call, depth: int = 2):
        if depth < 1:
            raise ValueError(f"pipeline depth must be >= 1, got {depth}")
        from collections import deque
        self._call = call
        self.depth = depth
        self._inflight = deque()

    @staticmethod
    def _readback(out):
        # np.asarray (not block_until_ready): under the axon tunnel
        # block_until_ready can return at the dispatch floor before remote
        # execution finishes (CLAUDE.md); a host copy is the real barrier
        # and IS the serving wire-out.
        return jax.tree_util.tree_map(np.asarray, out)

    def submit(self, *args, **kwargs):
        """Dispatch one batch.  If `depth` batches were already in flight,
        blocks on the OLDEST and returns its result; otherwise returns
        None (the pipeline is still filling)."""
        out = None
        if len(self._inflight) >= self.depth:
            out = self._readback(self._inflight.popleft())
        self._inflight.append(self._call(*args, **kwargs))
        return out

    def collect(self):
        """Block on and return the oldest in-flight result."""
        if not self._inflight:
            raise RuntimeError("pipeline is empty: nothing submitted")
        return self._readback(self._inflight.popleft())

    def drain(self):
        """Collect every remaining in-flight result, oldest first."""
        out = []
        while self._inflight:
            out.append(self._readback(self._inflight.popleft()))
        return out

    def map(self, batches):
        """Generator: feed an iterable of argument tuples through the
        pipeline, yielding results in order with `depth` in flight."""
        for args in batches:
            done = self.submit(*args)
            if done is not None:
                yield done
        yield from self.drain()

    def __len__(self):
        return len(self._inflight)
