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
        (`mul_windowed`): its one-hot table select reads every entry for
        every lane, so the access pattern is secret-independent -- same
        constant-time contract as the width-1 ladder but ~1.6x faster
        (docs/CONSTANT_TIME.md path table)."""
        def build():
            def f(sk, peer):
                s, _ = Scalar.from_bytes(sk)
                p, ok = _ri._decompress(peer)
                q = EdwardsPoint(*p).mul_windowed(s)
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
            c: int | None = None):
        """[batch, 32] Ristretto wire + [batch, 32] scalar bytes ->
        ([32] wire, ok).

        Decodes, checks validity, runs Pippenger, re-encodes.  Lanes with
        invalid point encodings make ok False for the whole aggregate (the
        caller must reject the batch -- matching verifier semantics).

        Pinned-batch pipeline like keygen/dh: the batch axis must equal the
        engine batch (pad ragged traffic with `pad_msm` -- identity wire +
        zero scalars contribute nothing to the sum).

        On TPU the aggregation runs through the dense VMEM bucket kernel
        (parallel/msm._msm_dense, one jitted graph); otherwise three
        cached jit stages per window width c: donated decode, the
        per-window Pippenger kernels (module-level jits, cached by
        (batch, c) shapes), and the combine+encode -- steady-state calls
        re-trace nothing."""
        from .parallel.msm import (_combine_windows, _msm_dense, _use_dense,
                                   _window_buckets_signed, auto_c,
                                   auto_c_dense, signed_digits)

        n = points_wire.shape[0]
        if n != self.batch:
            raise ValueError(
                f"msm batch {n} != engine batch {self.batch}; pad with pad_msm")
        if _use_dense(n, c, False, True, None):
            cd = c if c is not None else auto_c_dense(n)
            nwin_d = -(-251 // cd)

            def build_decode_d():
                def f(wire, sk):
                    pts, okp = _ri._decompress(wire)
                    s, _ = Scalar.from_bytes(sk)
                    return pts, s.windows(cd, nwin_d), jnp.all(okp)
                return (jax.jit(f, donate_argnums=(0, 1))
                        if self._jit is not jax.jit else jax.jit(f))

            def build_encode_d():
                return jax.jit(lambda total: _ri._compress(total))

            pts, win, ok = self._fn(f"msm_decode_dense_c{cd}",
                                    build_decode_d)(points_wire, scalar32)
            total = _msm_dense(pts, win, cd, nwin_d)
            wire = self._fn("msm_encode_dense", build_encode_d)(total)
            return wire, ok
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

    # -- introspection -------------------------------------------------------

    def compiled(self):
        """Names of the pipelines compiled so far."""
        return sorted(self._fns)
