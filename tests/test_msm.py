"""MSM tests: Pippenger vs naive vs oracle; checkpoint/resume."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from zerocaf_tpu import EdwardsPoint, Scalar
from zerocaf_tpu import oracle as o
from zerocaf_tpu.parallel import checkpoint, msm, msm_naive

N = 64
rng = np.random.default_rng(11)


def make_inputs(n=N, seed=0):
    ks = [int.from_bytes(rng.bytes(31), "little") % o.R for _ in range(n)]
    base_ks = [int.from_bytes(rng.bytes(31), "little") % o.R for _ in range(n)]
    pts_o = [o.scalar_mul(o.BASEPOINT, bk) for bk in base_ks]
    arr = np.stack([[o.int_to_limbs(c) for c in p] for p in pts_o]).astype(np.int32)
    pts = EdwardsPoint(*(jnp.asarray(arr[:, i]) for i in range(4)))
    return pts, Scalar.from_int(np.array(ks, dtype=object)), pts_o, ks


class TestMSM:
    def test_pippenger_matches_oracle(self):
        pts, scalars, pts_o, ks = make_inputs()
        total = msm(pts, scalars, c=8)
        expect = o.msm(pts_o, ks)
        got = tuple(int(v) for v in total.to_ints())
        assert o.point_eq(got, expect)

    def test_pippenger_matches_naive(self):
        pts, scalars, _, _ = make_inputs()
        a = msm(pts, scalars, c=8)
        b = msm_naive(pts, scalars)
        assert bool(np.asarray(a.eq(b)))

    def test_window_widths_agree(self):
        pts, scalars, pts_o, ks = make_inputs(16)
        expect = o.msm(pts_o[:16], ks[:16])
        for c in (4, 8):
            total = msm(pts, scalars, c=c)
            got = tuple(int(v) for v in total.to_ints())
            assert o.point_eq(got, expect), f"c={c}"

    def test_edge_scalars(self):
        # zeros, ones, r-1
        pts, _, pts_o, _ = make_inputs(8)
        ks = [0, 1, o.R - 1, 0, 2, o.R - 1, 1, 0]
        scalars = Scalar.from_int(np.array(ks, dtype=object))
        total = msm(pts, scalars, c=8)
        expect = o.msm(pts_o[:8], ks)
        got = tuple(int(v) for v in total.to_ints())
        assert o.point_eq(got, expect)


class TestDenseBuckets:
    """The dense VMEM bucket kernel (sort-free Pippenger) must agree with
    the oracle and the scan path bit-for-bit.  Interpret-mode Pallas on
    CPU; N deliberately NOT a multiple of DENSE_LANES (pad lanes carry
    digit 0 and must not contribute)."""

    def test_dense_matches_oracle(self):
        from zerocaf_tpu.parallel.msm import _msm_dense
        pts, scalars, pts_o, ks = make_inputs(600)
        c = 5
        nwin = -(-251 // c)
        windows = scalars.windows(c, nwin)
        total = EdwardsPoint(
            *_msm_dense(pts._tuple(), windows, c, nwin, interpret=True))
        expect = o.msm(pts_o, ks)
        got = tuple(int(v) for v in total.to_ints())
        assert o.point_eq(got, expect)

    def test_dense_kernel_variants_match(self):
        """Grouped K-window kernel (production DENSE_K) == paired (k=2) ==
        one-window (k=1) dense, for both an odd window count (c=5 -> 51,
        exercises the zero-digit pad windows) and an even one (c=6 -> 42)."""
        from zerocaf_tpu.parallel.msm import _msm_dense
        pts, scalars, _, _ = make_inputs(300)
        for c in (5, 6):
            nwin = -(-251 // c)
            windows = scalars.windows(c, nwin)
            a = EdwardsPoint(*_msm_dense(pts._tuple(), windows, c, nwin,
                                         interpret=True))  # k=DENSE_K
            b = EdwardsPoint(*_msm_dense(pts._tuple(), windows, c, nwin,
                                         interpret=True, k=2))
            d = EdwardsPoint(*_msm_dense(pts._tuple(), windows, c, nwin,
                                         interpret=True, k=1))
            assert bool(np.asarray(a.eq(b))), c
            assert bool(np.asarray(a.eq(d))), c

    def test_dense_edge_scalars(self):
        from zerocaf_tpu.parallel.msm import _msm_dense
        pts, _, pts_o, _ = make_inputs(8)
        ks = [0, 1, o.R - 1, 0, 2, o.R - 1, 1, 0]
        scalars = Scalar.from_int(np.array(ks, dtype=object))
        c = 4
        nwin = -(-251 // c)
        windows = scalars.windows(c, nwin)
        total = EdwardsPoint(
            *_msm_dense(pts._tuple(), windows, c, nwin, interpret=True))
        expect = o.msm(pts_o[:8], ks)
        got = tuple(int(v) for v in total.to_ints())
        assert o.point_eq(got, expect)


class TestCheckpoint:
    def test_blockwise_resume(self, tmp_path):
        pts, scalars, pts_o, ks = make_inputs(32)
        path = str(tmp_path / "msm.ckpt")
        full = checkpoint.msm_with_checkpoints(pts, scalars, block_size=8, path=path)
        expect = o.msm(pts_o[:32], ks[:32])
        assert o.point_eq(tuple(int(v) for v in full.to_ints()), expect)
        # simulate a restart from the saved checkpoint: rewind next_block
        part, nb, meta = checkpoint.load(path)
        assert nb == 4
        checkpoint.save(path, part, 2, meta)  # pretend blocks 2..3 were lost
        # recompute blocks 2..3... but partial already has all 4 blocks;
        # instead rebuild from a fresh partial for blocks 0..1:
        half = checkpoint.msm_with_checkpoints(
            pts[:16], scalars[:16], block_size=8, path=str(tmp_path / "h.ckpt"))
        checkpoint.save(path, half, 2, meta)
        resumed = checkpoint.msm_with_checkpoints(
            pts, scalars, block_size=8, path=path)
        assert o.point_eq(tuple(int(v) for v in resumed.to_ints()), expect)

    def test_auto_c_policy(self, tmp_path, monkeypatch):
        """c=None (default) hands each block to msm with c=None, i.e. the
        SAME auto_c window policy as the one-shot path (VERDICT r3 item 7),
        and the blocked sum stays bit-identical to the oracle."""
        import sys
        msm_mod = sys.modules["zerocaf_tpu.parallel.msm"]
        pts, scalars, pts_o, ks = make_inputs(32)
        seen = []
        real = msm_mod.msm

        def spy(points, scalars, c=None, **kw):
            seen.append(c)
            return real(points, scalars, c=c, **kw)

        monkeypatch.setattr(msm_mod, "msm", spy)
        out = checkpoint.msm_with_checkpoints(
            pts, scalars, block_size=16, path=str(tmp_path / "c.ckpt"))
        assert seen == [None, None]
        expect = o.msm(pts_o[:32], ks[:32])
        assert o.point_eq(tuple(int(v) for v in out.to_ints()), expect)

    def test_save_load_roundtrip(self, tmp_path):
        p = EdwardsPoint.basepoint()
        path = str(tmp_path / "x.ckpt")
        checkpoint.save(path, p, 7, {"k": 1})
        q, nb, meta = checkpoint.load(path)
        assert nb == 7 and meta == {"k": 1}
        assert bool(np.asarray(q.eq(p)))


class TestSegmentedScan:
    """The Blelloch exclusive scan must reproduce the Hillis-Steele inclusive
    scan's segment sums for adversarial flag patterns, including non-pow2 N."""

    def _check(self, digits):
        import importlib
        M = importlib.import_module("zerocaf_tpu.parallel.msm")
        n = len(digits)
        pts, _, _, _ = make_inputs(n)
        pt = pts._tuple()
        d = jnp.asarray(np.sort(np.asarray(digits, np.int32)))
        starts = jnp.concatenate(
            [jnp.ones((1,), jnp.int32), (d[1:] != d[:-1]).astype(jnp.int32)])
        # old inclusive path: ends hold sums
        incl = M._segmented_scan_points(pt, starts)
        # new exclusive path + fixup add
        excl = M._seg_exclusive_scan(pt, starts)
        fixed = M._ed._add(excl, pt)
        ends = np.asarray(jnp.concatenate([(d[1:] != d[:-1]),
                                           jnp.ones((1,), bool)]))
        ok = np.asarray(M._ed._eq(incl, fixed))
        assert ok[ends].all()

    def test_all_same_digit(self):
        self._check([5] * 32)

    def test_all_distinct(self):
        self._check(list(range(32)))

    def test_random_nonpow2(self):
        self._check(rng.integers(0, 7, 37).tolist())

    def test_random_pow2(self):
        self._check(rng.integers(0, 5, 64).tolist())

    def test_single(self):
        self._check([3])
