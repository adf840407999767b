"""Multi-chip tests on the virtual 8-device CPU mesh (conftest.py).

The core requirement (SURVEY.md section 4): the same MSM on 1 device vs N
devices must be bit-identical -- EC adds are exact integer math, so any
reduction order agrees once every partial is canonically reduced.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zerocaf_tpu import EdwardsPoint, Scalar
from zerocaf_tpu import oracle as o
from zerocaf_tpu.config import MeshConfig
from zerocaf_tpu.parallel import (batch_sharding, make_mesh, msm, msm_sharded)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def make_inputs(n, seed=3):
    rng = np.random.default_rng(seed)
    ks = [int.from_bytes(rng.bytes(31), "little") % o.R for _ in range(n)]
    base_ks = [int.from_bytes(rng.bytes(31), "little") % o.R for _ in range(n)]
    pts_o = [o.scalar_mul(o.BASEPOINT, bk) for bk in base_ks]
    arr = np.stack([[o.int_to_limbs(c) for c in p] for p in pts_o]).astype(np.int32)
    pts = EdwardsPoint(*(jnp.asarray(arr[:, i]) for i in range(4)))
    return pts, Scalar.from_int(np.array(ks, dtype=object)), pts_o, ks


class TestShardedMSM:
    def test_sharded_equals_single_device_bitexact(self):
        mesh = make_mesh(MeshConfig(n_devices=8))
        pts, scalars, pts_o, ks = make_inputs(64)
        single = msm(pts, scalars, c=8)

        sh = batch_sharding(mesh)
        pts_s = EdwardsPoint(*(jax.device_put(c, sh) for c in pts._tuple()))
        sc_s = Scalar(jax.device_put(scalars.limbs, sh))
        sharded = msm_sharded(pts_s, sc_s, mesh, c=8)

        # bit-exact: canonical byte encodings identical
        a = np.asarray(single.compress())
        b = np.asarray(sharded.compress())
        assert (a == b).all()
        expect = o.msm(pts_o, ks)
        assert o.point_eq(tuple(int(v) for v in sharded.to_ints()), expect)

    def test_mesh_sizes(self):
        pts, scalars, pts_o, ks = make_inputs(32, seed=9)
        expect = o.msm(pts_o, ks)
        for nd in (2, 4):
            mesh = make_mesh(MeshConfig(n_devices=nd))
            sh = batch_sharding(mesh)
            pts_s = EdwardsPoint(*(jax.device_put(c, sh) for c in pts._tuple()))
            sc_s = Scalar(jax.device_put(scalars.limbs, sh))
            out = msm_sharded(pts_s, sc_s, mesh, c=8)
            assert o.point_eq(tuple(int(v) for v in out.to_ints()), expect), nd

    def test_window_sharded_combine(self):
        """shard_combine=True (each device combines nwin/D windows; the
        docs/SCALING.md Amdahl fix) is bit-exact vs the replicated
        combine at every mesh size, incl. nwin not divisible by D
        (c=8 -> nwin=32; c=6 -> nwin=42, not divisible by 4 or 8)."""
        pts, scalars, pts_o, ks = make_inputs(32, seed=13)
        expect = o.msm(pts_o, ks)
        for nd, c in ((2, 8), (4, 6), (8, 6)):
            mesh = make_mesh(MeshConfig(n_devices=nd))
            sh = batch_sharding(mesh)
            pts_s = EdwardsPoint(*(jax.device_put(v, sh) for v in pts._tuple()))
            sc_s = Scalar(jax.device_put(scalars.limbs, sh))
            out = msm_sharded(pts_s, sc_s, mesh, c=c, shard_combine=True)
            assert o.point_eq(tuple(int(v) for v in out.to_ints()),
                              expect), (nd, c)

    def test_dense_sharded_replicated_combine(self):
        """msm_sharded(dense=True) WITHOUT shard_combine (each device runs
        the dense kernel then combines all windows locally) at trivial
        size -- fast off-TPU regression coverage for the dense sharded
        route (VERDICT r4 item 8).  c=4 keeps the interpret-mode kernel
        small (nb=9)."""
        pts, scalars, pts_o, ks = make_inputs(16, seed=31)
        expect = o.msm(pts_o, ks)
        mesh = make_mesh(MeshConfig(n_devices=2))
        sh = batch_sharding(mesh)
        pts_s = EdwardsPoint(*(jax.device_put(v, sh) for v in pts._tuple()))
        sc_s = Scalar(jax.device_put(scalars.limbs, sh))
        out = msm_sharded(pts_s, sc_s, mesh, c=4, dense=True)
        assert o.point_eq(tuple(int(v) for v in out.to_ints()), expect)

    def test_dense_sharded_rejects_unsigned(self):
        import pytest
        pts, scalars, _, _ = make_inputs(16, seed=32)
        mesh = make_mesh(MeshConfig(n_devices=2))
        with pytest.raises(ValueError, match="signed"):
            msm_sharded(pts, scalars, mesh, c=4, dense=True, signed=False)

    def test_dense_shard_combine_pod_config(self):
        """The full pod configuration -- dense VMEM bucket kernel
        (interpret-mode off-TPU) + window-sharded combine -- on a
        2-device mesh vs the oracle.  ~2-3 min on the CI host (the
        interpret-mode kernel dominates); this is the one test covering
        exactly what tools/pod_msm.py --dense --shard-combine runs."""
        pts, scalars, pts_o, ks = make_inputs(24, seed=21)
        expect = o.msm(pts_o, ks)
        mesh = make_mesh(MeshConfig(n_devices=2))
        sh = batch_sharding(mesh)
        pts_s = EdwardsPoint(*(jax.device_put(v, sh) for v in pts._tuple()))
        sc_s = Scalar(jax.device_put(scalars.limbs, sh))
        out = msm_sharded(pts_s, sc_s, mesh, dense=True, shard_combine=True)
        assert o.point_eq(tuple(int(v) for v in out.to_ints()), expect)


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (args[0].shape[0], 32)

    def test_dryrun_multichip(self):
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)
