"""Two-process jax.distributed CPU smoke (VERDICT r2 item 5).

Exercises the REAL multi-process path the single-process tests fake with
virtual devices: each process owns one CPU device, `initialize_distributed`
(zerocaf_tpu/parallel/mesh.py) wires the coordination service, and a
sharded MSM runs over the global 2-device mesh -- per-process local
Pippenger partials, cross-process all_gather (the DCN-analogue collective),
local tree-reduce, verified against the big-int oracle on every process.

Run one worker per process:

    python tools/dist_smoke.py <process_id> <num_processes> <port>

tests/test_distributed.py launches both workers and checks for the OK line.
"""

import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU tunnel
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(pid: int, nprocs: int, port: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from zerocaf_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(coordinator=f"localhost:{port}",
                           num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.local_device_count() == 1

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from zerocaf_tpu import constants as C
    from zerocaf_tpu import native
    from zerocaf_tpu import oracle as o
    from zerocaf_tpu.parallel.comm import Communicator
    from zerocaf_tpu.parallel.msm import _msm_local, _tree_reduce

    mesh = Mesh(np.array(jax.devices()), ("data",))

    # 8 points per process: k_i * B with k_i = 1..16; each process prepares
    # only ITS rows (multi-controller style), the global array is assembled
    # from process-local shards.
    n_per, c = 8, 4
    nwin = -(-251 // c)
    n = nprocs * n_per
    ks = np.arange(1, n + 1)
    lo = pid * n_per
    local_pts = np.stack([
        C.point_limbs(o.scalar_mul(o.BASEPOINT, int(k)))
        for k in ks[lo:lo + n_per]])  # [n_per, 4, 22]
    sk_bytes = np.stack([
        np.frombuffer(int(k).to_bytes(32, "little"), np.uint8)
        for k in ks[lo:lo + n_per]])
    local_win = native.windows(sk_bytes, c, nwin).astype(np.int32)

    sh = NamedSharding(mesh, P("data"))

    def mk(local, gshape):
        return jax.make_array_from_process_local_data(sh, local, gshape)

    pt = tuple(mk(np.ascontiguousarray(local_pts[:, i]), (n, 22))
               for i in range(4))
    win = mk(local_win, (n, nwin))

    comm = Communicator("data")

    def local(pt_shard, win_shard):
        partial = _msm_local(pt_shard, win_shard, c=c, nwin=nwin)
        g = comm.all_gather_points(tuple(x[None] for x in partial))
        g = tuple(x.reshape(-1, 22) for x in g)
        return _tree_reduce(g)

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(tuple(P("data") for _ in range(4)), P("data")),
        out_specs=tuple(P() for _ in range(4)),
        check_vma=False))
    out = fn(pt, win)

    # replicated output: every process holds a full local copy
    got = tuple(
        int(o.limbs_to_int(
            np.asarray(x.addressable_shards[0].data).astype(np.int64))) % o.P
        for x in out)
    # points are k_i*B and scalars are k_i, so the aggregate is (sum k_i^2)*B
    expected = o.scalar_mul(o.BASEPOINT, int((ks.astype(object) ** 2).sum()) % o.R)
    assert o.point_eq(got, expected), (got, expected)
    print(f"DIST_SMOKE_OK pid={pid} nprocs={nprocs} n={n}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
