"""Checkpoint / resume for long multi-host MSM jobs.

The reference has no checkpointing; its closest analog is the canonical
to_bytes/from_bytes wire serialization on every type (SURVEY.md section 5),
which we reuse as the checkpoint format: partial sums are stored as canonical
32-byte coordinate encodings, making checkpoints consensus-stable across
limb layouts, hosts and framework versions.

Strategy (SURVEY.md "Failure detection"): a sharded MSM over B point blocks
accumulates one partial point per completed block; after each block the
accumulated partial and the next block index are flushed.  A restarted job
resumes from the last flushed block -- simple retry-on-restore, no elasticity
needed for a deterministic batch workload.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import jax.numpy as jnp

from ..models.edwards import EdwardsPoint
from ..ops import limb as _l
from ..ops.limb import FIELD as _F


def _point_to_bytes(p: EdwardsPoint) -> np.ndarray:
    """[..., 4, 32] uint8: canonical per-coordinate encodings."""
    return np.stack([np.asarray(_l.to_bytes(c, _F)) for c in p._tuple()], axis=-2)


def _point_from_bytes(b: np.ndarray) -> EdwardsPoint:
    coords = [_l.from_bytes(jnp.asarray(b[..., i, :]), _F) for i in range(4)]
    return EdwardsPoint(*coords)


def save(path: str, partial: EdwardsPoint, next_block: int, meta: dict | None = None) -> None:
    """Atomically write a checkpoint (tmp file + rename)."""
    payload = {
        "next_block": int(next_block),
        "meta": meta or {},
    }
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".ckpt.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            header = json.dumps(payload).encode()
            f.write(len(header).to_bytes(8, "little"))
            f.write(header)
            np.save(f, _point_to_bytes(partial))
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load(path: str) -> tuple[EdwardsPoint, int, dict] | None:
    """Returns (partial, next_block, meta) or None if no checkpoint."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        hlen = int.from_bytes(f.read(8), "little")
        payload = json.loads(f.read(hlen).decode())
        arr = np.load(f)
    return _point_from_bytes(arr), payload["next_block"], payload["meta"]


def msm_with_checkpoints(points, scalars, block_size: int, path: str,
                         mesh=None, c: int | None = None):
    """Blockwise MSM with checkpoint after every block; resumes from `path`
    if present.  Exact integer math makes the blocked sum bit-identical to
    the one-shot MSM.

    c=None (default) applies the same auto window-width policy as the
    one-shot `msm` to each block (auto_c of the block size -- long jobs are
    exactly the callers that care about the ~2x auto_c win at scale; see
    BASELINE.md round-3 MSM table)."""
    from .msm import msm as _msm_single
    from .msm import msm_sharded as _msm_sharded

    n = points.shape[0]
    nblocks = -(-n // block_size)
    state = load(path)
    if state is not None:
        acc, start, _ = state
    else:
        acc, start = EdwardsPoint.identity(), 0
    for b in range(start, nblocks):
        sl = slice(b * block_size, min((b + 1) * block_size, n))
        blk_pts = points[sl]
        blk_sc = scalars[sl]
        if mesh is not None:
            part = _msm_sharded(blk_pts, blk_sc, mesh, c=c)
        else:
            part = _msm_single(blk_pts, blk_sc, c=c)
        acc = acc + part
        save(path, acc, b + 1, {"n": n, "block_size": block_size})
    return acc
