"""Sequence-parallel tracking over the device mesh.

The reference's per-sequence loop (track.py:123) is embarrassingly
parallel — tracker state never crosses sequences. On a mesh, sequences
shard over the data axis: each device scans its shard of sequences with
the full (vmapped) tracker step; no collectives are needed in the hot
loop, so throughput scales linearly over ICI. The detector batches
frames across the same shard.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..trackers import slab as S


def make_sharded_tracker(step: Callable, mesh: Mesh, axis: str = "data"):
    """Return jitted (slabs (S, ...), det_streams (T, S, ...)) ->
    (slabs, outputs) with the sequence dimension sharded over the mesh."""
    vstep = jax.vmap(step)

    def scan(slabs, det_streams):
        def body(slabs, dets):
            slabs, out = vstep(slabs, dets)
            return slabs, out

        return jax.lax.scan(body, slabs, det_streams)

    seq_sharded = NamedSharding(mesh, P(axis))
    frame_seq_sharded = NamedSharding(mesh, P(None, axis))
    return jax.jit(
        scan,
        in_shardings=(seq_sharded, frame_seq_sharded),
        out_shardings=(seq_sharded, frame_seq_sharded),
    )


def stack_slabs(cfg, n: int):
    """n fresh slabs stacked on a leading sequence axis."""
    slab = S.init_slab(cfg)
    return jax.tree.map(lambda x: np.stack([np.asarray(x)] * n), slab)
