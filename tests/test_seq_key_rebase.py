"""Seq-key rebasing: list-order replication must not depend on the
absolute frame counter.

ins_seq/lost_seq only encode RELATIVE pool order; rebase_seq_keys
compresses them to dense ranks once per frame so they stay bounded by
capacity + per-frame offsets forever. The previous frame-scaled bases
(frame * k) overflowed int32 after ~125k frames at CLI-default
capacities (~70 min of 30 fps video), silently corrupting the pool
order that deepsort/strongsort/uavmot/deepmot's misindexed-lost
replication depends on.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from yolov7_tracker_tpu.trackers import TrackerConfig, init_slab, build_tracker
from yolov7_tracker_tpu.trackers import slab as S
from tests.test_trackers_golden import (
    compare, run_slab_tracker, synth_stream,
)

# far enough that the old frame * k seq base wraps int32 immediately
# (k ~ 1e3 at these capacities), while frame + stream length stays int32
OFFSET = 100_000_000


def test_rebase_preserves_order():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(-2**31, 2**31 - 1, 64, np.int64)
                       .astype(np.int32))
    slab = init_slab(TrackerConfig(tracker="uavmot", capacity=64,
                                   det_capacity=16))
    rebased = S.rebase_seq_keys(slab._replace(ins_seq=keys, lost_seq=keys))
    # dense rank in [0, T), same sort order
    for k2 in (rebased.ins_seq, rebased.lost_seq):
        assert int(k2.min()) == 0 and int(k2.max()) == 63
        np.testing.assert_array_equal(
            np.argsort(np.asarray(keys), kind="stable"),
            np.argsort(np.asarray(k2), kind="stable"),
        )


def _run_with_frame_offset(stream, cfg, offset):
    """run_slab_tracker, but the slab starts at a huge absolute frame
    (frame-difference fields shifted consistently, as if the stream were
    the tail of a very long video)."""
    step, cfg = build_tracker(cfg)
    slab = init_slab(cfg)
    slab = slab._replace(
        frame=slab.frame + offset,
        frame_id=slab.frame_id + offset,
        start_frame=slab.start_frame + offset,
    )
    results = []
    for dets in stream:
        det_slab = S.make_det_slab(
            cfg, dets[:, :4], dets[:, 4], dets[:, 5],
            np.ones(len(dets), bool),
        )
        slab, out = step(slab, det_slab)
        ids = np.asarray(out.track_id)
        valid = np.asarray(out.valid)
        tlwh = np.asarray(out.tlwh)
        score = np.asarray(out.score)
        results.append({
            int(ids[i]): (tlwh[i], float(score[i]))
            for i in range(len(ids)) if valid[i]
        })
    # the invariant that kills frame-scaled key schemes: keys stay
    # bounded by capacity + one frame's worth of offsets, forever
    bound = (2 * cfg.capacity + cfg.det_capacity
             + (cfg.max_time_lost + 2) * cfg.capacity)
    assert int(jnp.max(slab.ins_seq)) < bound
    assert int(jnp.max(slab.lost_seq)) < bound
    return results


@pytest.mark.slow  # two tracker-step compiles (~25s each on 1 core)
@pytest.mark.parametrize("tracker", ["uavmot", "deepsort"])
def test_ids_invariant_to_absolute_frame(tracker):
    kw = dict(conf_thresh=0.5, capacity=64, det_capacity=32)
    if tracker == "deepsort":
        kw["feature_dim"] = 8  # the cascade/misindexed-lost step runs
    cfg = TrackerConfig(tracker=tracker, **kw)
    stream = synth_stream(11, frames=40)
    # both runs start mid-video (frame != 1) so the reference's
    # first-frame instant-activation special case (basetrack.py:239-240)
    # applies to neither; only the absolute frame magnitude differs
    base = _run_with_frame_offset(stream, cfg, 5)
    shifted = _run_with_frame_offset(stream, cfg, OFFSET)
    compare(shifted, base)
