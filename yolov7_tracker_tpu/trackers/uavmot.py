"""UAVMOT: ByteTrack-style association with an adaptive-motion rematch
using local structure similarity (reference tracker/uavmot.py:106-279).

Stage 1 matches pool vs high dets at 0.7; if anything matched, the cost
is re-fused with the structure-similarity distance at lambda = 0.98
(matching.local_relation_fuse_motion, matching.py:284-310) and the match
is REDONE at 0.8 — the rematch result is what commits (uavmot.py:182-190).
Structure vectors are [max neighbor dist, min neighbor dist, included
angle] within radius 400px (matching.py:344-386); track centers come
from the KF mean, det centers from the floor-div xywh quirk
(AMF_STrack.get_xy, uavmot.py:59-63).

Reference quirks replicated exactly (golden vs the reference's own code
in tests/test_reference_tracker_golden2.py):
  * the step-4 lost-marking indexes ``strack_pool`` with
    ``u_tracks0``-relative indices (uavmot.py:227-230, same off-by-list
    indexing as deepsort.py:174-177) — reproduced via the slab's
    list-order keys (slab.misindexed_lost_mask);
  * the AMF rematch gate is ``matched_pair0.any()`` (uavmot.py:182):
    a lone (0, 0) match counts as "nothing matched" and skips the
    structure-fused rematch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import boxes as boxops
from ..ops.assignment import solve_assignment as masked_assignment
from . import appearance as A
from . import slab as S
from .registry import register


@register("uavmot")
def uavmot_step(slab: S.TrackSlab, dets: S.DetSlab, cfg: S.TrackerConfig):
    fmt = cfg.kalman_format
    slab = slab._replace(frame=slab.frame + 1)
    # once per frame, before any key assignment (see _seq_base)
    slab = S.rebase_seq_keys(slab)

    low_conf = max(0.15, cfg.conf_thresh - 0.3)
    high = dets.valid & (dets.score >= cfg.conf_thresh)
    low = dets.valid & ~high & (dets.score > low_conf)

    pmask = S.pool_mask(slab)
    slab = S.predict_pool(slab, fmt, pmask)
    pool_rank = S.pool_order_rank(slab, pmask)

    # stage 1: IoU @0.7, then structure-fused rematch @0.8
    cost = boxops.iou_distance(S.track_tlbr(slab, fmt), dets.tlbr)
    r2c_a, _ = masked_assignment(cost, pmask, high, 0.7)
    # matched_pair0.any() (uavmot.py:182): the rematch runs only when
    # some match has a NONZERO index in the reference's (K, 2) pair
    # array — rows are strack_pool positions, cols are D_high
    # positions, so a lone (pool[0], D_high[0]) match is treated as
    # "nothing matched" by numpy's any() and skips the rematch
    high_pos = jnp.cumsum(high.astype(jnp.int32)) - 1
    det_idx_a = jnp.clip(r2c_a, 0, dets.tlbr.shape[0] - 1)
    any_matched = jnp.any(
        (r2c_a >= 0) & ((pool_rank > 0) | (high_pos[det_idx_a] > 0))
    )

    track_xy = slab.mean[:, :2]
    det_xy = boxops.tlwh_to_xywh(dets.tlwh)[:, :2]
    sdist = A.structure_distance(track_xy, pmask, det_xy, high)
    fused = 0.98 * cost + 0.02 * sdist
    r2c_b, c2r_b = masked_assignment(fused, pmask, high, 0.8)

    r2c = jnp.where(any_matched, r2c_b, r2c_a)
    d = dets.tlbr.shape[0]
    c2r = jnp.full((d,), -1, jnp.int32).at[
        jnp.where(r2c >= 0, r2c, d)
    ].set(
        jnp.where(r2c >= 0, jnp.arange(slab.capacity, dtype=jnp.int32), -1),
        mode="drop",
    )
    was_tracked = slab.state == S.TRACKED
    slab = S.apply_matches(slab, dets, r2c, fmt, cfg, pool_rank=pool_rank)

    # stages 2 + 3 solved in LOCKSTEP (exact semantics, see
    # bytetrack.py): stage 2 (Tracked leftovers vs low @0.5) and
    # stage 3 (unconfirmed vs u_dets0 @0.7) both depend only on
    # stage 1, so the two independent solves batch into one vmapped
    # auction.
    u_tracks0 = pmask & (r2c < 0) & was_tracked
    umask = S.unconfirmed_mask(slab)
    u_high = high & (c2r < 0)
    cost23 = boxops.iou_distance(S.track_tlbr(slab, fmt), dets.tlbr)
    r2c_s, c2r_s = jax.vmap(
        masked_assignment, in_axes=(None, 0, 0, 0)
    )(
        cost23,
        jnp.stack([u_tracks0, umask]),
        jnp.stack([low, u_high]),
        jnp.asarray([0.5, 0.7], jnp.float32),
    )
    r2c2, r2c3 = r2c_s[0], r2c_s[1]
    c2r3 = c2r_s[1]
    slab = S.apply_matches(slab, dets, r2c2, fmt, cfg)
    # reference step-4 mis-indexed lost-marking (uavmot.py:227-230)
    wrong_lost = S.misindexed_lost_mask(
        slab, pool_rank, u_tracks0, u_tracks0 & (r2c2 < 0), pmask
    )
    slab = S.mark_lost_ordered(slab, wrong_lost, pool_rank,
                               dets.tlbr.shape[0])
    slab = S.apply_matches(slab, dets, r2c3, fmt, cfg)
    slab = S.mark_removed(slab, umask & (r2c3 < 0))

    # births
    new_mask = u_high & (c2r3 < 0) & (dets.score > cfg.conf_thresh + 0.1)
    slab = S.init_new_tracks(slab, dets, new_mask, fmt, cfg)

    slab = S.prune_lost(slab, cfg.max_time_lost)
    slab = S.remove_duplicates(slab, fmt)
    return slab, S.frame_output(slab, fmt, cfg)
