"""DeepSORT: appearance-first cascade tracker
(reference tracker/deepsort.py:11-227) as a jitted slab step.

Schedule:
  1. matching_cascade (depth = max_time_lost) over the pool with the
     gated metric: nearest-history cosine distance, clipped at 0.15 and
     chi2-gated by Kalman Mahalanobis distance (deepsort.py:42-77,134);
  2. unmatched *Tracked* rows vs leftover dets, IoU @0.5 (:149-170);
  3. unconfirmed vs leftovers, IoU @0.9; births if score > conf_thresh
     (no +0.1 here, :195-199); prune lost; dedup.

Reference quirk replicated exactly: step 4 indexes ``strack_pool`` with
indices that belong to the filtered ``u_tracks0`` list
(deepsort.py:174-177), marking the pool members at those POSITIONS lost
rather than the unmatched tracks themselves. The slab carries the
reference's list-order keys (slab.ins_seq/lost_seq) to reproduce the
affected set bit-for-bit (see slab.misindexed_lost_mask); golden vs the
reference's own code in tests/test_reference_tracker_golden2.py.

Features: per-track ring buffer (budget 100, no EMA —
use_avg_of_feature=False, deepsort.py:112).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import boxes as boxops
from ..ops.assignment import solve_assignment as masked_assignment
from . import appearance as A
from . import slab as S
from .registry import register


@register(
    "deepsort",
    feature_dim=512,
    feature_hist=32,
    use_avg_of_feature=False,
)
def deepsort_step(slab: S.TrackSlab, dets: S.DetSlab, cfg: S.TrackerConfig):
    fmt = cfg.kalman_format
    slab = slab._replace(frame=slab.frame + 1)
    # once per frame, before any key assignment (see _seq_base)
    slab = S.rebase_seq_keys(slab)
    dmask = dets.valid & (dets.score > cfg.conf_thresh)

    pmask = S.pool_mask(slab)
    slab = S.predict_pool(slab, fmt, pmask)
    pool_rank = S.pool_order_rank(slab, pmask)

    # stage 1: gated appearance cascade @0.9
    app = A.nearest_embedding_distance(
        slab.feat_hist, slab.feat_count, dets.feature
    )
    cost = A.gate_cost_matrix(app, slab, dets, fmt)
    r2c, c2r = A.matching_cascade(
        cost, slab, pmask, dmask, 0.9, cfg.max_time_lost
    )
    was_tracked = slab.state == S.TRACKED
    slab = S.apply_matches(slab, dets, r2c, fmt, cfg, pool_rank=pool_rank,
                           cascade_refind_order=True)

    # stage 2: IoU on unmatched Tracked rows @0.5
    u_tracks0 = pmask & (r2c < 0) & was_tracked
    u_dets0 = dmask & (c2r < 0)
    cost2 = boxops.iou_distance(S.track_tlbr(slab, fmt), dets.tlbr)
    r2c2, c2r2 = masked_assignment(cost2, u_tracks0, u_dets0, 0.5)
    slab = S.apply_matches(slab, dets, r2c2, fmt, cfg)
    # reference step-4 mis-indexed lost-marking (deepsort.py:174-177)
    wrong_lost = S.misindexed_lost_mask(
        slab, pool_rank, u_tracks0, u_tracks0 & (r2c2 < 0), pmask
    )
    slab = S.mark_lost_ordered(slab, wrong_lost, pool_rank,
                               dets.tlbr.shape[0])

    # stage 3: unconfirmed @0.9
    umask = S.unconfirmed_mask(slab)
    u_dets1 = u_dets0 & (c2r2 < 0)
    cost3 = boxops.iou_distance(S.track_tlbr(slab, fmt), dets.tlbr)
    r2c3, c2r3 = masked_assignment(cost3, umask, u_dets1, 0.9)
    slab = S.apply_matches(slab, dets, r2c3, fmt, cfg)
    slab = S.mark_removed(slab, umask & (r2c3 < 0))

    # births: score > conf_thresh (deepsort.py:197)
    new_mask = u_dets1 & (c2r3 < 0) & (dets.score > cfg.conf_thresh)
    slab = S.init_new_tracks(slab, dets, new_mask, fmt, cfg)

    slab = S.prune_lost(slab, cfg.max_time_lost)
    slab = S.remove_duplicates(slab, fmt)
    return slab, S.frame_output(slab, fmt, cfg)
