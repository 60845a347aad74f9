"""StrongSORT: DeepSORT++ with NSA Kalman, ECC camera compensation and a
single fused motion+appearance stage (reference tracker/strongsort.py:
20-250).

Schedule:
  1. optional ECC warp applied BEFORE predict (:138-142, unlike BoT-SORT)
  2. fused cost gamma*IoU + (1-gamma)*euclidean-embedding over the pool
     at 0.7 (:148-155, gamma=0.1); NSA KF scales measurement noise by
     (1 - conf) on update (kalman 'strongsort', forced by track.py:70-71)
  3. unmatched Tracked rows vs leftovers, IoU @0.5 (:168-177)
  4. unconfirmed vs leftovers with the same fused cost @0.7 (:199-209);
     births at score > conf + 0.1; lost pruning; dedup.

Features are EMA-smoothed (use_avg default True) and compared with plain
euclidean distance on the *raw-magnitude* det features (matching.py:97-98
— only cosine normalizes), matching the reference.

Reference quirk replicated exactly: the step-4 lost-marking indexes
``strack_pool`` with ``u_tracks0``-relative indices (strongsort.py:
194-197) — the slab reproduces the affected set via the list-order keys
(slab.misindexed_lost_mask), golden vs the reference's own code in
tests/test_reference_tracker_golden2.py. AFLink and GSI are flagged
TODO in the reference (:34-39) and surfaced here via eval-time
postprocessing (see reid/aflink.py, eval/gsi.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import boxes as boxops
from ..ops.assignment import solve_assignment as masked_assignment
from . import appearance as A
from . import slab as S
from .registry import register


def _fused(slab, dets, fmt, gamma):
    iou = boxops.iou_distance(S.track_tlbr(slab, fmt), dets.tlbr)
    emb = A.euclidean_distance(slab.feature, dets.feature)
    return gamma * iou + (1.0 - gamma) * emb


@register("strongsort", feature_dim=512)
def strongsort_step(slab: S.TrackSlab, dets: S.DetSlab,
                    cfg: S.TrackerConfig):
    fmt = cfg.kalman_format  # forced 'strongsort' (NSA)
    slab = slab._replace(frame=slab.frame + 1)
    # once per frame, before any key assignment (see _seq_base)
    slab = S.rebase_seq_keys(slab)
    dmask = dets.valid & (dets.score > cfg.conf_thresh)

    pmask = S.pool_mask(slab)
    slab = A.apply_gmc(slab, dets.warp, pmask)  # ECC before predict
    slab = S.predict_pool(slab, fmt, pmask)
    pool_rank = S.pool_order_rank(slab, pmask)

    # stage 1: fused motion+appearance @0.7
    cost = _fused(slab, dets, fmt, cfg.gamma)
    cost = jnp.where(dmask[None, :], cost, 1e9)
    r2c, c2r = masked_assignment(cost, pmask, dmask, 0.7)
    was_tracked = slab.state == S.TRACKED
    slab = S.apply_matches(slab, dets, r2c, fmt, cfg, pool_rank=pool_rank)

    # stage 2: IoU @0.5 over unmatched Tracked rows
    u_tracks0 = pmask & (r2c < 0) & was_tracked
    u_dets0 = dmask & (c2r < 0)
    cost2 = boxops.iou_distance(S.track_tlbr(slab, fmt), dets.tlbr)
    r2c2, c2r2 = masked_assignment(cost2, u_tracks0, u_dets0, 0.5)
    slab = S.apply_matches(slab, dets, r2c2, fmt, cfg)
    # reference step-4 mis-indexed lost-marking (strongsort.py:194-197)
    wrong_lost = S.misindexed_lost_mask(
        slab, pool_rank, u_tracks0, u_tracks0 & (r2c2 < 0), pmask
    )
    slab = S.mark_lost_ordered(slab, wrong_lost, pool_rank,
                               dets.tlbr.shape[0])

    # stage 3: unconfirmed with fused cost @0.7
    umask = S.unconfirmed_mask(slab)
    u_dets1 = u_dets0 & (c2r2 < 0)
    cost3 = _fused(slab, dets, fmt, cfg.gamma)
    r2c3, c2r3 = masked_assignment(cost3, umask, u_dets1, 0.7)
    slab = S.apply_matches(slab, dets, r2c3, fmt, cfg)
    slab = S.mark_removed(slab, umask & (r2c3 < 0))

    new_mask = u_dets1 & (c2r3 < 0) & (dets.score > cfg.conf_thresh + 0.1)
    slab = S.init_new_tracks(slab, dets, new_mask, fmt, cfg)

    slab = S.prune_lost(slab, cfg.max_time_lost)
    slab = S.remove_duplicates(slab, fmt)
    return slab, S.frame_output(slab, fmt, cfg)
