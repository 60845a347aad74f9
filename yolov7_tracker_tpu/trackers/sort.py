"""SORT — the base association schedule (reference BaseTracker.update,
tracker/basetrack.py:368-487) as one pure jitted slab step.

Schedule per frame:
  1. gate detections at conf_thresh (basetrack.py:387)
  2. KF-predict the pool (activated Tracked + Lost), IoU-cost Hungarian
     at iou_thresh (:408-426)
  3. unmatched Tracked pool members -> Lost (:428-433)
  4. unconfirmed tracks vs leftover detections at iou_thresh + 0.1
     (:435-453); unmatched unconfirmed -> Removed
  5. leftover detections with score > conf_thresh + 0.1 -> new tracks (:456-461)
  6. prune Lost older than max_time_lost (:462-466), dedup tracked/lost (:477)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import boxes as boxops
from ..ops.assignment import solve_assignment as masked_assignment
from . import slab as S
from .registry import register


@register("sort")
def sort_step(slab: S.TrackSlab, dets: S.DetSlab, cfg: S.TrackerConfig):
    fmt = cfg.kalman_format
    slab = slab._replace(frame=slab.frame + 1)

    dmask = dets.valid & (dets.score > cfg.conf_thresh)

    # stage 1: pool association
    pmask = S.pool_mask(slab)
    slab = S.predict_pool(slab, fmt, pmask)
    cost = boxops.iou_distance(S.track_tlbr(slab, fmt), dets.tlbr)
    r2c, c2r = masked_assignment(cost, pmask, dmask, cfg.iou_thresh)
    slab = S.apply_matches(slab, dets, r2c, fmt, cfg)

    # unmatched Tracked pool members become Lost
    slab = S.mark_lost(slab, pmask & (r2c < 0) & (slab.state == S.TRACKED))

    # stage 2: unconfirmed vs leftover dets at a looser threshold
    umask = S.unconfirmed_mask(slab)
    u_dets = dmask & (c2r < 0)
    cost2 = boxops.iou_distance(S.track_tlbr(slab, fmt), dets.tlbr)
    r2c2, c2r2 = masked_assignment(cost2, umask, u_dets, cfg.iou_thresh + 0.1)
    slab = S.apply_matches(slab, dets, r2c2, fmt, cfg)
    slab = S.mark_removed(slab, umask & (r2c2 < 0))

    # stage 3: births
    new_mask = u_dets & (c2r2 < 0) & (dets.score > cfg.conf_thresh + 0.1)
    slab = S.init_new_tracks(slab, dets, new_mask, fmt, cfg)

    # stage 4: pruning + dedup
    slab = S.prune_lost(slab, cfg.max_time_lost)
    slab = S.remove_duplicates(slab, fmt)
    return slab, S.frame_output(slab, fmt, cfg)


def sort_step_no_detection(slab: S.TrackSlab, cfg: S.TrackerConfig):
    """update_without_detection (basetrack.py:489-537): predict-only frame
    (used with --detect_per_frame skipping)."""
    fmt = cfg.kalman_format
    slab = slab._replace(frame=slab.frame + 1)
    slab = S.predict_pool(slab, fmt)
    slab = S.remove_duplicates(slab, fmt)
    return slab, S.frame_output(slab, fmt, cfg)
