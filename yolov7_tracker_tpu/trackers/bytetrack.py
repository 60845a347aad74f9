"""ByteTrack: two-stage high/low-confidence association
(reference tracker/bytetrack.py:8-204) as a jitted slab step.

Stages:
  1. pool (activated Tracked + Lost) vs high-conf dets (score >=
     conf_thresh) at thresh 0.9; optional appearance fusion
     gamma*IoU + (1-gamma)*cosine (bytetrack.py:109-118, off by default);
  2. *Tracked* leftovers vs low-conf dets (score in
     (max(0.15, conf-0.3), conf)) at 0.5 (:69-70,134-149);
  3. unconfirmed tracks vs leftover high dets at 0.7 (:159-170);
  4. births from leftover high dets with score > conf_thresh + 0.1 (:173-177);
  5. prune lost > max_time_lost, dedup (:179-194).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import boxes as boxops
from ..ops.assignment import solve_assignment as masked_assignment
from . import slab as S
from .registry import register


@register("bytetrack")
def bytetrack_step(slab: S.TrackSlab, dets: S.DetSlab, cfg: S.TrackerConfig):
    fmt = cfg.kalman_format
    slab = slab._replace(frame=slab.frame + 1)

    low_conf = max(0.15, cfg.conf_thresh - 0.3)
    high = dets.valid & (dets.score >= cfg.conf_thresh)
    low = dets.valid & ~high & (dets.score > low_conf)

    # stage 1: pool vs high dets @0.9
    pmask = S.pool_mask(slab)
    slab = S.predict_pool(slab, fmt, pmask)
    track_boxes = S.track_tlbr(slab, fmt)
    cost = boxops.iou_distance(track_boxes, dets.tlbr)
    if cfg.feature_dim > 0:
        # appearance fusion (bytetrack.py:109-116)
        app = 1.0 - slab.feature @ dets.feature.T
        cost = cfg.gamma * cost + (1.0 - cfg.gamma) * app
    r2c, c2r = masked_assignment(cost, pmask, high, 0.9)
    was_tracked = slab.state == S.TRACKED
    slab = S.apply_matches(slab, dets, r2c, fmt, cfg)

    # stages 2 + 3 solved in LOCKSTEP (latency optimization, exact
    # semantics): stage 2 (unmatched *Tracked* rows vs low dets @0.5)
    # and stage 3 (unconfirmed vs leftover high dets @0.7) both depend
    # only on stage 1 — their row sets are disjoint from every row
    # updated in stages 1-2 (stage-2 rows are stage-1-unmatched, so
    # their KF boxes are untouched; unconfirmed tracks are outside the
    # pool entirely), so both cost matrices equal the post-stage-1 IoU
    # matrix and the two independent solves batch into one vmapped
    # auction whose sweeps amortize across the pair.
    cost23 = boxops.iou_distance(S.track_tlbr(slab, fmt), dets.tlbr)
    u_tracks0 = pmask & (r2c < 0) & was_tracked
    umask = S.unconfirmed_mask(slab)
    u_high = high & (c2r < 0)
    r2c_b, c2r_b = jax.vmap(
        masked_assignment, in_axes=(None, 0, 0, 0)
    )(
        cost23,
        jnp.stack([u_tracks0, umask]),
        jnp.stack([low, u_high]),
        jnp.asarray([0.5, 0.7], jnp.float32),
    )
    r2c2, r2c3 = r2c_b[0], r2c_b[1]
    c2r3 = c2r_b[1]
    slab = S.apply_matches(slab, dets, r2c2, fmt, cfg)
    # unmatched after stage 2 -> Lost
    slab = S.mark_lost(slab, u_tracks0 & (r2c2 < 0))
    slab = S.apply_matches(slab, dets, r2c3, fmt, cfg)
    slab = S.mark_removed(slab, umask & (r2c3 < 0))

    # stage 4: births
    new_mask = u_high & (c2r3 < 0) & (dets.score > cfg.conf_thresh + 0.1)
    slab = S.init_new_tracks(slab, dets, new_mask, fmt, cfg)

    # stage 5
    slab = S.prune_lost(slab, cfg.max_time_lost)
    slab = S.remove_duplicates(slab, fmt)
    return slab, S.frame_output(slab, fmt, cfg)
