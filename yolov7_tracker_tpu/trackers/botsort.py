"""BoT-SORT: ByteTrack association + camera-motion compensation + optional
IoU/embedding min-fusion (reference tracker/botsort.py:270-493).

The step takes a per-frame 2x3 affine camera warp as an extra input
(computed by trackers.gmc on host ORB features or the device ECC solve);
it is applied to pool AND unconfirmed KF states after predict
(botsort.py:379-382). Appearance fusion (off by default, :274) uses the
paper's dual-threshold min rule: emb cost halved, set to 1 where IoU
dist > 0.5 or emb dist > 0.25, then min(IoU, emb) (:384-396).

Reference quirks kept: stage 2 runs over ALL stage-1-unmatched pool rows
(Lost included, :411); births come from the stage-1 leftovers
``u_dets0`` even if the det also matched an unconfirmed track
(:463-467).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import boxes as boxops
from ..ops.assignment import solve_assignment as masked_assignment
from . import appearance as A
from . import slab as S
from .registry import register

THETA_IOU, THETA_EMB = 0.5, 0.25  # eq (12)-(13), botsort.py:287-289


def _fused_cost(slab, dets, fmt, use_appearance):
    iou = boxops.iou_distance(S.track_tlbr(slab, fmt), dets.tlbr)
    if not use_appearance:
        return iou
    emb = 0.5 * A.cosine_distance(slab.feature, dets.feature)
    emb = jnp.where(iou > THETA_IOU, 1.0, emb)
    emb = jnp.where(emb > THETA_EMB, 1.0, emb)
    return jnp.minimum(iou, emb)


@register("botsort")
def botsort_step(slab: S.TrackSlab, dets: S.DetSlab, cfg: S.TrackerConfig):
    fmt = cfg.kalman_format  # forced 'botsort' (track.py:68-69)
    use_app = cfg.feature_dim > 0
    slab = slab._replace(frame=slab.frame + 1)

    low_conf = max(0.15, cfg.conf_thresh - 0.3)
    high = dets.valid & (dets.score >= cfg.conf_thresh)
    low = dets.valid & ~high & (dets.score > low_conf)

    pmask = S.pool_mask(slab)
    umask0 = S.unconfirmed_mask(slab)
    slab = S.predict_pool(slab, fmt, pmask)
    # camera-motion warp (identity when GMC disabled — a no-op)
    slab = A.apply_gmc(slab, dets.warp, pmask | umask0)

    # stage 1: pool vs high @0.9
    cost = _fused_cost(slab, dets, fmt, use_app)
    r2c, c2r = masked_assignment(cost, pmask, high, 0.9)
    slab = S.apply_matches(slab, dets, r2c, fmt, cfg)

    # stages 2 + 3 solved in LOCKSTEP (exact semantics, see
    # bytetrack.py): stage 2 (ALL unmatched pool rows vs low @0.5,
    # botsort.py:411) and stage 3 (unconfirmed vs u_dets0 @0.7) both
    # depend only on stage 1 — stage-3 rows (unconfirmed) are outside
    # the pool and its cols are stage-1 leftovers, so the two
    # independent solves batch into one vmapped auction.
    u_tracks0 = pmask & (r2c < 0)
    umask = S.unconfirmed_mask(slab)
    u_high = high & (c2r < 0)
    cost2 = boxops.iou_distance(S.track_tlbr(slab, fmt), dets.tlbr)
    cost3 = _fused_cost(slab, dets, fmt, use_app)
    r2c_b, _ = jax.vmap(masked_assignment)(
        jnp.stack([cost2, cost3]),
        jnp.stack([u_tracks0, umask]),
        jnp.stack([low, u_high]),
        jnp.asarray([0.5, 0.7], jnp.float32),
    )
    r2c2, r2c3 = r2c_b[0], r2c_b[1]
    slab = S.apply_matches(slab, dets, r2c2, fmt, cfg)
    slab = S.mark_lost(slab, u_tracks0 & (r2c2 < 0))
    slab = S.apply_matches(slab, dets, r2c3, fmt, cfg)
    slab = S.mark_removed(slab, umask & (r2c3 < 0))

    # births from u_dets0 (NOT post-unconfirmed; reference :463-467)
    new_mask = u_high & (dets.score > cfg.conf_thresh + 0.1)
    slab = S.init_new_tracks(slab, dets, new_mask, fmt, cfg)

    slab = S.prune_lost(slab, cfg.max_time_lost)
    slab = S.remove_duplicates(slab, fmt)
    return slab, S.frame_output(slab, fmt, cfg)
