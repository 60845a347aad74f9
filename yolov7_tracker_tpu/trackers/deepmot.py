"""DeepMOT: differentiable-Hungarian tracker
(reference tracker/deepmot.py:142-324) as a jitted slab step.

Stage 1 cost is the euclidean-center + IoU blend ``ecu_iou_distance``
(matching.py:129-162: 0.5 * ((1 - exp(-5 * center_dist / diag)) +
iou_dist)), passed through the DHN (reid/dhn.py) and matched on
``1 - DHN(D)`` at 0.9 (deepmot.py:221-233). Stages 2-4 follow the
ByteTrack shape: Tracked leftovers vs low dets @0.5, unconfirmed @0.7,
births at score > conf + 0.1, lost pruning, dedup.

The DHN runs on the compacted padded cost matrix (see reid/dhn.py for
the documented deviation; the reference ships no DHN.pth). The frame's
(h, w) for the center-distance normalizer comes from
``TrackerConfig.extra_dim``-free ``img_hw`` passed at build time via the
``img_hw`` keyword.

Reference quirk replicated exactly: the step-4 lost-marking indexes
``strack_pool`` with ``u_tracks0``-relative indices (deepmot.py:268-272,
the same off-by-list indexing as deepsort.py:174-177) — reproduced via
the slab's list-order keys (slab.misindexed_lost_mask).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import boxes as boxops
from ..ops.assignment import solve_assignment as masked_assignment
from ..reid import dhn as dhn_mod
from . import slab as S
from .registry import register


def ecu_iou_distance(slab, dets, fmt, img_hw):
    """0.5 * (normalized-center distance + IoU distance)
    (matching.py:129-162)."""
    t_tlwh = S.track_tlwh(slab, fmt)
    d_tlwh = dets.tlwh
    t_c = t_tlwh[:, :2] + 0.5 * t_tlwh[:, 2:]
    d_c = d_tlwh[:, :2] + 0.5 * d_tlwh[:, 2:]
    ecu = jnp.linalg.norm(t_c[:, None, :] - d_c[None, :, :], axis=-1)
    norm = (img_hw[0] ** 2 + img_hw[1] ** 2) ** 0.5
    ecu = 1.0 - jnp.exp(-5.0 * ecu / norm)
    iou = boxops.iou_distance(S.track_tlbr(slab, fmt), dets.tlbr)
    return 0.5 * (ecu + iou)


@register("deepmot", capacity=128, det_capacity=48)
def deepmot_step(slab: S.TrackSlab, dets: S.DetSlab, cfg: S.TrackerConfig,
                 dhn_variables=None, img_hw: Tuple[int, int] = (1080, 1920)):
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

    # stage 1: ecu+iou cost -> DHN -> match 1 - DHN @0.9
    cost = ecu_iou_distance(slab, dets, fmt, img_hw)
    if dhn_variables is not None:
        comp, rperm, cperm = dhn_mod.compact_cost(
            cost, pmask, high, row_key=pool_rank)
        scores = dhn_mod.build_dhn(cfg.dhn_arch, cfg.dhn_hidden).apply(
            dhn_variables, comp
        )
        cost = 1.0 - dhn_mod.uncompact(scores, rperm, cperm)
    r2c, c2r = masked_assignment(cost, pmask, high, 0.9)
    was_tracked = slab.state == S.TRACKED
    slab = S.apply_matches(slab, dets, r2c, fmt, cfg, pool_rank=pool_rank)

    # stages 2 + 3 solved in LOCKSTEP (exact semantics, see
    # bytetrack.py): both depend only on stage 1, so the two
    # independent solves batch into one vmapped auction.
    u_tracks0 = pmask & (r2c < 0) & was_tracked
    umask = S.unconfirmed_mask(slab)
    u_high = high & (c2r < 0)
    cost23 = boxops.iou_distance(S.track_tlbr(slab, fmt), dets.tlbr)
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
    # reference step-4 mis-indexed lost-marking (deepmot.py:268-272)
    wrong_lost = S.misindexed_lost_mask(
        slab, pool_rank, u_tracks0, u_tracks0 & (r2c2 < 0), pmask
    )
    slab = S.mark_lost_ordered(slab, wrong_lost, pool_rank,
                               dets.tlbr.shape[0])
    slab = S.apply_matches(slab, dets, r2c3, fmt, cfg)
    slab = S.mark_removed(slab, umask & (r2c3 < 0))

    new_mask = u_high & (c2r3 < 0) & (dets.score > cfg.conf_thresh + 0.1)
    slab = S.init_new_tracks(slab, dets, new_mask, fmt, cfg)

    slab = S.prune_lost(slab, cfg.max_time_lost)
    slab = S.remove_duplicates(slab, fmt)
    return slab, S.frame_output(slab, fmt, cfg)
