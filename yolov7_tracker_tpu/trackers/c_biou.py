"""C-BIoU tracker: Kalman-free buffered-IoU cascade
(reference tracker/c_biou_tracker.py:17-353) as a jitted slab step.

Per-track state (C_BIoUSTrack, :17-62) lives in the slab's ``extra``
columns: a 6-deep ring of raw tlwh boxes (deque of the last n+1=6
observations, :37-39,126-131), the observation count, and the two motion
states. Buffered boxes expand tlwh by b1=0.3 / b2=0.5 about the center
with a max(0, .) clamp (:48-62). Motion state extrapolates
``o_t + (delta/n) * (o_t - o_{t-n})`` only on a Tracked match with
pending time_since_update (:133-146); re_activate uses the plain buffered
box and — reference quirk — does NOT reset time_since_update (:89-112).

Schedule: level-1 buffered IoU @0.9 -> level-2 @0.5 over Tracked
leftovers -> unconfirmed @0.7 -> births; unmatched Tracked go Lost with
time_since_update = frame - end_frame (:323-331). NOTE reference parity:
Lost tracks are never pruned by age in this tracker (there is no step-5
lost sweep), so they persist until slab capacity pressure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import boxes as boxops
from ..ops.assignment import solve_assignment as masked_assignment
from . import slab as S
from .registry import register

N_BUF = 6  # deque holds up to n+1 = 6 boxes (n = 5)
N = 5
B1, B2 = 0.3, 0.5
EXTRA_DIM = N_BUF * 4 + 1 + 4 + 4  # ring(24) + count(1) + ms1(4) + ms2(4)


def _buf(extra):
    return extra[:, : N_BUF * 4].reshape(-1, N_BUF, 4)


def _count(extra):
    return extra[:, N_BUF * 4].astype(jnp.int32)


def _ms(extra, level):
    off = N_BUF * 4 + 1 + (0 if level == 1 else 4)
    return extra[:, off : off + 4]


def _pack(buf, count, ms1, ms2):
    return jnp.concatenate(
        [
            buf.reshape(buf.shape[0], -1),
            count.astype(jnp.float32)[:, None],
            ms1,
            ms2,
        ],
        axis=1,
    )


def _buffered(tlwh, b):
    """get_buffer_bbox with the reference's max(0, .) clamp (:62)."""
    return jnp.maximum(boxops.buffered_tlwh(tlwh, b), 0.0)


def _ring_append(buf, count, new):
    """deque append: grow to 6 then shift-left (:126-131)."""
    shifted = jnp.concatenate([buf[:, 1:], new[:, None, :]], axis=1)
    grown = jax.vmap(lambda b, c, x: b.at[jnp.clip(c, 0, N_BUF - 1)].set(x))(
        buf, count, new
    )
    full = count > N  # len > n -> popleft+append
    new_buf = jnp.where(full[:, None, None], shifted, grown)
    new_count = jnp.where(full, count, count + 1)
    return new_buf, new_count


def _apply_matches_cbiou(slab, dets, row_to_col, cfg):
    """update (:114-152) / re_activate (:89-112) for matched rows."""
    matched = row_to_col >= 0
    det_idx = jnp.clip(row_to_col, 0, dets.tlbr.shape[0] - 1)
    det_tlwh = dets.tlwh[det_idx]

    buf, count = _buf(slab.extra), _count(slab.extra)
    new_buf, new_count = _ring_append(buf, count, det_tlwh)

    was_tracked = slab.state == S.TRACKED
    # update-path motion state (:133-146)
    newest = det_tlwh
    oldest = new_buf[:, 0]
    tsu = slab.time_since_update.astype(jnp.float32)
    extrapolated = newest + (tsu[:, None] / N) * (newest - oldest)
    use_extrap = (slab.time_since_update > 0) & (new_count >= N)
    motion_src = jnp.where(use_extrap[:, None], extrapolated, newest)
    # re_activate-path motion state: plain buffered new box (:109-112)
    motion_src = jnp.where(was_tracked[:, None], motion_src, newest)
    ms1 = _buffered(motion_src, B1)
    ms2 = _buffered(motion_src, B2)

    m = matched
    m1 = m[:, None]
    extra = slab.extra
    new_extra = _pack(new_buf, new_count, ms1, ms2)
    # reference quirk: re_activate does not reset time_since_update
    new_tsu = jnp.where(m & was_tracked, 0, slab.time_since_update)

    return slab._replace(
        det_tlwh=jnp.where(m1, det_tlwh, slab.det_tlwh),
        score=jnp.where(m, dets.score[det_idx], slab.score),
        state=jnp.where(m, S.TRACKED, slab.state),
        is_activated=jnp.where(m, True, slab.is_activated),
        frame_id=jnp.where(m, slab.frame, slab.frame_id),
        tracklet_len=jnp.where(
            m, jnp.where(was_tracked, slab.tracklet_len + 1, 0), slab.tracklet_len
        ),
        time_since_update=new_tsu,
        extra=jnp.where(m1, new_extra, extra),
    )


def _init_new_cbiou(slab, dets, new_mask, cfg):
    """Births (activate, :76-87) + fresh buffer state (:37-45)."""
    slab = S.init_new_tracks(slab, dets, new_mask, "none", cfg)
    # overwrite extra for the slots just filled: start_frame == frame and
    # state Tracked and det box matches. Simpler: recompute extra for all
    # slots whose start_frame == current frame and frame_id == frame and
    # tracklet_len == 0 and buffer count == 0.
    fresh = (
        slab.occupied
        & (slab.start_frame == slab.frame)
        & (_count(slab.extra) == 0)
    )
    tlwh = slab.det_tlwh
    buf0 = jnp.zeros((slab.capacity, N_BUF, 4), jnp.float32)
    buf0 = buf0.at[:, 0].set(tlwh)
    extra0 = _pack(
        buf0,
        jnp.ones((slab.capacity,), jnp.int32),
        _buffered(tlwh, B1),
        _buffered(tlwh, B2),
    )
    return slab._replace(
        extra=jnp.where(fresh[:, None], extra0, slab.extra)
    )


@register(
    "c_bioutracker",
    kalman_format="none",
    extra_dim=EXTRA_DIM,
)
def c_biou_step(slab: S.TrackSlab, dets: S.DetSlab, cfg: S.TrackerConfig):
    slab = slab._replace(frame=slab.frame + 1)
    dmask = dets.valid & (dets.score > cfg.conf_thresh)
    det_bb1 = boxops.tlwh_to_tlbr(_buffered(dets.tlwh, B1))
    det_bb2 = boxops.tlwh_to_tlbr(_buffered(dets.tlwh, B2))

    # level 1: pool motion_state1 vs det buffer_bbox1 @0.9
    pmask = S.pool_mask(slab)
    ms1 = boxops.tlwh_to_tlbr(_ms(slab.extra, 1))
    cost1 = 1.0 - boxops.iou_matrix(ms1, det_bb1)
    r2c1, c2r1 = masked_assignment(cost1, pmask, dmask, 0.9)
    was_tracked = slab.state == S.TRACKED
    slab = _apply_matches_cbiou(slab, dets, r2c1, cfg)

    # level 2: Tracked leftovers vs leftover dets @0.5
    u_tracks0 = pmask & (r2c1 < 0) & was_tracked
    u_dets0 = dmask & (c2r1 < 0)
    ms2 = boxops.tlwh_to_tlbr(_ms(slab.extra, 2))
    cost2 = 1.0 - boxops.iou_matrix(ms2, det_bb2)
    r2c2, c2r2 = masked_assignment(cost2, u_tracks0, u_dets0, 0.5)
    slab = _apply_matches_cbiou(slab, dets, r2c2, cfg)

    # unconfirmed vs remaining dets @0.7 (level-1 boxes, :300-309)
    umask = S.unconfirmed_mask(slab)
    u_dets1 = u_dets0 & (c2r2 < 0)
    ms1b = boxops.tlwh_to_tlbr(_ms(slab.extra, 1))
    cost3 = 1.0 - boxops.iou_matrix(ms1b, det_bb1)
    r2c3, c2r3 = masked_assignment(cost3, umask, u_dets1, 0.7)
    slab = _apply_matches_cbiou(slab, dets, r2c3, cfg)
    slab = S.mark_removed(slab, umask & (r2c3 < 0))

    # births
    new_mask = u_dets1 & (c2r3 < 0) & (dets.score > cfg.conf_thresh + 0.1)
    slab = _init_new_cbiou(slab, dets, new_mask, cfg)

    # step 4: unmatched Tracked -> Lost (or Removed if stale);
    # tsu = frame - end_frame (:323-331). No lost-age sweep (parity).
    u_tracks1 = u_tracks0 & (r2c2 < 0)
    age = slab.frame - slab.frame_id
    slab = S.mark_removed(slab, u_tracks1 & (age > cfg.max_time_lost))
    newly_lost = u_tracks1 & (age <= cfg.max_time_lost)
    slab = slab._replace(
        state=jnp.where(newly_lost, S.LOST, slab.state),
        time_since_update=jnp.where(
            newly_lost, age, slab.time_since_update
        ),
    )

    slab = S.remove_duplicates(slab, "none")
    return slab, S.frame_output(slab, "none", cfg)
