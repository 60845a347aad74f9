"""The track slab: fixed-size functional tracker state.

The reference keeps tracks as Python object lists with imperative list
algebra (STrack + joint/sub/remove_duplicate_stracks,
tracker/basetrack.py:74-576) and pays a host round-trip per frame. Here
the whole tracker state is one padded pytree of (T,)-leading arrays plus
an occupancy mask, and every lifecycle event (activate / update /
re_activate / mark_lost / mark_removed, basetrack.py:222-339) is a masked
vectorized update — so a tracker step is a pure jittable function
``(slab, det_slab) -> (slab, frame_output)`` and whole sequences run
under ``lax.scan`` entirely on device.

State encoding mirrors TrackState (basetrack.py:14-18): slots hold
New/Tracked/Lost; Removed tracks simply free their slot (the reference's
removed list only feeds set subtraction, which occupancy already covers).
Track ids are assigned in detection order via a cumulative sum over the
new-track mask, reproducing the sequential BaseTrack.next_id counter
(basetrack.py:43-46).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import boxes as boxops
from ..ops import kalman

# TrackState (basetrack.py:14-18)
NEW, TRACKED, LOST, REMOVED = 0, 1, 2, 3

IDENTITY_WARP = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)


class TrackSlab(NamedTuple):
    """Padded track state; capacity T fixed at trace time."""

    mean: jnp.ndarray           # (T, 8) KF mean (format-padded)
    cov: jnp.ndarray            # (T, 8, 8) KF covariance
    det_tlwh: jnp.ndarray       # (T, 4) raw detection tlwh at last update
    score: jnp.ndarray          # (T,)
    cls: jnp.ndarray            # (T,)
    state: jnp.ndarray          # (T,) int32 TrackState
    occupied: jnp.ndarray       # (T,) bool — slot in use
    is_activated: jnp.ndarray   # (T,) bool
    track_id: jnp.ndarray       # (T,) int32
    frame_id: jnp.ndarray       # (T,) int32 last-updated frame
    start_frame: jnp.ndarray    # (T,) int32
    tracklet_len: jnp.ndarray   # (T,) int32
    time_since_update: jnp.ndarray  # (T,) int32
    feature: jnp.ndarray        # (T, F) smoothed ReID feature (F=0 if unused)
    feat_hist: jnp.ndarray      # (T, H, F) feature ring buffer (H=0 if unused)
    feat_count: jnp.ndarray     # (T,) int32 features stored in ring
    extra: jnp.ndarray          # (T, E) tracker-specific state (E=0 default)
    # reference list-order keys: the reference's tracked_stracks /
    # lost_stracks are python lists whose ORDER is observable through the
    # step-4 mis-indexed lost-marking shared by deepsort.py:174-177,
    # strongsort.py:198-201 and uavmot.py:227-230 (strack_pool indexed
    # with u_tracks0-relative indices). ins_seq is the position key in
    # tracked_stracks (set at birth, refreshed on re-activate — joint_
    # stracks appends refinds at the tail, basetrack.py:540-550);
    # lost_seq the position key in lost_stracks (set when marked lost).
    ins_seq: jnp.ndarray        # (T,) int32 tracked-list order key
    lost_seq: jnp.ndarray       # (T,) int32 lost-list order key
    next_id: jnp.ndarray        # () int32 id counter
    frame: jnp.ndarray          # () int32 current frame number

    @property
    def capacity(self) -> int:
        return self.score.shape[0]


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """Static tracker options (hashable — safe as a jit static arg).

    Mirrors the reference CLI opts consumed by the trackers
    (tracker/track.py:342-386): conf_thresh, iou_thresh, kalman_format,
    track_buffer, frame_rate coupling (basetrack.py:354-356).
    """

    tracker: str = "sort"
    kalman_format: str = "default"
    conf_thresh: float = 0.2
    iou_thresh: float = 0.5
    track_buffer: int = 30
    frame_rate: int = 30
    capacity: int = 256          # track slab size T
    det_capacity: int = 128      # detection slab size D
    feature_dim: int = 0         # ReID feature dim (512 when used)
    feature_hist: int = 0        # feature ring-buffer depth (DeepSORT: 100)
    use_avg_of_feature: bool = True  # EMA smoothing (basetrack.py:327-329)
    extra_dim: int = 0           # per-tracker extra state columns
    gamma: float = 0.1           # IoU/appearance blend (bytetrack.py:13)
    min_area: float = 150.0      # output area filter (track.py opts.min_area)
    dhn_weights: str = ""        # DeepMOT: msgpack path of trained DHN
    dhn_hidden: int = 256        # DHN GRU width (reference arch: 256)
    dhn_arch: str = "gru"        # 'gru' (reference Munkrs shape) or
                                 # 'sinkhorn' (parallel, reid/dhn.py)

    @property
    def max_time_lost(self) -> int:
        return int(self.frame_rate / 30.0 * self.track_buffer)


class DetSlab(NamedTuple):
    """Padded per-frame detections: tlbr+score+cls (+optional features,
    + the frame's camera-motion warp for GMC trackers)."""

    tlbr: jnp.ndarray    # (D, 4)
    score: jnp.ndarray   # (D,)
    cls: jnp.ndarray     # (D,)
    valid: jnp.ndarray   # (D,) bool
    feature: jnp.ndarray  # (D, F) ReID features (F=0 if unused)
    warp: jnp.ndarray = IDENTITY_WARP  # (2, 3) affine, identity = no GMC

    @property
    def tlwh(self):
        return boxops.tlbr_to_tlwh(self.tlbr)


def init_slab(cfg: TrackerConfig) -> TrackSlab:
    t = cfg.capacity
    f = cfg.feature_dim
    h = cfg.feature_hist
    return TrackSlab(
        mean=jnp.zeros((t, 8), jnp.float32),
        cov=jnp.tile(jnp.eye(8, dtype=jnp.float32), (t, 1, 1)),
        det_tlwh=jnp.zeros((t, 4), jnp.float32),
        score=jnp.zeros((t,), jnp.float32),
        cls=jnp.zeros((t,), jnp.float32),
        state=jnp.full((t,), REMOVED, jnp.int32),
        occupied=jnp.zeros((t,), bool),
        is_activated=jnp.zeros((t,), bool),
        track_id=jnp.zeros((t,), jnp.int32),
        frame_id=jnp.zeros((t,), jnp.int32),
        start_frame=jnp.zeros((t,), jnp.int32),
        tracklet_len=jnp.zeros((t,), jnp.int32),
        time_since_update=jnp.zeros((t,), jnp.int32),
        feature=jnp.zeros((t, f), jnp.float32),
        feat_hist=jnp.zeros((t, h, f), jnp.float32),
        feat_count=jnp.zeros((t,), jnp.int32),
        extra=jnp.zeros((t, cfg.extra_dim), jnp.float32),
        ins_seq=jnp.zeros((t,), jnp.int32),
        lost_seq=jnp.zeros((t,), jnp.int32),
        next_id=jnp.int32(0),
        frame=jnp.int32(0),
    )


def make_det_slab(cfg: TrackerConfig, tlbr, score, cls, valid,
                  feature=None, warp=None) -> DetSlab:
    d = cfg.det_capacity
    f = cfg.feature_dim

    def pad(x, n, fill=0.0):
        x = jnp.asarray(x)
        pad_n = n - x.shape[0]
        widths = [(0, pad_n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)[:n]

    if feature is None:
        feature = jnp.zeros((d, f), jnp.float32)
    return DetSlab(
        tlbr=pad(jnp.asarray(tlbr, jnp.float32), d),
        score=pad(jnp.asarray(score, jnp.float32), d),
        cls=pad(jnp.asarray(cls, jnp.float32), d),
        valid=pad(jnp.asarray(valid, bool), d, False),
        feature=pad(jnp.asarray(feature, jnp.float32), d),
        warp=IDENTITY_WARP if warp is None else jnp.asarray(warp, jnp.float32),
    )


# ---------------------------------------------------------------------------
# masked views
# ---------------------------------------------------------------------------

def track_tlwh(slab: TrackSlab, fmt: str) -> jnp.ndarray:
    """Current box per slot: KF-derived once initiated, else raw det tlwh
    (STrack.tlwh, basetrack.py:183-211; mean is None only pre-activate)."""
    if fmt == "none":  # Kalman-free trackers (C-BIoU): raw last detection
        return slab.det_tlwh
    kf_tlwh = kalman.tlwh_from_mean(fmt, slab.mean)
    # every occupied slot has gone through activate() -> KF initiated
    return jnp.where(slab.occupied[:, None], kf_tlwh, slab.det_tlwh)


def track_tlbr(slab: TrackSlab, fmt: str) -> jnp.ndarray:
    return boxops.tlwh_to_tlbr(track_tlwh(slab, fmt))


def pool_mask(slab: TrackSlab) -> jnp.ndarray:
    """strack_pool = activated Tracked + Lost (basetrack.py:400-409)."""
    return slab.occupied & (
        ((slab.state == TRACKED) & slab.is_activated) | (slab.state == LOST)
    )


def unconfirmed_mask(slab: TrackSlab) -> jnp.ndarray:
    """Tracked but not yet activated (basetrack.py:400-406)."""
    return slab.occupied & (slab.state == TRACKED) & ~slab.is_activated


# ---------------------------------------------------------------------------
# reference list-order replication (deepsort/strongsort/uavmot only)
# ---------------------------------------------------------------------------

def rebase_seq_keys(slab: TrackSlab) -> TrackSlab:
    """Compress ins_seq/lost_seq to their dense ranks (order-preserving,
    values in [0, T)). Only the RELATIVE order of the keys matters
    (pool_order_rank sorts them); rebasing once per frame before any
    key assignment keeps every key < T + this frame's offsets, so the
    keys never grow with the frame counter. Without this, frame-scaled
    bases overflow int32 after ~125k frames at CLI-default capacities
    (~70 min of 30 fps video) and silently corrupt the pool order the
    misindexed-lost replication depends on."""

    def rank(key):
        t = key.shape[0]
        order = jnp.argsort(key, stable=True)
        return (
            jnp.zeros((t,), jnp.int32)
            .at[order]
            .set(jnp.arange(t, dtype=jnp.int32))
        )

    return slab._replace(
        ins_seq=rank(slab.ins_seq), lost_seq=rank(slab.lost_seq)
    )


def _seq_base(slab: TrackSlab, det_capacity: int) -> int:
    """Per-frame base for ins_seq/lost_seq: any constant larger than
    every rebased key (rebase_seq_keys bounds them < capacity). Within a
    frame the offsets are: births (< D, det-slot order), then refinds
    (D + level*T + pool position), matching the reference's append order
    (births enter tracked_stracks via joint(activated) before
    joint(refind); cascade refinds order by level then row). Trackers
    that replicate list order MUST call rebase_seq_keys once per step
    before the first assignment."""
    return slab.capacity


def pool_order_rank(slab: TrackSlab, pmask: jnp.ndarray) -> jnp.ndarray:
    """(T,) rank of each slot in the reference's strack_pool order:
    tracked_stracks (ascending ins_seq) followed by lost_stracks
    (ascending lost_seq); non-pool slots rank after all pool members
    (joint_stracks(tracked, lost), basetrack.py:400-409)."""
    t = slab.capacity
    is_lost = slab.state == LOST
    key = jnp.where(is_lost, slab.lost_seq, slab.ins_seq)
    order = jnp.lexsort(
        (key, is_lost.astype(jnp.int32), (~pmask).astype(jnp.int32))
    )
    return (
        jnp.zeros((t,), jnp.int32)
        .at[order]
        .set(jnp.arange(t, dtype=jnp.int32))
    )


def misindexed_lost_mask(
    slab: TrackSlab,
    pool_rank: jnp.ndarray,
    u0_mask: jnp.ndarray,
    unmatched2_mask: jnp.ndarray,
    pmask: jnp.ndarray,
) -> jnp.ndarray:
    """The reference's step-4 lost-marking bug, replicated exactly:
    ``for idx in u_tracks1_idx: strack_pool[idx].mark_lost()`` where the
    idx values are positions within the FILTERED u_tracks0 list, not the
    pool (deepsort.py:174-177, strongsort.py:198-201, uavmot.py:227-230)
    — so the tracks actually marked lost are the pool members at those
    positions. u0_mask selects the u_tracks0 members, unmatched2_mask
    the subset unmatched in stage 2 (whose u_tracks0 positions form
    u_tracks1_idx)."""
    t = slab.capacity
    u0_by_rank = jnp.zeros((t,), bool).at[pool_rank].set(u0_mask)
    u0_int = u0_by_rank.astype(jnp.int32)
    pos_by_rank = jnp.cumsum(u0_int) - u0_int  # u_tracks0 position per rank
    pos = pos_by_rank[pool_rank]
    tgt = jnp.zeros((t,), bool).at[
        jnp.where(unmatched2_mask, pos, t)
    ].set(True, mode="drop")
    return pmask & tgt[pool_rank]


def mark_lost_ordered(
    slab: TrackSlab, mask: jnp.ndarray, pool_rank: jnp.ndarray,
    det_capacity: int,
) -> TrackSlab:
    """mark_lost + lost-list position key: newly lost tracks append to
    lost_stracks in marking order (= ascending pool position, since
    u_tracks1_idx iterates ascending)."""
    base = _seq_base(slab, det_capacity)
    return slab._replace(
        state=jnp.where(mask, LOST, slab.state),
        lost_seq=jnp.where(mask, base + pool_rank, slab.lost_seq),
    )


# ---------------------------------------------------------------------------
# lifecycle ops (all masked)
# ---------------------------------------------------------------------------

def predict_pool(slab: TrackSlab, fmt: str,
                 mask: Optional[jnp.ndarray] = None) -> TrackSlab:
    """KF multi_predict over the pool + time_since_update bump
    (STrack.multi_predict, basetrack.py:253-271). Non-Tracked pool members
    get their trailing velocity zeroed first (:263-265)."""
    if mask is None:
        mask = pool_mask(slab)
    mean = kalman.zero_stale_velocity(
        fmt, slab.mean, slab.state == TRACKED
    )
    new_mean, new_cov = kalman.predict(fmt, mean, slab.cov)
    m = mask[:, None]
    return slab._replace(
        mean=jnp.where(m, new_mean, slab.mean),
        cov=jnp.where(mask[:, None, None], new_cov, slab.cov),
        time_since_update=jnp.where(
            mask, slab.time_since_update + 1, slab.time_since_update
        ),
    )


def apply_matches(
    slab: TrackSlab,
    dets: DetSlab,
    row_to_col: jnp.ndarray,
    fmt: str,
    cfg: TrackerConfig,
    allow_reactivate: bool = True,
    pool_rank: Optional[jnp.ndarray] = None,
    cascade_refind_order: bool = False,
) -> TrackSlab:
    """Commit matched (track, det) pairs.

    Tracked rows follow STrack.update (basetrack.py:296-339): KF update
    with the det measurement, score refresh, tracklet_len += 1. Lost rows
    follow STrack.re_activate (:273-294): same KF update, tracklet_len = 0.
    Both set state=Tracked, is_activated=True, time_since_update=0.

    pool_rank (order-replicating trackers only): refinds re-enter
    tracked_stracks at the tail (joint_stracks appends them after this
    frame's births), so their ins_seq is refreshed to base + D + rank.
    """
    matched = row_to_col >= 0
    det_idx = jnp.clip(row_to_col, 0, dets.tlbr.shape[0] - 1)
    det_tlwh = dets.tlwh[det_idx]
    meas = kalman.measurement_from_tlwh(fmt, det_tlwh)
    conf = None
    if kalman.SPECS[fmt].nsa:
        # STrack.update passes the det score as NSA confidence, but
        # re_activate (Lost->Tracked) calls kalman.update WITHOUT it —
        # default 0.0, i.e. unscaled measurement noise (basetrack.py:
        # 283-285 vs 318-320, kalman_filter.py:617-634).
        conf = jnp.where(slab.state == TRACKED, dets.score[det_idx], 0.0)
    new_mean, new_cov = kalman.update(fmt, slab.mean, slab.cov, meas, conf)

    was_tracked = slab.state == TRACKED
    upd = matched
    m1, m2 = upd[:, None], upd[:, None, None]
    new_feat = slab.feature
    new_hist = slab.feat_hist
    new_fc = slab.feat_count
    if cfg.feature_dim > 0:
        det_feat = dets.feature[det_idx]
        has_feat = jnp.sum(jnp.abs(det_feat), axis=-1) > 0
        # reference normalizes the det feature before smoothing/appending
        # (basetrack.py:325); raw features enter the slab only at birth.
        det_feat_n = det_feat / (
            jnp.linalg.norm(det_feat, axis=-1, keepdims=True) + 1e-12
        )
        fmask = (upd & has_feat)[:, None]
        if cfg.use_avg_of_feature:
            # EMA 0.9 + renorm (basetrack.py:327-329)
            smooth = 0.9 * slab.feature + 0.1 * det_feat_n
            smooth = smooth / (
                jnp.linalg.norm(smooth, axis=-1, keepdims=True) + 1e-12
            )
            new_feat = jnp.where(fmask, smooth, slab.feature)
        else:
            new_feat = jnp.where(fmask, det_feat_n, slab.feature)
        if cfg.feature_hist > 0:
            # ring buffer append (budget, basetrack.py:331-332)
            pos = slab.feat_count % cfg.feature_hist
            appended = jax.vmap(
                lambda hist, p, f: hist.at[p].set(f)
            )(slab.feat_hist, pos, det_feat_n)
            new_hist = jnp.where(fmask[:, :, None], appended, slab.feat_hist)
            new_fc = jnp.where(
                upd & has_feat, slab.feat_count + 1, slab.feat_count
            )

    new_ins_seq = slab.ins_seq
    if pool_rank is not None:
        d_cap = dets.tlbr.shape[0]
        refind = upd & ~was_tracked
        # refind list order: plain linear_assignment iterates matches by
        # ascending pool row (level 0); matching_cascade accumulates
        # matches level-by-level, i.e. ascending time_since_update then
        # pool row (matching.py:244-266). tsu at a refind is bounded by
        # max_time_lost + 1 (prune_lost removes anything older), so the
        # clip below never collapses distinct levels.
        level = (jnp.clip(slab.time_since_update, 0, cfg.max_time_lost + 1)
                 if cascade_refind_order else 0)
        new_ins_seq = jnp.where(
            refind,
            _seq_base(slab, d_cap) + d_cap
            + level * slab.capacity + pool_rank,
            slab.ins_seq,
        )
    return slab._replace(
        mean=jnp.where(m1, new_mean, slab.mean),
        cov=jnp.where(m2, new_cov, slab.cov),
        det_tlwh=jnp.where(m1, det_tlwh, slab.det_tlwh),
        score=jnp.where(upd, dets.score[det_idx], slab.score),
        ins_seq=new_ins_seq,
        state=jnp.where(upd, TRACKED, slab.state),
        is_activated=jnp.where(upd, True, slab.is_activated),
        frame_id=jnp.where(upd, slab.frame, slab.frame_id),
        tracklet_len=jnp.where(
            upd, jnp.where(was_tracked, slab.tracklet_len + 1, 0),
            slab.tracklet_len,
        ),
        time_since_update=jnp.where(upd, 0, slab.time_since_update),
        feature=new_feat,
        feat_hist=new_hist,
        feat_count=new_fc,
    )


def mark_lost(slab: TrackSlab, mask: jnp.ndarray) -> TrackSlab:
    return slab._replace(state=jnp.where(mask, LOST, slab.state))


def mark_removed(slab: TrackSlab, mask: jnp.ndarray) -> TrackSlab:
    """Removed slots are freed for reuse."""
    return slab._replace(
        state=jnp.where(mask, REMOVED, slab.state),
        occupied=jnp.where(mask, False, slab.occupied),
        is_activated=jnp.where(mask, False, slab.is_activated),
    )


def init_new_tracks(
    slab: TrackSlab,
    dets: DetSlab,
    new_mask: jnp.ndarray,
    fmt: str,
    cfg: TrackerConfig,
) -> TrackSlab:
    """Activate unmatched high-score detections as new tracks
    (STrack.activate, basetrack.py:222-245).

    Ids are ``next_id + rank`` in detection order (matching the
    reference's sequential counter); the k-th new det lands in the k-th
    free slot. Overflow beyond free capacity is dropped.
    """
    d = new_mask.shape[0]
    t = slab.capacity
    free = ~slab.occupied
    # rank of each new det among new dets (0-based), in det order
    det_rank = jnp.cumsum(new_mask.astype(jnp.int32)) - 1
    # k-th free slot index
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank per slot
    n_free = jnp.sum(free.astype(jnp.int32))
    # slot_for_rank[k] = index of k-th free slot
    slot_for_rank = jnp.full((t,), t, jnp.int32).at[
        jnp.where(free, free_rank, t)
    ].set(jnp.arange(t, dtype=jnp.int32), mode="drop")
    placeable = new_mask & (det_rank < n_free)
    target_slot = jnp.where(
        placeable, slot_for_rank[jnp.clip(det_rank, 0, t - 1)], t
    )

    det_tlwh = dets.tlwh
    if fmt == "none":
        mean0 = jnp.zeros((d, 8), jnp.float32)
        cov0 = jnp.tile(jnp.eye(8, dtype=jnp.float32), (d, 1, 1))
    else:
        meas = kalman.measurement_from_tlwh(fmt, det_tlwh)
        mean0, cov0 = kalman.initiate(fmt, meas)
    ids = slab.next_id + 1 + det_rank  # next_id() pre-increments

    def scat(dst, src):
        return dst.at[target_slot].set(src, mode="drop")

    frame1 = slab.frame == 1  # is_activated only on the first frame (:239-240)
    new_slab = slab._replace(
        mean=scat(slab.mean, mean0),
        cov=scat(slab.cov, cov0),
        det_tlwh=scat(slab.det_tlwh, det_tlwh),
        extra=scat(slab.extra, jnp.zeros((d,) + slab.extra.shape[1:], jnp.float32)),
        score=scat(slab.score, dets.score),
        cls=scat(slab.cls, dets.cls),
        state=scat(slab.state, jnp.full((d,), TRACKED, jnp.int32)),
        occupied=scat(slab.occupied, jnp.ones((d,), bool)),
        is_activated=scat(slab.is_activated, jnp.full((d,), frame1)),
        track_id=scat(slab.track_id, ids),
        frame_id=scat(slab.frame_id, jnp.full((d,), slab.frame, jnp.int32)),
        start_frame=scat(slab.start_frame, jnp.full((d,), slab.frame, jnp.int32)),
        tracklet_len=scat(slab.tracklet_len, jnp.zeros((d,), jnp.int32)),
        time_since_update=scat(slab.time_since_update, jnp.zeros((d,), jnp.int32)),
        # tracked-list position: births append in det order, before this
        # frame's refinds (offset < d; refinds use d + pool_rank)
        ins_seq=scat(
            slab.ins_seq,
            _seq_base(slab, d) + jnp.arange(d, dtype=jnp.int32),
        ),
        next_id=slab.next_id + jnp.sum(placeable.astype(jnp.int32)),
    )
    if cfg.feature_dim > 0:
        feat = dets.feature
        new_slab = new_slab._replace(
            feature=scat(slab.feature, feat),
            feat_count=scat(
                slab.feat_count,
                (jnp.sum(jnp.abs(feat), axis=-1) > 0).astype(jnp.int32),
            ),
        )
        if cfg.feature_hist > 0:
            hist0 = jnp.zeros((d, cfg.feature_hist, cfg.feature_dim), jnp.float32)
            hist0 = hist0.at[:, 0, :].set(feat)
            new_slab = new_slab._replace(feat_hist=scat(slab.feat_hist, hist0))
    return new_slab


def prune_lost(slab: TrackSlab, max_time_lost: int) -> TrackSlab:
    """Remove tracks lost for longer than the buffer
    (basetrack.py:462-466: frame_id - end_frame > max_time_lost)."""
    stale = (
        slab.occupied
        & (slab.state == LOST)
        & (slab.frame - slab.frame_id > max_time_lost)
    )
    return mark_removed(slab, stale)


def remove_duplicates(slab: TrackSlab, fmt: str) -> TrackSlab:
    """remove_duplicate_stracks (basetrack.py:563-576): tracked-vs-lost
    pairs with IoU distance < 0.15 drop the younger member."""
    tlbr = track_tlbr(slab, fmt)
    tracked = slab.occupied & (slab.state == TRACKED)
    lost = slab.occupied & (slab.state == LOST)
    dist = 1.0 - boxops.iou_matrix(tlbr, tlbr)
    dup = (dist < 0.15) & tracked[:, None] & lost[None, :]
    age_t = (slab.frame_id - slab.start_frame)[:, None]
    age_l = (slab.frame_id - slab.start_frame)[None, :]
    # timep > timeq -> drop q (lost); else drop p (tracked)
    drop_lost_pair = dup & (age_t > age_l)
    drop_tracked_pair = dup & ~(age_t > age_l)
    drop_tracked = jnp.any(drop_tracked_pair, axis=1)
    drop_lost = jnp.any(drop_lost_pair, axis=0)
    return mark_removed(slab, drop_tracked | drop_lost)


class FrameOutput(NamedTuple):
    """Per-frame emitted tracks (fixed width = slab capacity)."""

    track_id: jnp.ndarray  # (T,) int32
    tlwh: jnp.ndarray      # (T, 4)
    score: jnp.ndarray     # (T,)
    cls: jnp.ndarray       # (T,)
    valid: jnp.ndarray     # (T,) bool


def frame_output(slab: TrackSlab, fmt: str, cfg: TrackerConfig) -> FrameOutput:
    """Emit activated tracked tracks with the reference's min-area filter
    (track.py:160-173)."""
    tlwh = track_tlwh(slab, fmt)
    valid = (
        slab.occupied
        & (slab.state == TRACKED)
        & slab.is_activated
        & (tlwh[:, 2] * tlwh[:, 3] > cfg.min_area)
    )
    return FrameOutput(
        track_id=slab.track_id, tlwh=tlwh, score=slab.score,
        cls=slab.cls, valid=valid,
    )


# ---------------------------------------------------------------------------
# Mid-sequence state checkpointing.
#
# The reference cannot do this: tracker state is a web of Python STrack
# objects plus a process-global id counter (BaseTrack._count,
# basetrack.py:22,43-46), and state simply resets per sequence
# (track.py:132). The slab is a flat pytree of arrays, so a long-running
# stream (RTSP serving, multi-hour sequences) checkpoints in one npz and
# resumes bit-exactly after a restart or preemption.
# ---------------------------------------------------------------------------

# cfg fields that shape or interpret the slab arrays; a checkpoint from a
# differently-configured tracker must not load silently.
_STATE_FINGERPRINT_FIELDS = (
    "tracker", "kalman_format", "capacity", "det_capacity",
    "feature_dim", "feature_hist", "extra_dim",
)


def _state_fingerprint(cfg: TrackerConfig) -> str:
    return ";".join(
        f"{k}={getattr(cfg, k)}" for k in _STATE_FINGERPRINT_FIELDS
    )


def save_slab(path: str, slab: TrackSlab, cfg: TrackerConfig,
              tag: str = "", aux: Optional[dict] = None) -> None:
    """Write tracker state to ``path`` (npz: one entry per slab field
    plus the config fingerprint). Fetches to host — call between frames,
    not inside jit.

    ``tag`` names the state's identity (e.g. the camera/stream source):
    :func:`load_slab` refuses a checkpoint whose tag differs, so a
    reordered ``--streams`` list cannot silently resume another camera's
    tracker state. ``aux`` carries extra host-side arrays (e.g. GMC
    previous-frame state) alongside the slab."""
    import numpy as np

    arrays = {f: np.asarray(v) for f, v in zip(slab._fields, slab)}
    arrays["_fingerprint"] = np.asarray(_state_fingerprint(cfg))
    if tag:
        arrays["_tag"] = np.asarray(tag)
    for k, v in (aux or {}).items():
        arrays["_aux_" + k] = np.asarray(v)
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    import os

    os.replace(tmp, path)  # atomic: a crash mid-write never corrupts


def load_slab(path: str, cfg: TrackerConfig, expect_tag: str = "",
              with_aux: bool = False):
    """Load tracker state saved by :func:`save_slab`, validating that the
    checkpoint was produced under a slab-compatible config (and, when
    ``expect_tag`` is given, for the same stream identity). With
    ``with_aux`` returns ``(slab, aux_dict)``."""
    import numpy as np

    with np.load(path) as z:
        got = str(z["_fingerprint"])
        want = _state_fingerprint(cfg)
        if got != want:
            raise ValueError(
                f"tracker state {path} was saved under a different "
                f"config:\n  saved:   {got}\n  current: {want}"
            )
        if expect_tag:
            got_tag = str(z["_tag"]) if "_tag" in z else ""
            if got_tag != expect_tag:
                raise ValueError(
                    f"tracker state {path} belongs to a different stream:"
                    f"\n  saved:   {got_tag or '<untagged>'}"
                    f"\n  current: {expect_tag}"
                )
        missing = [f for f in TrackSlab._fields if f not in z]
        if missing:
            raise ValueError(
                f"tracker state {path} is missing fields {missing}"
            )
        slab = TrackSlab(
            **{f: jnp.asarray(z[f]) for f in TrackSlab._fields}
        )
        if with_aux:
            aux = {k[len("_aux_"):]: np.asarray(z[k])
                   for k in z.files if k.startswith("_aux_")}
            return slab, aux
        return slab
