"""Oracles for the appearance/motion trackers (DeepSORT, BoT-SORT,
UAVMOT, StrongSORT): numpy object-list reimplementations of the
reference schedules, including the reference's step-4 lost-marking
quirk (strack_pool indexed with u_tracks0-relative indices,
deepsort.py:174-177 / strongsort.py:194-197 / uavmot.py:227-230) and
UAVMOT's matched_pair0.any() rematch gate — replicated exactly so these
oracles, the slab trackers, and the reference's own code all agree
(tests/test_reference_tracker_golden2.py)."""

import math

import numpy as np

from tests import oracles
from tests.oracle_tracker import (
    NEW, TRACKED, LOST, REMOVED, OTrack, OracleBase, iou_dist, joint, sub,
    dedup, tlwh2meas,
)
from yolov7_tracker_tpu.ops.assignment import linear_assignment_host


class OFeatTrack(OTrack):
    """OTrack + feature history / EMA (STrack feature logic,
    basetrack.py:97-102,324-332)."""

    def __init__(self, tracker, cls, tlwh, score, feature=None,
                 use_avg=True, budget=32):
        super().__init__(tracker, cls, tlwh, score)
        self.use_avg = use_avg
        self.budget = budget
        self.features = []
        if feature is not None:
            self.features.append(np.asarray(feature, np.float64))

    def update(self, det, frame_id):
        super().update(det, frame_id)
        if det.features:
            f = det.features[0] / np.linalg.norm(det.features[0])
            if self.use_avg:
                smooth = 0.9 * self.features[-1] + 0.1 * f
                smooth /= np.linalg.norm(smooth)
                self.features = [smooth]
            else:
                self.features.append(f)
                self.features = self.features[-self.budget:]


def cosine_dist(track_feats, det_feats):
    a = np.stack(track_feats)
    b = np.stack(det_feats)
    a = a / np.linalg.norm(a, axis=1, keepdims=True)
    b = b / np.linalg.norm(b, axis=1, keepdims=True)
    return 1.0 - a @ b.T


class OracleDeepSORT(OracleBase):
    fmt = "default"

    def gated_metric(self, tracks, dets):
        det_feats = np.stack([d.features[-1] for d in dets])
        cost = np.zeros((len(tracks), len(dets)))
        for i, tr in enumerate(tracks):
            d = cosine_dist(tr.features, det_feats)
            cost[i] = d.min(axis=0)
        cost[cost > 0.15] = 1e5
        meas = np.stack([tlwh2meas("default", d.tlwh) for d in dets])
        for i, tr in enumerate(tracks):
            gd = oracles.kf_gating(self.fmt, tr.mean, tr.cov, meas)
            cost[i, gd > 9.4877] = 1e5
        return cost

    def cascade(self, tracks, dets, thresh, depth):
        det_idx = list(range(len(dets)))
        matches = []
        for level in range(depth):
            if not det_idx:
                break
            rows = [k for k in range(len(tracks))
                    if tracks[k].time_since_update == 1 + level]
            if not rows:
                continue
            cost = self.gated_metric([tracks[k] for k in rows],
                                     [dets[j] for j in det_idx])
            m, _, u_col = linear_assignment_host(cost, thresh)
            for r, c in m:
                matches.append((rows[r], det_idx[c]))
            det_idx = [det_idx[c] for c in u_col]
        matched_rows = {r for r, _ in matches}
        u_rows = [k for k in range(len(tracks)) if k not in matched_rows]
        return matches, u_rows, det_idx

    def update(self, dets_feat):
        dets, feats = dets_feat
        self.frame_id += 1
        activated, refind, lost, removed = [], [], [], []
        keep = dets[:, 4] > self.conf
        dets, feats = dets[keep], feats[keep]
        detections = [
            OFeatTrack(self, d[5], [d[0], d[1], d[2] - d[0], d[3] - d[1]],
                       d[4], feature=f, use_avg=False)
            for d, f in zip(dets, feats)
        ]
        unconfirmed = [t for t in self.tracked if not t.is_activated]
        tracked = [t for t in self.tracked if t.is_activated]
        pool = joint(tracked, self.lost)
        self.multi_predict(pool)

        matches, u_t0, u_d0 = self.cascade(pool, detections, 0.9,
                                           self.max_time_lost)
        for it, idet in matches:
            tr, det = pool[it], detections[idet]
            if tr.state == TRACKED:
                tr.update(det, self.frame_id)
                activated.append(tr)
            else:
                tr.re_activate(det, self.frame_id)
                refind.append(tr)
        u_tracks0 = [pool[i] for i in u_t0 if pool[i].state == TRACKED]
        u_dets0 = [detections[i] for i in u_d0]
        cost = iou_dist(u_tracks0, u_dets0)
        m1, u_t1, u_d1 = linear_assignment_host(cost, 0.5)
        for r, c in m1:
            tr, det = u_tracks0[r], u_dets0[c]
            tr.update(det, self.frame_id)
            activated.append(tr)
        # reference quirk: indexes strack_pool with u_tracks0-relative
        # indices (deepsort.py:174-177)
        for i in u_t1:
            tr = pool[i]
            tr.state = LOST
            lost.append(tr)
        u_det1 = [u_dets0[i] for i in u_d1]
        cost = iou_dist(unconfirmed, u_det1)
        m2, u_t2, u_d2 = linear_assignment_host(cost, 0.9)
        for r, c in m2:
            unconfirmed[r].update(u_det1[c], self.frame_id)
            activated.append(unconfirmed[r])
        for i in u_t2:
            unconfirmed[i].state = REMOVED
            removed.append(unconfirmed[i])
        for i in u_d2:
            det = u_det1[i]
            if det.score > self.conf:
                det.activate(self.frame_id)
                activated.append(det)
        for tr in self.lost:
            if self.frame_id - tr.frame_id > self.max_time_lost:
                tr.state = REMOVED
                removed.append(tr)
        return self._finalize(activated, refind, lost, removed)


def multi_gmc(tracks, warp):
    """Reference multi_gmc (botsort.py:250-269): R8x8 = kron(I4, R),
    mean' = R8 mean + [t, 0...], cov' = R8 cov R8^T."""
    r2 = np.asarray(warp)[:2, :2]
    t2 = np.asarray(warp)[:2, 2]
    r8 = np.kron(np.eye(4), r2)
    for tr in tracks:
        tr.mean = r8 @ tr.mean
        tr.mean[:2] += t2
        tr.cov = r8 @ tr.cov @ r8.T


class OracleBoTSORT(OracleBase):
    fmt = "botsort"
    warp = None  # per-frame 2x3 camera warp (set by the GMC golden test)

    def update(self, dets):
        self.frame_id += 1
        activated, refind, lost, removed = [], [], [], []
        low_conf = max(0.15, self.conf - 0.3)
        hi = dets[:, 4] >= self.conf
        lo = ~hi & (dets[:, 4] > low_conf)
        mk = lambda d: OTrack(self, d[5],
                              [d[0], d[1], d[2] - d[0], d[3] - d[1]], d[4])
        d_high = [mk(d) for d in dets[hi]]
        d_low = [mk(d) for d in dets[lo]]
        unconfirmed = [t for t in self.tracked if not t.is_activated]
        tracked = [t for t in self.tracked if t.is_activated]
        pool = joint(tracked, self.lost)
        self.multi_predict(pool)
        if self.warp is not None:  # botsort.py:379-382
            multi_gmc(pool, self.warp)
            multi_gmc(unconfirmed, self.warp)
        m0, u_t0, u_d0 = linear_assignment_host(iou_dist(pool, d_high), 0.9)
        for r, c in m0:
            tr, det = pool[r], d_high[c]
            if tr.state == TRACKED:
                tr.update(det, self.frame_id)
                activated.append(tr)
            elif tr.state == LOST:
                tr.re_activate(det, self.frame_id)
                refind.append(tr)
        u_tracks0 = [pool[i] for i in u_t0]  # ALL unmatched (quirk)
        u_dets0 = [d_high[i] for i in u_d0]
        m1, u_t1, _ = linear_assignment_host(iou_dist(u_tracks0, d_low), 0.5)
        for r, c in m1:
            tr, det = u_tracks0[r], d_low[c]
            if tr.state == TRACKED:
                tr.update(det, self.frame_id)
                activated.append(tr)
            elif tr.state == LOST:
                tr.re_activate(det, self.frame_id)
                refind.append(tr)
        for i in u_t1:
            tr = u_tracks0[i]
            tr.state = LOST
            lost.append(tr)
        m2, u_t2, _ = linear_assignment_host(
            iou_dist(unconfirmed, u_dets0), 0.7
        )
        for r, c in m2:
            unconfirmed[r].update(u_dets0[c], self.frame_id)
            activated.append(unconfirmed[r])
        for i in u_t2:
            unconfirmed[i].state = REMOVED
            removed.append(unconfirmed[i])
        # births from u_dets0 even if matched to unconfirmed (quirk)
        for det in u_dets0:
            if det.score > self.conf + 0.1:
                det.activate(self.frame_id)
                activated.append(det)
        for tr in self.lost:
            if self.frame_id - tr.frame_id > self.max_time_lost:
                tr.state = REMOVED
                removed.append(tr)
        return self._finalize(activated, refind, lost, removed)


def structure_vec(xys, valid_idx, local_r=400.0):
    out = []
    for i in valid_idx:
        lens, idxs = [], []
        for j in valid_idx:
            d = np.linalg.norm(xys[i] - xys[j])
            if 0 < d < local_r:
                lens.append(d)
                idxs.append(j)
        if not lens:
            out.append([1e-4, 1e-4, 1e-4])
            continue
        mx, mn = max(lens), min(lens)
        if mx == mn:
            out.append([mx, mn, 1e-4])
            continue
        v1 = xys[idxs[lens.index(mx)]] - xys[i]
        v2 = xys[idxs[lens.index(mn)]] - xys[i]
        a1 = int(math.atan2(v1[1], v1[0]) * 180 / math.pi)
        a2 = int(math.atan2(v2[1], v2[0]) * 180 / math.pi)
        if a1 * a2 >= 0:
            inc = abs(a1 - a2)
        else:
            inc = abs(a1) + abs(a2)
            if inc > 180:
                inc = 360 - inc
        out.append([mx, mn, inc])
    return np.asarray(out, np.float64)


class OracleUAVMOT(OracleBase):
    fmt = "default"

    def update(self, dets):
        self.frame_id += 1
        activated, refind, lost, removed = [], [], [], []
        low_conf = max(0.15, self.conf - 0.3)
        hi = dets[:, 4] >= self.conf
        lo = ~hi & (dets[:, 4] > low_conf)
        mk = lambda d: OTrack(self, d[5],
                              [d[0], d[1], d[2] - d[0], d[3] - d[1]], d[4])
        d_high = [mk(d) for d in dets[hi]]
        d_low = [mk(d) for d in dets[lo]]
        unconfirmed = [t for t in self.tracked if not t.is_activated]
        tracked = [t for t in self.tracked if t.is_activated]
        pool = joint(tracked, self.lost)
        self.multi_predict(pool)
        cost = iou_dist(pool, d_high)
        m_a, u_t0, u_d0 = linear_assignment_host(cost, 0.7)
        # matched_pair0.any() gate (uavmot.py:182): a lone (0, 0) match
        # reads as "nothing matched" and skips the rematch
        if np.asarray(m_a).any():
            t_xy = np.stack([t.mean[:2] for t in pool]) if pool else np.zeros((0, 2))
            d_xy = np.stack(
                [d.tlwh[:2] + np.floor(d.tlwh[2:] / 2) for d in d_high]
            ) if d_high else np.zeros((0, 2))
            sa = structure_vec(t_xy, list(range(len(pool))))
            sb = structure_vec(d_xy, list(range(len(d_high))))
            if len(sa) and len(sb):
                na = sa / np.linalg.norm(sa, axis=1, keepdims=True)
                nb = sb / np.linalg.norm(sb, axis=1, keepdims=True)
                sdist = np.maximum(0.0, 1.0 - na @ nb.T)
                fused = 0.98 * cost + 0.02 * sdist
                m_a, u_t0, u_d0 = linear_assignment_host(fused, 0.8)
        for r, c in m_a:
            tr, det = pool[r], d_high[c]
            if tr.state == TRACKED:
                tr.update(det, self.frame_id)
                activated.append(tr)
            elif tr.state == LOST:
                tr.re_activate(det, self.frame_id)
                refind.append(tr)
        u_tracks0 = [pool[i] for i in u_t0 if pool[i].state == TRACKED]
        u_dets0 = [d_high[i] for i in u_d0]
        m1, u_t1, _ = linear_assignment_host(iou_dist(u_tracks0, d_low), 0.5)
        for r, c in m1:
            tr, det = u_tracks0[r], d_low[c]
            if tr.state == TRACKED:
                tr.update(det, self.frame_id)
                activated.append(tr)
            elif tr.state == LOST:
                tr.re_activate(det, self.frame_id)
                refind.append(tr)
        for i in u_t1:  # reference quirk: pool indexed (uavmot.py:227)
            tr = pool[i]
            tr.state = LOST
            lost.append(tr)
        m2, u_t2, u_d2 = linear_assignment_host(
            iou_dist(unconfirmed, u_dets0), 0.7
        )
        for r, c in m2:
            unconfirmed[r].update(u_dets0[c], self.frame_id)
            activated.append(unconfirmed[r])
        for i in u_t2:
            unconfirmed[i].state = REMOVED
            removed.append(unconfirmed[i])
        for i in u_d2:
            det = u_dets0[i]
            if det.score > self.conf + 0.1:
                det.activate(self.frame_id)
                activated.append(det)
        for tr in self.lost:
            if self.frame_id - tr.frame_id > self.max_time_lost:
                tr.state = REMOVED
                removed.append(tr)
        return self._finalize(activated, refind, lost, removed)


class OracleStrongSORT(OracleBase):
    fmt = "strongsort"

    def __init__(self, gamma=0.1, **kw):
        super().__init__(**kw)
        self.gamma = gamma

    @staticmethod
    def _euclid(tracks, dets):
        a = np.stack([t.features[-1] for t in tracks])
        b = np.stack([d.features[0] for d in dets])
        d2 = (
            (a**2).sum(1)[:, None] - 2 * a @ b.T + (b**2).sum(1)[None, :]
        )
        return np.sqrt(np.maximum(d2, 0))

    def fused(self, tracks, dets):
        if not tracks or not dets:
            return np.zeros((len(tracks), len(dets)))
        return self.gamma * iou_dist(tracks, dets) + (
            1 - self.gamma
        ) * self._euclid(tracks, dets)

    def update(self, dets_feat):
        dets, feats = dets_feat
        self.frame_id += 1
        activated, refind, lost, removed = [], [], [], []
        keep = dets[:, 4] > self.conf
        dets, feats = dets[keep], feats[keep]
        detections = [
            OFeatTrack(self, d[5], [d[0], d[1], d[2] - d[0], d[3] - d[1]],
                       d[4], feature=f, use_avg=True)
            for d, f in zip(dets, feats)
        ]
        unconfirmed = [t for t in self.tracked if not t.is_activated]
        tracked = [t for t in self.tracked if t.is_activated]
        pool = joint(tracked, self.lost)
        self.multi_predict(pool)
        m0, u_t0, u_d0 = linear_assignment_host(
            self.fused(pool, detections), 0.7
        )
        for r, c in m0:
            tr, det = pool[r], detections[c]
            if tr.state == TRACKED:
                tr.update(det, self.frame_id)
                activated.append(tr)
            elif tr.state == LOST:
                tr.re_activate(det, self.frame_id)
                refind.append(tr)
        u_tracks0 = [pool[i] for i in u_t0 if pool[i].state == TRACKED]
        u_dets0 = [detections[i] for i in u_d0]
        m1, u_t1, u_d1 = linear_assignment_host(
            iou_dist(u_tracks0, u_dets0), 0.5
        )
        for r, c in m1:
            u_tracks0[r].update(u_dets0[c], self.frame_id)
            activated.append(u_tracks0[r])
        for i in u_t1:  # reference quirk: pool indexed (strongsort.py:194)
            tr = pool[i]
            tr.state = LOST
            lost.append(tr)
        u_det1 = [u_dets0[i] for i in u_d1]
        m2, u_t2, u_d2 = linear_assignment_host(
            self.fused(unconfirmed, u_det1), 0.7
        )
        for r, c in m2:
            unconfirmed[r].update(u_det1[c], self.frame_id)
            activated.append(unconfirmed[r])
        for i in u_t2:
            unconfirmed[i].state = REMOVED
            removed.append(unconfirmed[i])
        for i in u_d2:
            det = u_det1[i]
            if det.score > self.conf + 0.1:
                det.activate(self.frame_id)
                activated.append(det)
        for tr in self.lost:
            if self.frame_id - tr.frame_id > self.max_time_lost:
                tr.state = REMOVED
                removed.append(tr)
        return self._finalize(activated, refind, lost, removed)
