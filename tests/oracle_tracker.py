"""Numpy object-list oracle trackers (SORT / ByteTrack / C-BIoU).

Independent reimplementation of the reference tracker semantics
(tracker/basetrack.py, bytetrack.py, c_biou_tracker.py) used as golden
ground truth for the slab-based device trackers. Deliberately written in
the reference's style (mutable track objects + list algebra) so the two
implementations share no code.
"""

import numpy as np

from tests import oracles
from yolov7_tracker_tpu.ops.assignment import linear_assignment_host

NEW, TRACKED, LOST, REMOVED = 0, 1, 2, 3


def tlwh2meas(fmt, tlwh):
    t = np.asarray(tlwh, np.float64)
    if fmt in ("default", "strongsort"):
        return np.array([t[0] + t[2] / 2, t[1] + t[3] / 2, t[2] / t[3], t[3]])
    if fmt == "naive":
        return np.array(
            [t[0] + t[2] / 2, t[1] + t[3] / 2, t[2] * t[3], t[3] / t[2]]
        )
    if fmt == "botsort":
        return np.array([t[0] + t[2] // 2, t[1] + t[3] // 2, t[2], t[3]])
    raise ValueError(fmt)


class OTrack:
    def __init__(self, tracker, cls, tlwh, score, feature=None):
        self.tracker = tracker
        self.cls = cls
        self._tlwh = np.asarray(tlwh, np.float64)
        self.score = score
        self.state = NEW
        self.is_activated = False
        self.track_id = None
        self.mean = None
        self.cov = None
        self.frame_id = None
        self.start_frame = None
        self.tracklet_len = 0
        self.time_since_update = 0
        self.feature = feature

    @property
    def fmt(self):
        return self.tracker.fmt

    @property
    def tlwh(self):
        if self.mean is None:
            return self._tlwh.copy()
        m = self.mean[:4].copy()
        if self.fmt in ("default", "strongsort"):
            w = m[2] * m[3]
            return np.array([m[0] - w / 2, m[1] - m[3] / 2, w, m[3]])
        if self.fmt == "naive":
            h = np.sqrt(m[2] * m[3])
            w = m[2] / h
            return np.array([m[0], m[1], w, h])  # center-anchored quirk
        if self.fmt == "botsort":
            return np.array([m[0] - m[2] / 2, m[1] - m[3] / 2, m[2], m[3]])
        raise ValueError(self.fmt)

    @property
    def tlbr(self):
        t = self.tlwh
        return np.array([t[0], t[1], t[0] + t[2], t[1] + t[3]])

    def activate(self, frame_id):
        self.track_id = self.tracker.next_id()
        self.mean, self.cov = oracles.kf_initiate(
            self.fmt, tlwh2meas(self.fmt, self._tlwh)
        )
        self.state = TRACKED
        self.is_activated = frame_id == 1
        self.frame_id = frame_id
        self.start_frame = frame_id
        self.time_since_update = 0

    def re_activate(self, det, frame_id):
        self.mean, self.cov = oracles.kf_update(
            self.fmt, self.mean, self.cov, tlwh2meas(self.fmt, det.tlwh)
        )
        self.tracklet_len = 0
        self.state = TRACKED
        self.is_activated = True
        self.frame_id = frame_id
        self.score = det.score
        self.time_since_update = 0

    def update(self, det, frame_id):
        self.frame_id = frame_id
        self.tracklet_len += 1
        self.score = det.score
        conf = self.score if self.fmt == "strongsort" else None
        self.mean, self.cov = oracles.kf_update(
            self.fmt, self.mean, self.cov, tlwh2meas(self.fmt, det.tlwh), conf
        )
        self.state = TRACKED
        self.is_activated = True
        self.time_since_update = 0


def iou_dist(tracks_a, tracks_b):
    if not tracks_a or not tracks_b:
        return np.zeros((len(tracks_a), len(tracks_b)))
    a = np.stack([t.tlbr for t in tracks_a])
    b = np.stack([t.tlbr for t in tracks_b])
    return 1.0 - oracles.iou_matrix_np(a, b)


class OracleBase:
    fmt = "default"

    def __init__(self, conf_thresh=0.2, iou_thresh=0.5, track_buffer=30,
                 frame_rate=30, kalman_format=None):
        if kalman_format:
            self.fmt = kalman_format
        self.conf = conf_thresh
        self.iou_thresh = iou_thresh
        self.max_time_lost = int(frame_rate / 30.0 * track_buffer)
        self.tracked = []
        self.lost = []
        self.removed = []
        self.frame_id = 0
        self._count = 0

    def next_id(self):
        self._count += 1
        return self._count

    def multi_predict(self, pool):
        for t in pool:
            if t.state != TRACKED:
                t.mean[oracles.kf_dims(self.fmt) - 1] = 0
            t.mean, t.cov = oracles.kf_predict(self.fmt, t.mean, t.cov)
            t.time_since_update += 1

    def _finalize(self, activated, refind, lost, removed):
        self.tracked = [t for t in self.tracked if t.state == TRACKED]
        self.tracked = joint(self.tracked, activated)
        self.tracked = joint(self.tracked, refind)
        self.lost = sub(self.lost, self.tracked)
        self.lost.extend(lost)
        self.lost = sub(self.lost, self.removed)
        self.removed.extend(removed)
        self.tracked, self.lost = dedup(self.tracked, self.lost)
        return [t for t in self.tracked if t.is_activated]


class OracleSORT(OracleBase):
    def update(self, dets):
        """dets: (N, 6) [tlbr, score, cls]."""
        self.frame_id += 1
        activated, refind, lost, removed = [], [], [], []
        dets = dets[dets[:, 4] > self.conf]
        detections = [
            OTrack(self, d[5], [d[0], d[1], d[2] - d[0], d[3] - d[1]], d[4])
            for d in dets
        ]
        unconfirmed = [t for t in self.tracked if not t.is_activated]
        tracked = [t for t in self.tracked if t.is_activated]
        pool = joint(tracked, self.lost)
        self.multi_predict(pool)
        cost = iou_dist(pool, detections)
        matches, u_t, u_d = linear_assignment_host(cost, self.iou_thresh)
        for it, idet in matches:
            tr, det = pool[it], detections[idet]
            if tr.state == TRACKED:
                tr.update(det, self.frame_id)
                activated.append(tr)
            else:
                tr.re_activate(det, self.frame_id)
                refind.append(tr)
        for it in u_t:
            tr = pool[it]
            if tr.state == TRACKED:
                tr.state = LOST
                lost.append(tr)
        u_det = [detections[i] for i in u_d]
        cost = iou_dist(unconfirmed, u_det)
        matches, u_t1, u_d1 = linear_assignment_host(cost, self.iou_thresh + 0.1)
        for it, idet in matches:
            tr, det = unconfirmed[it], u_det[idet]
            if tr.state == TRACKED:
                tr.update(det, self.frame_id)
                activated.append(tr)
            else:
                tr.re_activate(det, self.frame_id)
                refind.append(tr)
        for it in u_t1:
            unconfirmed[it].state = REMOVED
            removed.append(unconfirmed[it])
        for idet in u_d1:
            det = u_det[idet]
            if det.score > self.conf + 0.1:
                det.activate(self.frame_id)
                activated.append(det)
        for tr in self.lost:
            if self.frame_id - tr.frame_id > self.max_time_lost:
                tr.state = REMOVED
                removed.append(tr)
        return self._finalize(activated, refind, lost, removed)


class OracleByteTrack(OracleBase):
    def update(self, dets):
        self.frame_id += 1
        activated, refind, lost, removed = [], [], [], []
        low_conf = max(0.15, self.conf - 0.3)
        hi_mask = dets[:, 4] >= self.conf
        lo_mask = ~hi_mask & (dets[:, 4] > low_conf)
        mk = lambda d: OTrack(
            self, d[5], [d[0], d[1], d[2] - d[0], d[3] - d[1]], d[4]
        )
        d_high = [mk(d) for d in dets[hi_mask]]
        d_low = [mk(d) for d in dets[lo_mask]]
        unconfirmed = [t for t in self.tracked if not t.is_activated]
        tracked = [t for t in self.tracked if t.is_activated]
        pool = joint(tracked, self.lost)
        self.multi_predict(pool)
        cost = iou_dist(pool, d_high)
        matches, u_t0, u_d0 = linear_assignment_host(cost, 0.9)
        for it, idet in matches:
            tr, det = pool[it], d_high[idet]
            if tr.state == TRACKED:
                tr.update(det, self.frame_id)
                activated.append(tr)
            elif tr.state == LOST:
                tr.re_activate(det, self.frame_id)
                refind.append(tr)
        u_tracks0 = [pool[i] for i in u_t0 if pool[i].state == TRACKED]
        u_dets0 = [d_high[i] for i in u_d0]
        cost = iou_dist(u_tracks0, d_low)
        matches, u_t1, _ = linear_assignment_host(cost, 0.5)
        for it, idet in matches:
            tr, det = u_tracks0[it], d_low[idet]
            if tr.state == TRACKED:
                tr.update(det, self.frame_id)
                activated.append(tr)
            elif tr.state == LOST:
                tr.re_activate(det, self.frame_id)
                refind.append(tr)
        for i in u_t1:
            u_tracks0[i].state = LOST
            lost.append(u_tracks0[i])
        cost = iou_dist(unconfirmed, u_dets0)
        matches, u_t2, u_d2 = linear_assignment_host(cost, 0.7)
        for it, idet in matches:
            unconfirmed[it].update(u_dets0[idet], self.frame_id)
            activated.append(unconfirmed[it])
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


class OCBTrack(OTrack):
    """C-BIoU track: no Kalman, deque of raw boxes + motion states."""

    B1, B2, N = 0.3, 0.5, 5

    def __init__(self, tracker, cls, tlwh, score):
        super().__init__(tracker, cls, tlwh, score)
        self.buffer = [self._tlwh.copy()]
        self.bb1 = self.buffered(self._tlwh, self.B1)
        self.bb2 = self.buffered(self._tlwh, self.B2)
        self.ms1 = self.bb1.copy()
        self.ms2 = self.bb2.copy()

    @staticmethod
    def buffered(t, b):
        return np.maximum(
            0.0, t + np.array([-b * t[2], -b * t[3], 2 * b * t[2], 2 * b * t[3]])
        )

    @property
    def tlwh(self):
        return self.buffer[-1].copy()

    @property
    def tlbr(self):
        t = self.tlwh
        return np.array([t[0], t[1], t[0] + t[2], t[1] + t[3]])

    def activate(self, frame_id):
        self.track_id = self.tracker.next_id()
        self.state = TRACKED
        self.is_activated = frame_id == 1
        self.frame_id = frame_id
        self.start_frame = frame_id

    def _append(self, tlwh):
        if len(self.buffer) > self.N:
            self.buffer.pop(0)
        self.buffer.append(np.asarray(tlwh, np.float64))

    def re_activate(self, det, frame_id):
        self.tracklet_len = 0
        self.state = TRACKED
        self.is_activated = True
        self.frame_id = frame_id
        self.score = det.score
        self._tlwh = det._tlwh
        self._append(self._tlwh)
        self.bb1 = self.buffered(self._tlwh, self.B1)
        self.bb2 = self.buffered(self._tlwh, self.B2)
        self.ms1 = self.bb1.copy()
        self.ms2 = self.bb2.copy()
        # quirk: time_since_update NOT reset

    def update(self, det, frame_id):
        self.frame_id = frame_id
        self.tracklet_len += 1
        new_tlwh = det.tlwh
        self._tlwh = new_tlwh
        self.score = det.score
        self._append(new_tlwh)
        if self.time_since_update:
            if len(self.buffer) < self.N:
                src = new_tlwh
            else:
                src = self.buffer[-1] + (self.time_since_update / self.N) * (
                    self.buffer[-1] - self.buffer[0]
                )
        else:
            src = new_tlwh
        self.ms1 = self.buffered(src, self.B1)
        self.ms2 = self.buffered(src, self.B2)
        self.state = TRACKED
        self.is_activated = True
        self.time_since_update = 0


class OracleCBIoU(OracleBase):
    fmt = "none"

    def update(self, dets):
        self.frame_id += 1
        activated, refind, lost, removed = [], [], [], []
        dets = dets[dets[:, 4] > self.conf]
        detections = [
            OCBTrack(self, d[5], [d[0], d[1], d[2] - d[0], d[3] - d[1]], d[4])
            for d in dets
        ]
        unconfirmed = [t for t in self.tracked if not t.is_activated]
        tracked = [t for t in self.tracked if t.is_activated]
        pool = joint(tracked, self.lost)

        def bdist(tracks, ds, level):
            if not tracks or not ds:
                return np.zeros((len(tracks), len(ds)))
            a = np.stack([(t.ms1 if level == 1 else t.ms2) for t in tracks])
            a = np.concatenate([a[:, :2], a[:, :2] + a[:, 2:]], axis=1)
            b = np.stack([(d.bb1 if level == 1 else d.bb2) for d in ds])
            b = np.concatenate([b[:, :2], b[:, :2] + b[:, 2:]], axis=1)
            return 1.0 - oracles.iou_matrix_np(a, b)

        matches, u_t0, u_d0 = linear_assignment_host(
            bdist(pool, detections, 1), 0.9
        )
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
        matches, u_t1, u_d1 = linear_assignment_host(
            bdist(u_tracks0, u_dets0, 2), 0.5
        )
        for it, idet in matches:
            tr, det = u_tracks0[it], u_dets0[idet]
            if tr.state == TRACKED:
                tr.update(det, self.frame_id)
                activated.append(tr)
            else:
                tr.re_activate(det, self.frame_id)
                refind.append(tr)
        u_tracks1 = [u_tracks0[i] for i in u_t1]
        u_dets1 = [u_dets0[i] for i in u_d1]
        matches, u_tu, u_du = linear_assignment_host(
            bdist(unconfirmed, u_dets1, 1), 0.7
        )
        for it, idet in matches:
            unconfirmed[it].update(u_dets1[idet], self.frame_id)
            activated.append(unconfirmed[it])
        for i in u_tu:
            unconfirmed[i].state = REMOVED
            removed.append(unconfirmed[i])
        for i in u_du:
            det = u_dets1[i]
            if det.score > self.conf + 0.1:
                det.activate(self.frame_id)
                activated.append(det)
        for tr in u_tracks1:
            if self.frame_id - tr.frame_id > self.max_time_lost:
                tr.state = REMOVED
                removed.append(tr)
            else:
                tr.state = LOST
                tr.time_since_update = self.frame_id - tr.frame_id
                lost.append(tr)
        return self._finalize(activated, refind, lost, removed)


def joint(a, b):
    seen = {t.track_id for t in a}
    out = list(a)
    for t in b:
        if t.track_id not in seen:
            seen.add(t.track_id)
            out.append(t)
    return out


def sub(a, b):
    ids = {t.track_id for t in b}
    return [t for t in a if t.track_id not in ids]


def dedup(a, b):
    if not a or not b:
        return a, b
    d = iou_dist(a, b)
    pairs = np.where(d < 0.15)
    dupa, dupb = set(), set()
    for p, q in zip(*pairs):
        timep = a[p].frame_id - a[p].start_frame
        timeq = b[q].frame_id - b[q].start_frame
        if timep > timeq:
            dupb.add(q)
        else:
            dupa.add(p)
    return (
        [t for i, t in enumerate(a) if i not in dupa],
        [t for i, t in enumerate(b) if i not in dupb],
    )
