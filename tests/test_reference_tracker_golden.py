"""Slab tracker vs the REFERENCE'S OWN tracker code.

The reference's python trackers couldn't previously serve as oracles
because the `lap` and `cython_bbox` wheels do not build on this box.
This test shims both — lap.lapjv via scipy on the exact cost-limit
extended construction, cython_bbox.bbox_overlaps as the +1-convention
IoU — and runs tracker/bytetrack.py UNMODIFIED on the synthetic
detection streams, comparing its per-frame (id, tlwh, score) output
with the slab tracker's. A stronger golden than the independent numpy
reimplementations in tests/oracle_tracker.py: the oracle here is the
reference's own control flow.
"""

import os
import sys
import types

import numpy as np
import pytest

REF_TRACKER = "/root/reference/tracker"
pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REF_TRACKER),
                       reason="reference tracker not available"),
]

from tests.test_trackers_golden import (compare, run_slab_tracker,
                                        synth_stream)


def _install_shims():
    from scipy.optimize import linear_sum_assignment

    # numpy>=2 removed the aliases the reference uses
    for name, val in (("float", np.float64), ("int", np.int_),
                      ("bool", np.bool_)):
        if not hasattr(np, name):
            setattr(np, name, val)

    if "lap" not in sys.modules:
        lap = types.ModuleType("lap")

        def lapjv(cost, extend_cost=False, cost_limit=None):
            """lap.lapjv cost-limit semantics via scipy on the extended
            square matrix (the same construction as
            ops/assignment.linear_assignment_host)."""
            cost = np.asarray(cost, np.float64)
            n, m = cost.shape
            x = np.full(n, -1, int)
            y = np.full(m, -1, int)
            if cost.size == 0:
                return 0.0, x, y
            if cost_limit is not None:
                ext = np.full((n + m, n + m), cost_limit / 2.0)
                ext[n:, m:] = 0.0
                ext[:n, :m] = cost
            else:
                ext = cost
            rows, cols = linear_sum_assignment(ext)
            total = 0.0
            for r, c in zip(rows, cols):
                if r < n and c < m:
                    x[r] = c
                    y[c] = r
                    total += cost[r, c]
            return total, x, y

        lap.lapjv = lapjv
        sys.modules["lap"] = lap

    if "cython_bbox" not in sys.modules:
        cb = types.ModuleType("cython_bbox")

        def bbox_overlaps(boxes, query):
            """cython_bbox IoU on tlbr with the +1 area convention."""
            boxes = np.asarray(boxes, np.float64)
            query = np.asarray(query, np.float64)
            if len(boxes) == 0 or len(query) == 0:
                return np.zeros((len(boxes), len(query)))
            iw = (np.minimum(boxes[:, None, 2], query[None, :, 2])
                  - np.maximum(boxes[:, None, 0], query[None, :, 0]) + 1)
            ih = (np.minimum(boxes[:, None, 3], query[None, :, 3])
                  - np.maximum(boxes[:, None, 1], query[None, :, 1]) + 1)
            iw = np.maximum(iw, 0)
            ih = np.maximum(ih, 0)
            inter = iw * ih
            a1 = ((boxes[:, 2] - boxes[:, 0] + 1)
                  * (boxes[:, 3] - boxes[:, 1] + 1))[:, None]
            a2 = ((query[:, 2] - query[:, 0] + 1)
                  * (query[:, 3] - query[:, 1] + 1))[None, :]
            return inter / (a1 + a2 - inter)

        cb.bbox_overlaps = bbox_overlaps
        sys.modules["cython_bbox"] = cb

    from tests.test_model_parity import _stub_missing_modules

    _stub_missing_modules()
    if REF_TRACKER not in sys.path:
        sys.path.insert(0, REF_TRACKER)


def _make_reference_bytetracker(conf=0.5, kalman_format="default",
                                track_buffer=30, img_size=800):
    _install_shims()
    import bytetrack as ref_bt

    # the ctor unconditionally builds the ReID extractor; appearance is
    # off for ByteTrack so stub it out
    ref_bt.Extractor = lambda *a, **k: None
    # the reference's track-id counter is a class attribute that
    # persists across tracker instances; reset it per run
    import basetrack

    basetrack.BaseTrack._count = 0
    opts = types.SimpleNamespace(
        conf_thresh=conf, track_buffer=track_buffer,
        kalman_format=kalman_format, img_size=img_size,
        reid_model_path="", nms_thresh=0.7,
    )
    return ref_bt.ByteTrack(opts, frame_rate=30)


def run_reference(stream, **kw):
    tr = _make_reference_bytetracker(**kw)
    img = np.zeros((800, 800, 3), np.uint8)
    results = []
    for dets in stream:
        outs = tr.update(dets.copy(), img)
        frame = {}
        for t in outs:
            frame[int(t.track_id)] = (np.asarray(t.tlwh, float),
                                      float(t.score))
        results.append(frame)
    return results


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bytetrack_matches_reference_code(seed):
    from yolov7_tracker_tpu.trackers import TrackerConfig

    stream = synth_stream(seed)
    want = run_reference(stream, conf=0.5)
    cfg = TrackerConfig(tracker="bytetrack", conf_thresh=0.5,
                        capacity=64, det_capacity=32,
                        kalman_format="default")
    got = run_slab_tracker(stream, cfg)
    # ids must agree exactly; boxes tolerate the f32-vs-f64 Kalman
    # drift over 60 frames (the slab filter runs float32)
    compare(got, want, box_atol=3.0)


def run_reference_sort(stream, conf=0.5, kalman_format="naive",
                       track_buffer=30):
    _install_shims()
    import basetrack

    basetrack.BaseTrack._count = 0
    opts = types.SimpleNamespace(
        conf_thresh=conf, track_buffer=track_buffer,
        kalman_format=kalman_format, img_size=800, reid_model_path="",
        iou_thresh=0.5,
    )
    tr = basetrack.BaseTracker(opts, frame_rate=30)
    img = np.zeros((800, 800, 3), np.uint8)
    results = []
    for dets in stream:
        outs = tr.update(dets.copy(), img)
        results.append({int(t.track_id): (np.asarray(t.tlwh, float),
                                          float(t.score))
                        for t in outs})
    return results


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1])
def test_sort_matches_reference_code(seed):
    """BaseTracker IS the reference's SORT; same shimmed-oracle
    comparison. kalman_format='default' — the reference
    NaiveKalmanFilter.multi_predict mixes (N,) arrays with a scalar in
    its Q list (kalman_filter.py:100-110), which numpy>=1.24 rejects,
    so the 'naive' path cannot run upstream on this box (it stays
    covered by the numpy-oracle goldens in test_trackers_golden)."""
    from yolov7_tracker_tpu.trackers import TrackerConfig

    stream = synth_stream(seed)
    want = run_reference_sort(stream, conf=0.5, kalman_format="default")
    cfg = TrackerConfig(tracker="sort", conf_thresh=0.5, capacity=64,
                        det_capacity=32, kalman_format="default")
    got = run_slab_tracker(stream, cfg)
    compare(got, want, box_atol=3.0)
