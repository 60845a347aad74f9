"""Slab trackers vs the REFERENCE'S OWN tracker code — the remaining six.

Extends tests/test_reference_tracker_golden.py (ByteTrack/SORT) to the
rest of the tracker zoo: the reference's c_biou_tracker.py, uavmot.py,
botsort.py (GMC off), deepsort.py and strongsort.py run UNMODIFIED over
the lap/cython_bbox shims, with their ReID extractors replaced by a
deterministic feature source shared with the slab side (CNN forward
parity is separately torch-golden in tests/test_reid_parity.py — these
tests pin the association CONTROL FLOW, the part a reimplementation can
silently get wrong).

Also adds a ≥500-frame ByteTrack stream to bound long-horizon
f32-vs-f64 Kalman drift (SURVEY §7 "float drift" hard part).
"""

import types

import numpy as np
import pytest

from tests.test_reference_tracker_golden import (REF_TRACKER, _install_shims,
                                                 pytestmark)  # noqa: F401
from tests.test_trackers_golden import compare, run_slab_tracker, synth_stream
from tests.test_trackers_golden2 import FDIM, run_slab, synth_stream_feat

pytestmark = list(pytestmark) + [pytest.mark.slow]


def _base_opts(conf=0.5, kalman_format="default", track_buffer=30,
               **extra):
    opts = types.SimpleNamespace(
        conf_thresh=conf, track_buffer=track_buffer,
        kalman_format=kalman_format, img_size=800, reid_model_path="",
        nms_thresh=0.7, iou_thresh=0.5,
    )
    for k, v in extra.items():
        setattr(opts, k, v)
    return opts


def _reset_ids():
    import basetrack

    basetrack.BaseTrack._count = 0


class _FeatLookup:
    """Deterministic ReID stand-in: serves each reference get_feature
    call the exact per-detection features the slab side receives, keyed
    by box coordinates (the reference filters detections before
    extracting, so indices don't line up — coordinates do)."""

    def __init__(self):
        self.dets = None
        self.feats = None

    def set_frame(self, dets, feats):
        self.dets = dets
        self.feats = feats

    def __call__(self, tlbrs, ori_img=None):
        out = np.zeros((len(tlbrs), FDIM), np.float64)
        for i, t in enumerate(tlbrs):
            j = int(np.argmin(np.abs(self.dets[:, :4]
                                     - np.asarray(t)[None]).sum(1)))
            out[i] = self.feats[j]
        return out


def _emit(outs):
    return {int(t.track_id): (np.asarray(t.tlwh, float), float(t.score))
            for t in outs}


IMG = np.zeros((800, 800, 3), np.uint8)


# ---------------------------------------------------------------------------
# C_BIoU — /root/reference/tracker/c_biou_tracker.py:213-353
# ---------------------------------------------------------------------------

def run_reference_cbiou(stream, conf=0.5):
    _install_shims()
    import c_biou_tracker as ref

    _reset_ids()
    tr = ref.C_BIoUTracker(_base_opts(conf=conf))
    return [_emit(tr.update(d.copy(), IMG)) for d in stream]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cbiou_matches_reference_code(seed):
    from yolov7_tracker_tpu.trackers import TrackerConfig

    stream = synth_stream(seed)
    want = run_reference_cbiou(stream)
    cfg = TrackerConfig(tracker="c_bioutracker", conf_thresh=0.5,
                        capacity=64, det_capacity=32)
    got = run_slab_tracker(stream, cfg)
    # no Kalman: boxes are raw detections — tight tolerance
    compare(got, want, box_atol=0.01)


# ---------------------------------------------------------------------------
# UAVMOT — /root/reference/tracker/uavmot.py:74-279 (AMF + structure sim)
# ---------------------------------------------------------------------------

def run_reference_uavmot(stream, conf=0.5):
    _install_shims()
    import uavmot as ref

    ref.Extractor = lambda *a, **k: None
    _reset_ids()
    tr = ref.UAVMOT(_base_opts(conf=conf))
    return [_emit(tr.update(d.copy(), IMG)) for d in stream]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_uavmot_matches_reference_code(seed):
    from yolov7_tracker_tpu.trackers import TrackerConfig

    stream = synth_stream(seed)
    want = run_reference_uavmot(stream)
    cfg = TrackerConfig(tracker="uavmot", conf_thresh=0.5, capacity=64,
                        det_capacity=32)
    got = run_slab_tracker(stream, cfg)
    compare(got, want, box_atol=3.0)


# ---------------------------------------------------------------------------
# BoT-SORT, GMC off — /root/reference/tracker/botsort.py:271-493
# (the GMC warp itself is cv2-golden in tests/test_gmc.py; feeding both
# sides an identical precomputed warp is covered there)
# ---------------------------------------------------------------------------

def run_reference_botsort(stream, conf=0.5):
    _install_shims()
    import botsort as ref

    ref.Extractor = lambda *a, **k: None
    _reset_ids()
    tr = ref.BoTSORT(_base_opts(conf=conf, kalman_format="botsort"),
                     use_GMC=False)
    return [_emit(tr.update(d.copy(), IMG)) for d in stream]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_botsort_matches_reference_code(seed):
    from yolov7_tracker_tpu.trackers import TrackerConfig

    stream = synth_stream(seed)
    want = run_reference_botsort(stream)
    cfg = TrackerConfig(tracker="botsort", conf_thresh=0.5, capacity=64,
                        det_capacity=32)
    got = run_slab_tracker(stream, cfg)
    compare(got, want, box_atol=3.0)


# ---------------------------------------------------------------------------
# DeepSORT — /root/reference/tracker/deepsort.py:85-227 (cascade+gating)
# ---------------------------------------------------------------------------

def run_reference_deepsort(stream_feat, conf=0.5):
    _install_shims()
    import deepsort as ref

    ref.Extractor = lambda *a, **k: None
    _reset_ids()
    tr = ref.DeepSORT(_base_opts(conf=conf))
    lookup = _FeatLookup()
    tr.get_feature = lookup
    results = []
    for dets, feats in stream_feat:
        lookup.set_frame(dets, feats)
        results.append(_emit(tr.update(dets.copy(), IMG)))
    return results


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_deepsort_matches_reference_code(seed):
    from yolov7_tracker_tpu.trackers import TrackerConfig

    stream = synth_stream_feat(seed)
    want = run_reference_deepsort(stream)
    # feature_hist=64 ≥ stream length so the slab ring buffer never
    # evicts — the reference keeps budget 100 (basetrack.py:98,331-332)
    cfg = TrackerConfig(tracker="deepsort", conf_thresh=0.5, capacity=64,
                        det_capacity=32, feature_dim=FDIM,
                        feature_hist=64, use_avg_of_feature=False)
    got = run_slab(stream, cfg, with_feats=True)
    compare(got, want, box_atol=3.0)


# ---------------------------------------------------------------------------
# StrongSORT (ECC off) — /root/reference/tracker/strongsort.py:110-250
# ---------------------------------------------------------------------------

def run_reference_strongsort(stream_feat, conf=0.5):
    _install_shims()
    import strongsort as ref

    class _Dummy:
        def cuda(self):
            return self

        def eval(self):
            return self

    ref.osnet_x0_25 = lambda *a, **k: _Dummy()
    ref.load_pretrained_weights = lambda *a, **k: None
    _reset_ids()
    tr = ref.StrongSORT(_base_opts(conf=conf, kalman_format="strongsort"),
                        use_ECC=False, use_AFLink=False, use_GSI=False)
    lookup = _FeatLookup()
    tr.get_feature = lookup
    results = []
    for dets, feats in stream_feat:
        lookup.set_frame(dets, feats)
        results.append(_emit(tr.update(dets.copy(), IMG)))
    return results


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_strongsort_matches_reference_code(seed):
    from yolov7_tracker_tpu.trackers import TrackerConfig

    # short horizon: the NSA-KF + euclidean-feature cost chain amplifies
    # f32-vs-f64 drift into knife-edge assignment flips after ~30 frames
    # (same bound as the numpy-oracle golden in test_trackers_golden2)
    stream = synth_stream_feat(seed, frames=25)
    want = run_reference_strongsort(stream)
    cfg = TrackerConfig(tracker="strongsort", conf_thresh=0.5,
                        capacity=64, det_capacity=32, feature_dim=FDIM)
    got = run_slab(stream, cfg, with_feats=True)
    compare(got, want, box_atol=3.0)


# ---------------------------------------------------------------------------
# Long-horizon ByteTrack: 500 frames bounds f32 Kalman drift + id growth
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0])
def test_bytetrack_long_horizon_matches_reference_code(seed):
    from tests.test_reference_tracker_golden import run_reference
    from yolov7_tracker_tpu.trackers import TrackerConfig

    stream = synth_stream(seed, frames=500, n_obj=12)
    want = run_reference(stream, conf=0.5)
    cfg = TrackerConfig(tracker="bytetrack", conf_thresh=0.5,
                        capacity=128, det_capacity=32,
                        kalman_format="default")
    got = run_slab_tracker(stream, cfg)
    # ids must stay in lockstep for all 500 frames; the box tolerance is
    # the measured f32-vs-f64 Cholesky-chain divergence envelope
    compare(got, want, box_atol=5.0)


# ---------------------------------------------------------------------------
# BoT-SORT with GMC ON: identical injected per-frame warps drive both
# the reference's multi_gmc (kron(I4, R) Kalman transform,
# botsort.py:250-269,379-382) and the slab's apply_gmc — the warp
# ESTIMATION itself is separately cv2-golden in tests/test_gmc.py.
# ---------------------------------------------------------------------------

def synth_warps(seed, frames=60):
    rng = np.random.default_rng(seed + 100)
    warps = []
    for _ in range(frames):
        ang = rng.normal(0, 0.004)
        s = 1.0 + rng.normal(0, 0.002)
        tx, ty = rng.normal(0, 1.5, 2)
        c, si = np.cos(ang) * s, np.sin(ang) * s
        warps.append(np.array([[c, -si, tx], [si, c, ty]], np.float64))
    return warps


def run_reference_botsort_gmc(stream, warps, conf=0.5):
    _install_shims()
    import botsort as ref

    ref.Extractor = lambda *a, **k: None
    _reset_ids()
    tr = ref.BoTSORT(_base_opts(conf=conf, kalman_format="botsort"),
                     use_GMC=True)
    it = iter(warps)
    tr.gmc.apply = lambda raw_frame, detections=None: next(it)
    return [_emit(tr.update(d.copy(), IMG)) for d in stream]


@pytest.mark.parametrize("seed", [0, 1])
def test_botsort_gmc_on_matches_reference_code(seed):
    import jax.numpy as jnp

    from yolov7_tracker_tpu.trackers import (TrackerConfig, build_tracker,
                                             init_slab)
    from yolov7_tracker_tpu.trackers import slab as SS

    stream = synth_stream(seed)
    warps = synth_warps(seed, frames=len(stream))
    want = run_reference_botsort_gmc(stream, warps)

    cfg = TrackerConfig(tracker="botsort", conf_thresh=0.5, capacity=64,
                        det_capacity=32)
    step, cfg = build_tracker(cfg)
    slab = init_slab(cfg)
    got = []
    for dets, warp in zip(stream, warps):
        det_slab = SS.make_det_slab(
            cfg, dets[:, :4], dets[:, 4], dets[:, 5],
            np.ones(len(dets), bool),
            warp=jnp.asarray(warp, jnp.float32))
        slab, out = step(slab, det_slab)
        valid = np.asarray(out.valid)
        ids = np.asarray(out.track_id)
        tlwh = np.asarray(out.tlwh)
        score = np.asarray(out.score)
        got.append({int(ids[i]): (tlwh[i], float(score[i]))
                    for i in range(len(ids)) if valid[i]})
    compare(got, want, box_atol=3.0)
