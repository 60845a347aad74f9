"""HOTA/CLEAR/Identity parity vs the vendored TrackEval (used as a
test-only oracle, like the torch reference model)."""

import os
import sys

import numpy as np
import pytest

REF_TE = "/root/reference/tracker"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TE), reason="reference trackeval not available"
)


def synth_data(seed, frames=40, n_gt=6, n_trk=7):
    """Build a synthetic preprocessed-sequence dict shared by both
    implementations."""
    rng = np.random.default_rng(seed)
    gt_ids, trk_ids, sims = [], [], []
    n_gt_dets = n_trk_dets = 0
    for t in range(frames):
        g = np.sort(rng.choice(n_gt, rng.integers(0, n_gt + 1), replace=False))
        k = np.sort(rng.choice(n_trk, rng.integers(0, n_trk + 1), replace=False))
        sim = np.zeros((len(g), len(k)))
        for i, gi in enumerate(g):
            for j, kj in enumerate(k):
                if kj == gi:  # "correct" pairing has high IoU usually
                    sim[i, j] = np.clip(rng.uniform(0.4, 0.95), 0, 1)
                elif rng.uniform() < 0.1:
                    sim[i, j] = rng.uniform(0, 0.7)
        gt_ids.append(g.astype(int))
        trk_ids.append(k.astype(int))
        sims.append(sim)
        n_gt_dets += len(g)
        n_trk_dets += len(k)
    return {
        "gt_ids": gt_ids,
        "tracker_ids": trk_ids,
        "similarity_scores": sims,
        "num_timesteps": frames,
        "num_gt_ids": n_gt,
        "num_tracker_ids": n_trk,
        "num_gt_dets": n_gt_dets,
        "num_tracker_dets": n_trk_dets,
    }


def _import_trackeval():
    # the vendored package lives at tracker/trackeval; numpy>=2 removed
    # np.float/np.int aliases the old code uses
    for name, val in (("float", np.float64), ("int", np.int_)):
        if not hasattr(np, name):
            setattr(np, name, val)
    import types

    if "pycocotools" not in sys.modules:
        m = types.ModuleType("pycocotools")
        m.mask = types.ModuleType("pycocotools.mask")
        sys.modules["pycocotools"] = m
        sys.modules["pycocotools.mask"] = m.mask
    if REF_TE not in sys.path:
        sys.path.insert(0, REF_TE)
    import trackeval  # noqa

    return trackeval


@pytest.mark.parametrize("seed", range(4))
def test_metric_parity(seed):
    trackeval = _import_trackeval()
    from trackeval.metrics import HOTA, CLEAR, Identity

    from yolov7_tracker_tpu.eval import metrics as M

    data = synth_data(seed)
    got_h = M.hota(data)
    got_c = M.clear(data)
    got_i = M.identity(data)

    cfg = {"PRINT_CONFIG": False}
    want_h = HOTA().eval_sequence(data)
    want_c = CLEAR(cfg).eval_sequence(data)
    want_i = Identity(cfg).eval_sequence(data)

    for k in ("HOTA", "DetA", "AssA", "DetRe", "DetPr", "LocA"):
        np.testing.assert_allclose(got_h[k], want_h[k], atol=1e-8, err_msg=k)
    for k in ("MOTA", "MOTP", "IDSW", "CLR_TP", "CLR_FN", "CLR_FP", "MT",
              "ML", "PT", "Frag"):
        np.testing.assert_allclose(got_c[k], want_c[k], atol=1e-8, err_msg=k)
    for k in ("IDF1", "IDTP", "IDFN", "IDFP"):
        np.testing.assert_allclose(got_i[k], want_i[k], atol=1e-8, err_msg=k)


def test_combine_matches_trackeval():
    trackeval = _import_trackeval()
    from trackeval.metrics import HOTA, CLEAR, Identity

    from yolov7_tracker_tpu.eval import metrics as M

    datas = [synth_data(s) for s in range(3)]
    mine = [dict(**M.hota(d), **M.clear(d), **M.identity(d)) for d in datas]
    got = M.combine_sequences(mine)

    h = HOTA()
    c = CLEAR({"PRINT_CONFIG": False})
    i = Identity({"PRINT_CONFIG": False})
    want_h = h.combine_sequences({k: h.eval_sequence(d) for k, d in enumerate(datas)})
    want_c = c.combine_sequences({k: c.eval_sequence(d) for k, d in enumerate(datas)})
    want_i = i.combine_sequences({k: i.eval_sequence(d) for k, d in enumerate(datas)})
    np.testing.assert_allclose(got["HOTA"], want_h["HOTA"], atol=1e-8)
    np.testing.assert_allclose(got["AssA"], want_h["AssA"], atol=1e-8)
    np.testing.assert_allclose(got["MOTA"], want_c["MOTA"], atol=1e-8)
    np.testing.assert_allclose(got["IDF1"], want_i["IDF1"], atol=1e-8)

@pytest.mark.parametrize("seed", range(3))
def test_vace_ideucl_parity(seed):
    _import_trackeval()
    from trackeval.metrics.vace import VACE
    from trackeval.metrics.ideucl import IDEucl

    from yolov7_tracker_tpu.eval import metrics as M

    data = synth_data(seed)
    rng = np.random.default_rng(seed + 100)
    data["gt_dets"] = [
        np.column_stack([
            rng.uniform(0, 500, len(g)), rng.uniform(0, 300, len(g)),
            rng.uniform(20, 80, len(g)), rng.uniform(40, 120, len(g)),
        ])
        for g in data["gt_ids"]
    ]

    got_v = M.vace(data)
    got_e = M.ideucl(data)
    want_v = VACE().eval_sequence(dict(data))
    want_e = IDEucl({"PRINT_CONFIG": False}).eval_sequence(dict(data))
    for k in ("STDA", "ATA", "FDA", "SFDA"):
        np.testing.assert_allclose(got_v[k], want_v[k], atol=1e-8, err_msg=k)
    np.testing.assert_allclose(got_e["IDEucl"], want_e["IDEucl"], atol=1e-8)

    # sequence combine
    datas = []
    for s in range(3):
        d = synth_data(s)
        r2 = np.random.default_rng(s + 100)
        d["gt_dets"] = [
            np.column_stack([
                r2.uniform(0, 500, len(g)), r2.uniform(0, 300, len(g)),
                r2.uniform(20, 80, len(g)), r2.uniform(40, 120, len(g)),
            ])
            for g in d["gt_ids"]
        ]
        datas.append(d)
    mine = [dict(**M.vace(d), **M.ideucl(d)) for d in datas]
    got = M.combine_sequences(mine)
    v = VACE()
    e = IDEucl({"PRINT_CONFIG": False})
    want_vc = v.combine_sequences(
        {k: v.eval_sequence(dict(d)) for k, d in enumerate(datas)})
    want_ec = e.combine_sequences(
        {k: e.eval_sequence(dict(d)) for k, d in enumerate(datas)})
    np.testing.assert_allclose(got["ATA"], want_vc["ATA"], atol=1e-8)
    np.testing.assert_allclose(got["SFDA"], want_vc["SFDA"], atol=1e-8)
    np.testing.assert_allclose(got["IDEucl"], want_ec["IDEucl"], atol=1e-8)

def _synth_tracks(seed, frames=30, n_gt=8, n_dt=9):
    """Synthetic track-level data in the shared TrackMAP input format."""
    rng = np.random.default_rng(seed)
    def mk_tracks(n, jitter):
        tracks, ids = [], []
        for i in range(n):
            t0 = int(rng.integers(0, frames // 2))
            t1 = int(rng.integers(t0 + 1, frames + 1))
            x, y = rng.uniform(0, 400, 2)
            w, h = rng.uniform(10, 120, 2)
            trk = {}
            for t in range(t0, t1):
                trk[t] = np.array([
                    x + t * 2 + rng.normal(0, jitter),
                    y + t + rng.normal(0, jitter),
                    w, h,
                ])
            tracks.append(trk)
            ids.append(i)
        return ids, tracks
    gt_ids, gt_tracks = mk_tracks(n_gt, 0.0)
    rng2 = np.random.default_rng(seed)  # same geometry, jittered
    dt_ids, dt_tracks = mk_tracks(n_dt, 0.0)
    # perturb dt boxes so IoUs spread over [0, 1)
    for trk in dt_tracks:
        dx = rng.uniform(-20, 20, 2)
        for t in trk:
            trk[t] = trk[t] + np.array([dx[0], dx[1], 0, 0])
    area = lambda trk: float(np.mean([b[2] * b[3] for b in trk.values()]))
    return {
        "gt_track_ids": gt_ids, "dt_track_ids": dt_ids,
        "gt_tracks": gt_tracks, "dt_tracks": dt_tracks,
        "gt_track_areas": [area(t) for t in gt_tracks],
        "dt_track_areas": [area(t) for t in dt_tracks],
        "gt_track_lengths": [len(t) for t in gt_tracks],
        "dt_track_lengths": [len(t) for t in dt_tracks],
        "gt_track_iscrowd": [0] * n_gt,
        "dt_track_scores": rng.uniform(0.1, 1.0, n_dt),
        "iou_type": "bbox", "boxformat": "xywh",
        "not_exhaustively_labeled": False,
    }


@pytest.mark.parametrize("seed", range(3))
def test_trackmap_parity(seed):
    _import_trackeval()
    from trackeval.metrics.track_map import TrackMAP

    from yolov7_tracker_tpu.eval import metrics as M

    datas = [_synth_tracks(seed * 10 + k) for k in range(3)]
    mine = M.trackmap_combine([M.trackmap_sequence(d) for d in datas])

    tm = TrackMAP({"PRINT_CONFIG": False})
    want = tm.combine_sequences(
        {k: tm.eval_sequence(dict(d)) for k, d in enumerate(datas)}
    )
    for lbl in M.TRACKMAP_LABELS:
        np.testing.assert_allclose(
            mine["AP_" + lbl], want["AP_" + lbl], atol=1e-8,
            err_msg="AP_" + lbl,
        )
        np.testing.assert_allclose(
            mine["AR_" + lbl], want["AR_" + lbl], atol=1e-8,
            err_msg="AR_" + lbl,
        )


def test_tracks_from_frames_roundtrip():
    from yolov7_tracker_tpu.eval import metrics as M

    data = synth_data(0, frames=12, n_gt=4, n_trk=4)
    rng = np.random.default_rng(7)
    data["gt_dets"] = [
        np.column_stack([rng.uniform(0, 300, len(g)),
                         rng.uniform(0, 300, len(g)),
                         rng.uniform(10, 60, len(g)),
                         rng.uniform(10, 60, len(g))])
        for g in data["gt_ids"]
    ]
    data["tracker_dets"] = [
        np.column_stack([rng.uniform(0, 300, len(d)),
                         rng.uniform(0, 300, len(d)),
                         rng.uniform(10, 60, len(d)),
                         rng.uniform(10, 60, len(d))])
        for d in data["tracker_ids"]
    ]
    td = M.tracks_from_frames(data)
    assert len(td["gt_tracks"]) == len(td["gt_track_ids"])
    assert all(l >= 1 for l in td["gt_track_lengths"])
    out = M.trackmap_combine([M.trackmap_sequence(td)])
    assert out["AP_all"].shape == (10,)
