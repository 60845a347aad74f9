"""Golden tests for the py-motmetrics-style fallback evaluator
(eval/motmetrics_lite.py, reference tracker/evaluate.py:154-185).

Oracle: eval.metrics.clear / identity — themselves golden vs the
vendored TrackEval (tests/test_eval_metrics.py) — fed the exact same
box streams. On well-separated trajectories the MOTAccumulator event
model and CLEAR's prev-preferring Hungarian agree exactly on
MOTA/FP/FN/IDSW, MOTP_lite == 1 - MOTP_clear (distance vs similarity),
and the trajectory-level IDF1s coincide.
"""

import numpy as np

from yolov7_tracker_tpu.eval import metrics as M
from yolov7_tracker_tpu.eval.data import iou_tlwh
from yolov7_tracker_tpu.eval.motmetrics_lite import (
    MOTAccumulatorLite, evaluate_files,
)


def synth_boxes(seed=0, frames=30, n=5):
    """Well-separated gt trajectories + corrupted hypotheses:
    localization noise, per-frame drops (FN), far clutter (FP), and one
    mid-sequence identity switch (IDSW)."""
    rng = np.random.default_rng(seed)
    base = np.stack([np.array([120.0 * i + 30, 200.0 * (i % 3) + 40])
                     for i in range(n)])
    vel = rng.uniform(-1.5, 1.5, (n, 2))
    wh = np.full((n, 2), 40.0)
    gt, hyp = [], []
    for f in range(frames):
        centers = base + vel * f
        g_ids, g_boxes, h_ids, h_boxes = [], [], [], []
        for i in range(n):
            tl = centers[i] - wh[i] / 2
            g_ids.append(i + 1)
            g_boxes.append([tl[0], tl[1], wh[i][0], wh[i][1]])
            if rng.uniform() < 0.12:      # miss
                continue
            hid = i + 1
            if i == 0 and f >= frames // 2:
                hid = n + 1               # id switch on track 1
            noise = rng.normal(0, 1.0, 2)
            h_ids.append(hid)
            h_boxes.append([tl[0] + noise[0], tl[1] + noise[1],
                            wh[i][0], wh[i][1]])
        if rng.uniform() < 0.3:           # far clutter FP
            h_ids.append(99)
            h_boxes.append([800.0 + rng.uniform(0, 50), 700.0, 30.0, 30.0])
        gt.append((g_ids, np.asarray(g_boxes, float).reshape(-1, 4)))
        hyp.append((h_ids, np.asarray(h_boxes, float).reshape(-1, 4)))
    return gt, hyp


def to_clear_data(gt, hyp):
    """Map the box streams onto the preprocessed-sequence dict the
    TrackEval-parity metrics consume (contiguous 0-based ids)."""
    gt_all = sorted({i for ids, _ in gt for i in ids})
    h_all = sorted({i for ids, _ in hyp for i in ids})
    gmap = {g: k for k, g in enumerate(gt_all)}
    hmap = {h: k for k, h in enumerate(h_all)}
    gt_ids, trk_ids, sims = [], [], []
    n_gt_dets = n_trk_dets = 0
    for (gids, gb), (hids, hb) in zip(gt, hyp):
        gt_ids.append(np.asarray([gmap[g] for g in gids], int))
        trk_ids.append(np.asarray([hmap[h] for h in hids], int))
        sims.append(iou_tlwh(gb, hb))
        n_gt_dets += len(gids)
        n_trk_dets += len(hids)
    return {
        "gt_ids": gt_ids,
        "tracker_ids": trk_ids,
        "similarity_scores": sims,
        "num_timesteps": len(gt),
        "num_gt_ids": len(gt_all),
        "num_tracker_ids": len(h_all),
        "num_gt_dets": n_gt_dets,
        "num_tracker_dets": n_trk_dets,
    }


def test_clear_golden():
    for seed in range(3):
        gt, hyp = synth_boxes(seed)
        acc = MOTAccumulatorLite()
        for (gids, gb), (hids, hb) in zip(gt, hyp):
            acc.update(gids, gb, hids, hb)
        got = acc.metrics()

        data = to_clear_data(gt, hyp)
        want_c = M.clear(data)
        want_i = M.identity(data)

        assert got["IDSW"] == want_c["IDSW"], seed
        assert got["FP"] == want_c["CLR_FP"], seed
        assert got["FN"] == want_c["CLR_FN"], seed
        np.testing.assert_allclose(got["MOTA"], want_c["MOTA"], atol=1e-9)
        # motmetrics MOTP is a 1-IoU distance; CLEAR's is a similarity
        np.testing.assert_allclose(got["MOTP"], 1.0 - want_c["MOTP"],
                                   atol=1e-9)
        np.testing.assert_allclose(got["IDF1"], want_i["IDF1"], atol=1e-9)


def test_evaluate_files_matches_accumulator(tmp_path):
    """The txt-file surface (evaluate.py:154-185): parsing + the gt
    mark/class filter must reproduce the direct accumulator run."""
    gt, hyp = synth_boxes(1)
    gt_path = tmp_path / "gt.txt"
    res_path = tmp_path / "res.txt"
    with open(gt_path, "w") as f:
        for fid, (gids, gb) in enumerate(gt, 1):
            for g, b in zip(gids, gb):
                f.write(f"{fid},{g},{b[0]},{b[1]},{b[2]},{b[3]},1,1,1.0\n")
        # rows the filter must drop: mark 0 and an out-of-range class
        f.write("1,77,0,0,10,10,0,1,1.0\n")
        f.write("1,78,0,0,10,10,1,13,1.0\n")
    with open(res_path, "w") as f:
        for fid, (hids, hb) in enumerate(hyp, 1):
            for h, b in zip(hids, hb):
                f.write(f"{fid},{h},{b[0]},{b[1]},{b[2]},{b[3]},1,-1,-1\n")

    out = evaluate_files([str(res_path)], [str(gt_path)])
    got = out[str(res_path)]

    acc = MOTAccumulatorLite()
    for (gids, gb), (hids, hb) in zip(gt, hyp):
        acc.update(gids, gb, hids, hb)
    want = acc.metrics()
    for k in ("MOTA", "MOTP", "IDSW", "FP", "FN", "IDF1"):
        np.testing.assert_allclose(got[k], want[k], atol=1e-9, err_msg=k)
