"""KITTI 2D-box reader golden vs the vendored TrackEval Kitti2DBox
(tracker/trackeval/datasets/kitti_2d_box.py used as a test oracle, like
test_eval_metrics does for the metrics)."""

import os
import sys

import numpy as np
import pytest

REF_TE = "/root/reference/tracker"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TE), reason="reference trackeval not available"
)

KITTI_TYPES = ["Car", "Van", "Truck", "Pedestrian", "Person",
               "Cyclist", "Tram", "Misc"]


def synth_kitti(root, seq="0000", frames=25, seed=0):
    """Tiny KITTI-layout dataset: gt label_02 txt with mixed classes,
    occlusion/truncation levels and DontCare regions; tracker results
    with noise/drops/clutter."""
    rng = np.random.default_rng(seed)
    gt_dir = os.path.join(root, "gt", "label_02")
    trk_dir = os.path.join(root, "trackers", "ours", "data")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(trk_dir, exist_ok=True)

    n = 8
    types = [KITTI_TYPES[i % 5] for i in range(n)]  # cars/vans/peds mix
    base = rng.uniform(50, 800, (n, 2))
    vel = rng.uniform(-3, 3, (n, 2))
    hw = rng.uniform(40, 90, (n, 2))
    occ = rng.integers(0, 4, n)     # some exceed max_occlusion 2
    trunc = rng.integers(0, 2, n)   # some exceed max_truncation 0
    # keep one car (i=0) and one pedestrian (i=3) always evaluatable
    occ[0] = occ[3] = 0
    trunc[0] = trunc[3] = 0

    gt_rows, trk_rows = [], []
    for t in range(frames):
        for i in range(n):
            c = base[i] + vel[i] * t
            x1, y1 = c
            x2, y2 = c + hw[i]
            gt_rows.append(
                f"{t} {i} {types[i]} {trunc[i]} {occ[i]} 0.0 "
                f"{x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f} "
                f"1.0 1.0 1.0 0.0 0.0 0.0 0.0"
            )
            if rng.uniform() < 0.15:
                continue  # tracker miss
            noise = rng.normal(0, 2.0, 2)
            ttype = "Car" if types[i] in ("Car", "Van") else "Pedestrian"
            trk_rows.append(
                f"{t} {100 + i} {ttype} 0 0 0.0 "
                f"{x1 + noise[0]:.2f} {y1 + noise[1]:.2f} "
                f"{x2 + noise[0]:.2f} {y2 + noise[1]:.2f} "
                f"1.0 1.0 1.0 0.0 0.0 0.0 0.0 {rng.uniform(0.5, 1.0):.3f}"
            )
        # a DontCare region + clutter partially inside it
        gt_rows.append(
            f"{t} -1 DontCare -1 -1 -10 900.00 300.00 1000.00 400.00 "
            f"-1 -1 -1 -1000 -1000 -1000 -10"
        )
        if rng.uniform() < 0.5:
            trk_rows.append(
                f"{t} 999 Car 0 0 0.0 905.00 305.00 990.00 390.00 "
                f"1.0 1.0 1.0 0.0 0.0 0.0 0.0 0.9"
            )
        if rng.uniform() < 0.3:  # tiny unmatched det (<25px height)
            trk_rows.append(
                f"{t} 998 Pedestrian 0 0 0.0 500.00 500.00 515.00 518.00 "
                f"1.0 1.0 1.0 0.0 0.0 0.0 0.0 0.6"
            )
    with open(os.path.join(gt_dir, seq + ".txt"), "w") as f:
        f.write("\n".join(gt_rows) + "\n")
    with open(os.path.join(trk_dir, seq + ".txt"), "w") as f:
        f.write("\n".join(trk_rows) + "\n")
    with open(os.path.join(root, "gt",
                           "evaluate_tracking.seqmap.training"), "w") as f:
        f.write(f"{seq} empty 000000 {frames:06d}\n")
    return seq, frames


def _import_trackeval():
    for name, val in (("float", np.float64), ("int", np.int_),
                      ("bool", np.bool_)):
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


def test_kitti_preproc_golden(tmp_path):
    trackeval = _import_trackeval()
    from trackeval.datasets import Kitti2DBox

    from yolov7_tracker_tpu.eval import data as D
    from yolov7_tracker_tpu.eval import metrics as M

    root = str(tmp_path)
    seq, frames = synth_kitti(root)

    ds = Kitti2DBox({
        "GT_FOLDER": os.path.join(root, "gt"),
        "TRACKERS_FOLDER": os.path.join(root, "trackers"),
        "SPLIT_TO_EVAL": "training",
        "PRINT_CONFIG": False,
    })
    raw_ref = ds.get_raw_seq_data("ours", seq)

    raw = D.load_kitti_seq(
        seq,
        os.path.join(root, "gt", "label_02", seq + ".txt"),
        os.path.join(root, "trackers", "ours", "data", seq + ".txt"),
        frames,
    )
    for cls in ("car", "pedestrian"):
        want = ds.get_preprocessed_seq_data(raw_ref, cls)
        got = D.preprocess_kitti(raw, cls)
        assert got["num_gt_ids"] == want["num_gt_ids"], cls
        assert got["num_tracker_ids"] == want["num_tracker_ids"], cls
        assert got["num_gt_dets"] == want["num_gt_dets"], cls
        assert got["num_tracker_dets"] == want["num_tracker_dets"], cls
        for t in range(frames):
            np.testing.assert_array_equal(
                got["gt_ids"][t], want["gt_ids"][t], err_msg=f"{cls} t{t}")
            np.testing.assert_array_equal(
                got["tracker_ids"][t], want["tracker_ids"][t],
                err_msg=f"{cls} t{t}")
            np.testing.assert_allclose(
                got["similarity_scores"][t], want["similarity_scores"][t],
                atol=1e-12, err_msg=f"{cls} t{t}")
        # and the metrics downstream agree
        from trackeval.metrics import CLEAR, HOTA

        want_c = CLEAR({"PRINT_CONFIG": False}).eval_sequence(want)
        got_c = M.clear(got)
        for k in ("MOTA", "IDSW", "CLR_FP", "CLR_FN"):
            np.testing.assert_allclose(got_c[k], want_c[k], err_msg=k)
        want_h = HOTA().eval_sequence(want)
        got_h = M.hota(got)
        np.testing.assert_allclose(got_h["HOTA"], want_h["HOTA"],
                                   atol=1e-9)


def test_kitti_evaluator_end_to_end(tmp_path):
    """The evaluator driver runs KITTI through the same surface the CLI
    uses (benchmark dispatch + combine + CSV)."""
    from yolov7_tracker_tpu.eval import evaluator

    root = str(tmp_path)
    seq, frames = synth_kitti(root, seed=1)
    table = evaluator.evaluate_benchmark(
        os.path.join(root, "gt"),
        os.path.join(root, "trackers", "ours", "data"),
        {seq: frames},
        benchmark="KITTI",
        gt_loc_format="{gt_folder}/label_02/{seq}.txt",
        output_folder=os.path.join(root, "out"),
    )
    for cls in ("car", "pedestrian"):
        res = table[cls]["COMBINED_SEQ"]
        assert np.isfinite(res["MOTA"])
        assert res["CLR_TP"] > 0
        assert os.path.isfile(os.path.join(root, "out",
                                           f"{cls}_summary.csv"))
