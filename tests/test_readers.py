"""BDD100K / HeadTracking (HT) / PersonPath22 reader goldens vs the
vendored TrackEval dataset classes (tracker/trackeval/datasets/
{bdd100k,head_tracking_challenge,person_path_22}.py used as oracles,
same pattern as test_kitti_reader)."""

import json
import os
import sys

import numpy as np
import pytest

REF_TE = "/root/reference/tracker"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TE), reason="reference trackeval not available"
)


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


def _compare_preprocessed(got, want, frames, label=""):
    assert got["num_gt_ids"] == want["num_gt_ids"], label
    assert got["num_tracker_ids"] == want["num_tracker_ids"], label
    assert got["num_gt_dets"] == want["num_gt_dets"], label
    assert got["num_tracker_dets"] == want["num_tracker_dets"], label
    for t in range(frames):
        np.testing.assert_array_equal(
            got["gt_ids"][t], want["gt_ids"][t], err_msg=f"{label} t{t}")
        np.testing.assert_array_equal(
            got["tracker_ids"][t], want["tracker_ids"][t],
            err_msg=f"{label} t{t}")
        np.testing.assert_allclose(
            np.asarray(got["similarity_scores"][t], float),
            np.asarray(want["similarity_scores"][t], float),
            atol=1e-12, err_msg=f"{label} t{t}")


def _check_metrics(got, want):
    from trackeval.metrics import CLEAR, HOTA

    from yolov7_tracker_tpu.eval import metrics as M

    want_c = CLEAR({"PRINT_CONFIG": False}).eval_sequence(want)
    got_c = M.clear(got)
    for k in ("MOTA", "IDSW", "CLR_FP", "CLR_FN"):
        np.testing.assert_allclose(got_c[k], want_c[k], err_msg=k)
    want_h = HOTA().eval_sequence(want)
    got_h = M.hota(got)
    np.testing.assert_allclose(got_h["HOTA"], want_h["HOTA"], atol=1e-9)


# ---------------------------------------------------------------------------
# BDD100K
# ---------------------------------------------------------------------------

BDD_CATS = ["pedestrian", "rider", "car", "bus", "truck", "train",
            "motorcycle", "bicycle"]


def synth_bdd(root, seq="b1c9c847-3bda4659", frames=20, seed=0):
    """Tiny BDD100K-layout dataset: per-seq gt/tracker jsons with mixed
    categories, a Crowd-attribute gt box, a distractor-category gt box,
    and tracker noise/misses/clutter near the ignore region."""
    rng = np.random.default_rng(seed)
    gt_dir = os.path.join(root, "gt")
    trk_dir = os.path.join(root, "trackers", "ours", "data")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(trk_dir, exist_ok=True)

    n = 8
    cats = [BDD_CATS[i % len(BDD_CATS)] for i in range(n)]
    base = rng.uniform(50, 900, (n, 2))
    vel = rng.uniform(-4, 4, (n, 2))
    hw = rng.uniform(40, 120, (n, 2))

    gt_frames, trk_frames = [], []
    for t in range(frames):
        g_labels, t_labels = [], []
        for i in range(n):
            x1, y1 = base[i] + vel[i] * t
            x2, y2 = x1 + hw[i][0], y1 + hw[i][1]
            g_labels.append({
                "id": str(i), "category": cats[i],
                "box2d": {"x1": x1, "y1": y1, "x2": x2, "y2": y2},
                "attributes": {"Crowd": False},
            })
            if rng.uniform() < 0.15:
                continue
            nx, ny = rng.normal(0, 2.0, 2)
            t_labels.append({
                "id": str(100 + i), "category": cats[i],
                "box2d": {"x1": x1 + nx, "y1": y1 + ny,
                          "x2": x2 + nx, "y2": y2 + ny},
            })
        # crowd-ignore gt region + distractor-category gt
        g_labels.append({
            "id": "90", "category": "car",
            "box2d": {"x1": 1000.0, "y1": 300.0, "x2": 1150.0, "y2": 420.0},
            "attributes": {"Crowd": True},
        })
        g_labels.append({
            "id": "91", "category": "other vehicle",
            "box2d": {"x1": 600.0, "y1": 600.0, "x2": 700.0, "y2": 680.0},
        })
        if rng.uniform() < 0.5:  # clutter inside the crowd region
            t_labels.append({
                "id": "999", "category": "car",
                "box2d": {"x1": 1010.0, "y1": 310.0, "x2": 1140.0,
                          "y2": 410.0},
            })
        gt_frames.append({"index": t, "labels": g_labels,
                          "videoName": seq, "name": f"{seq}-{t:07d}.jpg"})
        trk_frames.append({"index": t, "labels": t_labels,
                           "videoName": seq, "name": f"{seq}-{t:07d}.jpg"})
    with open(os.path.join(gt_dir, seq + ".json"), "w") as f:
        json.dump(gt_frames, f)
    with open(os.path.join(trk_dir, seq + ".json"), "w") as f:
        json.dump(trk_frames, f)
    return seq, frames


def test_bdd100k_preproc_golden(tmp_path):
    _import_trackeval()
    from trackeval.datasets import BDD100K

    from yolov7_tracker_tpu.eval import readers as R

    root = str(tmp_path)
    seq, frames = synth_bdd(root)

    ds = BDD100K({
        "GT_FOLDER": os.path.join(root, "gt"),
        "TRACKERS_FOLDER": os.path.join(root, "trackers"),
        "PRINT_CONFIG": False,
    })
    raw_ref = ds.get_raw_seq_data("ours", seq)

    raw = R.load_bdd100k_seq(
        seq,
        os.path.join(root, "gt", seq + ".json"),
        os.path.join(root, "trackers", "ours", "data", seq + ".json"),
    )
    assert raw.num_timesteps == frames
    for cls in ("pedestrian", "car", "bicycle", "train"):
        want = ds.get_preprocessed_seq_data(raw_ref, cls)
        got = R.preprocess_bdd100k(raw, cls)
        _compare_preprocessed(got, want, frames, label=f"bdd/{cls}")
        _check_metrics(got, want)


def test_bdd100k_evaluator_end_to_end(tmp_path):
    from yolov7_tracker_tpu.eval import evaluator

    root = str(tmp_path)
    seq, frames = synth_bdd(root, seed=1)
    table = evaluator.evaluate_benchmark(
        os.path.join(root, "gt"),
        os.path.join(root, "trackers", "ours", "data"),
        {seq: frames},
        benchmark="BDD100K",
        classes=["pedestrian", "car"],
        gt_loc_format="{gt_folder}/{seq}.json",
        output_folder=os.path.join(root, "out"),
    )
    for cls in ("pedestrian", "car"):
        res = table[cls]["COMBINED_SEQ"]
        assert np.isfinite(res["MOTA"])
        assert res["CLR_TP"] > 0


# ---------------------------------------------------------------------------
# HeadTracking Challenge (HT)
# ---------------------------------------------------------------------------


def synth_ht(root, seq="HT-02", frames=25, seed=0):
    """Tiny HT-layout dataset: gt with class/visibility/conf columns
    (some invisible, some distractor-class, some zero-marked), tracker
    txt with noise/misses."""
    rng = np.random.default_rng(seed)
    gt_dir = os.path.join(root, "gt", seq, "gt")
    trk_dir = os.path.join(root, "trackers", "ours", "data")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(trk_dir, exist_ok=True)

    n = 8
    cls = [1, 1, 1, 2, 4, 1, 1, 3]      # mixed pedestrian/distractors
    vis = rng.uniform(0.3, 1.0, n)
    vis[5] = 0.0                          # invisible pedestrian
    conf = np.ones(n)
    conf[6] = 0.0                         # zero-marked pedestrian
    base = rng.uniform(30, 500, (n, 2))
    vel = rng.uniform(-2, 2, (n, 2))
    hw = rng.uniform(15, 40, (n, 2))

    gt_rows, trk_rows = [], []
    for t in range(1, frames + 1):
        for i in range(n):
            x, y = base[i] + vel[i] * t
            w, h = hw[i]
            gt_rows.append(
                f"{t},{i + 1},{x:.2f},{y:.2f},{w:.2f},{h:.2f},"
                f"{int(conf[i])},{cls[i]},{vis[i]:.3f}")
            if rng.uniform() < 0.12:
                continue
            nx, ny = rng.normal(0, 1.0, 2)
            trk_rows.append(
                f"{t},{50 + i},{x + nx:.2f},{y + ny:.2f},{w:.2f},{h:.2f},"
                f"{rng.uniform(0.5, 1.0):.3f},-1,-1")
    with open(os.path.join(gt_dir, "gt.txt"), "w") as f:
        f.write("\n".join(gt_rows) + "\n")
    with open(os.path.join(root, "gt", seq, "seqinfo.ini"), "w") as f:
        f.write(f"[Sequence]\nname={seq}\nseqLength={frames}\n")
    with open(os.path.join(trk_dir, seq + ".txt"), "w") as f:
        f.write("\n".join(trk_rows) + "\n")
    return seq, frames


def test_ht_preproc_golden(tmp_path):
    _import_trackeval()
    from trackeval.datasets import HeadTrackingChallenge

    from yolov7_tracker_tpu.eval import readers as R

    root = str(tmp_path)
    seq, frames = synth_ht(root)

    ds = HeadTrackingChallenge({
        "GT_FOLDER": os.path.join(root, "gt"),
        "TRACKERS_FOLDER": os.path.join(root, "trackers"),
        "BENCHMARK": "HT",
        "SEQ_INFO": {seq: frames},
        "SKIP_SPLIT_FOL": True,
        "PRINT_CONFIG": False,
    })
    raw_ref = ds.get_raw_seq_data("ours", seq)
    want = ds.get_preprocessed_seq_data(raw_ref, "pedestrian")

    raw = R.load_ht_seq(
        seq,
        os.path.join(root, "gt", seq, "gt", "gt.txt"),
        os.path.join(root, "trackers", "ours", "data", seq + ".txt"),
        frames,
    )
    got = R.preprocess_ht(raw, "pedestrian")
    _compare_preprocessed(got, want, frames, label="ht")
    _check_metrics(got, want)


def test_ht_evaluator_end_to_end(tmp_path):
    from yolov7_tracker_tpu.eval import evaluator

    root = str(tmp_path)
    seq, frames = synth_ht(root, seed=1)
    table = evaluator.evaluate_benchmark(
        os.path.join(root, "gt"),
        os.path.join(root, "trackers", "ours", "data"),
        {seq: frames},
        benchmark="HT",
        output_folder=os.path.join(root, "out"),
    )
    res = table["pedestrian"]["COMBINED_SEQ"]
    assert np.isfinite(res["MOTA"]) and res["CLR_TP"] > 0


# ---------------------------------------------------------------------------
# PersonPath22
# ---------------------------------------------------------------------------


def synth_pp22(root, seq="uid_vid_00008", frames=25, seed=0):
    """Tiny PersonPath22-layout dataset: MOT txt gt with crowd (class
    13) ignore rows, distractor classes, zero-marked rows; tracker txt
    with noise/misses and clutter fully inside the crowd region."""
    rng = np.random.default_rng(seed)
    gt_dir = os.path.join(root, "gt", seq, "gt")
    trk_dir = os.path.join(root, "trackers", "ours", "data")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(trk_dir, exist_ok=True)

    n = 8
    cls = [1, 1, 1, 7, 8, 1, 1, 12]     # peds + distractors
    conf = np.ones(n)
    conf[6] = 0.0                         # zero-marked
    base = rng.uniform(30, 700, (n, 2))
    vel = rng.uniform(-3, 3, (n, 2))
    hw = rng.uniform(25, 70, (n, 2))

    gt_rows, trk_rows = [], []
    for t in range(1, frames + 1):
        for i in range(n):
            x, y = base[i] + vel[i] * t
            w, h = hw[i]
            gt_rows.append(
                f"{t},{i + 1},{x:.2f},{y:.2f},{w:.2f},{h:.2f},"
                f"{int(conf[i])},{cls[i]},1")
            if rng.uniform() < 0.12:
                continue
            nx, ny = rng.normal(0, 1.5, 2)
            trk_rows.append(
                f"{t},{50 + i},{x + nx:.2f},{y + ny:.2f},{w:.2f},{h:.2f},"
                f"{rng.uniform(0.5, 1.0):.3f},-1,-1")
        # crowd ignore region (class 13) + clutter fully inside it
        gt_rows.append(f"{t},900,800.00,500.00,150.00,120.00,1,13,1")
        if rng.uniform() < 0.5:
            trk_rows.append(
                f"{t},99,810.00,510.00,100.00,90.00,0.9,-1,-1")
    with open(os.path.join(gt_dir, "gt.txt"), "w") as f:
        f.write("\n".join(gt_rows) + "\n")
    with open(os.path.join(root, "gt", seq, "seqinfo.ini"), "w") as f:
        f.write(f"[Sequence]\nname={seq}\nseqLength={frames}\n")
    with open(os.path.join(trk_dir, seq + ".txt"), "w") as f:
        f.write("\n".join(trk_rows) + "\n")
    return seq, frames


def test_pp22_preproc_golden(tmp_path):
    _import_trackeval()
    from trackeval.datasets import PersonPath22

    from yolov7_tracker_tpu.eval import readers as R

    root = str(tmp_path)
    seq, frames = synth_pp22(root)

    ds = PersonPath22({
        "GT_FOLDER": os.path.join(root, "gt"),
        "TRACKERS_FOLDER": os.path.join(root, "trackers"),
        "SEQ_INFO": {seq: frames},
        "SKIP_SPLIT_FOL": True,
        "PRINT_CONFIG": False,
    })
    raw_ref = ds.get_raw_seq_data("ours", seq)
    want = ds.get_preprocessed_seq_data(raw_ref, "pedestrian")

    raw = R.load_personpath_seq(
        seq,
        os.path.join(root, "gt", seq, "gt", "gt.txt"),
        os.path.join(root, "trackers", "ours", "data", seq + ".txt"),
        frames,
    )
    got = R.preprocess_personpath(raw, "pedestrian")
    _compare_preprocessed(got, want, frames, label="pp22")
    _check_metrics(got, want)


def test_pp22_evaluator_end_to_end(tmp_path):
    from yolov7_tracker_tpu.eval import evaluator

    root = str(tmp_path)
    seq, frames = synth_pp22(root, seed=1)
    table = evaluator.evaluate_benchmark(
        os.path.join(root, "gt"),
        os.path.join(root, "trackers", "ours", "data"),
        {seq: frames},
        benchmark="PersonPath22",
        output_folder=os.path.join(root, "out"),
    )
    res = table["pedestrian"]["COMBINED_SEQ"]
    assert np.isfinite(res["MOTA"]) and res["CLR_TP"] > 0


# ---------------------------------------------------------------------------
# MOTS Challenge / KITTI MOTS
# ---------------------------------------------------------------------------


def _install_pycoco_shim():
    """Back the pycocotools stub with our RLE codec so the vendored MOTS
    readers can run as logic oracles. The codec itself is validated
    independently in tests/test_rle.py (hand-derived strings + dense
    round-trips), so this tests the reader flow, not codec-vs-codec."""
    from yolov7_tracker_tpu.eval import rle as RL

    _import_trackeval()
    m = sys.modules["pycocotools.mask"]
    m.merge = RL.merge
    m.area = RL.area
    m.iou = RL.iou
    m.encode = None  # not used by the MOTS readers (is_encoded=True)
    m.decode = RL.decode


def _rect_mask(h, w, y0, y1, x0, x1):
    mask = np.zeros((h, w), np.uint8)
    mask[max(0, int(y0)):max(0, int(y1)), max(0, int(x0)):max(0, int(x1))] = 1
    return mask


def synth_mots(root, seq="MOTS20-02", frames=20, seed=0,
               classes=(2, 2, 2, 2, 1, 1), frame_base=1):
    """Tiny MOTS-layout dataset: disjoint rectangle masks per object
    (the reference raises on overlapping masks), an ignore region
    (class 10), tracker masks with jitter/misses and clutter inside the
    ignore region."""
    from yolov7_tracker_tpu.eval import rle as RL

    rng = np.random.default_rng(seed)
    gt_dir = os.path.join(root, "gt", seq, "gt")
    trk_dir = os.path.join(root, "trackers", "ours", "data")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(trk_dir, exist_ok=True)

    H, W = 120, 400
    n = len(classes)
    # disjoint x-lanes per object; ignore region in the last lane
    lanes = np.linspace(0, W - 50, n + 1)
    gt_rows, trk_rows = [], []
    for t in range(frame_base, frames + frame_base):
        for i in range(n):
            y0 = 10 + 3 * np.sin(t / 3 + i)
            x0 = lanes[i] + (t % 5)
            m = _rect_mask(H, W, y0, y0 + 40, x0, x0 + 30)
            enc = RL.encode(m)["counts"].decode()
            gt_rows.append(f"{t} {1000 * classes[i] + i} {classes[i]} "
                           f"{H} {W} {enc}")
            if rng.uniform() < 0.15:
                continue
            dy, dx = rng.integers(-3, 4, 2)
            m2 = _rect_mask(H, W, y0 + dy, y0 + 40 + dy, x0 + dx,
                            x0 + 28 + dx)
            enc2 = RL.encode(m2)["counts"].decode()
            trk_rows.append(f"{t} {50 + i} {classes[i]} {H} {W} {enc2}")
        # ignore region (class 10) + clutter mostly inside it
        mi = _rect_mask(H, W, 60, 110, lanes[-1], lanes[-1] + 45)
        gt_rows.append(f"{t} 10000 10 {H} {W} "
                       f"{RL.encode(mi)['counts'].decode()}")
        if rng.uniform() < 0.5:
            mc = _rect_mask(H, W, 65, 100, lanes[-1] + 5, lanes[-1] + 40)
            trk_rows.append(f"{t} 99 2 {H} {W} "
                            f"{RL.encode(mc)['counts'].decode()}")
    with open(os.path.join(gt_dir, "gt.txt"), "w") as f:
        f.write("\n".join(gt_rows) + "\n")
    with open(os.path.join(root, "gt", seq, "seqinfo.ini"), "w") as f:
        f.write(f"[Sequence]\nname={seq}\nseqLength={frames}\n")
    with open(os.path.join(trk_dir, seq + ".txt"), "w") as f:
        f.write("\n".join(trk_rows) + "\n")
    return seq, frames


def _compare_mots(got, want, frames, label=""):
    assert got["num_gt_ids"] == want["num_gt_ids"], label
    assert got["num_tracker_ids"] == want["num_tracker_ids"], label
    assert got["num_gt_dets"] == want["num_gt_dets"], label
    assert got["num_tracker_dets"] == want["num_tracker_dets"], label
    for t in range(frames):
        np.testing.assert_array_equal(
            got["gt_ids"][t], want["gt_ids"][t], err_msg=f"{label} t{t}")
        np.testing.assert_array_equal(
            got["tracker_ids"][t], want["tracker_ids"][t],
            err_msg=f"{label} t{t}")
        np.testing.assert_allclose(
            np.asarray(got["similarity_scores"][t], float),
            np.asarray(want["similarity_scores"][t], float),
            atol=1e-12, err_msg=f"{label} t{t}")


def test_mots_preproc_golden(tmp_path):
    _install_pycoco_shim()
    from trackeval.datasets import MOTSChallenge

    from yolov7_tracker_tpu.eval import readers as R

    root = str(tmp_path)
    seq, frames = synth_mots(root, classes=(2, 2, 2, 2, 2, 2))

    ds = MOTSChallenge({
        "GT_FOLDER": os.path.join(root, "gt"),
        "TRACKERS_FOLDER": os.path.join(root, "trackers"),
        "SEQ_INFO": {seq: frames},
        "SKIP_SPLIT_FOL": True,
        "PRINT_CONFIG": False,
    })
    raw_ref = ds.get_raw_seq_data("ours", seq)
    want = ds.get_preprocessed_seq_data(raw_ref, "pedestrian")

    raw = R.load_mots_seq(
        seq,
        os.path.join(root, "gt", seq, "gt", "gt.txt"),
        os.path.join(root, "trackers", "ours", "data", seq + ".txt"),
        frames,
    )
    got = R.preprocess_mots(raw, "pedestrian")
    _compare_mots(got, want, frames, label="mots")
    _check_metrics(got, want)


def test_kitti_mots_preproc_golden(tmp_path):
    _install_pycoco_shim()
    from trackeval.datasets import KittiMOTS

    from yolov7_tracker_tpu.eval import readers as R

    root = str(tmp_path)
    seq, frames = synth_mots(root, seq="0002", seed=2,
                             classes=(1, 1, 1, 2, 2, 2), frame_base=0)

    ds = KittiMOTS({
        "GT_FOLDER": os.path.join(root, "gt"),
        "TRACKERS_FOLDER": os.path.join(root, "trackers"),
        "SEQ_INFO": {seq: frames},
        "SKIP_SPLIT_FOL": True,
        "PRINT_CONFIG": False,
        "GT_LOC_FORMAT": "{gt_folder}/{seq}/gt/gt.txt",
    })
    raw_ref = ds.get_raw_seq_data("ours", seq)

    raw = R.load_kitti_mots_seq(
        seq,
        os.path.join(root, "gt", seq, "gt", "gt.txt"),
        os.path.join(root, "trackers", "ours", "data", seq + ".txt"),
        frames,
    )
    for cls in ("car", "pedestrian"):
        want = ds.get_preprocessed_seq_data(raw_ref, cls)
        got = R.preprocess_kitti_mots(raw, cls)
        _compare_mots(got, want, frames, label=f"kitti_mots/{cls}")
        _check_metrics(got, want)


def test_mots_evaluator_end_to_end(tmp_path):
    from yolov7_tracker_tpu.eval import evaluator

    root = str(tmp_path)
    seq, frames = synth_mots(root, seed=3, classes=(2, 2, 2, 2, 2, 2))
    table = evaluator.evaluate_benchmark(
        os.path.join(root, "gt"),
        os.path.join(root, "trackers", "ours", "data"),
        {seq: frames},
        benchmark="MOTS",
        output_folder=os.path.join(root, "out"),
    )
    res = table["pedestrian"]["COMBINED_SEQ"]
    assert np.isfinite(res["MOTA"]) and res["CLR_TP"] > 0


# ---------------------------------------------------------------------------
# DAVIS
# ---------------------------------------------------------------------------


def synth_davis(root, seq="bear", frames=12, seed=0):
    """Tiny DAVIS-layout dataset: indexed PNGs with 3 objects (disjoint
    rectangles), a void (255) border region in the gt, tracker frames
    with jitter/misses and an extra spurious object."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    gt_dir = os.path.join(root, "gt", seq)
    trk_dir = os.path.join(root, "trackers", "ours", "data", seq)
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(trk_dir, exist_ok=True)

    H, W = 60, 90
    for t in range(frames):
        g = np.zeros((H, W), np.uint8)
        tr = np.zeros((H, W), np.uint8)
        for i, oid in enumerate((1, 2, 3)):
            x0 = 5 + 28 * i + (t % 4)
            y0 = 8 + 2 * i + int(3 * np.sin(t / 2 + i))
            g[y0:y0 + 18, x0:x0 + 20] = oid
            if rng.uniform() < 0.85:
                dy, dx = rng.integers(-2, 3, 2)
                tr[y0 + dy:y0 + 16 + dy, x0 + dx:x0 + 19 + dx] = oid
        g[0:3, :] = 255                      # void strip
        if rng.uniform() < 0.4:              # spurious tracker object
            tr[50:58, 2:12] = 7
        Image.fromarray(g, mode="L").save(
            os.path.join(gt_dir, f"{t:05d}.png"))
        Image.fromarray(tr, mode="L").save(
            os.path.join(trk_dir, f"{t:05d}.png"))
    return seq, frames


def test_davis_preproc_golden(tmp_path):
    _install_pycoco_shim()
    from yolov7_tracker_tpu.eval import rle as RL

    m = sys.modules["pycocotools.mask"]
    m.encode = RL.encode_pycoco  # DAVIS oracle encodes dense stacks
    from trackeval.datasets import DAVIS

    from yolov7_tracker_tpu.eval import readers as R

    root = str(tmp_path)
    seq, frames = synth_davis(root)

    ds = DAVIS({
        "GT_FOLDER": os.path.join(root, "gt"),
        "TRACKERS_FOLDER": os.path.join(root, "trackers"),
        "SEQMAP_FILE": None,
        "PRINT_CONFIG": False,
    })
    raw_ref = ds.get_raw_seq_data("ours", seq)
    want = ds.get_preprocessed_seq_data(raw_ref, "general")

    raw = R.load_davis_seq(
        seq,
        os.path.join(root, "gt", seq),
        os.path.join(root, "trackers", "ours", "data", seq),
    )
    got = R.preprocess_davis(raw)
    _compare_mots(got, want, frames, label="davis")
    # voided tracker masks agree RLE-for-RLE
    for t in range(frames):
        for a, b in zip(got["tracker_dets"][t], want["tracker_dets"][t]):
            np.testing.assert_array_equal(RL.decode(a), RL.decode(b))
    _check_metrics(got, want)


def test_davis_jandf_through_evaluator(tmp_path):
    """DAVIS end-to-end through evaluate_benchmark with the dense J&F
    metric alongside HOTA."""
    from yolov7_tracker_tpu.eval import evaluator, readers as R

    root = str(tmp_path)
    seq, frames = synth_davis(root, seed=2)
    raw = R.load_davis_seq(
        seq, os.path.join(root, "gt", seq),
        os.path.join(root, "trackers", "ours", "data", seq))
    dense = R.preprocess_davis(raw, dense=True)
    from yolov7_tracker_tpu.eval import metrics as M

    res = M.jandf(dense)
    assert np.isfinite(res["J&F"]) and res["J&F"] > 0.3

    table = evaluator.evaluate_benchmark(
        os.path.join(root, "gt"),
        os.path.join(root, "trackers", "ours", "data"),
        {seq: frames},
        benchmark="DAVIS",
        gt_loc_format="{gt_folder}/{seq}",
        output_folder=os.path.join(root, "out"),
    )
    r = table["general"]["COMBINED_SEQ"]
    assert np.isfinite(r["MOTA"]) and r["CLR_TP"] > 0


# ---------------------------------------------------------------------------
# TAO
# ---------------------------------------------------------------------------


def synth_tao(root, seed=0):
    """Tiny TAO-layout dataset: 2 videos, sparse annotated frames, a
    merged category, per-video negative and not-exhaustive categories,
    a tracker json with scores, a missing video_id, a track id reused
    across videos, and detections on a non-annotated image."""
    rng = np.random.default_rng(seed)
    gt_dir = os.path.join(root, "gt")
    trk_dir = os.path.join(root, "trackers", "ours", "data")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(trk_dir, exist_ok=True)

    categories = [
        {"id": 1, "name": "person"},
        {"id": 2, "name": "car",
         "merged": [{"id": 7, "name": "auto"}]},
        {"id": 3, "name": "dog"},
        {"id": 4, "name": "cat"},
    ]
    videos = [
        {"id": 10, "name": "val/seq_a", "neg_category_ids": [3],
         "not_exhaustive_category_ids": []},
        {"id": 20, "name": "val/seq_b", "neg_category_ids": [],
         "not_exhaustive_category_ids": [2]},
    ]
    images, annotations, tracks = [], [], []
    img_id = 100
    ann_id = 1000
    vid_frames = {}
    for vid, n_frames in ((10, 6), (20, 5)):
        ids = []
        for k in range(n_frames):
            images.append({"id": img_id, "video_id": vid,
                           "frame_index": k * 30})
            ids.append(img_id)
            img_id += 1
        vid_frames[vid] = ids
    # an extra image with no gt annotations (tracker-only dets land here)
    images.append({"id": 999, "video_id": 10, "frame_index": 500})

    def add_track(vid, tid, cat, base, n0=0, n1=None):
        tracks.append({"id": tid, "category_id": cat, "video_id": vid})
        nonlocal_frames = vid_frames[vid][n0:n1]
        out = []
        for k, im in enumerate(nonlocal_frames):
            bbox = [base[0] + 3 * k, base[1] + 2 * k, 40 + (tid % 7),
                    60 + (tid % 5)]
            a = {"id": len(annotations) + 1, "image_id": im,
                 "video_id": vid, "track_id": tid, "category_id": cat,
                 "bbox": bbox}
            annotations.append(a)
            out.append((im, bbox))
        return out

    gt_boxes = {}
    gt_boxes[(10, 1)] = add_track(10, 1, 1, (50, 50))
    gt_boxes[(10, 2)] = add_track(10, 2, 7, (200, 80))   # 'auto' -> car
    gt_boxes[(10, 3)] = add_track(10, 3, 1, (400, 90), n0=2)
    gt_boxes[(20, 4)] = add_track(20, 4, 1, (60, 40))
    gt_boxes[(20, 5)] = add_track(20, 5, 2, (300, 120), n1=4)

    with open(os.path.join(gt_dir, "tao_gt.json"), "w") as f:
        json.dump({"videos": videos, "images": images,
                   "annotations": annotations, "tracks": tracks,
                   "categories": categories}, f)

    trk = []
    tid_counter = 0
    for (vid, tid), frames in gt_boxes.items():
        tid_counter += 1
        for im, bbox in frames:
            if rng.uniform() < 0.15:
                continue
            nx, ny = rng.normal(0, 2.0, 2)
            cat = 7 if tid == 2 else (1 if tid in (1, 3, 4) else 2)
            a = {"image_id": im, "track_id": tid % 3,  # ids clash across vids
                 "category_id": cat,
                 "bbox": [bbox[0] + nx, bbox[1] + ny, bbox[2], bbox[3]],
                 "score": float(rng.uniform(0.4, 1.0)),
                 "video_id": vid}
            trk.append(a)
    # missing video_id on one det + dets on the non-gt image + a neg-cat
    # det (dog, class 3, negative for video 10) + a spurious person det
    trk[0] = {k: v for k, v in trk[0].items() if k != "video_id"}
    trk.append({"image_id": 999, "track_id": 77, "category_id": 1,
                "bbox": [10, 10, 30, 30], "score": 0.9})
    trk.append({"image_id": vid_frames[10][1], "track_id": 78,
                "category_id": 3, "bbox": [700, 300, 40, 40],
                "score": 0.8, "video_id": 10})
    trk.append({"image_id": vid_frames[10][2], "track_id": 79,
                "category_id": 1, "bbox": [800, 400, 40, 40],
                "score": 0.7, "video_id": 10})
    with open(os.path.join(trk_dir, "results.json"), "w") as f:
        json.dump(trk, f)
    return ["val-seq_a", "val-seq_b"]


def test_tao_preproc_golden(tmp_path):
    _import_trackeval()
    from trackeval.datasets import TAO

    from yolov7_tracker_tpu.eval import readers as R

    root = str(tmp_path)
    seqs = synth_tao(root)

    ds = TAO({
        "GT_FOLDER": os.path.join(root, "gt"),
        "TRACKERS_FOLDER": os.path.join(root, "trackers"),
        "PRINT_CONFIG": False,
    })
    gt_json = os.path.join(root, "gt", "tao_gt.json")
    trk_json = os.path.join(root, "trackers", "ours", "data",
                            "results.json")
    for seq in seqs:
        raw_ref = ds.get_raw_seq_data("ours", seq)
        raw = R.load_tao_seq(seq, gt_json, trk_json)
        for cls in ("person", "car"):
            if cls not in ds.class_list:
                continue
            want = ds.get_preprocessed_seq_data(raw_ref, cls)
            got = R.preprocess_tao(raw, cls)
            _compare_preprocessed(got, want, raw["num_timesteps"],
                                  label=f"tao/{seq}/{cls}")
            # TrackMAP track representations
            assert got["gt_track_ids"] == want["gt_track_ids"]
            assert got["dt_track_ids"] == want["dt_track_ids"]
            np.testing.assert_allclose(
                got["dt_track_scores"], want["dt_track_scores"])
            np.testing.assert_allclose(
                got["gt_track_areas"], want["gt_track_areas"])
            assert got["gt_track_lengths"] == want["gt_track_lengths"]
            for a, b in zip(got["dt_tracks"], want["dt_tracks"]):
                assert set(a.keys()) == set(b.keys())
                for k in a:
                    np.testing.assert_allclose(a[k], b[k])
            _check_metrics(got, want)
            # TrackMAP downstream agrees
            from trackeval.metrics import TrackMAP

            from yolov7_tracker_tpu.eval import metrics as M

            tm = TrackMAP({"PRINT_CONFIG": False})
            want_tm = tm.combine_sequences({0: tm.eval_sequence(want)})
            got_tm = M.trackmap_combine([M.trackmap_sequence(got)])
            for lbl in M.TRACKMAP_LABELS:
                np.testing.assert_allclose(
                    np.asarray(got_tm["AP_" + lbl]),
                    np.asarray(want_tm["AP_" + lbl]),
                    atol=1e-8, err_msg=f"{seq}/{cls}/AP_{lbl}")


def test_tao_evaluator_end_to_end(tmp_path):
    from yolov7_tracker_tpu.eval import evaluator

    root = str(tmp_path)
    seqs = synth_tao(root, seed=1)
    table = evaluator.evaluate_benchmark(
        os.path.join(root, "gt"),
        os.path.join(root, "trackers", "ours", "data"),
        {s: 0 for s in seqs},
        benchmark="TAO",
        classes=["person"],
        gt_loc_format="{gt_folder}/tao_gt.json",
        output_folder=os.path.join(root, "out"),
    )
    res = table["person"]["COMBINED_SEQ"]
    assert np.isfinite(res["MOTA"]) and res["CLR_TP"] > 0


def synth_tao_ow(root, seed=0):
    """TAO fixture with categories spanning the OW splits: 4, 13 known;
    20 distractor; 5, 6 unknown."""
    rng = np.random.default_rng(seed)
    gt_dir = os.path.join(root, "gt")
    trk_dir = os.path.join(root, "trackers", "ours", "data")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(trk_dir, exist_ok=True)

    categories = [{"id": c, "name": f"cat{c}"} for c in (4, 13, 20, 5, 6)]
    videos = [
        {"id": 10, "name": "val/ow_a", "neg_category_ids": [],
         "not_exhaustive_category_ids": []},
    ]
    images, annotations, tracks = [], [], []
    vid_frames = []
    for k in range(6):
        images.append({"id": 100 + k, "video_id": 10,
                       "frame_index": k * 30})
        vid_frames.append(100 + k)

    def add_track(tid, cat, base):
        tracks.append({"id": tid, "category_id": cat, "video_id": 10})
        out = []
        for k, im in enumerate(vid_frames):
            bbox = [base[0] + 3 * k, base[1] + 2 * k, 45, 65]
            annotations.append({
                "id": len(annotations) + 1, "image_id": im,
                "video_id": 10, "track_id": tid, "category_id": cat,
                "bbox": bbox})
            out.append((im, bbox))
        return out

    gtb = {}
    for tid, cat, base in ((1, 4, (50, 50)), (2, 13, (220, 90)),
                           (3, 20, (420, 60)), (4, 5, (600, 100)),
                           (5, 6, (800, 40))):
        gtb[tid] = add_track(tid, cat, base)

    with open(os.path.join(gt_dir, "tao_gt.json"), "w") as f:
        json.dump({"videos": videos, "images": images,
                   "annotations": annotations, "tracks": tracks,
                   "categories": categories, "info": {}, "licenses": []},
                  f)

    trk = []
    for tid, frames in gtb.items():
        for im, bbox in frames:
            if rng.uniform() < 0.15:
                continue
            nx, ny = rng.normal(0, 2.0, 2)
            trk.append({"image_id": im, "track_id": 50 + tid,
                        "category_id": 1,  # OW trackers emit one class
                        "bbox": [bbox[0] + nx, bbox[1] + ny,
                                 bbox[2], bbox[3]],
                        "score": float(rng.uniform(0.4, 1.0)),
                        "video_id": 10})
    with open(os.path.join(trk_dir, "results.json"), "w") as f:
        json.dump(trk, f)
    return "val-ow_a"


def test_tao_ow_preproc_golden(tmp_path):
    _import_trackeval()
    from trackeval.datasets import TAO_OW

    from yolov7_tracker_tpu.eval import readers as R

    root = str(tmp_path)
    seq = synth_tao_ow(root)
    gt_json = os.path.join(root, "gt", "tao_gt.json")
    trk_json = os.path.join(root, "trackers", "ours", "data",
                            "results.json")
    for subset in ("known", "distractor", "unknown"):
        ds = TAO_OW({
            "GT_FOLDER": os.path.join(root, "gt"),
            "TRACKERS_FOLDER": os.path.join(root, "trackers"),
            "SUBSET": subset,
            "PRINT_CONFIG": False,
        })
        raw_ref = ds.get_raw_seq_data("ours", seq)
        want = ds.get_preprocessed_seq_data(raw_ref, "object")
        raw = R.load_tao_ow_seq(seq, gt_json, trk_json, subset=subset)
        got = R.preprocess_tao_ow(raw)
        _compare_preprocessed(got, want, raw["num_timesteps"],
                              label=f"tao_ow/{subset}")
        assert got["gt_track_ids"] == want["gt_track_ids"], subset
        assert got["dt_track_ids"] == want["dt_track_ids"], subset
        _check_metrics(got, want)


# ---------------------------------------------------------------------------
# YouTube-VIS
# ---------------------------------------------------------------------------


def synth_ytvis(root, seed=0):
    """Tiny YT-VIS-layout dataset: track-level jsons with uncompressed-
    RLE per-frame segmentations (disjoint rectangles), an iscrowd gt
    track, per-track scores in the tracker json."""
    from yolov7_tracker_tpu.eval import rle as RL

    rng = np.random.default_rng(seed)
    gt_dir = os.path.join(root, "gtv", "youtube_vis_train_sub_split")
    trk_dir = os.path.join(root, "trk", "youtube_vis_train_sub_split",
                           "ours", "data")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(trk_dir, exist_ok=True)

    H, W = 72, 96
    T = 8
    categories = [{"id": 1, "name": "person"}, {"id": 2, "name": "dog"}]
    videos = [{"id": 1, "file_names": [f"vidA/{t:05d}.jpg"
                                       for t in range(T)]}]

    def rect_rle(y0, x0, h, w):
        m = np.zeros((H, W), np.uint8)
        m[int(y0):int(y0) + h, int(x0):int(x0) + w] = 1
        runs = RL.counts_to_runs(RL.encode(m))
        return {"size": [H, W], "counts": [int(r) for r in runs]}

    def track_segs(x_lane, cat, miss_p=0.0, crowd=0):
        segs, areas = [], []
        for t in range(T):
            if rng.uniform() < miss_p:
                segs.append(None)
                areas.append(None)
            else:
                s = rect_rle(8 + 2 * t, x_lane + t, 16, 12)
                segs.append(s)
                areas.append(16 * 12)
        return segs, areas

    gt_anns, trk_anns = [], []
    lanes = [4, 26, 48, 70]
    cats = [1, 1, 2, 1]
    for i in range(4):
        segs, areas = track_segs(lanes[i], cats[i])
        gt_anns.append({"id": 10 + i, "video_id": 1,
                        "category_id": cats[i], "segmentations": segs,
                        "areas": areas, "iscrowd": 1 if i == 3 else 0,
                        "height": H, "width": W})
        tsegs, _ = track_segs(lanes[i], cats[i], miss_p=0.2)
        # jitter: shift the lane by 1-2 px via new rects
        tsegs = [None if s is None else rect_rle(
            8 + 2 * t + int(rng.integers(-1, 2)), lanes[i] + t, 16, 11)
            for t, s in enumerate(tsegs)]
        trk_anns.append({"video_id": 1, "category_id": cats[i],
                         "segmentations": tsegs,
                         "score": float(rng.uniform(0.4, 1.0)),
                         "height": H, "width": W})
    with open(os.path.join(gt_dir, "gt.json"), "w") as f:
        json.dump({"videos": videos, "annotations": gt_anns,
                   "categories": categories}, f)
    with open(os.path.join(trk_dir, "results.json"), "w") as f:
        json.dump(trk_anns, f)
    return "vidA", T


def test_ytvis_preproc_golden(tmp_path):
    _install_pycoco_shim()
    from yolov7_tracker_tpu.eval import rle as RL

    m = sys.modules["pycocotools.mask"]
    m.frPyObjects = lambda obj, h, w: RL.fr_uncompressed(obj, h, w)
    from trackeval.datasets import YouTubeVIS

    from yolov7_tracker_tpu.eval import readers as R

    root = str(tmp_path)
    seq, T = synth_ytvis(root)

    ds = YouTubeVIS({
        "GT_FOLDER": os.path.join(root, "gtv") + "/",
        "TRACKERS_FOLDER": os.path.join(root, "trk") + "/",
        "PRINT_CONFIG": False,
    })
    raw_ref = ds.get_raw_seq_data("ours", seq)

    gt_json = os.path.join(root, "gtv", "youtube_vis_train_sub_split",
                           "gt.json")
    trk_json = os.path.join(root, "trk", "youtube_vis_train_sub_split",
                            "ours", "data", "results.json")
    raw = R.load_ytvis_seq(seq, gt_json, trk_json)
    for cls in ("person", "dog"):
        want = ds.get_preprocessed_seq_data(raw_ref, cls)
        got = R.preprocess_ytvis(raw, cls)
        _compare_mots(got, want, T, label=f"ytvis/{cls}")
        assert got["gt_track_ids"] == want["gt_track_ids"]
        assert got["dt_track_ids"] == want["dt_track_ids"]
        assert got["gt_track_iscrowd"] == want["gt_track_iscrowd"]
        np.testing.assert_allclose(got["gt_track_areas"],
                                   want["gt_track_areas"])
        _check_metrics(got, want)
        # TrackMAP(mask): no per-track lengths in YT-VIS, so compare
        # with the time splits disabled on the oracle (ours keeps every
        # track in-range for those splits)
        from trackeval.metrics import TrackMAP

        from yolov7_tracker_tpu.eval import metrics as M

        tm = TrackMAP({"PRINT_CONFIG": False, "USE_TIME_RANGES": False})
        want_tm = tm.combine_sequences({0: tm.eval_sequence(want)})
        got_tm = M.trackmap_combine([M.trackmap_sequence(got)])
        for lbl in ("all", "area_s", "area_m", "area_l"):
            np.testing.assert_allclose(
                np.asarray(got_tm["AP_" + lbl]),
                np.asarray(want_tm["AP_" + lbl]),
                atol=1e-8, err_msg=f"{cls}/AP_{lbl}")


# ---------------------------------------------------------------------------
# BURST
# ---------------------------------------------------------------------------


def synth_burst(root, seed=0):
    """Tiny BURST-format dataset: 2 sequences with per-frame RLE
    segmentations (disjoint rectangles, compressed-string counts), a
    distractor-category gt track, neg/not-exhaustive categories, and a
    prediction json with scores/misses."""
    from yolov7_tracker_tpu.eval import rle as RL

    rng = np.random.default_rng(seed)
    gt_dir = os.path.join(root, "gt")
    trk_dir = os.path.join(root, "trackers", "ours", "data")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(trk_dir, exist_ok=True)

    H, W = 64, 96

    def rect(y0, x0, h, w):
        m = np.zeros((H, W), np.uint8)
        m[int(y0):int(y0) + h, int(x0):int(x0) + w] = 1
        return RL.encode(m)["counts"].decode()

    def seq(seq_id, name, cats, n_frames, miss_p):
        # cats: {local_track_id: category}
        lanes = np.linspace(2, W - 14, len(cats) + 1)
        gt_segs, pred_segs, paths = [], [], []
        for t in range(n_frames):
            paths.append(f"frame{t * 30:04d}.jpg")
            g, p = {}, {}
            for i, (local, cat) in enumerate(cats.items()):
                y0 = 6 + 2 * ((t + i) % 4)
                g[local] = {"rle": rect(y0, lanes[i] + t, 14, 10)}
                if rng.uniform() < 1 - miss_p:
                    p[local] = {
                        "rle": rect(y0 + int(rng.integers(-2, 3)),
                                    lanes[i] + t, 14, 9),
                        "score": float(rng.uniform(0.4, 1.0))}
            gt_segs.append(g)
            pred_segs.append(p)
        base = {"id": seq_id, "dataset": "synthetic", "seq_name": name,
                "width": W, "height": H,
                "annotated_image_paths": paths,
                "track_category_ids": {str(k): v
                                       for k, v in cats.items()},
                "neg_category_ids": [95],
                "not_exhaustive_category_ids": []}
        return ({**base, "segmentations": gt_segs},
                {**base, "segmentations": pred_segs})

    # cat 4/13 known; 20 is an OW distractor (dropped from gt)
    g1, p1 = seq(10, "seq_a", {1: 4, 2: 13, 3: 20}, 6, 0.15)
    g2, p2 = seq(20, "seq_b", {1: 13, 2: 4}, 5, 0.15)
    gt = {"split": "val", "sequences": [g1, g2]}
    pred = {"split": "val", "sequences": [p1, p2]}
    with open(os.path.join(gt_dir, "all_classes.json"), "w") as f:
        json.dump(gt, f)
    with open(os.path.join(trk_dir, "results.json"), "w") as f:
        json.dump(pred, f)
    return ["val/synthetic/seq_a", "val/synthetic/seq_b"]


def test_burst_preproc_golden(tmp_path):
    _install_pycoco_shim()
    from yolov7_tracker_tpu.eval import rle as RL

    m = sys.modules["pycocotools.mask"]
    m.toBbox = RL.to_bbox

    def iou_dispatch(a, b, iscrowd):
        # pycocotools mask.iou silently does bbox IoU for array inputs
        if isinstance(a, np.ndarray) or (
                len(a) and not isinstance(a[0], dict)):
            a = np.asarray(a, float).reshape(-1, 4)
            b = np.asarray(b, float).reshape(-1, 4)
            from yolov7_tracker_tpu.eval.data import iou_tlwh

            return iou_tlwh(a, b)
        return RL.iou(a, b, iscrowd)

    m.iou = iou_dispatch
    # format_converter binds `cocomask` at ITS import; other tests may
    # have replaced sys.modules["pycocotools.mask"] since (test_jandf
    # installs a dense-array shim), so rebind explicitly
    import trackeval.datasets.burst_helpers.format_converter as fc

    fc.cocomask = m
    from trackeval.datasets import BURST

    from yolov7_tracker_tpu.eval import readers as R

    root = str(tmp_path)
    seqs = synth_burst(root)
    cats_path = os.path.join(
        "/root/reference/tracker/trackeval/datasets/burst_helpers",
        "tao_categories.json")

    ds = BURST({
        "GT_FOLDER": os.path.join(root, "gt"),
        "TRACKERS_FOLDER": os.path.join(root, "trackers"),
        "EXEMPLAR_GUIDED": False,
        "PRINT_CONFIG": False,
    })
    gt_json = os.path.join(root, "gt", "all_classes.json")
    trk_json = os.path.join(root, "trackers", "ours", "data",
                            "results.json")
    for seq in seqs:
        seq_disp = seq.replace("/", "-")
        names = [s for s in ds.seq_list
                 if s.replace("/", "-") == seq_disp or s == seq]
        raw_ref = ds.get_raw_seq_data("ours", names[0])
        raw = R.load_burst_seq(seq_disp, gt_json, trk_json,
                               categories=cats_path)
        for cls in ("dog", "cat"):
            if cls not in ds.class_list:
                continue
            want = ds.get_preprocessed_seq_data(raw_ref, cls)
            got = R.preprocess_burst(raw, cls)
            _compare_preprocessed(got, want, raw["num_timesteps"],
                                  label=f"burst/{seq}/{cls}")
            assert got["gt_track_ids"] == want["gt_track_ids"]
            assert got["dt_track_ids"] == want["dt_track_ids"]
            np.testing.assert_allclose(got["gt_track_areas"],
                                       want["gt_track_areas"])
            _check_metrics(got, want)
            # TrackMAP over mask tracks
            from trackeval.metrics import TrackMAP

            from yolov7_tracker_tpu.eval import metrics as M

            tm = TrackMAP({"PRINT_CONFIG": False})
            want_tm = tm.combine_sequences({0: tm.eval_sequence(want)})
            got_tm = M.trackmap_combine([M.trackmap_sequence(got)])
            for lbl in M.TRACKMAP_LABELS:
                np.testing.assert_allclose(
                    np.asarray(got_tm["AP_" + lbl]),
                    np.asarray(want_tm["AP_" + lbl]),
                    atol=1e-8, err_msg=f"{seq}/{cls}/AP_{lbl}")


def test_burst_ow_preproc_golden(tmp_path):
    _install_pycoco_shim()
    from yolov7_tracker_tpu.eval import rle as RL

    m = sys.modules["pycocotools.mask"]
    m.toBbox = RL.to_bbox

    def iou_dispatch(a, b, iscrowd):
        if isinstance(a, np.ndarray) or (
                len(a) and not isinstance(a[0], dict)):
            a = np.asarray(a, float).reshape(-1, 4)
            b = np.asarray(b, float).reshape(-1, 4)
            from yolov7_tracker_tpu.eval.data import iou_tlwh

            return iou_tlwh(a, b)
        return RL.iou(a, b, iscrowd)

    m.iou = iou_dispatch
    # format_converter binds `cocomask` at ITS import; other tests may
    # have replaced sys.modules["pycocotools.mask"] since (test_jandf
    # installs a dense-array shim), so rebind explicitly
    import trackeval.datasets.burst_helpers.format_converter as fc

    fc.cocomask = m
    from trackeval.datasets import BURST_OW

    from yolov7_tracker_tpu.eval import readers as R

    root = str(tmp_path)
    seqs = synth_burst(root, seed=2)
    cats_path = os.path.join(
        "/root/reference/tracker/trackeval/datasets/burst_helpers",
        "tao_categories.json")

    ds = BURST_OW({
        "GT_FOLDER": os.path.join(root, "gt"),
        "TRACKERS_FOLDER": os.path.join(root, "trackers"),
        "SUBSET": "known",
        "PRINT_CONFIG": False,
    })
    gt_json = os.path.join(root, "gt", "all_classes.json")
    trk_json = os.path.join(root, "trackers", "ours", "data",
                            "results.json")
    for seq in seqs:
        seq_disp = seq.replace("/", "-")
        names = [s for s in ds.seq_list
                 if s.replace("/", "-") == seq_disp or s == seq]
        raw_ref = ds.get_raw_seq_data("ours", names[0])
        want = ds.get_preprocessed_seq_data(raw_ref, "object")
        raw = R.load_burst_ow_seq(seq_disp, gt_json, trk_json,
                                  categories=cats_path, subset="known")
        got = R.preprocess_burst_ow(raw)
        _compare_preprocessed(got, want, raw["num_timesteps"],
                              label=f"burst_ow/{seq}")
        assert got["gt_track_ids"] == want["gt_track_ids"]
        assert got["dt_track_ids"] == want["dt_track_ids"]
        _check_metrics(got, want)


# ---------------------------------------------------------------------------
# RobMOTS
# ---------------------------------------------------------------------------


def synth_robmots(root, seed=0, sub="mots_challenge"):
    """Tiny RobMOTS-layout dataset: unified txt rows
    `t id cls score h w rle` (0-based frames), COCO class ids, a +100
    ignore region, a tiny unmatched det, seqmap with an ignore class."""
    from yolov7_tracker_tpu.eval import rle as RL

    rng = np.random.default_rng(seed)
    split = "train"
    gt_dir = os.path.join(root, "gt", split, sub)
    trk_dir = os.path.join(root, "trackers", split, "ours", "data", sub)
    os.makedirs(os.path.join(gt_dir, "data"), exist_ok=True)
    os.makedirs(trk_dir, exist_ok=True)

    H, W = 96, 160
    T = 12
    seq = "seq01"

    def rect(y0, x0, h, w):
        m = np.zeros((H, W), np.uint8)
        m[int(y0):int(y0) + h, int(x0):int(x0) + w] = 1
        return RL.encode(m)["counts"].decode()

    classes = [1, 1, 3, 16]   # person, person, car, cat (cat = ignored)
    lanes = [4, 40, 76, 112]
    gt_rows, trk_rows = [], []
    for t in range(T):
        for i, c in enumerate(classes):
            y0 = 8 + 2 * ((t + i) % 4)
            gt_rows.append(f"{t} {10 + i} {c} 1.0 {H} {W} "
                           f"{rect(y0, lanes[i] + t, 30, 12)}")
            if rng.uniform() < 0.85:
                trk_rows.append(
                    f"{t} {50 + i} {c} {rng.uniform(0.5, 1.0):.3f} "
                    f"{H} {W} "
                    f"{rect(y0 + int(rng.integers(-2, 3)), lanes[i] + t, 29, 11)}")
        # ignore region for class person (101) + a tiny unmatched det
        gt_rows.append(f"{t} 90 101 1.0 {H} {W} {rect(60, 140, 30, 16)}")
        if rng.uniform() < 0.5:
            trk_rows.append(f"{t} 99 1 0.9 {H} {W} {rect(64, 142, 24, 12)}")
        if rng.uniform() < 0.4:   # too-small det (<= min(96,160)/8 = 12)
            trk_rows.append(f"{t} 98 3 0.8 {H} {W} {rect(4, 150, 8, 6)}")
    with open(os.path.join(gt_dir, "data", seq + ".txt"), "w") as f:
        f.write("\n".join(gt_rows) + "\n")
    with open(os.path.join(gt_dir, "seqmap.txt"), "w") as f:
        f.write(f"{seq} {T} {H} {W} 16\n")   # cat ignored in this seq
    with open(os.path.join(gt_dir, "clsmap.txt"), "w") as f:
        f.write("1 3 16\n")
    with open(os.path.join(trk_dir, seq + ".txt"), "w") as f:
        f.write("\n".join(trk_rows) + "\n")
    return seq, T, (H, W)


def test_robmots_preproc_golden(tmp_path):
    _install_pycoco_shim()
    from yolov7_tracker_tpu.eval import rle as RL

    m = sys.modules["pycocotools.mask"]

    def to_bbox_multi(d):
        if isinstance(d, dict):
            return RL.to_bbox(d)
        return np.stack([RL.to_bbox(x) for x in d]) if len(d) \
            else np.zeros((0, 4))

    m.toBbox = to_bbox_multi
    m.frPyObjects = lambda obj, h, w: (
        [RL.from_bbox(b, h, w) for b in obj]
        if isinstance(obj, np.ndarray) and obj.ndim == 2
        else RL.fr_uncompressed(obj, h, w))
    from trackeval.datasets import RobMOTS

    from yolov7_tracker_tpu.eval import readers as R

    root = str(tmp_path)
    seq, T, size = synth_robmots(root)

    ds = RobMOTS({
        "GT_FOLDER": os.path.join(root, "gt"),
        "TRACKERS_FOLDER": os.path.join(root, "trackers"),
        "SUB_BENCHMARK": "mots_challenge",
        "SPLIT_TO_EVAL": "train",
        "PRINT_CONFIG": False,
    })
    raw_ref = ds.get_raw_seq_data("ours", seq)

    seqmap = R.read_robmots_seqmap(
        os.path.join(root, "gt", "train", "mots_challenge", "seqmap.txt"))
    info = seqmap[seq]
    raw = R.load_robmots_seq(
        seq,
        os.path.join(root, "gt", "train", "mots_challenge", "data",
                     seq + ".txt"),
        os.path.join(root, "trackers", "train", "ours", "data",
                     "mots_challenge", seq + ".txt"),
        info["length"], info["size"], "mots_challenge",
        ignore_class_ids=info["ignore_class_ids"],
        valid_class_ids=(1, 3, 16),
    )
    for cls in ("person", "car", "cat", "all"):
        want = ds.get_preprocessed_seq_data(raw_ref, cls)
        got = R.preprocess_robmots(raw, cls)
        _compare_mots(got, want, T, label=f"robmots/{cls}")
        _check_metrics(got, want)
