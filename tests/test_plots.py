"""Tests for train-batch mosaics (utils/plots.py plot_images analogue,
train.py:388-391) and tracker-comparison scatter plots
(trackeval/plotting.py analogue)."""

import csv
import os

import numpy as np


def test_plot_train_batch(tmp_path):
    import cv2

    from yolov7_tracker_tpu.utils.logging import plot_train_batch

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (4, 96, 96, 3), np.uint8)
    targets = np.zeros((4, 8, 5), np.float32)
    masks = np.zeros((4, 8), bool)
    for b in range(4):
        targets[b, 0] = [b % 2, 0.5, 0.5, 0.3, 0.4]
        masks[b, 0] = True
    out = plot_train_batch(imgs, targets, masks,
                           str(tmp_path / "b" / "train_batch0.jpg"),
                           names=("car", "person"))
    img = cv2.imread(out)
    assert img is not None and img.shape == (192, 192, 3)  # 2x2 grid
    # float input path
    out2 = plot_train_batch(imgs.astype(np.float32) / 255, targets, masks,
                            str(tmp_path / "train_batch1.jpg"))
    assert os.path.isfile(out2)


def test_plot_compare_trackers(tmp_path):
    from yolov7_tracker_tpu.eval.plotting import (
        DEFAULT_PLOTS, plot_compare_trackers,
    )

    fields = ["HOTA", "DetA", "AssA", "DetRe", "DetPr", "AssRe", "AssPr",
              "LocA", "MOTA", "IDF1"]
    rng = np.random.default_rng(1)
    for trk in ("bytetrack", "sort", "botsort"):
        d = tmp_path / trk
        d.mkdir()
        with open(d / "pedestrian_summary.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["seq"] + fields)
            w.writerow(["COMBINED_SEQ"]
                       + [f"{rng.uniform(0.3, 0.9):.5g}" for _ in fields])
    out = plot_compare_trackers(
        str(tmp_path), ["bytetrack", "sort", "botsort"], "pedestrian",
        str(tmp_path / "plots"),
    )
    assert len(out) == len(DEFAULT_PLOTS)
    for p in out:
        assert os.path.isfile(p) and os.path.getsize(p) > 5000
