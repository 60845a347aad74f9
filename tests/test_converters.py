"""Dataset converter tests over synthetic VisDrone / MOT trees."""

import os

import numpy as np
import pytest


def test_visdrone_converter(tmp_path):
    import cv2

    from yolov7_tracker_tpu.data import converters

    root = tmp_path / "vd"
    split = "VisDrone2019-MOT-train"
    seq = "uav0001"
    (root / split / "sequences" / seq).mkdir(parents=True)
    (root / split / "annotations").mkdir(parents=True)
    for f in range(1, 4):
        cv2.imwrite(
            str(root / split / "sequences" / seq / f"{f:07d}.jpg"),
            np.zeros((100, 200, 3), np.uint8),
        )
    rows = [
        "1,1,20,30,40,20,1,4,0,0",     # car, kept (cls 3 after remap)
        "1,2,10,10,20,20,0,4,0,0",     # score 0 -> dropped
        "2,1,25,35,40,20,1,1,0,0",     # pedestrian
        "2,3,5,5,10,10,1,0,0,0",       # ignored class -> dropped
    ]
    (root / split / "annotations" / f"{seq}.txt").write_text(
        "\n".join(rows) + "\n"
    )
    imgs = converters.convert_visdrone(str(root), split)
    assert len(imgs) == 3
    lab1 = (root / split / "labels" / seq / "0000001.txt").read_text()
    assert lab1.startswith("3 ")  # car remapped 4 -> 3
    vals = [float(x) for x in lab1.split()[1:]]
    assert all(0 <= v <= 1 for v in vals)
    lab2 = (root / split / "labels" / seq / "0000002.txt").read_text()
    assert len(lab2.strip().splitlines()) == 1  # ignored row dropped


def test_mot_converter(tmp_path):
    import configparser

    import cv2

    from yolov7_tracker_tpu.data import converters

    root = tmp_path / "mot"
    seq = root / "train" / "MOT-01"
    (seq / "img1").mkdir(parents=True)
    (seq / "gt").mkdir(parents=True)
    for f in range(1, 3):
        cv2.imwrite(str(seq / "img1" / f"{f:06d}.jpg"),
                    np.zeros((80, 160, 3), np.uint8))
    ini = configparser.ConfigParser()
    ini["Sequence"] = {"imWidth": "160", "imHeight": "80", "imDir": "img1",
                       "seqLength": "2", "name": "MOT-01"}
    with open(seq / "seqinfo.ini", "w") as f:
        ini.write(f)
    gt = [
        "1,1,10,10,30,20,1,1,0.9",   # kept
        "1,2,50,10,30,20,1,1,0.5",   # low visibility -> dropped
        "2,1,12,11,30,20,1,2,0.9",   # non-pedestrian -> dropped
    ]
    (seq / "gt" / "gt.txt").write_text("\n".join(gt) + "\n")
    imgs = converters.convert_mot(str(root), "train")
    assert len(imgs) == 2
    lab = (seq / "labels" / "000001.txt").read_text().strip().splitlines()
    assert len(lab) == 1 and lab[0].startswith("0 ")
    assert not os.path.exists(seq / "labels" / "000002.txt") or \
        (seq / "labels" / "000002.txt").read_text().strip() == ""


def test_discover_visdrone_layout(tmp_path):
    import cv2

    from yolov7_tracker_tpu.data.sequence import discover_sequences

    root = tmp_path / "VisDrone2019"
    d = root / "VisDrone2019-MOT-test-dev" / "sequences" / "uav7"
    d.mkdir(parents=True)
    cv2.imwrite(str(d / "0000001.jpg"), np.zeros((10, 10, 3), np.uint8))
    seqs = discover_sequences(str(root), "origin", split="test-dev")
    assert len(seqs) == 1 and seqs[0].name == "uav7"
