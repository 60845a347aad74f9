"""COCO RLE codec tests: hand-derived strings from the format spec,
dense round-trips, and run-level ops vs dense-mask computations."""

import numpy as np

from yolov7_tracker_tpu.eval import rle as RL


def test_counts_encoding_hand_derived():
    # runs [1, 2, 3, 3]: first three raw, fourth stored as delta
    # 3 - runs[1] = 1 -> all single 5-bit chunks '1','2','3','1'
    assert RL.runs_to_counts([1, 2, 3, 3]) == b"1231"
    np.testing.assert_array_equal(
        RL.counts_to_runs({"size": [3, 3], "counts": b"1231"}),
        [1, 2, 3, 3])
    # negative delta: runs [2, 5, 1, 1] -> i=3 stores 1-5=-4, whose
    # 5-bit chunk is 28 with the 0x10 sign bit set -> chr(48+28)='L'
    assert RL.runs_to_counts([2, 5, 1, 1]) == b"251L"
    np.testing.assert_array_equal(
        RL.counts_to_runs({"size": [4, 2], "counts": b"251L"}),
        [2, 5, 1, 1])
    # multi-chunk value: 100 = 0b1100100 -> chunks 00100|00011 with
    # continuation on the first
    assert RL.runs_to_counts([100]) == bytes([48 + 4 + 32, 48 + 3])


def test_dense_roundtrip():
    rng = np.random.default_rng(0)
    for h, w in [(1, 1), (7, 5), (13, 31), (64, 64)]:
        for frac in (0.0, 0.2, 0.8, 1.0):
            mask = (rng.random((h, w)) < frac).astype(np.uint8)
            enc = RL.encode(mask)
            np.testing.assert_array_equal(RL.decode(enc), mask)
            assert RL.area(enc) == int(mask.sum())


def test_merge_and_iou_vs_dense():
    rng = np.random.default_rng(1)
    h, w = 40, 30
    masks = [(rng.random((h, w)) < 0.3).astype(np.uint8) for _ in range(4)]
    encs = [RL.encode(m) for m in masks]

    union = RL.decode(RL.merge(encs, intersect=False))
    np.testing.assert_array_equal(union, np.maximum.reduce(masks))
    inter = RL.decode(RL.merge(encs[:2], intersect=True))
    np.testing.assert_array_equal(inter, masks[0] & masks[1])

    got = RL.iou(encs[:2], encs[2:], [False, False])
    for i in range(2):
        for j in range(2):
            a, b = masks[i].astype(bool), masks[2 + j].astype(bool)
            want = (a & b).sum() / max((a | b).sum(), 1)
            np.testing.assert_allclose(got[i, j], want, atol=1e-12)
    # iscrowd: intersection over dt area
    got_ioa = RL.iou(encs[:1], encs[1:2], [True])
    a, b = masks[0].astype(bool), masks[1].astype(bool)
    np.testing.assert_allclose(
        got_ioa[0, 0], (a & b).sum() / max(a.sum(), 1), atol=1e-12)


def test_empty_and_full():
    z = RL.encode(np.zeros((5, 7), np.uint8))
    assert RL.area(z) == 0
    np.testing.assert_array_equal(RL.decode(z), np.zeros((5, 7)))
    f = RL.encode(np.ones((5, 7), np.uint8))
    assert RL.area(f) == 35
    m = RL.merge([], intersect=False)
    assert RL.area(m) == 0
