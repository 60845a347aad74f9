"""Hand-derived scenarios for eval/cocoeval_lite.py (the pycocotools
COCOeval bbox replacement the reference's test.py json path needs,
test.py:173-193). Each expectation is computed by hand from the COCO
protocol: 10 IoU thresholds, 101-point interpolation, greedy matching,
crowd/ignore and area-range rules."""

import json

import numpy as np
import pytest

from yolov7_tracker_tpu.eval.cocoeval_lite import (
    COCOevalLite,
    bbox_iou_xywh,
    evaluate_json,
)


def _gt(images, anns):
    return {
        "images": [{"id": i} for i in images],
        "annotations": [
            {"id": k, **a} for k, a in enumerate(anns)
        ],
        "categories": [{"id": 1}],
    }


def _ann(img, bbox, cat=1, **kw):
    return {"image_id": img, "category_id": cat, "bbox": bbox, **kw}


def _det(img, bbox, score, cat=1):
    return {"image_id": img, "category_id": cat, "bbox": bbox,
            "score": score}


def test_iou_matrix_plain_and_crowd():
    dt = np.array([[0, 0, 10, 10.0]])
    gt = np.array([[0, 0, 10, 5.0]])
    plain = bbox_iou_xywh(dt, gt, np.array([0]))
    crowd = bbox_iou_xywh(dt, gt, np.array([1]))
    assert plain[0, 0] == pytest.approx(0.5)      # 50 / 100
    assert crowd[0, 0] == pytest.approx(0.5)      # inter / det area


def test_perfect_detection_is_ap_1():
    gt = _gt([1], [_ann(1, [10, 10, 20, 30])])
    dt = [_det(1, [10, 10, 20, 30], 0.9)]
    s = COCOevalLite(gt, dt).accumulate().summarize()
    assert s["AP"] == pytest.approx(1.0)
    assert s["AP50"] == pytest.approx(1.0)
    assert s["AR100"] == pytest.approx(1.0)


def test_iou_half_matches_only_the_first_threshold():
    # IoU exactly 0.5: counts at t=0.50, misses 0.55..0.95 -> AP = 0.1
    gt = _gt([1], [_ann(1, [0, 0, 10, 10])])
    dt = [_det(1, [0, 0, 10, 5], 0.9)]
    s = COCOevalLite(gt, dt).accumulate().summarize()
    assert s["AP50"] == pytest.approx(1.0)
    assert s["AP75"] == pytest.approx(0.0)
    assert s["AP"] == pytest.approx(0.1)


def test_high_scoring_false_positive_caps_precision():
    # order: FP(.95), TP(.9), TP(.5) -> envelope precision 2/3 everywhere
    gt = _gt([1], [_ann(1, [0, 0, 10, 10]), _ann(1, [50, 50, 10, 10])])
    dt = [
        _det(1, [100, 100, 10, 10], 0.95),
        _det(1, [0, 0, 10, 10], 0.9),
        _det(1, [50, 50, 10, 10], 0.5),
    ]
    s = COCOevalLite(gt, dt).accumulate().summarize()
    assert s["AP"] == pytest.approx(2.0 / 3.0)
    assert s["AR100"] == pytest.approx(1.0)


def test_duplicate_after_full_recall_does_not_hurt():
    gt = _gt([1], [_ann(1, [0, 0, 10, 10])])
    dt = [_det(1, [0, 0, 10, 10], 0.9),
          _det(1, [0, 0, 10, 10], 0.8)]
    s = COCOevalLite(gt, dt).accumulate().summarize()
    assert s["AP"] == pytest.approx(1.0)


def test_crowd_gt_absorbs_matches_without_counting():
    # det B overlaps only the crowd region: ignored, not a FP
    gt = _gt([1], [
        _ann(1, [0, 0, 10, 10]),
        _ann(1, [100, 100, 50, 50], iscrowd=1),
    ])
    dt = [
        _det(1, [0, 0, 10, 10], 0.9),
        _det(1, [110, 110, 20, 20], 0.8),   # inside crowd
    ]
    s = COCOevalLite(gt, dt).accumulate().summarize()
    assert s["AP"] == pytest.approx(1.0)
    # without the crowd flag the same det is a plain FP after recall
    # saturation -> AP unchanged but the det now counts in fp cumsum
    gt2 = _gt([1], [_ann(1, [0, 0, 10, 10])])
    s2 = COCOevalLite(gt2, dt).accumulate().summarize()
    assert s2["AP"] == pytest.approx(1.0)


def test_unmatched_high_fp_with_crowd_still_counts():
    # FP scored above the TP: precision envelope 0.5
    gt = _gt([1], [_ann(1, [0, 0, 10, 10])])
    dt = [
        _det(1, [200, 200, 5, 5], 0.95),
        _det(1, [0, 0, 10, 10], 0.9),
    ]
    s = COCOevalLite(gt, dt).accumulate().summarize()
    assert s["AP"] == pytest.approx(0.5)


def test_maxdets_truncation_drives_ar1():
    gt = _gt([1], [_ann(1, [0, 0, 10, 10]), _ann(1, [50, 50, 10, 10])])
    dt = [_det(1, [0, 0, 10, 10], 0.9),
          _det(1, [50, 50, 10, 10], 0.8)]
    s = COCOevalLite(gt, dt).accumulate().summarize()
    assert s["AR1"] == pytest.approx(0.5)
    assert s["AR10"] == pytest.approx(1.0)


def test_area_ranges_partition():
    # one small GT (16x16=256), one large GT (200x200=40000)
    gt = _gt([1], [_ann(1, [0, 0, 16, 16]), _ann(1, [300, 300, 200, 200])])
    dt = [_det(1, [0, 0, 16, 16], 0.9),
          _det(1, [300, 300, 200, 200], 0.8)]
    e = COCOevalLite(gt, dt).accumulate()
    s = e.summarize()
    assert s["AP_small"] == pytest.approx(1.0)
    assert s["AP_large"] == pytest.approx(1.0)
    assert s["AP_medium"] == -1.0   # no medium GT anywhere
    assert s["AP"] == pytest.approx(1.0)


def test_per_image_and_per_category_isolation():
    # det in the wrong image / category never matches
    gt = _gt([1, 2], [_ann(1, [0, 0, 10, 10])])
    dt = [_det(2, [0, 0, 10, 10], 0.9)]
    s = COCOevalLite(gt, dt).accumulate().summarize()
    assert s["AP"] == pytest.approx(0.0)


def test_greedy_matching_prefers_best_iou_not_first():
    # two GTs; the det overlaps both, better IoU with the second
    gt = _gt([1], [_ann(1, [0, 0, 10, 10]), _ann(1, [2, 0, 10, 10])])
    dt = [_det(1, [2, 0, 10, 10], 0.9)]
    e = COCOevalLite(gt, dt).accumulate()
    s = e.summarize()
    # recall 0.5 at every threshold (one GT matched perfectly);
    # p=1 at the 51 recall points <= 0.5, 0 after -> AP = 51/101
    assert s["AR100"] == pytest.approx(0.5)
    assert s["AP"] == pytest.approx(51.0 / 101.0)


def test_evaluate_json_roundtrip(tmp_path):
    gt = _gt([1], [_ann(1, [10, 10, 20, 30])])
    dt = [_det(1, [10, 10, 20, 30], 0.9)]
    gp, dp = tmp_path / "gt.json", tmp_path / "dt.json"
    gp.write_text(json.dumps(gt))
    dp.write_text(json.dumps(dt))
    s = evaluate_json(str(gp), str(dp))
    assert s["AP"] == pytest.approx(1.0)
