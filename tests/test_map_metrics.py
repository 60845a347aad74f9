"""mAP harness parity: ap_per_class / compute_ap / correctness_matrix /
ConfusionMatrix vs the reference utils/metrics.py."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
    not os.path.isdir(REF), reason="no reference repo"
),
]


def _ref_metrics():
    from tests.test_model_parity import _stub_missing_modules

    _stub_missing_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import utils.general  # noqa: F401  (break the metrics<->general cycle)
    import utils.metrics as rm

    return rm


def _stats(seed, n=500, nc=6):
    rng = np.random.default_rng(seed)
    conf = rng.uniform(0, 1, n).astype(np.float32)
    pred_cls = rng.integers(0, nc, n).astype(np.float32)
    target_cls = rng.integers(0, nc, 300).astype(np.float32)
    # tp correlated with confidence so curves are non-trivial
    base = (rng.uniform(0, 1, n) < conf * 0.9)
    tp = np.stack([base & (rng.uniform(0, 1, n) < 1.0 - 0.08 * j)
                   for j in range(10)], axis=1)
    return tp, conf, pred_cls, target_cls


@pytest.mark.parametrize("seed", range(3))
def test_ap_per_class_matches_reference(seed):
    rm = _ref_metrics()
    from yolov7_tracker_tpu.train.metrics import ap_per_class

    tp, conf, pcls, tcls = _stats(seed)
    p, r, ap, f1, classes = ap_per_class(tp, conf, pcls, tcls)
    p_r, r_r, ap_r, f1_r, cls_r = rm.ap_per_class(tp, conf, pcls, tcls)
    np.testing.assert_array_equal(classes, cls_r.astype(int))
    np.testing.assert_allclose(ap, ap_r, atol=1e-10)
    np.testing.assert_allclose(p, p_r, atol=1e-10)
    np.testing.assert_allclose(r, r_r, atol=1e-10)


def test_confusion_matrix_matches_reference():
    rm = _ref_metrics()
    torch = pytest.importorskip("torch")
    from yolov7_tracker_tpu.train.metrics import ConfusionMatrix

    rng = np.random.default_rng(0)
    nc = 4
    mine = ConfusionMatrix(nc=nc)
    ref = rm.ConfusionMatrix(nc=nc)
    for _ in range(5):
        nd = int(rng.integers(8, 20))
        nl = int(rng.integers(2, 8))
        xy = rng.uniform(0, 400, (nd, 2))
        wh = rng.uniform(20, 80, (nd, 2))
        dets = np.concatenate(
            [xy, xy + wh, rng.uniform(0.2, 1, (nd, 1)),
             rng.integers(0, nc, (nd, 1))], axis=1
        ).astype(np.float32)
        lxy = xy[:nl] + rng.normal(0, 10, (nl, 2))
        labels = np.concatenate(
            [rng.integers(0, nc, (nl, 1)), lxy, lxy + wh[:nl]], axis=1
        ).astype(np.float32)
        mine.process_batch(dets, labels)
        ref.process_batch(torch.from_numpy(dets), torch.from_numpy(labels))
    np.testing.assert_allclose(mine.matrix, ref.matrix, atol=1e-9)
