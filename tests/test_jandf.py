"""J&F parity vs the vendored TrackEval JAndF, run on dense masks via a
minimal pycocotools/skimage shim (the real pycocotools is absent — the
shim stores dense arrays where the original stores RLE)."""

import math
import sys
import types

import numpy as np
import pytest


def _install_mask_shims():
    """pycocotools.mask + skimage.morphology over dense numpy masks."""
    m = types.ModuleType("pycocotools")
    mm = types.ModuleType("pycocotools.mask")

    def encode(arr):
        return {"size": list(arr.shape), "dense": np.asarray(arr, np.uint8)}

    def decode(d):
        return d["dense"]

    def area(objs):
        if isinstance(objs, dict):
            return objs["dense"].sum()
        return np.array([o["dense"].sum() for o in objs], float)

    def iou(dt, gt, iscrowd):
        out = np.zeros((len(dt), len(gt)))
        for i, d in enumerate(dt):
            for j, g in enumerate(gt):
                inter = np.logical_and(d["dense"], g["dense"]).sum()
                union = d["dense"].sum() + g["dense"].sum() - inter
                out[i, j] = inter / union if union > 0 else 0.0
        return out

    mm.encode, mm.decode, mm.area, mm.iou = encode, decode, area, iou
    m.mask = mm
    sys.modules["pycocotools"] = m
    sys.modules["pycocotools.mask"] = mm

    sk = types.ModuleType("skimage")
    morph = types.ModuleType("skimage.morphology")

    def disk(r):
        r = int(r)
        y, x = np.ogrid[-r:r + 1, -r:r + 1]
        return (x * x + y * y <= r * r)

    morph.disk = disk
    sk.morphology = morph
    sys.modules.setdefault("skimage", sk)
    sys.modules["skimage.morphology"] = morph


def _synth_mask_data(seed, T=12, n_gt=3, n_tr=4, H=64, W=80):
    rng = np.random.default_rng(seed)
    data = {
        "num_timesteps": T, "num_gt_ids": n_gt, "num_tracker_ids": n_tr,
        "gt_ids": [], "tracker_ids": [], "gt_dets": [], "tracker_dets": [],
    }
    centers = rng.uniform(15, 50, (n_gt, 2))
    vel = rng.uniform(-1.5, 1.5, (n_gt, 2))

    def rect_mask(cy, cx, h, w):
        msk = np.zeros((H, W), np.uint8)
        y1, x1 = int(max(cy - h / 2, 0)), int(max(cx - w / 2, 0))
        y2, x2 = int(min(cy + h / 2, H)), int(min(cx + w / 2, W))
        msk[y1:y2, x1:x2] = 1
        return msk

    for t in range(T):
        g_ids, g_dets, t_ids, t_dets = [], [], [], []
        for i in range(n_gt):
            if rng.uniform() < 0.15:
                continue
            cy, cx = centers[i] + vel[i] * t
            g_ids.append(i)
            g_dets.append(rect_mask(cy, cx, 14, 10))
        for k in range(n_tr):
            if k < n_gt and rng.uniform() < 0.8:
                cy, cx = centers[k] + vel[k] * t + rng.normal(0, 2, 2)
                t_ids.append(k)
                t_dets.append(rect_mask(cy, cx, 14, 10))
            elif k >= n_gt and rng.uniform() < 0.3:
                t_ids.append(k)
                t_dets.append(rect_mask(rng.uniform(10, 50),
                                        rng.uniform(10, 70), 12, 9))
        data["gt_ids"].append(np.asarray(g_ids, int))
        data["tracker_ids"].append(np.asarray(t_ids, int))
        data["gt_dets"].append(g_dets)
        data["tracker_dets"].append(t_dets)
    return data


@pytest.mark.parametrize("seed", range(3))
def test_jandf_matches_reference(seed):
    import os

    REF_TE = "/root/reference/tracker"
    if not os.path.isdir(REF_TE):
        pytest.skip("no reference")
    _install_mask_shims()
    for name, val in (("float", np.float64), ("int", np.int_),
                      ("bool", np.bool_)):
        if not hasattr(np, name):
            setattr(np, name, val)
    if REF_TE not in sys.path:
        sys.path.insert(0, REF_TE)
    from trackeval.metrics.j_and_f import JAndF

    from yolov7_tracker_tpu.eval.metrics import jandf

    data = _synth_mask_data(seed)
    got = jandf(data)

    # the reference mutates + expects RLE-dict dets; rebuild via shim
    from pycocotools import mask as mask_utils

    ref_data = _synth_mask_data(seed)
    ref_data["gt_dets"] = [
        [mask_utils.encode(m) for m in dets] for dets in ref_data["gt_dets"]
    ]
    ref_data["tracker_dets"] = [
        [mask_utils.encode(m) for m in dets]
        for dets in ref_data["tracker_dets"]
    ]
    want = JAndF().eval_sequence(ref_data)
    for k in ("J-Mean", "J-Recall", "J-Decay", "F-Mean", "F-Recall",
              "F-Decay", "J&F"):
        np.testing.assert_allclose(got[k], want[k], atol=1e-10, err_msg=k)
    assert got["num_gt_tracks"] == want["num_gt_tracks"]
