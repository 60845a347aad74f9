"""End-to-end detection parity: letterbox + model + NMS + scale_coords
against the reference torch pipeline on the same image with the same
(converted) weights. Exercises the exact tracking-input path
(post_process_v7, tracker/track.py:234-244)."""

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


def test_detection_chain_parity():
    torch = pytest.importorskip("torch")
    cv2 = pytest.importorskip("cv2")
    from tests.test_model_parity import _stub_missing_modules, build_reference

    _stub_missing_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)

    import jax.numpy as jnp

    from yolov7_tracker_tpu.data.letterbox import (
        letterbox_host, scale_coords_device,
    )
    from yolov7_tracker_tpu.models import convert, yolo, zoo
    from yolov7_tracker_tpu.ops import nms as nms_mod

    img_path = os.path.join(REF, "inference/images/horses.jpg")
    ori = cv2.imread(img_path)
    assert ori is not None
    ori = cv2.resize(ori, (320, 256))

    ref_model = build_reference("yolov7-tiny.yaml")
    # random-init scores cluster within ~0.01, making NMS order chaotic;
    # sharpen the head logits so both pipelines see well-separated scores
    with torch.no_grad():
        for m in ref_model.model[-1].m:
            m.weight.mul_(6.0)
    spec = zoo.get_spec("yolov7-tiny", nc=80)
    variables = convert.convert_state_dict(ref_model.state_dict(), spec)
    model = yolo.YoloV7(spec)

    # --- reference chain (torch): letterbox -> fwd -> NMS -> scale
    lb, _, _ = letterbox_host(ori, (192, 192), stride=32)
    x = lb[:, :, ::-1].transpose(2, 0, 1).astype(np.float32) / 255.0
    with torch.no_grad():
        pred = ref_model(torch.from_numpy(x[None].copy()))[0]
    from utils.general import non_max_suppression

    conf = 1e-5  # random weights score low; force candidates through
    ref_out = non_max_suppression(pred, conf_thres=conf, iou_thres=0.45)[0]
    ref_out = ref_out.numpy()
    # scale back (same math as post_process_v7)
    gain = min(lb.shape[0] / ori.shape[0], lb.shape[1] / ori.shape[1])
    pad = ((lb.shape[1] - ori.shape[1] * gain) / 2,
           (lb.shape[0] - ori.shape[0] * gain) / 2)
    ref_out[:, [0, 2]] = ((ref_out[:, [0, 2]] - pad[0]) / gain).clip(0, 320)
    ref_out[:, [1, 3]] = ((ref_out[:, [1, 3]] - pad[1]) / gain).clip(0, 256)

    # --- our chain on the same letterboxed input
    xin = jnp.asarray(
        lb[:, :, ::-1].astype(np.float32)[None] / 255.0
    )
    dec, _ = model.apply(variables, xin, training=False)
    dets, count = nms_mod.nms(dec[0], conf, 0.45)
    n = int(count)
    got = np.asarray(dets)[:n]
    got_boxes = np.asarray(
        scale_coords_device(
            jnp.asarray(got[:, :4]), lb.shape[:2], ori.shape[:2],
            do_round=False,
        )
    )

    assert n == len(ref_out), (n, len(ref_out))
    # Random weights produce EXACT score ties at many grid cells; NMS
    # tie-breaking then differs between torch's (na, ny, nx) candidate
    # order and ours (ny, nx, na), so survivors within a tie class can be
    # different (verified: every divergent row has an exactly-tied-score
    # twin at another grid cell). Each stage is golden-tested elsewhere;
    # this test checks the composed chain: >= 85% of the top-80 must have
    # an exact reference twin (same class, score within 1e-3, box within
    # 1.5px).
    k = 80
    order_ref = np.argsort(-ref_out[:, 4], kind="stable")
    r = ref_out[order_ref][: n]
    unmatched = 0
    for i in range(k):
        cand = (
            (np.abs(r[:, 4] - got[i, 4]) < 1e-3)
            & (r[:, 5] == got[i, 5])
            & (np.abs(r[:, :4] - got_boxes[i]).max(axis=1) < 1.5)
        )
        if not cand.any():
            unmatched += 1
    assert unmatched <= k * 0.15, (
        f"{unmatched}/{k} detections without a ref twin"
    )
