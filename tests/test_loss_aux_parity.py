"""Aux SimOTA loss parity vs the reference torch ComputeLossAuxOTA
(w6-style dual-head model, small resolution)."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
    not os.path.isdir(REF), reason="no reference repo"
),
]

HYP = {
    "box": 0.05, "cls": 0.3, "obj": 0.7, "cls_pw": 1.0, "obj_pw": 1.0,
    "anchor_t": 4.0, "fl_gamma": 0.0, "label_smoothing": 0.0,
}


def test_aux_loss_matches_reference():
    torch = pytest.importorskip("torch")
    from tests.test_model_parity import _stub_missing_modules
    from tests.test_loss_parity import make_targets

    _stub_missing_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.yolo import Model
    from utils.loss import ComputeLossAuxOTA

    from yolov7_tracker_tpu.models import zoo
    from yolov7_tracker_tpu.train.loss import Hyp, compute_loss_aux_ota

    img_size = 128
    torch.manual_seed(0)
    ref_model = Model(os.path.join(REF, "cfg/training/yolov7-w6.yaml"),
                      ch=3, nc=8)
    ref_model.hyp = HYP
    ref_model.gr = 1.0
    loss_ref = ComputeLossAuxOTA(ref_model)

    spec = zoo.get_spec("yolov7-w6", nc=8)
    rng = np.random.default_rng(0)
    bsz = 2
    preds = []
    for s in list(spec.strides) * 2:  # lead + aux, same spatial dims
        ny = nx = img_size // s
        preds.append(
            rng.normal(0, 1, (bsz, ny, nx, 3, 13)).astype(np.float32)
        )
    targets, tmask, flat = make_targets(rng, bsz, 5)

    loss, parts = compute_loss_aux_ota(
        [jnp.asarray(p) for p in preds], jnp.asarray(targets),
        jnp.asarray(tmask), spec, img_size, Hyp()
    )

    p_t = [torch.from_numpy(np.transpose(p, (0, 3, 1, 2, 4))) for p in preds]
    imgs = torch.zeros(bsz, 3, img_size, img_size)
    ref_total, ref_parts = loss_ref(p_t, torch.from_numpy(flat), imgs)

    np.testing.assert_allclose(
        float(loss), float(ref_total), rtol=3e-3, atol=3e-3
    )
    got = np.array([float(parts["box"]), float(parts["obj"]),
                    float(parts["cls"])])
    np.testing.assert_allclose(got, ref_parts[:3].numpy(),
                               rtol=5e-3, atol=3e-3)
