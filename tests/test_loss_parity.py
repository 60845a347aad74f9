"""SimOTA loss parity vs the reference torch ComputeLossOTA, plus
train-step/dryrun smoke tests."""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

REF = "/root/reference"

HYP = {
    "box": 0.05, "cls": 0.3, "obj": 0.7, "cls_pw": 1.0, "obj_pw": 1.0,
    "anchor_t": 4.0, "fl_gamma": 0.0, "label_smoothing": 0.0,
}


def make_targets(rng, bsz, n_per_img):
    """(B, T, 5) padded targets + mask, plus reference flat (N, 6) form."""
    t_cap = 16
    tgt = np.zeros((bsz, t_cap, 5), np.float32)
    mask = np.zeros((bsz, t_cap), bool)
    flat = []
    for b in range(bsz):
        n = n_per_img
        cls = rng.integers(0, 8, n)
        xy = rng.uniform(0.2, 0.8, (n, 2))
        wh = rng.uniform(0.05, 0.3, (n, 2))
        for i in range(n):
            tgt[b, i] = [cls[i], xy[i, 0], xy[i, 1], wh[i, 0], wh[i, 1]]
            mask[b, i] = True
            flat.append([b, cls[i], xy[i, 0], xy[i, 1], wh[i, 0], wh[i, 1]])
    return tgt, mask, np.asarray(flat, np.float32)


@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference repo")
def test_simota_loss_matches_reference():
    torch = pytest.importorskip("torch")
    from tests.test_model_parity import _stub_missing_modules

    _stub_missing_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.yolo import Model
    from utils.loss import ComputeLossOTA

    from yolov7_tracker_tpu.models import zoo
    from yolov7_tracker_tpu.train.loss import Hyp, compute_loss_ota

    img_size = 128
    torch.manual_seed(0)
    ref_model = Model(os.path.join(REF, "cfg/training/yolov7-tiny.yaml"),
                      ch=3, nc=8)
    ref_model.hyp = HYP
    ref_model.gr = 1.0
    loss_ref = ComputeLossOTA(ref_model)

    spec = zoo.get_spec("yolov7-tiny", nc=8)
    rng = np.random.default_rng(0)
    bsz = 2
    # random raw head outputs in OUR layout (B, ny, nx, na, no)
    preds = []
    for s in spec.strides:
        ny = nx = img_size // s
        preds.append(
            rng.normal(0, 1, (bsz, ny, nx, 3, 13)).astype(np.float32)
        )
    targets, tmask, flat = make_targets(rng, bsz, 5)

    loss, parts = compute_loss_ota(
        [jnp.asarray(p) for p in preds], jnp.asarray(targets),
        jnp.asarray(tmask), spec, img_size, Hyp()
    )

    # reference expects (B, na, ny, nx, no)
    p_t = [torch.from_numpy(np.transpose(p, (0, 3, 1, 2, 4))) for p in preds]
    imgs = torch.zeros(bsz, 3, img_size, img_size)
    ref_total, ref_parts = loss_ref(p_t, torch.from_numpy(flat), imgs)

    np.testing.assert_allclose(
        float(loss), float(ref_total), rtol=2e-3, atol=2e-3
    )
    got = np.array([float(parts["box"]), float(parts["obj"]),
                    float(parts["cls"])])
    want = ref_parts[:3].numpy()
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=2e-3)


def test_dryrun_multichip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(len(jax.devices()))

@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference repo")
def test_plain_loss_matches_reference():
    """Plain (non-OTA) loss vs torch ComputeLoss (hyp loss_ota=0 path)."""
    torch = pytest.importorskip("torch")
    from tests.test_model_parity import _stub_missing_modules

    _stub_missing_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.yolo import Model
    from utils.loss import ComputeLoss

    from yolov7_tracker_tpu.models import zoo
    from yolov7_tracker_tpu.train.loss import Hyp, compute_loss

    img_size = 128
    torch.manual_seed(0)
    ref_model = Model(os.path.join(REF, "cfg/training/yolov7-tiny.yaml"),
                      ch=3, nc=8)
    ref_model.hyp = HYP
    ref_model.gr = 1.0
    loss_ref = ComputeLoss(ref_model)

    spec = zoo.get_spec("yolov7-tiny", nc=8)
    rng = np.random.default_rng(1)
    bsz = 2
    preds = []
    for s in spec.strides:
        ny = nx = img_size // s
        preds.append(
            rng.normal(0, 1, (bsz, ny, nx, 3, 13)).astype(np.float32)
        )
    targets, tmask, flat = make_targets(rng, bsz, 5)

    loss, parts = compute_loss(
        [jnp.asarray(p) for p in preds], jnp.asarray(targets),
        jnp.asarray(tmask), spec, img_size, Hyp()
    )
    p_t = [torch.from_numpy(np.transpose(p, (0, 3, 1, 2, 4))) for p in preds]
    ref_total, ref_parts = loss_ref(p_t, torch.from_numpy(flat))

    np.testing.assert_allclose(
        float(loss), float(ref_total), rtol=2e-3, atol=2e-3
    )
    got = np.array([float(parts["box"]), float(parts["obj"]),
                    float(parts["cls"])])
    np.testing.assert_allclose(got, ref_parts[:3].numpy(),
                               rtol=5e-3, atol=2e-3)

@pytest.mark.skipif(not os.path.isdir(REF), reason="no reference repo")
def test_bin_ota_loss_matches_reference(tmp_path):
    """ComputeLossBinOTA parity on an IBin-headed tiny model (the
    reference ships no IBin cfg, so the oracle model is built from the
    tiny cfg with its head swapped to IBin)."""
    torch = pytest.importorskip("torch")
    from tests.test_model_parity import _stub_missing_modules

    _stub_missing_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.yolo import Model
    from utils.loss import ComputeLossBinOTA

    from yolov7_tracker_tpu.models.spec import load_yaml_file
    from yolov7_tracker_tpu.train.loss import Hyp, compute_loss_bin_ota

    cfg_txt = open(os.path.join(REF, "cfg/training/yolov7-tiny.yaml")).read()
    cfg_txt = cfg_txt.replace("IDetect", "IBin")
    p = tmp_path / "tiny-bin.yaml"
    p.write_text(cfg_txt)

    img_size = 128
    torch.manual_seed(0)
    ref_model = Model(str(p), ch=3, nc=8)
    ref_model.hyp = HYP
    ref_model.gr = 1.0
    loss_ref = ComputeLossBinOTA(ref_model)

    spec = load_yaml_file(str(p), nc=8)
    no = spec.no
    assert no == 8 + 3 + 2 * 22, no

    rng = np.random.default_rng(0)
    bsz = 2
    preds = []
    for s in spec.strides:
        ny = nx = img_size // s
        preds.append(
            rng.normal(0, 1, (bsz, ny, nx, 3, no)).astype(np.float32)
        )
    targets, tmask, flat = make_targets(rng, bsz, 5)

    loss, parts = compute_loss_bin_ota(
        [np.asarray(p) for p in preds], jnp.asarray(targets),
        jnp.asarray(tmask), spec, img_size, Hyp()
    )
    p_t = [torch.from_numpy(np.transpose(pp, (0, 3, 1, 2, 4)))
           for pp in preds]
    imgs = torch.zeros(bsz, 3, img_size, img_size)
    ref_total, ref_parts = loss_ref(p_t, torch.from_numpy(flat), imgs)

    np.testing.assert_allclose(
        float(loss), float(ref_total), rtol=3e-3, atol=3e-3
    )
    got = np.array([float(parts["box"]), float(parts["obj"]),
                    float(parts["cls"])])
    np.testing.assert_allclose(got, ref_parts[:3].numpy(),
                               rtol=5e-3, atol=3e-3)
