"""Output-space ensemble golden test vs the reference Ensemble
(models/experimental.py:68-81): two independently-initialized tiny
checkpoints, concatenated (nms-ensemble) / reduced (mean/max) decoded
predictions must match torch's."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF), reason="no reference repo"),
]


@pytest.fixture(scope="module")
def two_models():
    torch = pytest.importorskip("torch")
    from tests.test_model_parity import _stub_missing_modules, build_reference

    _stub_missing_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from yolov7_tracker_tpu.models import convert, yolo, zoo

    spec = zoo.get_spec("yolov7-tiny", nc=80)
    refs, ours = [], []
    for seed in (0, 7):
        torch.manual_seed(seed)
        m = build_reference("yolov7-tiny.yaml")
        # re-randomize (build_reference seeds 0 internally)
        gen = torch.Generator().manual_seed(seed + 100)
        with torch.no_grad():
            for p in m.parameters():
                p.add_(0.05 * torch.randn(p.shape, generator=gen))
        refs.append(m)
        ours.append((yolo.YoloV7(spec),
                     convert.convert_state_dict(m.state_dict(), spec)))
    return refs, ours


def _torch_outs(refs, x):
    import torch

    outs = []
    with torch.no_grad():
        for m in refs:
            outs.append(m(torch.from_numpy(x))[0].numpy())
    return outs


def _sorted_cols(a):
    return np.sort(a.reshape(-1, a.shape[-1]), axis=0)


def test_nms_ensemble_concat(two_models):
    from yolov7_tracker_tpu.models.yolo import ensemble_apply

    refs, ours = two_models
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, 128, 128)).astype(np.float32)
    y1, y2 = _torch_outs(refs, x)
    ref_cat = np.concatenate([y1, y2], axis=1)  # torch.cat(y, 1)

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    got = np.asarray(ensemble_apply(ours, x_nhwc, mode="nms"))
    assert got.shape == ref_cat.shape
    np.testing.assert_allclose(
        _sorted_cols(ref_cat), _sorted_cols(got), rtol=2e-3, atol=2e-3
    )


@pytest.mark.parametrize("mode,np_red", [("mean", np.mean), ("max", np.max)])
def test_reduce_ensembles(two_models, mode, np_red):
    from yolov7_tracker_tpu.models.yolo import ensemble_apply

    refs, ours = two_models
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 3, 128, 128)).astype(np.float32)
    y1, y2 = _torch_outs(refs, x)
    # elementwise reduce across models; candidate order is per-framework
    # consistent, so sorted-multiset comparison stays valid
    ref_red = np_red(np.stack([y1, y2]), axis=0)

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    got = np.asarray(ensemble_apply(ours, x_nhwc, mode=mode))
    assert got.shape == ref_red.shape
    np.testing.assert_allclose(
        _sorted_cols(ref_red), _sorted_cols(got), rtol=2e-3, atol=2e-3
    )
