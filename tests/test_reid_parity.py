"""ReID model parity: Flax OSNet / DeepSORT CNN vs the reference torch
modules (random weights, converted)."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/tracker"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
    not os.path.isdir(REF), reason="no reference repo"
),
]


def _setup():
    torch = pytest.importorskip("torch")
    from tests.test_model_parity import _stub_missing_modules

    _stub_missing_modules()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    return torch


def _randomize_bn(torch, model, seed=1):
    gen = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
            m.running_mean.copy_(
                0.05 * torch.randn(m.num_features, generator=gen)
            )
            m.running_var.copy_(
                1.0 + 0.1 * torch.rand(m.num_features, generator=gen)
            )


@pytest.mark.parametrize("name", ["osnet_x0_25", "osnet_x1_0"])
def test_osnet_parity(name):
    torch = _setup()
    from reid_models import OSNet as ref_osnet

    from yolov7_tracker_tpu.reid import osnet as mine
    import jax.numpy as jnp

    torch.manual_seed(0)
    ref = getattr(ref_osnet, name)(num_classes=10, pretrained=False)
    ref.eval()
    _randomize_bn(torch, ref)

    model = mine.build_osnet(name)
    variables = mine.convert_osnet(ref.state_dict())

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 128, 256, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_deepsort_cnn_parity():
    torch = _setup()
    from reid_models.deepsort_reid import Net

    from yolov7_tracker_tpu.reid import deepsort_cnn as mine
    import jax.numpy as jnp

    torch.manual_seed(0)
    ref = Net(reid=True)
    ref.eval()
    _randomize_bn(torch, ref)

    model = mine.DeepSortCNN()
    variables = mine.convert_deepsort_cnn(ref.state_dict())

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (3, 128, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_osnet_x0_25_real_checkpoint():
    """The reference ships weights/osnet_x0_25.pth — load it for real."""
    torch = _setup()
    path = "/root/reference/weights/osnet_x0_25.pth"
    if not os.path.isfile(path):
        pytest.skip("checkpoint not present")
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    from yolov7_tracker_tpu.reid import osnet as mine
    import jax.numpy as jnp

    model = mine.build_osnet("osnet_x0_25")
    variables = mine.convert_osnet(sd)
    x = jnp.zeros((1, 128, 256, 3))
    out = np.asarray(model.apply(variables, x))
    assert out.shape == (1, 512)
    assert np.isfinite(out).all()


def test_dhn_training_learns():
    """A short DHN training run on synthetic Hungarian problems drives
    the loss down and yields assignment-shaped outputs."""
    import numpy as np

    import jax.numpy as jnp

    from yolov7_tracker_tpu.reid.dhn import DHN
    from yolov7_tracker_tpu.train.dhn_train import (
        make_problem, train_dhn, weighted_focal_bce,
    )

    variables = train_dhn(steps=60, h=8, w=8, log_every=0, seed=0)
    model = DHN()
    rng = np.random.default_rng(99)
    losses = []
    accs = []
    for _ in range(10):
        d, y = make_problem(rng, 8, 8)
        pred = np.asarray(model.apply(variables, jnp.asarray(d)))
        losses.append(float(weighted_focal_bce(jnp.asarray(pred),
                                               jnp.asarray(y))))
        # prediction should score true matches above non-matches
        accs.append(pred[y > 0.5].mean() - pred[y < 0.5].mean())
    assert np.mean(accs) > 0.05, np.mean(accs)
