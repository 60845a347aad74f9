"""RankSort / aLRP / AP loss parity (values AND hand-written gradients)
vs the reference torch.autograd.Function implementations."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
    not os.path.isdir(REF), reason="no reference repo"
),
]


def _ref_losses():
    torch = pytest.importorskip("torch")
    from tests.test_model_parity import _stub_missing_modules

    _stub_missing_modules()
    # the reference hardcodes .cuda(); run its math on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from utils.loss import APLoss, RankSort, aLRPLoss

    return torch, RankSort, aLRPLoss, APLoss


def _case(seed, n=64, n_fg=12, binary_targets=False):
    rng = np.random.default_rng(seed)
    logits = rng.normal(0, 2, n).astype(np.float32)
    targets = np.zeros(n, np.float32)
    idx = rng.choice(n, n_fg, replace=False)
    targets[idx] = 1.0 if binary_targets else rng.uniform(0.2, 1.0, n_fg)
    return logits, targets


@pytest.mark.parametrize("seed", range(3))
def test_ranksort_parity(seed):
    torch, RankSort, _, _ = _ref_losses()
    from yolov7_tracker_tpu.train.rank_losses import rank_sort_loss

    logits, targets = _case(seed)
    lt = torch.tensor(logits, requires_grad=True)
    re_t, se_t = RankSort.apply(lt, torch.tensor(targets), 0.5)
    re_t.backward()
    g_t = lt.grad.numpy()

    valid = jnp.ones(len(logits), bool)
    f = lambda l: rank_sort_loss(l, jnp.asarray(targets), valid, 0.5)
    (re, se) = f(jnp.asarray(logits))
    g = jax.grad(lambda l: f(l)[0])(jnp.asarray(logits))
    np.testing.assert_allclose(float(re), float(re_t), atol=1e-5)
    np.testing.assert_allclose(float(se), float(se_t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g), g_t, atol=1e-5)


@pytest.mark.parametrize("seed", range(3))
def test_alrp_parity(seed):
    torch, _, aLRPLoss, _ = _ref_losses()
    from yolov7_tracker_tpu.train.rank_losses import alrp_loss

    logits, targets = _case(seed, binary_targets=True)
    rng = np.random.default_rng(seed + 50)
    reg_full = rng.uniform(0, 1, len(logits)).astype(np.float32)

    lt = torch.tensor(logits, requires_grad=True)
    tt = torch.tensor(targets)
    reg_fg = torch.tensor(reg_full[targets == 1.0])
    cls_t, rank_t, order_t = aLRPLoss.apply(lt, tt, reg_fg, 1.0)
    cls_t.backward()
    g_t = lt.grad.numpy()

    valid = jnp.ones(len(logits), bool)
    f = lambda l: alrp_loss(
        l, jnp.asarray(targets), jnp.asarray(reg_full), valid, 1.0
    )
    cls, rank = f(jnp.asarray(logits))
    g = jax.grad(lambda l: f(l)[0])(jnp.asarray(logits))
    np.testing.assert_allclose(float(cls), float(cls_t), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(rank)[targets == 1.0], rank_t.detach().numpy(),
        atol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(g), g_t, atol=1e-5)


@pytest.mark.parametrize("seed", range(3))
def test_ap_parity(seed):
    torch, _, _, APLoss = _ref_losses()
    from yolov7_tracker_tpu.train.rank_losses import ap_loss

    logits, targets = _case(seed, binary_targets=True)
    lt = torch.tensor(logits, requires_grad=True)
    cls_t = APLoss.apply(lt, torch.tensor(targets), 1.0)
    cls_t.backward()
    g_t = lt.grad.numpy()

    valid = jnp.ones(len(logits), bool)
    f = lambda l: ap_loss(l, jnp.asarray(targets), valid, 1.0)
    cls = f(jnp.asarray(logits))
    g = jax.grad(f)(jnp.asarray(logits))
    np.testing.assert_allclose(float(cls), float(cls_t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g), g_t, atol=1e-5)


def test_bce_blur_parity():
    torch, *_ = _ref_losses()
    from utils.loss import BCEBlurWithLogitsLoss

    from yolov7_tracker_tpu.train.loss import bce_blur

    rng = np.random.default_rng(0)
    x = rng.normal(0, 2, 200).astype(np.float32)
    t = (rng.uniform(size=200) < 0.3).astype(np.float32)
    want = BCEBlurWithLogitsLoss()(torch.tensor(x), torch.tensor(t))
    got = bce_blur(jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(float(got), float(want), atol=1e-6)
