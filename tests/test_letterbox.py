"""Letterbox parity: device_preprocess vs host cv2 letterbox, including
the stride-64 (P6: yolov7-w6/e6/d6/e6e) canvas where total pad exceeds 32
— a regression test for the old stride=32 re-modulo that shifted the
image placement (and thus every detection box) for P6 models."""

import numpy as np
import pytest

import jax.numpy as jnp

from yolov7_tracker_tpu.data.letterbox import (
    device_preprocess, letterbox_host, letterbox_params,
)


def _gradient(h, w, seed=0):
    rng = np.random.default_rng(seed)
    y = np.linspace(0, 200, h, dtype=np.float32)[:, None, None]
    x = np.linspace(0, 55, w, dtype=np.float32)[None, :, None]
    c = rng.uniform(0, 40, (1, 1, 3)).astype(np.float32)
    return np.clip(y + x + c, 0, 255).astype(np.uint8)


@pytest.mark.parametrize(
    "src_hw,img_size,stride",
    [
        ((120, 160), 160, 32),   # stride-32, pad < 32
        ((540, 960), 544, 64),   # stride-64, total pad 46 > 32 (P6 bug)
        ((96, 54), 128, 64),     # h-constrained, both dims padded
    ],
)
def test_device_vs_host_placement(src_hw, img_size, stride):
    img = _gradient(*src_hw)
    lb, _, _ = letterbox_host(img, (img_size, img_size), stride=stride)

    r, (uw, uh), (dw, dh) = letterbox_params(
        src_hw, (img_size, img_size), stride=stride
    )
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    out_hw = (uh + top + bottom, uw + left + right)
    assert lb.shape[:2] == out_hw

    got, _ = device_preprocess(
        jnp.asarray(img[None]), src_hw, out_hw, unpad_hw=(uh, uw),
        bgr_to_rgb=False,
    )
    got = np.asarray(got[0], np.float32) * 255.0
    ref = lb.astype(np.float32)

    # pad region must be 114 (to float tolerance) in exactly the same places
    pad_got = np.all(np.abs(got - 114.0) < 0.01, axis=-1)
    pad_ref = np.all(ref == 114.0, axis=-1)
    # interior image pixels could coincidentally equal 114; compare the
    # pad frame only (rows/cols outside the placed rectangle)
    mask = np.ones(out_hw, bool)
    mask[top:top + uh, left:left + uw] = False
    assert pad_got[mask].all(), "device pad region not 114 — misplacement"
    assert pad_ref[mask].all()

    # placed image: same rectangle, values within bilinear-impl tolerance
    a = got[top:top + uh, left:left + uw]
    b = ref[top:top + uh, left:left + uw]
    assert np.abs(a - b).mean() < 1.0
    assert np.abs(a - b).max() < 8.0


def test_p6_placement_regression():
    """The exact failure mode: stride-64 canvas with 60px total pad. The
    old code re-applied %32 -> top=14 instead of 30 (16px shift)."""
    src_hw, img_size, stride = (540, 960), 576, 64
    r, (uw, uh), (dw, dh) = letterbox_params(
        src_hw, (img_size, img_size), stride=stride
    )
    assert (uh + 2 * int(round(dh - 0.1))) % 64 == 0
    out_hw = (uh + 2 * int(round(dh - 0.1)), uw)
    img = np.full((*src_hw, 3), 255, np.uint8)
    got, _ = device_preprocess(
        jnp.asarray(img[None]), src_hw, out_hw, unpad_hw=(uh, uw),
        bgr_to_rgb=False,
    )
    col = np.asarray(got[0, :, out_hw[1] // 2, 0])
    white_rows = np.where(col > 0.9)[0]
    top = int(round(dh - 0.1))
    assert white_rows[0] == top, (white_rows[0], top)
    assert white_rows[-1] == top + uh - 1


def test_default_unpad_matches_auto_false():
    """Without unpad_hw, placement derives from the canvas symmetrically."""
    src_hw, out_hw = (120, 160), (128, 160)
    img = _gradient(*src_hw, seed=3)
    a, _ = device_preprocess(
        jnp.asarray(img[None]), src_hw, out_hw, bgr_to_rgb=False
    )
    b, _ = device_preprocess(
        jnp.asarray(img[None]), src_hw, out_hw, unpad_hw=(120, 160),
        bgr_to_rgb=False,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_resize_linear_matches_jax_image():
    """_resize_linear is pinned to jax.image.resize's linear lowering
    (the dense banded matmul measured fastest on TPU — see the
    docstring and tools/tpu_resize_probe.py); any reformulation must
    keep these values."""
    import jax

    from yolov7_tracker_tpu.data.letterbox import _resize_linear

    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (2, 1080, 1920, 3)),
        jnp.float32)
    ref = jax.image.resize(x, (2, 608, 1088, 3), method="linear",
                           antialias=False)
    np.testing.assert_allclose(np.asarray(_resize_linear(x, 608, 1088)),
                               np.asarray(ref), atol=0.05)
