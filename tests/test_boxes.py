import numpy as np
import pytest

import jax.numpy as jnp

from yolov7_tracker_tpu.ops import boxes
from tests import oracles


def rand_tlwh(n, rng):
    xy = rng.uniform(0, 800, (n, 2))
    wh = rng.uniform(5, 200, (n, 2))
    return np.concatenate([xy, wh], axis=1).astype(np.float32)


def test_tlbr_roundtrip():
    rng = np.random.default_rng(0)
    tlwh = rand_tlwh(64, rng)
    back = boxes.tlbr_to_tlwh(boxes.tlwh_to_tlbr(jnp.asarray(tlwh)))
    np.testing.assert_allclose(np.asarray(back), tlwh, rtol=1e-5, atol=1e-3)


def test_xyah_roundtrip():
    rng = np.random.default_rng(1)
    tlwh = rand_tlwh(64, rng)
    back = boxes.xyah_to_tlwh(boxes.tlwh_to_xyah(jnp.asarray(tlwh)))
    np.testing.assert_allclose(np.asarray(back), tlwh, rtol=1e-4, atol=1e-3)


def test_xyar_matches_reference_form():
    # (xc, yc, area, h/w); recovery is center-anchored (reference quirk)
    rng = np.random.default_rng(2)
    tlwh = rand_tlwh(16, rng)
    xyar = np.asarray(boxes.tlwh_to_xyar(jnp.asarray(tlwh)))
    np.testing.assert_allclose(xyar[:, 2], tlwh[:, 2] * tlwh[:, 3], rtol=1e-5)
    np.testing.assert_allclose(xyar[:, 3], tlwh[:, 3] / tlwh[:, 2], rtol=1e-5)
    cxcywh = np.asarray(boxes.xyar_to_cxcywh(jnp.asarray(xyar)))
    np.testing.assert_allclose(cxcywh[:, 2:], tlwh[:, 2:], rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(
        cxcywh[:, :2], tlwh[:, :2] + tlwh[:, 2:] / 2, rtol=1e-5
    )


def test_xywh_floor_quirk():
    tlwh = np.array([[10.0, 20.0, 5.0, 7.0]], np.float32)
    xywh = np.asarray(boxes.tlwh_to_xywh(jnp.asarray(tlwh)))
    # reference: result[:2] += result[2:] // 2 -> floor(5/2)=2, floor(7/2)=3
    np.testing.assert_allclose(xywh[0], [12.0, 23.0, 5.0, 7.0])
    back = np.asarray(boxes.xywh_to_tlwh(jnp.asarray(xywh)))
    np.testing.assert_allclose(back[0], tlwh[0])


def test_iou_matrix_vs_oracle():
    rng = np.random.default_rng(3)
    a = np.asarray(boxes.tlwh_to_tlbr(jnp.asarray(rand_tlwh(40, rng))))
    b = np.asarray(boxes.tlwh_to_tlbr(jnp.asarray(rand_tlwh(30, rng))))
    got = np.asarray(boxes.iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    want = oracles.iou_matrix_np(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_buffered_tlwh():
    tlwh = np.array([[100.0, 100.0, 10.0, 20.0]], np.float32)
    out = np.asarray(boxes.buffered_tlwh(jnp.asarray(tlwh), 0.3))
    np.testing.assert_allclose(out[0], [97.0, 94.0, 16.0, 32.0], rtol=1e-6)


@pytest.mark.parametrize("kind", ["iou", "giou", "diou", "ciou"])
def test_bbox_iou_family_sane(kind):
    rng = np.random.default_rng(4)
    b1 = rand_tlwh(32, rng)
    b1[:, :2] += b1[:, 2:] / 2  # to xywh-center
    b2 = b1 + rng.normal(0, 3, b1.shape).astype(np.float32)
    kw = {} if kind == "iou" else {kind: True}
    val = np.asarray(boxes.bbox_iou(jnp.asarray(b1), jnp.asarray(b2), **kw))
    assert val.shape == (32,)
    assert np.all(val <= 1.0 + 1e-6)
    same = np.asarray(boxes.bbox_iou(jnp.asarray(b1), jnp.asarray(b1), **kw))
    np.testing.assert_allclose(same, 1.0, atol=1e-5)
