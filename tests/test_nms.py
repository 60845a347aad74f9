import numpy as np
import pytest

import jax.numpy as jnp

from yolov7_tracker_tpu.ops import nms as nms_mod
from tests import oracles


def synth_pred(n, nc, rng, img=640):
    xy = rng.uniform(50, img - 50, (n, 2))
    wh = rng.uniform(10, 120, (n, 2))
    obj = rng.uniform(0, 1, (n, 1))
    cls = rng.dirichlet(np.ones(nc), n)
    return np.concatenate([xy, wh, obj, cls], axis=1).astype(np.float32)


def run_device(pred, conf, iou, **kw):
    dets, count = nms_mod.nms(jnp.asarray(pred), conf, iou, **kw)
    return np.asarray(dets)[: int(count)]


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("nc", [1, 4])
def test_nms_matches_oracle(seed, nc):
    rng = np.random.default_rng(seed)
    pred = synth_pred(400, nc, rng)
    got = run_device(pred, 0.25, 0.45)
    want = oracles.nms_np(pred, 0.25, 0.45)
    assert got.shape[0] == want.shape[0]
    np.testing.assert_allclose(got[:, :4], want[:, :4], rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(got[:, 4], want[:, 4], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(got[:, 5], want[:, 5])


@pytest.mark.parametrize("seed", range(3))
def test_nms_multilabel(seed):
    rng = np.random.default_rng(50 + seed)
    pred = synth_pred(200, 5, rng)
    got = run_device(pred, 0.1, 0.5, multi_label=True)
    want = oracles.nms_np(pred, 0.1, 0.5, multi_label=True)
    assert got.shape[0] == want.shape[0]
    # same candidate set; order is score-desc in both
    np.testing.assert_allclose(got[:, 4], want[:, 4], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(got[:, 5], want[:, 5])


def test_nms_low_conf_dense():
    # tracking-path config: conf 0.01, many candidates
    rng = np.random.default_rng(99)
    pred = synth_pred(2000, 1, rng)
    got = run_device(pred, 0.01, 0.7)
    want = oracles.nms_np(pred, 0.01, 0.7)
    assert got.shape[0] == min(300, want.shape[0])
    np.testing.assert_allclose(
        got[:, 4], want[: got.shape[0], 4], rtol=1e-4, atol=1e-5
    )


def test_nms_agnostic_differs():
    rng = np.random.default_rng(7)
    pred = synth_pred(300, 4, rng)
    per_class = run_device(pred, 0.25, 0.45)
    agnostic = run_device(pred, 0.25, 0.45, agnostic=True)
    want = oracles.nms_np(pred, 0.25, 0.45, agnostic=True)
    assert agnostic.shape[0] == want.shape[0]
    assert agnostic.shape[0] <= per_class.shape[0]


def test_nms_empty():
    pred = np.zeros((100, 6), np.float32)
    dets, count = nms_mod.nms(jnp.asarray(pred), 0.25, 0.45)
    assert int(count) == 0


def test_nms_batched():
    rng = np.random.default_rng(3)
    pred = np.stack([synth_pred(128, 2, rng) for _ in range(3)])
    dets, counts = nms_mod.nms(jnp.asarray(pred), 0.25, 0.45)
    assert dets.shape == (3, 300, 6)
    for b in range(3):
        want = oracles.nms_np(pred[b], 0.25, 0.45)
        assert int(counts[b]) == want.shape[0]


@pytest.mark.slow  # multi-minute compile; raw-vs-decoded parity (fast lane keeps the decoded-path NMS goldens)
def test_nms_from_raw_matches_decoded():
    """The fused score-first NMS (raw head inputs, top-k before decode)
    produces identical detections to decode-everything + nms on a real
    model (f32 compute, so ordering is exact)."""
    from yolov7_tracker_tpu.models import yolo, zoo
    from yolov7_tracker_tpu.ops import nms as nms_mod

    spec = zoo.get_spec("yolov7-tiny", nc=8)
    model, variables = yolo.build_model(spec, img_size=160, init="random")
    rng = np.random.default_rng(0)
    params = dict(variables["params"])
    for k, v in params.items():
        if k.startswith("head_m"):
            v = dict(v)
            v["kernel"] = v["kernel"] * 6.0
            b = v["bias"].reshape(spec.na, spec.no)
            b = b.at[:, 4].add(5.0).at[:, 5:].add(5.0)
            v["bias"] = b.reshape(-1)
            params[k] = v
    variables = {"params": params,
                 "batch_stats": variables["batch_stats"]}
    x = jnp.asarray(rng.uniform(0, 1, (2, 160, 160, 3)).astype(np.float32))
    pred, raw = model.apply(variables, x, training=False)
    d1, c1 = nms_mod.nms(pred.astype(jnp.float32), 0.01, 0.45,
                         max_det=50, top_k=512)
    d2, c2 = nms_mod.nms_from_raw(
        raw, jnp.asarray(spec.anchors_per_level()), tuple(spec.strides),
        0.01, 0.45, max_det=50, top_k=512)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("lane", ["sparse", "overflow"])
def test_nms_from_raw_candidate_densities(lane):
    """The raw-path top-K-by-score selection must reproduce
    decode-everything + nms both when the candidate set fits the K
    slab (sparse) and when it overflows K and the score-sorted
    truncation becomes load-bearing (overflow — the reference's
    max_nms edge, general.py:659-663). The conf threshold is picked
    from the score distribution so each regime is deterministic."""
    from yolov7_tracker_tpu.models import yolo, zoo
    from yolov7_tracker_tpu.ops import nms as nms_mod

    spec = zoo.get_spec("yolov7-tiny", nc=4)
    model, variables = yolo.build_model(spec, img_size=128, init="random")
    params = dict(variables["params"])
    for k, v in params.items():
        if k.startswith("head_m"):
            v = dict(v)
            v["kernel"] = v["kernel"] * 6.0
            params[k] = v
    variables = {"params": params,
                 "batch_stats": variables["batch_stats"]}
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32))
    pred, raw = model.apply(variables, x, training=False)

    # pred is the DECODED head output: obj/cls already sigmoided
    scores = np.sort(np.asarray(
        pred[..., 4] * np.max(pred[..., 5:], axis=-1)
    ), axis=1)[:, ::-1]                            # (B, N) descending
    if lane == "sparse":
        k_slab = 512
        conf = float(scores[:, 20].min())          # >=20 true candidates
        n_cand = (scores > conf).sum(axis=1)
        assert 0 < n_cand.max() <= k_slab, "expected the sparse regime"
    else:
        k_slab = 64
        conf = float(scores[:, 200].min())         # >=200 cands per image
        n_cand = (scores > conf).sum(axis=1)
        assert n_cand.max() > k_slab, "expected the overflow regime"

    d1, c1 = nms_mod.nms(pred.astype(jnp.float32), conf, 0.45,
                         max_det=32, top_k=k_slab)
    d2, c2 = nms_mod.nms_from_raw(
        raw, jnp.asarray(spec.anchors_per_level()), tuple(spec.strides),
        conf, 0.45, max_det=32, top_k=k_slab)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-5, atol=1e-4)
