"""W8A8 post-training quantization (models/quant.py).

No reference counterpart (the reference serves fp16) — this guards the
TPU-native int8 serving mode: tree-structure exactness vs
``YoloV7(spec, fused="int8")`` init, close forward agreement with the
fused f32 model, head exclusion, and the int8 arithmetic itself
(per-channel weight scales round-trip).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


def _build_quantized(model_name, img=160, nc=8, seed=0):
    from yolov7_tracker_tpu.models import quant, yolo, zoo
    from yolov7_tracker_tpu.models.fuse import fuse_variables

    spec = zoo.get_spec(model_name, nc=nc)
    _, variables = yolo.build_model(spec, img_size=img, init="random")
    fused = fuse_variables(variables)
    batches = quant.default_calib_batches(
        np.random.default_rng(seed), n=2, batch=1, size=img
    )
    qvars = quant.quantize_variables(spec, fused, calib_batches=batches)
    return spec, fused, qvars, batches


def test_quantized_tree_matches_int8_model_init():
    from yolov7_tracker_tpu.models import yolo

    spec, _, qvars, _ = _build_quantized("yolov7-tiny")
    qmodel = yolo.YoloV7(spec, fused="int8")
    shapes = jax.eval_shape(
        lambda r, d: qmodel.init(r, d, training=False),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 160, 160, 3), jnp.float32),
    )
    want = {
        jax.tree_util.keystr(k): (v.shape, str(v.dtype))
        for k, v in jax.tree_util.tree_leaves_with_path(shapes["params"])
    }
    got = {
        jax.tree_util.keystr(k): (v.shape, str(v.dtype))
        for k, v in jax.tree_util.tree_leaves_with_path(qvars["params"])
    }
    assert want == got


@pytest.mark.parametrize("model_name", ["yolov7-tiny", "yolov7-w6"])
def test_quantized_forward_tracks_f32(model_name):
    """Decoded predictions of the int8 model stay close to the fused
    f32 model on calibration-distribution inputs (w6 exercises the
    folded-ReOrg quantized stem and the IAuxDetect head)."""
    from yolov7_tracker_tpu.models import yolo

    # w6 is a stride-64 model: the input must divide by 64
    img = 128 if model_name == "yolov7-w6" else 160
    spec, fused, qvars, batches = _build_quantized(model_name, img=img)
    fmodel = yolo.YoloV7(spec, fused=True)
    qmodel = yolo.YoloV7(spec, fused="int8")
    x = batches[0]
    y_ref, _ = fmodel.apply(fused, x, training=False)
    y_q, _ = qmodel.apply(qvars, x, training=False)
    y_ref = np.asarray(y_ref, np.float64)
    y_q = np.asarray(y_q, np.float64)
    corr = np.corrcoef(y_ref.ravel(), y_q.ravel())[0, 1]
    assert corr > 0.999
    # confidence channel drives NMS/tracking: bounded absolute error
    np.testing.assert_allclose(
        y_q[..., 4], y_ref[..., 4], atol=5e-2
    )


def test_heads_stay_unquantized_and_weights_roundtrip():
    spec, fused, qvars, _ = _build_quantized("yolov7-tiny")
    params = qvars["params"]
    # head convs untouched (float kernels, no scales)
    heads = [k for k in params if k.startswith("head_m")]
    assert heads
    for k in heads:
        assert params[k]["kernel"].dtype == jnp.float32
        assert set(params[k]) == {"kernel", "bias"}
    # a backbone conv is int8 with per-channel scales that round-trip
    qc = params["layer0"]["conv"]
    assert qc["kernel"].dtype == jnp.int8
    assert qc["w_scale"].shape == (qc["kernel"].shape[-1],)
    deq = np.asarray(qc["kernel"], np.float32) * np.asarray(qc["w_scale"])
    orig = np.asarray(fused["params"]["layer0"]["conv"]["kernel"])
    # symmetric per-channel absmax quant: max error = scale/2 per weight
    err = np.abs(deq - orig)
    assert (err <= np.asarray(qc["w_scale"]) / 2 + 1e-7).all()
    # every quantized conv got a calibrated (non-default) a_scale
    assert float(qc["a_scale"]) != 1.0


def test_pipeline_int8_mode_runs():
    """TrackingPipeline(quant='int8') end-to-end on CPU: detector +
    NMS + tracker step produce finite outputs."""
    from yolov7_tracker_tpu.pipeline import (
        PipelineConfig,
        TrackingPipeline,
    )
    from yolov7_tracker_tpu.trackers.slab import TrackerConfig

    pcfg = PipelineConfig(
        model="yolov7-tiny", nc=80, img_size=160, detector_batch=2,
        quant="int8",
    )
    tcfg = TrackerConfig(
        tracker="bytetrack", conf_thresh=0.5, capacity=32,
        det_capacity=32,
    )
    pipe = TrackingPipeline(pcfg, tcfg)
    rng = np.random.default_rng(0)
    frames = rng.integers(
        0, 255, (2, 192, 256, 3), dtype=np.uint8
    )
    outs = list(pipe.run_sequence(frames))
    assert len(outs) == 2
