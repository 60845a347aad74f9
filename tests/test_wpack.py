"""Width-packed execution (models/wpack.py): exactness of every packed
conv geometry against the direct conv, the concat-permutation fold, the
region planner, and (slow) full-model parity on the real yolov7-w6
graph — the packed region must be output-identical to the regular
fused path (it reorders f32 accumulation only).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov7_tracker_tpu.models import wpack


def conv(x, k, s, pad):
    return jax.lax.conv_general_dilated(
        x, k, s, pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


@pytest.mark.parametrize(
    "k,s,pad,q",
    [(3, 1, 1, 2), (3, 2, 1, 2), (3, 2, 1, 1), (1, 1, 0, 2),
     (6, 2, 2, 2)],
)
def test_packed_conv_exact(k, s, pad, q):
    rng = np.random.default_rng(k * 10 + s + q)
    w_in = 16
    x = rand(rng, 2, 8, w_in, 5)
    kern = rand(rng, k, k, 5, 7)
    base = conv(x, kern, (s, s), ((pad, pad), (pad, pad)))
    kp, sp, pads = wpack.pack_kernel(kern, s=s, pad=pad, q=q)
    y = conv(wpack.pack_w(x), kp, (s, sp), ((pad, pad), pads))
    got = wpack.unpack_w(y) if q == 2 else y
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [1, 3])
def test_concat_perm_folds_into_consumer(k):
    rng = np.random.default_rng(3 + k)
    parts = [rand(rng, 2, 8, 12, c) for c in (3, 5, 4)]
    kern = rand(rng, k, k, 12, 6)
    pad = k // 2
    base = conv(jnp.concatenate(parts, -1), kern, (1, 1),
                ((pad, pad), (pad, pad)))
    raw = jnp.concatenate([wpack.pack_w(p) for p in parts], -1)
    perm = wpack.concat_perm([3, 5, 4])
    kp, sp, pads = wpack.pack_kernel(kern, s=1, pad=pad, q=2,
                                     in_perm=perm)
    got = wpack.unpack_w(conv(raw, kp, (1, sp), ((pad, pad), pads)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_stem_unpacked_kernel_exact():
    # unpacked-canvas stem kernel vs the plain folded 6x6/s2 conv
    rng = np.random.default_rng(11)
    x = rand(rng, 2, 12, 16, 3)
    k6 = rand(rng, 6, 6, 3, 7)
    base = conv(x, k6, (2, 2), ((2, 2), (2, 2)))
    kp, strides, pads = wpack.stem_kernel_unpacked(k6)
    got = wpack.unpack_w(conv(x, kp, strides, pads))
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_stem_raw_fold_matches_normalized_path():
    # raw-scale BGR canvas with the kernel-side flip + 1/255 fold
    # (blocks._WPackConv raw_in) == the normalized-canvas path
    rng = np.random.default_rng(12)
    raw = jnp.asarray(
        rng.uniform(0, 255, (2, 12, 16, 3)).astype(np.float32))
    k6 = rand(rng, 6, 6, 3, 7)
    base = conv(raw[..., ::-1] / 255.0, k6, (2, 2), ((2, 2), (2, 2)))
    kp, strides, pads = wpack.stem_kernel_unpacked(
        k6[:, :, ::-1, :] * (1.0 / 255.0))
    got = wpack.unpack_w(conv(raw, kp, strides, pads))
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_stem_band_absorption_exact():
    """Unpadded-input stem with widened zero padding + strip-conv
    corrections == the stem on the 114-padded canvas (the conv is
    linear in its input, so the constant band's contribution is itself
    a conv of the band-only canvas)."""
    rng = np.random.default_rng(13)
    img = jnp.asarray(
        rng.uniform(0, 255, (2, 12, 16, 3)).astype(np.float32))
    k6 = rand(rng, 6, 6, 3, 7)
    for top, bot in [(3, 5), (14, 14), (1, 0), (0, 2)]:
        canvas = jnp.pad(img, ((0, 0), (top, bot), (0, 0), (0, 0)),
                         constant_values=114.0)
        kp, strides, pads = wpack.stem_kernel_unpacked(k6)
        base = conv(canvas, kp, strides, pads)
        y = conv(img, kp, strides,
                 ((pads[0][0] + top, pads[0][1] + bot), pads[1]))
        ct, cb, r_top, r_bot = wpack.stem_band_corrections(
            kp, 12, 16, (top, bot), 114.0)
        if ct is not None:
            y = y.at[:, :r_top].add(ct)
        if cb is not None:
            y = y.at[:, r_bot:].add(cb)
        np.testing.assert_allclose(np.asarray(y), np.asarray(base),
                                   rtol=1e-4, atol=1e-3,
                                   err_msg=f"bands=({top},{bot})")


def _mini_w6_cfg():
    """Smallest cfg matching the w6-family packable-front pattern:
    ReOrg stem + narrow E-ELAN-ish stage + concat + stride-2 exit."""
    return {
        "nc": 4,
        "depth_multiple": 1.0,
        "width_multiple": 1.0,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [
            [-1, 1, "ReOrg", []],
            [-1, 1, "Conv", [16, 3, 1]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [16, 1, 1]],
            [-2, 1, "Conv", [16, 1, 1]],
            [-1, 1, "Conv", [16, 3, 1]],
            [[-1, -2, -4], 1, "Concat", [1]],
            [-1, 1, "Conv", [32, 1, 1]],
            [-1, 1, "Conv", [128, 3, 2]],
        ],
        "head": [[[-1], 1, "IDetect", ["nc", "anchors"]]],
    }


def test_mini_front_full_model_parity_incl_raw_stem():
    from yolov7_tracker_tpu.models import spec as spec_mod
    from yolov7_tracker_tpu.models import yolo
    from yolov7_tracker_tpu.models.fuse import fuse_variables

    s = spec_mod.parse_yaml_cfg(_mini_w6_cfg(), name="mini-w6", nc=4)
    assert wpack.plan_region(s) is not None
    assert yolo.wpack_stem_active(s)
    _, variables = yolo.build_model(s, img_size=64, init="random")
    fv = fuse_variables(variables)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 64, 64, 3)).astype(np.float32))
    pb, _ = yolo.YoloV7(s, fused=True).apply(fv, x, training=False)
    pp, _ = yolo.YoloV7(s, fused=True, wpack=True).apply(
        fv, x, training=False)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(pb),
                               rtol=1e-4, atol=1e-5)
    # raw-scale BGR input, normalization folded into the stem kernel
    x_raw = x[..., ::-1] * 255.0
    pr, _ = yolo.YoloV7(
        s, fused=True, wpack=True, wpack_raw_stem=True
    ).apply(fv, x_raw, training=False)
    np.testing.assert_allclose(np.asarray(pr), np.asarray(pb),
                               rtol=1e-4, atol=1e-4)


def test_mini_front_pipeline_detect_parity():
    """detect_batch with the raw-canvas wpack serving path (preprocess
    normalize=False + wpack_raw_stem) == the unpacked pipeline."""
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
    from yolov7_tracker_tpu.models import spec as spec_mod
    from yolov7_tracker_tpu.models import yolo
    from yolov7_tracker_tpu.pipeline import PipelineConfig, TrackingPipeline
    from yolov7_tracker_tpu.trackers.slab import TrackerConfig

    s = spec_mod.parse_yaml_cfg(_mini_w6_cfg(), name="mini-w6", nc=4)
    _, variables = yolo.build_model(s, img_size=64, init="random")
    tc = TrackerConfig(tracker="bytetrack", conf_thresh=0.5,
                       capacity=8, det_capacity=8)
    # (60, 80) letterboxes with no pad band; (52, 80) produces
    # top/bottom 114 bands with left=right=0, which routes the wpack
    # side through the band-absorbing stem (pipeline stem_bands)
    for src_hw in [(60, 80), (52, 80)]:
        frames = np.asarray(np.random.default_rng(1).integers(
            0, 255, (2,) + src_hw + (3,)), np.uint8)
        outs = []
        for wp in (False, True):
            pipe = TrackingPipeline(
                PipelineConfig(model="mini-w6", nc=4, img_size=64,
                               detector_batch=2, dtype="float32",
                               wpack=wp),
                tc, variables=variables, spec=s)
            assert pipe._wpack_raw is wp
            outs.append(pipe.detect_batch(frames))
        for a, b in zip(outs[0], outs[1]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-3,
                                       err_msg=f"src_hw={src_hw}")


def test_plan_region_w6_front():
    from yolov7_tracker_tpu.models import zoo

    r = wpack.plan_region(zoo.get_spec("yolov7-w6", nc=80))
    assert r is not None
    assert r["exit"] == 11 and r["plan"][11] == "exit"
    assert r["plan"][1] == "stem" and r["plan"][9] == "concat"
    # the concat consumer carries the permutation
    assert list(r["perm"]) == [10]
    # ELAN branch widths at the concat (cfg yolov7-w6.yaml rows 3-9)
    assert len(r["perm"][10]) == 2 * 256


@pytest.mark.parametrize("name", ["yolov7", "yolov7-tiny", "yolov7x"])
def test_plan_region_none_for_non_reorg_fronts(name):
    from yolov7_tracker_tpu.models import zoo

    assert wpack.plan_region(zoo.get_spec(name, nc=80)) is None


@pytest.mark.slow  # w6 CPU compile is minutes; parity on the real graph
def test_w6_wpack_full_model_parity():
    from yolov7_tracker_tpu.models import yolo, zoo
    from yolov7_tracker_tpu.models.fuse import fuse_variables

    spec = zoo.get_spec("yolov7-w6", nc=8)
    _, variables = yolo.build_model(spec, img_size=128, init="random")
    fv = fuse_variables(variables)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 128, 128, 3)).astype(np.float32))
    pb, rb = yolo.YoloV7(spec, fused=True).apply(fv, x, training=False)
    pp, rp = yolo.YoloV7(spec, fused=True, wpack=True).apply(
        fv, x, training=False)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(pb),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(rb, rp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # raw-canvas serving variant on the real graph: BGR raw-scale in,
    # normalization folded into the packed stem kernel
    pr, _ = yolo.YoloV7(spec, fused=True, wpack=True,
                        wpack_raw_stem=True).apply(
        fv, x[..., ::-1] * 255.0, training=False)
    np.testing.assert_allclose(np.asarray(pr), np.asarray(pb),
                               rtol=1e-4, atol=1e-4)
