"""ReID wiring through the serving pipeline: PipelineConfig(reid=...)
fills DetSlab.feature with on-device crop embeddings inside the fused
step — the seam the reference implements as a host crop loop + torch
Extractor batch per frame (deepsort.py:19-40, strongsort.py:47-72).
The extractor itself and the appearance trackers are golden elsewhere
(test_reid_parity, reference goldens); these tests pin the WIRING:
the fused path's features equal the standalone extractor path's, and
the tracking outputs match a manual detect->embed->track chain."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compiles a detector + reid CNN


def _make_pipe():
    from yolov7_tracker_tpu.pipeline import (PipelineConfig,
                                             TrackingPipeline)
    from yolov7_tracker_tpu.trackers.slab import TrackerConfig

    return TrackingPipeline(
        PipelineConfig(model="yolov7-tiny", nc=4, img_size=160,
                       detector_batch=2, dtype="float32",
                       conf_thres=0.01, reid="deepsort_cnn"),
        TrackerConfig(tracker="deepsort", conf_thresh=0.3,
                      capacity=16, det_capacity=16))


def test_fused_reid_matches_manual_chain():
    import jax
    import jax.numpy as jnp

    from yolov7_tracker_tpu.reid import extractor
    from yolov7_tracker_tpu.trackers import slab as S

    pipe = _make_pipe()
    assert pipe.tcfg.feature_dim == 512  # deepsort registry default
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 255, (2, 200, 280, 3), np.uint8)

    slab, outs = pipe.process_batch(pipe.init_tracker(), frames)
    assert np.isfinite(np.asarray(outs.tlwh)).all()

    # manual chain: detect -> standalone extractor embed -> track_scan
    d = pipe.tcfg.det_capacity
    boxes, score, cls, counts = pipe.detect_batch(frames)
    reid_model, reid_vars, reid_hw = pipe._reid
    embed = extractor.make_reid_fn(reid_model, reid_vars, reid_hw)
    feats = np.stack([
        np.asarray(embed(jnp.asarray(frames[i]),
                         jnp.asarray(boxes[i, :d])))
        for i in range(2)
    ])
    det_slabs = jax.vmap(pipe.dets_to_slab)(
        boxes[:, :d], score[:, :d], cls[:, :d], counts
    )._replace(
        feature=jnp.asarray(feats),
        warp=jnp.tile(S.IDENTITY_WARP, (2, 1, 1)),
    )
    slab2, outs2 = pipe.track_scan(pipe.init_tracker(), det_slabs)

    np.testing.assert_array_equal(np.asarray(outs.valid),
                                  np.asarray(outs2.valid))
    np.testing.assert_array_equal(np.asarray(outs.track_id),
                                  np.asarray(outs2.track_id))
    np.testing.assert_allclose(np.asarray(outs.tlwh),
                               np.asarray(outs2.tlwh),
                               rtol=1e-4, atol=1e-3)


def test_multistream_reid_after_fused_first_touch():
    """Regression: reid.extractor is imported lazily from INSIDE the
    traced fused step (pipeline._embed_dets). When its module-level
    normalization constants were jnp arrays, first-touch under
    process_batch's scan trace leaked them as tracers into the module
    globals, and the next distinct trace (process_multistream) died
    with UnexpectedTracerError (found by tools/tracker_fleet_bench.py).
    The constants are numpy now; this pins the exact failing sequence
    with a cold module."""
    import sys

    sys.modules.pop("yolov7_tracker_tpu.reid.extractor", None)
    pipe = _make_pipe()
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (2, 200, 280, 3), np.uint8)

    slab, outs = pipe.process_batch(pipe.init_tracker(), frames)
    assert np.isfinite(np.asarray(outs.tlwh)).all()

    slabs = pipe.init_multistream(2)
    slabs, mouts = pipe.process_multistream(slabs, frames)
    assert np.isfinite(np.asarray(mouts.tlwh)).all()


def test_reid_capacity_caps_and_zero_pads():
    """reid_capacity=K embeds only the top-K (score-ordered) dets;
    rows past K carry exact-zero features (= cosine distance 1 in the
    appearance stage), and the first K match the uncapped path."""
    import jax.numpy as jnp

    from yolov7_tracker_tpu.pipeline import (PipelineConfig,
                                             TrackingPipeline)
    from yolov7_tracker_tpu.trackers.slab import TrackerConfig

    pipe = TrackingPipeline(
        PipelineConfig(model="yolov7-tiny", nc=4, img_size=160,
                       detector_batch=2, dtype="float32",
                       conf_thres=0.01, reid="deepsort_cnn",
                       reid_capacity=4),
        TrackerConfig(tracker="deepsort", conf_thresh=0.3,
                      capacity=16, det_capacity=16))
    rng = np.random.default_rng(5)
    frame = jnp.asarray(rng.integers(0, 255, (200, 280, 3), np.uint8))
    boxes = jnp.asarray(
        rng.uniform(10, 120, (16, 4)).astype(np.float32))
    boxes = boxes.at[:, 2:].set(boxes[:, :2] + 40)
    feats = np.asarray(pipe._embed_dets(frame, boxes))
    assert feats.shape == (16, 512)
    assert (feats[4:] == 0).all()
    pipe_full = TrackingPipeline(
        PipelineConfig(model="yolov7-tiny", nc=4, img_size=160,
                       detector_batch=2, dtype="float32",
                       conf_thres=0.01, reid="deepsort_cnn"),
        TrackerConfig(tracker="deepsort", conf_thresh=0.3,
                      capacity=16, det_capacity=16),
        variables=pipe.variables,
        reid_variables=pipe._reid[1])
    full = np.asarray(pipe_full._embed_dets(frame, boxes))
    np.testing.assert_allclose(feats[:4], full[:4], rtol=1e-5,
                               atol=1e-5)


def test_reid_requires_feature_dim():
    from yolov7_tracker_tpu.pipeline import (PipelineConfig,
                                             TrackingPipeline)
    from yolov7_tracker_tpu.trackers.slab import TrackerConfig

    with pytest.raises(ValueError, match="feature_dim"):
        TrackingPipeline(
            PipelineConfig(model="yolov7-tiny", nc=4, img_size=160,
                           dtype="float32", reid="deepsort_cnn"),
            TrackerConfig(tracker="sort", capacity=16,
                          det_capacity=16))


def test_track_cli_reid_real_osnet(tmp_path):
    """The track CLI consumes --reid_model_path end-to-end with the
    reference's shipped OSNet checkpoint (previously the flag was
    parsed but dead)."""
    import os

    import cv2
    import yaml

    osnet_path = "/root/reference/weights/osnet_x0_25.pth"
    if not os.path.isfile(osnet_path):
        pytest.skip("reference osnet checkpoint not present")

    from yolov7_tracker_tpu.cli import track as track_cli

    root = tmp_path / "data" / "seqA" / "img1"
    root.mkdir(parents=True)
    rng = np.random.default_rng(2)
    for i in range(4):
        cv2.imwrite(str(root / f"{i + 1:06d}.jpg"),
                    rng.integers(0, 255, (160, 240, 3), np.uint8))
    cfg_dir = tmp_path / "cfg"
    cfg_dir.mkdir()
    with open(cfg_dir / "tiny.yaml", "w") as f:
        yaml.safe_dump({"DATASET_ROOT": str(tmp_path / "data"),
                        "SPLIT": "", "CATEGORY_NAMES": ["obj"],
                        "CATEGORY_DICT": {0: "obj"}}, f)
    track_cli.main([
        "--dataset", "tiny", "--config_dir", str(cfg_dir),
        "--data_format", "origin", "--split", "",
        "--tracker", "strongsort", "--model", "yolov7-tiny",
        "--nc", "1", "--img_size", "160", "--detector_batch", "2",
        "--capacity", "16", "--det_capacity", "16",
        "--reid_model_path", osnet_path,
        "--track_eval", "false",
        "--output_dir", str(tmp_path / "out"),
    ])
    outs = list((tmp_path / "out").rglob("seqA.txt"))
    assert outs, "no MOT txt written"
