"""Spatially-partitioned inference: H-sharded forward == unsharded.

The reference has no analogue (DDP data parallelism only,
train.py:277-280); this validates the TPU-native low-latency mode where
one frame's rows split across the mesh and GSPMD partitions the convs.
Runs on the virtual 8-device CPU mesh (conftest).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov7_tracker_tpu.models import yolo, zoo
from yolov7_tracker_tpu.parallel.mesh import data_mesh
from yolov7_tracker_tpu.parallel.spatial import make_spatial_detector


@pytest.mark.slow
def test_spatial_forward_matches_unsharded(capfd):
    spec = zoo.get_spec("yolov7-tiny", nc=4)
    model, variables = yolo.build_model(
        spec, rng=jax.random.PRNGKey(3), img_size=256, init="random"
    )
    rng = np.random.default_rng(0)
    # H = 256 = 8 devices x stride 32: clean halo tiling
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 256, 256, 3)), jnp.float32)

    ref, _ = model.apply(variables, imgs, training=False)
    ref = np.asarray(ref)

    mesh = data_mesh(8)
    forward, place = make_spatial_detector(model, mesh)
    v_sh, imgs_sh = place(variables, imgs)
    out = np.asarray(forward(v_sh, imgs_sh))

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    # regression guard (VERDICT r3 weak #3): the decode_hook sharding
    # constraints must keep GSPMD from its "last resort"
    # replicate-then-repartition on the head-decode concat. XLA logs
    # that fallback to stderr from C++ — capfd sees it.
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err, err


@pytest.mark.slow
def test_spatial_detect_batch_matches_single(tmp_path):
    """detect_batch_spatial == detect_batch through the FULL detect
    path (preprocess -> H-sharded forward -> NMS -> rescale), and the
    detect CLI's --spatial_devices flag drives it end-to-end."""
    import cv2

    from yolov7_tracker_tpu.pipeline import (PipelineConfig,
                                             TrackingPipeline)
    from yolov7_tracker_tpu.trackers.slab import TrackerConfig

    pipe = TrackingPipeline(
        PipelineConfig(model="yolov7-tiny", nc=4, img_size=256,
                       detector_batch=1, dtype="float32",
                       conf_thres=0.01),
        TrackerConfig(capacity=16, det_capacity=16))
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, (1, 240, 320, 3), np.uint8)

    ref = [np.asarray(x) for x in pipe.detect_batch(frames)]
    mesh = data_mesh(8)
    got = [np.asarray(x)
           for x in pipe.detect_batch_spatial(frames, mesh)]
    assert (got[3] == ref[3]).all()          # counts
    n = int(ref[3][0])
    np.testing.assert_allclose(got[0][0, :n], ref[0][0, :n],
                               rtol=1e-4, atol=1e-3)   # boxes
    np.testing.assert_allclose(got[1][0, :n], ref[1][0, :n],
                               rtol=1e-4, atol=1e-4)   # scores

    # CLI drive: --spatial_devices over the virtual 8-device CPU mesh
    from yolov7_tracker_tpu.cli import detect as detect_cli

    src = tmp_path / "imgs"
    src.mkdir()
    cv2.imwrite(str(src / "a.jpg"),
                rng.integers(0, 255, (240, 320, 3), np.uint8))
    detect_cli.main([
        "--source", str(src), "--model", "yolov7-tiny", "--nc", "4",
        "--img_size", "256", "--conf", "0.01",
        "--save_dir", str(tmp_path / "out"), "--spatial_devices", "8",
    ])
    assert (tmp_path / "out" / "a.jpg").exists()
