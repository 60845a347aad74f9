"""End-to-end training convergence: overfit yolov7-tiny until it detects.

test_train_smoke proves the pjit train step RUNS; this proves the whole
learning loop LEARNS. SimOTA assignment (train/loss.py), the reference's
optimizer groups + warmup/one-cycle schedules (train.py:115-196,341-350),
EMA and mutable BN stats together must drive the loss down >8x on a tiny
synthetic dataset AND produce a detector whose top prediction overlaps
the ground-truth box through the full serving path (fused-BN pipeline,
device letterbox, fused score-first NMS) — the same train->weights->
detect round trip a reference user gets from train.py + detect.py.

~4 min on 1 CPU core (one train-step compile + 200 steps); slow lane.
"""

import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow  # one train-step compile + 200 CPU steps

STEPS = 200
N_IMGS = 8
IMG = 96


@pytest.fixture(scope="module")
def box_dataset(tmp_path_factory):
    """8 images: one white filled rectangle on dark noise, class 0."""
    import cv2

    root = tmp_path_factory.mktemp("convds")
    img_dir = root / "images" / "train"
    lab_dir = root / "labels" / "train"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    rng = np.random.default_rng(7)
    gts = []
    for i in range(N_IMGS):
        img = rng.integers(0, 40, (IMG, IMG, 3)).astype(np.uint8)
        cx, cy = rng.uniform(0.3, 0.7, 2)
        w, h = rng.uniform(0.25, 0.45, 2)
        x0, y0 = int((cx - w / 2) * IMG), int((cy - h / 2) * IMG)
        x1, y1 = int((cx + w / 2) * IMG), int((cy + h / 2) * IMG)
        cv2.rectangle(img, (x0, y0), (x1, y1), (255, 255, 255), -1)
        cv2.imwrite(str(img_dir / f"{i:03d}.png"), img)
        (lab_dir / f"{i:03d}.txt").write_text(
            f"0 {cx:.4f} {cy:.4f} {w:.4f} {h:.4f}\n"
        )
        gts.append((x0, y0, x1, y1))
    return str(img_dir), gts


def _iou(a, b):
    x0, y0 = max(a[0], b[0]), max(a[1], b[1])
    x1, y1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x1 - x0, 0) * max(y1 - y0, 0)
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / max(ua, 1e-9)


def test_overfit_until_detection(box_dataset):
    import cv2

    from yolov7_tracker_tpu.models import zoo
    from yolov7_tracker_tpu.parallel.mesh import data_mesh, shard_batch
    from yolov7_tracker_tpu.parallel.train_step import (
        OptConfig, make_train_state, make_train_step,
    )
    from yolov7_tracker_tpu.pipeline import PipelineConfig, TrackingPipeline
    from yolov7_tracker_tpu.trackers.slab import TrackerConfig
    from yolov7_tracker_tpu.train.datasets import YoloDataset

    img_dir, gts = box_dataset
    spec = zoo.get_spec("yolov7-tiny", nc=2)
    mesh = data_mesh()
    # nominal_batch == batch_size: no grad accumulation; lr0 raised so
    # the reference's 1000-step warmup floor (train.py:298) still yields
    # a useful effective lr over a 200-step run
    cfg = OptConfig(lr0=0.04, epochs=2, steps_per_epoch=100,
                    batch_size=N_IMGS, nominal_batch=N_IMGS)
    state = make_train_state(spec, img_size=IMG, opt_cfg=cfg, mesh=mesh,
                             rng=jax.random.PRNGKey(0))
    step = make_train_step(spec, mesh, img_size=IMG, opt_cfg=cfg)
    ds = YoloDataset(img_dir, img_size=IMG, max_labels=8, augment=False)

    losses = []
    it = ds.batches(N_IMGS, epochs=STEPS)
    for i in range(STEPS):
        imgs, tgts, masks = next(it)
        batch = shard_batch(
            mesh, (imgs.astype(np.float32) / 255.0, tgts, masks)
        )
        state, metrics = step(state, *batch)
        losses.append(float(metrics["loss"]))

    first, last = losses[0], float(np.mean(losses[-20:]))
    assert np.isfinite(losses).all()
    assert last < first / 8, (first, last)
    assert last < 0.1, last  # measured ~0.03 at 200 steps, seed 7

    # serve the trained weights through the real pipeline (fused BN +
    # device letterbox + fused NMS) and require the top detection to
    # find the box on >= 7/8 training images
    variables = jax.device_get(
        {"params": state.params, "batch_stats": state.batch_stats}
    )
    pipe = TrackingPipeline(
        PipelineConfig(model="yolov7-tiny", nc=2, img_size=IMG,
                       dtype="float32", conf_thres=0.1,
                       detector_batch=N_IMGS),
        TrackerConfig(tracker="bytetrack", conf_thresh=0.25,
                      capacity=16, det_capacity=16),
        variables=variables, spec=spec,
    )
    frames = np.stack([
        cv2.imread(os.path.join(img_dir, f"{i:03d}.png"))[:, :, ::-1]
        for i in range(N_IMGS)
    ])
    boxes, score, _, counts = map(np.asarray, pipe.detect_batch(frames))
    hits = 0
    report = []
    for i in range(N_IMGS):
        n = int(counts[i])
        if n == 0:
            report.append((i, 0.0, 0.0))
            continue
        j = int(np.argmax(score[i, :n]))
        iou = _iou(boxes[i, j], gts[i])
        report.append((i, float(score[i, j]), iou))
        if score[i, j] > 0.25 and iou > 0.5:
            hits += 1
    assert hits >= N_IMGS - 1, report
