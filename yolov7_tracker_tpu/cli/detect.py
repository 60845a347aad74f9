"""Image-folder detection CLI (reference detect.py surface):
batched compiled inference + NMS + box overlays."""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("tpu yolov7 detect")
    p.add_argument("--source", type=str, required=True)
    p.add_argument("--model", type=str, default="yolov7-tiny")
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--nc", type=int, default=80)
    p.add_argument("--img_size", type=int, default=640)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--save_dir", type=str, default="./detect_result")
    p.add_argument("--spatial_devices", type=int, default=0,
                   help="height-shard each frame's forward over the "
                        "first N devices (low-latency mode when chips "
                        "outnumber streams; parallel/spatial.py). "
                        "0/1 = single-device")
    opts = p.parse_args(argv)
    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import cv2
    import jax

    from ..data.writer import get_color
    from ..pipeline import PipelineConfig, TrackingPipeline
    from ..trackers.slab import TrackerConfig

    variables = None
    if opts.weights:
        from ..utils import checkpoint

        variables = checkpoint.load_variables(opts.weights)
    pcfg = PipelineConfig(model=opts.model, nc=opts.nc,
                          img_size=opts.img_size, conf_thres=opts.conf,
                          iou_thres=opts.iou, detector_batch=1)
    pipe = TrackingPipeline(pcfg, TrackerConfig(), variables=variables)

    mesh = None
    if opts.spatial_devices > 1:
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < opts.spatial_devices:
            raise SystemExit(
                f"--spatial_devices {opts.spatial_devices} but only "
                f"{len(devs)} devices visible")
        mesh = Mesh(
            np.asarray(devs[: opts.spatial_devices]), ("data",))
        print(f"spatial mode: height-sharding over "
              f"{opts.spatial_devices} devices")

    def detect(img_batch):
        if mesh is not None:
            return pipe.detect_batch_spatial(img_batch, mesh)
        return pipe.detect_batch(img_batch)

    os.makedirs(opts.save_dir, exist_ok=True)
    files = (
        sorted(
            os.path.join(opts.source, f) for f in os.listdir(opts.source)
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))
        )
        if os.path.isdir(opts.source) else [opts.source]
    )
    for path in files:
        img = cv2.imread(path)
        boxes, scores, cls, counts = detect(img[None])
        n = int(counts[0])
        b = np.asarray(boxes[0][:n])
        s = np.asarray(scores[0][:n])
        c = np.asarray(cls[0][:n]).astype(int)
        out = img.copy()
        for i in range(n):
            x1, y1, x2, y2 = map(int, b[i])
            cv2.rectangle(out, (x1, y1), (x2, y2), get_color(int(c[i]) + 1), 2)
            cv2.putText(out, f"{c[i]}:{s[i]:.2f}", (x1, y1 - 4),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 164, 0), 1)
        dst = os.path.join(opts.save_dir, os.path.basename(path))
        cv2.imwrite(dst, out)
        print(f"{path}: {n} detections -> {dst}")


if __name__ == "__main__":
    main()


def apply_classifier(dets: "np.ndarray", frame: "np.ndarray",
                     classify_fn) -> "np.ndarray":
    """Second-stage classifier filter (utils/general.py:745-777):
    square-pad each detection's crop by 1.3x + 30px, resize to 224,
    and keep only detections whose classifier argmax agrees with the
    detector class.

    classify_fn: (K, 224, 224, 3) float RGB in [0,1] -> (K,) int class
    ids (the reference uses an opt-in torchvision resnet; any jitted
    flax classifier works here)."""
    import cv2
    import numpy as np

    if len(dets) == 0:
        return dets
    h, w = frame.shape[:2]
    cx = (dets[:, 0] + dets[:, 2]) / 2
    cy = (dets[:, 1] + dets[:, 3]) / 2
    side = np.maximum(dets[:, 2] - dets[:, 0],
                      dets[:, 3] - dets[:, 1]) * 1.3 + 30
    crops = []
    for k in range(len(dets)):
        x1 = int(max(cx[k] - side[k] / 2, 0))
        y1 = int(max(cy[k] - side[k] / 2, 0))
        x2 = int(min(cx[k] + side[k] / 2, w))
        y2 = int(min(cy[k] + side[k] / 2, h))
        cut = frame[y1:max(y2, y1 + 1), x1:max(x2, x1 + 1)]
        im = cv2.resize(cut, (224, 224))[:, :, ::-1].astype(np.float32)
        crops.append(im / 255.0)
    pred2 = np.asarray(classify_fn(np.stack(crops)))
    return dets[dets[:, 5].astype(int) == pred2.astype(int)]
