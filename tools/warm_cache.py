#!/usr/bin/env python
"""Warm the persistent XLA compilation cache for the bench configs.

The build host has one CPU core; cold-compiling yolov7-w6 @1088 takes
>10 minutes. This script compiles the bench executables once so bench.py
(and the driver's run) hit the cache. Run detached:
    setsid nohup python tools/warm_cache.py > .warm.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from yolov7_tracker_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax.numpy as jnp

    from yolov7_tracker_tpu.pipeline import PipelineConfig, TrackingPipeline
    from yolov7_tracker_tpu.trackers import slab as S
    from yolov7_tracker_tpu.trackers.slab import TrackerConfig

    model = os.environ.get("WARM_MODEL", "yolov7-w6")
    img = int(os.environ.get("WARM_IMG", "1088"))
    batch = int(os.environ.get("WARM_BATCH", "16"))
    nseq = int(os.environ.get("WARM_NSEQ", "16"))
    n_frames = int(os.environ.get("WARM_FRAMES", "256"))

    def log(m):
        print(f"[warm +{time.time()-t_start:7.1f}s] {m}", flush=True)

    t_start = time.time()
    pcfg = PipelineConfig(model=model, nc=80, img_size=img,
                          detector_batch=batch)
    tcfg = TrackerConfig(tracker="bytetrack", conf_thresh=0.5,
                         capacity=128,
                         det_capacity=int(os.environ.get("BENCH_DET_CAP", "300")))
    pipe = TrackingPipeline(pcfg, tcfg)
    log("pipeline built")

    frames = jax.device_put(np.zeros((batch, 1080, 1920, 3), np.uint8))
    warps = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (batch, 1, 1))

    slab, outs = pipe.process_batch(pipe.init_tracker(), frames, warps)
    jax.block_until_ready(outs)
    log(f"fused step {model}@{img} b{batch} compiled")

    out = pipe.detect_batch(frames)
    jax.block_until_ready(out)
    log("detector-only compiled")

    d = tcfg.det_capacity
    det_stream = S.DetSlab(
        tlbr=jnp.zeros((n_frames, d, 4)), score=jnp.zeros((n_frames, d)),
        cls=jnp.zeros((n_frames, d)), valid=jnp.zeros((n_frames, d), bool),
        feature=jnp.zeros((n_frames, d, 0)),
        warp=jnp.tile(S.IDENTITY_WARP, (n_frames, 1, 1)),
    )
    _, outs = pipe.track_scan(pipe.init_tracker(), det_stream)
    jax.block_until_ready(outs)
    log("tracker scan compiled")

    multi = jax.tree.map(
        lambda x: jnp.stack([x] * nseq, axis=1), det_stream
    )
    slabs = jax.tree.map(
        lambda x: jnp.stack([x] * nseq, axis=0), pipe.init_tracker()
    )
    _, mouts = pipe.track_scan_multi(slabs, multi)
    jax.block_until_ready(mouts)
    log("seq-parallel tracker scan compiled")
    log("done")


if __name__ == "__main__":
    main()
