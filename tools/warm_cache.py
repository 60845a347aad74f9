#!/usr/bin/env python
"""Warm the persistent XLA compilation cache for the bench configs.

The build host has one CPU core; cold-compiling yolov7-w6 @1088 takes
>10 minutes. This script compiles the bench executables once so bench.py
(and the driver's run) hit the cache. Run detached:
    nohup python tools/warm_cache.py > .warm.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from yolov7_tracker_tpu.pipeline import PipelineConfig, TrackingPipeline
    from yolov7_tracker_tpu.trackers.slab import TrackerConfig

    model = os.environ.get("WARM_MODEL", "yolov7-w6")
    img = int(os.environ.get("WARM_IMG", "1088"))
    batch = int(os.environ.get("WARM_BATCH", "16"))

    def log(m):
        print(f"[warm +{time.time()-t_start:7.1f}s] {m}", flush=True)

    t_start = time.time()
    pcfg = PipelineConfig(model=model, nc=80, img_size=img,
                          detector_batch=batch)
    tcfg = TrackerConfig(tracker="bytetrack", conf_thresh=0.5,
                         capacity=128, det_capacity=64)
    pipe = TrackingPipeline(pcfg, tcfg)
    log("pipeline built")

    frames = np.zeros((batch, 1080, 1920, 3), np.uint8)
    out = pipe.detect_batch(frames)
    jax.block_until_ready(out)
    log(f"detector {model}@{img} b{batch} compiled")

    import jax.numpy as jnp
    from yolov7_tracker_tpu.trackers import slab as S

    d = tcfg.det_capacity
    det_stream = S.DetSlab(
        tlbr=jnp.zeros((256, d, 4)), score=jnp.zeros((256, d)),
        cls=jnp.zeros((256, d)), valid=jnp.zeros((256, d), bool),
        feature=jnp.zeros((256, d, 0)),
        warp=jnp.tile(S.IDENTITY_WARP, (256, 1, 1)),
    )
    slab = pipe.init_tracker()
    _, outs = pipe.track_scan(slab, det_stream)
    jax.block_until_ready(outs)
    log("tracker scan compiled")
    log("done")


if __name__ == "__main__":
    main()
