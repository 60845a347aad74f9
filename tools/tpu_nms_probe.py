#!/usr/bin/env python
"""NMS-stage latency on the real TPU: greedy chunk size sweep.

The r4 profile shows the NMS while loops cost ~0.22 ms/frame
(while.113 outer pick loop + while.118 inner fixpoint) with chunk=128
and max_det=300 — 3 outer rounds minimum. Larger chunks mean fewer
outer rounds at a bigger per-round fixpoint matrix. This probe times
nms_from_raw over REAL raw head outputs (sharpened-weight w6@1088,
bench detection load) per chunk and checks the pick sets match.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/root/repo/.jax_cache-{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", flush=True)
    os.environ.setdefault("BENCH_DET_CAP", "300")
    import bench

    from yolov7_tracker_tpu.data import letterbox as LB
    from yolov7_tracker_tpu.ops import nms as nms_mod

    model, img, batch = "yolov7-w6", 1088, 16
    src_hw = (1080, 1920)
    pipe = bench.build_pipeline(model, img, batch)
    rng = np.random.default_rng(0)
    f0 = rng.integers(0, 255, (batch,) + src_hw + (3,), np.uint8)
    dev = jax.device_put(f0)

    r, (uw, uh), (dw, dh) = LB.letterbox_params(src_hw, (img, img),
                                                stride=64)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    out_h, out_w = uh + top + bottom, uw + left + right

    @jax.jit
    def raw_fwd(variables, frames):
        imgs, _ = LB.device_preprocess(frames, src_hw, (out_h, out_w),
                                       unpad_hw=(uh, uw),
                                       dtype=jnp.bfloat16)
        _, raw = pipe.model.apply(variables, imgs, training=False)
        return raw

    raw = jax.block_until_ready(raw_fwd(pipe.variables, dev))
    anchors = jnp.asarray(pipe.spec.anchors_per_level())
    strides = tuple(int(s) for s in pipe.spec.strides)

    ref = None
    out = {}
    for chunk in (128, 256, 300, 512):
        fn = jax.jit(lambda rl, chunk=chunk: nms_mod.nms_from_raw(
            rl, anchors, strides, conf_thres=0.01, iou_thres=0.45,
            max_det=300, top_k=2048, chunk=chunk))
        dets, count = fn(raw)
        np.asarray(count)
        t0 = time.time()
        n = 64
        for _ in range(n):
            dets, count = fn(raw)
        np.asarray(count)
        ms = (time.time() - t0) / (n * batch) * 1e3
        d = np.asarray(dets)
        c = np.asarray(count)
        if ref is None:
            ref = (d, c)
        same = bool((c == ref[1]).all()) and bool(
            np.allclose(d, ref[0], atol=1e-3))
        out[f"chunk{chunk}_ms"] = round(ms, 4)
        out[f"chunk{chunk}_same"] = same
        print(f"chunk={chunk}: {ms:.4f} ms/frame, picks match: {same}, "
              f"mean count {c.mean():.1f}", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
