#!/usr/bin/env python
"""Detector-path latency breakdown on the real TPU: preprocess,
backbone forward, score top-k, full NMS, rescale — to find where the
2.8 ms/frame goes. One process, stages share the resident pipeline."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    cache_dir = f"/root/repo/.jax_cache-{jax.default_backend()}"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
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
    spec = pipe.spec

    @jax.jit
    def stage_pre(variables, frames):
        imgs, _ = LB.device_preprocess(frames, src_hw, (out_h, out_w),
                                       unpad_hw=(uh, uw),
                                       dtype=jnp.bfloat16)
        return jnp.sum(imgs.astype(jnp.float32))

    @jax.jit
    def stage_fwd(variables, frames):
        imgs, _ = LB.device_preprocess(frames, src_hw, (out_h, out_w),
                                       unpad_hw=(uh, uw),
                                       dtype=jnp.bfloat16)
        _, raw = pipe.model.apply(variables, imgs, training=False)
        return sum(jnp.sum(r_[..., 4].astype(jnp.float32)) for r_ in raw)

    @jax.jit
    def stage_topk(variables, frames):
        imgs, _ = LB.device_preprocess(frames, src_hw, (out_h, out_w),
                                       unpad_hw=(uh, uw),
                                       dtype=jnp.bfloat16)
        _, raw = pipe.model.apply(variables, imgs, training=False)
        # replicate nms_from_raw's candidate scoring + top_k + gather,
        # skip the suppression loop
        flat_rows, flat_scores = [], []
        for p in raw:
            b, ny, nx, na, no = p.shape
            obj = jax.nn.sigmoid(p[..., 4])
            cls_max = jnp.max(p[..., 5:], axis=-1)
            score = obj * jax.nn.sigmoid(cls_max)
            flat_scores.append(score.reshape(b, ny * nx * na))
            flat_rows.append(p.reshape(b, ny * nx * na, no))
        rows = jnp.concatenate(flat_rows, axis=1)
        sc = jnp.concatenate(flat_scores, axis=1).astype(jnp.float32)
        top_s, idx = jax.lax.top_k(sc, 2048)
        sel = jnp.take_along_axis(rows, idx[..., None], axis=1)
        return jnp.sum(top_s) + jnp.sum(sel.astype(jnp.float32)[..., 0])

    @jax.jit
    def stage_full(variables, frames):
        boxes, score, cls, counts = pipe._detect_fn(src_hw)(
            variables, frames)
        return counts

    stages = [("preprocess", stage_pre), ("fwd", stage_fwd),
              ("fwd+topk", stage_topk), ("full_detect", stage_full)]
    n = 96
    results = {}
    for name, fn in stages:
        v = fn(pipe.variables, dev)
        np.asarray(v)
        t0 = time.time()
        for _ in range(n):
            v = fn(pipe.variables, dev)
        np.asarray(v)
        ms = (time.time() - t0) / (n * batch) * 1e3
        results[name] = round(ms, 3)
        print(json.dumps({"stage": name, "ms_per_frame": results[name]}),
              flush=True)
    print(json.dumps({"breakdown": results}), flush=True)


if __name__ == "__main__":
    main()
