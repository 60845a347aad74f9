#!/usr/bin/env python
"""Capture a jax.profiler trace of the w6@1088 fused detect step and
print the top ops by self time (parsed locally with
tensorboard_plugin_profile — no TensorBoard UI needed)."""

import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/jaxtrace"


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/root/repo/.jax_cache-{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print(f"device: {jax.devices()[0]}", flush=True)
    os.environ.setdefault("BENCH_DET_CAP", "300")
    import bench

    model, img, batch = "yolov7-w6", 1088, 16
    src_hw = (1080, 1920)
    pipe = bench.build_pipeline(model, img, batch)
    rng = np.random.default_rng(0)
    f0 = rng.integers(0, 255, (batch,) + src_hw + (3,), np.uint8)
    dev = jax.device_put(f0)

    out = pipe.detect_batch(dev)
    np.asarray(out[3])
    print("warmed; tracing...", flush=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(12):
            out = pipe.detect_batch(dev)
        np.asarray(out[3])
    print("trace captured", flush=True)

    xplanes = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                        recursive=True)
    print("xplane files:", xplanes, flush=True)
    if not xplanes:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

        data, _ = raw_to_tool_data.xspace_to_tool_data(
            xplanes, "framework_op_stats", {})
        out_path = "/tmp/op_stats.json"
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(out_path, mode) as f:
            f.write(data)
        print(f"op stats written to {out_path} "
              f"({len(data)} bytes)", flush=True)
    except Exception as e:
        print(f"framework_op_stats failed: {e}", flush=True)
    for tool in ("op_profile", "overview_page"):
        try:
            from tensorboard_plugin_profile.convert import raw_to_tool_data

            data, _ = raw_to_tool_data.xspace_to_tool_data(
                xplanes, tool, {})
            path = f"/tmp/{tool}.json"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(path, mode) as f:
                f.write(data)
            print(f"{tool} written to {path} ({len(data)} bytes)",
                  flush=True)
        except Exception as e:
            print(f"{tool} failed: {e}", flush=True)


if __name__ == "__main__":
    main()
