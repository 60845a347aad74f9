#!/usr/bin/env python
"""Round-5 backbone-attack measurement session (ONE TPU process).

Captures what the MFU push needs:
  1. forward-only ms/frame at the headline batch (32) — the 1.59 ms
     (b16, r4) number re-measured at the benched batch;
  2. jax.profiler traces of (a) forward-only and (b) the full fused
     detect step, written to /tmp/jaxtrace_r5_{fwd,full} for offline
     parsing by tools/parse_r5_trace.py (per-layer self-time table);
  3. a conv micro-probe of the layout/fusion suspects so candidate
     fixes can be ranked without re-tracing.

Run detached (the axon tunnel admits one client at a time):
  setsid nohup python tools/tpu_r5_profile.py > /tmp/r5prof.log 2>&1 &
"""

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[r5prof {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def result(name, **kw):
    print(json.dumps({"measure": name, **kw}), flush=True)


def main():
    import jax

    from yolov7_tracker_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    log(f"device: {jax.devices()[0]}")
    os.environ.setdefault("BENCH_DET_CAP", "300")
    import bench

    from yolov7_tracker_tpu.data import letterbox as LB

    model, img, batch = "yolov7-w6", 1088, 32
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
    def stage_fwd(variables, frames):
        imgs, _ = LB.device_preprocess(frames, src_hw, (out_h, out_w),
                                       unpad_hw=(uh, uw),
                                       dtype=jnp.bfloat16)
        _, raw = pipe.model.apply(variables, imgs, training=False)
        return sum(jnp.sum(r_[..., 4].astype(jnp.float32)) for r_ in raw)

    @jax.jit
    def stage_full(variables, frames):
        boxes, score, cls, counts = pipe._detect_fn(src_hw)(
            variables, frames)
        return counts

    def time_stage(name, fn, n=64):
        v = fn(pipe.variables, dev)
        np.asarray(v)
        t0 = time.time()
        for _ in range(n):
            v = fn(pipe.variables, dev)
        np.asarray(v)
        ms = (time.time() - t0) / (n * batch) * 1e3
        result(name, ms_per_frame=round(ms, 4), batch=batch)
        return ms

    log("compiling stage_fwd (b32)...")
    time_stage("fwd_b32", stage_fwd)
    log("compiling stage_full (b32)...")
    time_stage("full_b32", stage_full)

    for tag, fn in (("fwd", stage_fwd), ("full", stage_full)):
        tdir = f"/tmp/jaxtrace_r5_{tag}"
        shutil.rmtree(tdir, ignore_errors=True)
        log(f"tracing {tag} -> {tdir}")
        with jax.profiler.trace(tdir):
            for _ in range(12):
                v = fn(pipe.variables, dev)
            np.asarray(v)
        result(f"trace_{tag}", dir=tdir)

    # --- conv micro-probes: rank the suspects without retracing -----
    # Shapes from the w6@1088 graph (B=32). Each probe reports achieved
    # TFLOP/s for a lone conv of that shape so per-layer trace times can
    # be compared against the best a single conv of that shape can do.
    def conv_probe(name, hw, cin, cout, k, s, n=32, g=1, b=batch):
        x = jnp.zeros((b, hw, hw, cin), jnp.bfloat16)
        w = jnp.zeros((k, k, cin // g, cout), jnp.bfloat16)

        @jax.jit
        def f(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (s, s), ((k // 2, k // 2), (k // 2, k // 2)),
                feature_group_count=g,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y.astype(jnp.float32))

        v = f(x, w)
        np.asarray(v)
        t0 = time.time()
        for _ in range(n):
            v = f(x, w)
        np.asarray(v)
        dt = (time.time() - t0) / n
        flops = 2 * b * (hw // s) * (hw // s) * k * k * (cin // g) * cout
        result(name, ms=round(dt * 1e3, 3),
               tflops=round(flops / dt / 1e12, 1),
               ms_per_frame=round(dt / b * 1e3, 4))

    log("conv probes...")
    # stem: folded ReOrg 6x6/s2 3->64 at 1088 (as 6x6 probe at k=6 is
    # irregular; probe the equivalent 3x3 on the 544 post-reorg grid)
    conv_probe("probe_stem_reorg3x3_12to64_544", 544, 12, 64, 3, 1)
    conv_probe("probe_conv3x3_64to128_s2_544", 544, 64, 128, 3, 2)
    conv_probe("probe_conv3x3_128to128_272", 272, 128, 128, 3, 1)
    conv_probe("probe_conv1x1_128to64_272", 272, 128, 64, 1, 1)
    conv_probe("probe_conv1x1_512to256_136", 136, 512, 256, 1, 1)
    conv_probe("probe_conv3x3_256to256_136", 136, 256, 256, 3, 1)
    conv_probe("probe_conv3x3_512to512_68", 68, 512, 512, 3, 1)
    conv_probe("probe_conv1x1_2048to1024_34", 34, 2048, 1024, 1, 1)
    log("done")


if __name__ == "__main__":
    main()
