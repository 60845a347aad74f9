#!/usr/bin/env python
"""A/B the width-packed w6 front on the real TPU: forward-only and
full-detect ms/frame with wpack on vs off (same variables), plus a
trace of the packed forward for per-op attribution. The off-side
numbers reproduce tools/tpu_r5_profile.py (fwd 1.664 / full 1.993
ms/frame at b32).

Run detached: setsid nohup python tools/tpu_wpack_ab.py > /tmp/wpab.log 2>&1 &
"""

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[wpab {time.strftime('%H:%M:%S')}] {m}", flush=True)


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

    model, img = "yolov7-w6", 1088
    batch = int(os.environ.get("WPAB_BATCH", "32"))
    src_hw = (1080, 1920)
    pipe = bench.build_pipeline(model, img, batch)  # wpack on (default)
    rng = np.random.default_rng(0)
    dev = jax.device_put(
        rng.integers(0, 255, (batch,) + src_hw + (3,), np.uint8))

    r, (uw, uh), (dw, dh) = LB.letterbox_params(src_hw, (img, img),
                                                stride=64)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    out_h, out_w = uh + top + bottom, uw + left + right

    def make_fwd(m, normalize=True, stem_bands=None):
        # stem_bands mirrors pipeline._detect_fn's seam: the preprocess
        # emits the UNPADDED resize and the packed stem absorbs the 114
        # band (conv padding + strip corrections) — the canvas pad
        # write never happens. This is the graph bench.py serves with
        # since the band fold; the canvas path (stem_bands=None) is
        # kept for A/B against it.
        @jax.jit
        def stage_fwd(variables, frames):
            imgs, _ = LB.device_preprocess(frames, src_hw,
                                           (out_h, out_w),
                                           unpad_hw=(uh, uw),
                                           dtype=jnp.bfloat16,
                                           normalize=normalize,
                                           pad_to_canvas=stem_bands is None)
            _, raw = m.apply(variables, imgs, training=False,
                             stem_bands=stem_bands)
            return sum(jnp.sum(x[..., 4].astype(jnp.float32))
                       for x in raw)
        return stage_fwd

    @jax.jit
    def stage_full(variables, frames):
        return pipe._detect_fn(src_hw)(variables, frames)[3]

    def time_stage(name, fn, n=64):
        v = fn(pipe.variables, dev)
        np.asarray(v)
        t0 = time.time()
        for _ in range(n):
            v = fn(pipe.variables, dev)
        np.asarray(v)
        ms = (time.time() - t0) / (n * batch) * 1e3
        result(name, ms_per_frame=round(ms, 4), batch=batch)

    # WPAB_BANDS=1: also measure/trace the band-fold forward (the graph
    # bench.py actually serves — unpadded resize, stem absorbs the 114
    # band). WPAB_ONLY=bands skips the canvas-path stages (warm-cache
    # reruns after the numbers are already on record).
    want_bands = os.environ.get("WPAB_BANDS", "0") == "1"
    only = os.environ.get("WPAB_ONLY", "")
    bands = (top, bottom)
    can_bands = (pipe._wpack_raw and left == 0 and right == 0
                 and (top or bottom))
    if want_bands and not can_bands:
        log("WPAB_BANDS requested but the band-fold path is inactive "
            "(needs wpack raw stem + row-band-only pad); skipping")
        want_bands = False

    fwd_on = make_fwd(pipe.model, normalize=not pipe._wpack_raw)
    fwd_bands = (make_fwd(pipe.model, normalize=False, stem_bands=bands)
                 if want_bands else None)
    if only != "bands":
        log("compiling packed fwd (canvas path)...")
        time_stage("fwd_wpack_on", fwd_on)
        log("compiling packed full detect...")
        time_stage("full_wpack_on", stage_full)
    if fwd_bands is not None:
        log("compiling packed fwd (band-fold path, as served)...")
        time_stage("fwd_wpack_bands", fwd_bands)
        tdir_b = "/tmp/jaxtrace_r5_wpack_bands"
        shutil.rmtree(tdir_b, ignore_errors=True)
        log(f"tracing band-fold fwd -> {tdir_b}")
        with jax.profiler.trace(tdir_b):
            for _ in range(12):
                v = fwd_bands(pipe.variables, dev)
            np.asarray(v)
        result("trace_bands", dir=tdir_b)
        if only == "bands":
            log("done (bands only)")
            return

    # numerics cross-check on chip: packed vs plain decode outputs
    from yolov7_tracker_tpu.models import yolo

    m_off = yolo.YoloV7(pipe.spec, fused=True)

    @jax.jit
    def diff(variables, frames):
        # each side gets its own preprocess: the packed raw stem eats
        # the raw-scale BGR canvas, the plain model the normalized one
        imgs_on, _ = LB.device_preprocess(frames, src_hw, (out_h, out_w),
                                          unpad_hw=(uh, uw),
                                          dtype=jnp.bfloat16,
                                          normalize=not pipe._wpack_raw)
        imgs, _ = LB.device_preprocess(frames, src_hw, (out_h, out_w),
                                       unpad_hw=(uh, uw),
                                       dtype=jnp.bfloat16)
        p_on, _ = pipe.model.apply(variables, imgs_on, training=False)
        p_off, _ = m_off.apply(variables, imgs, training=False)
        p_on = p_on.astype(jnp.float32)
        p_off = p_off.astype(jnp.float32)
        return jnp.max(jnp.abs(p_on - p_off)), jnp.max(jnp.abs(p_off))

    log("compiling on/off diff...")
    d, ref = diff(pipe.variables, dev)
    result("decode_diff", max_abs=float(d), ref_max=float(ref))

    tdir = "/tmp/jaxtrace_r5_wpack"
    shutil.rmtree(tdir, ignore_errors=True)
    log(f"tracing packed fwd -> {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(12):
            v = fwd_on(pipe.variables, dev)
        np.asarray(v)
    result("trace", dir=tdir)
    log("done")


if __name__ == "__main__":
    main()
