#!/usr/bin/env python
"""Serving fps for EVERY tracker in the zoo, one TPU session.

The reference publishes per-tracker fps (README.md:60-65: SORT 12.2,
DeepSORT 12.51, ByteTrack 14.32, DeepMOT 7.64, BoT-SORT 5.41, UAVMOT
18.56 on an A100); round 4 wired ReID into the fused serving path but
never timed it. This tool measures, for each tracker at the headline
config (yolov7-w6 @1088, b32, det_capacity 300, 128-track slab):

  * fused single-stream fps (process_batch loop, tracker state chained,
    packed async D2H + python emit — bench.py's headline shape);
  * multistream serving fps (32 independent streams, one frame each);
  * the ReID stage's own cost (detect+crops+CNN minus detect alone)
    for the deepsort_cnn and osnet_x0_25 paths;
  * GMC warp estimation ms/frame (host ORB and device ECC), plus a
    BoT-SORT end-to-end loop that pays GMC per frame like the
    reference does (botsort.py:78-109 runs ECC per update()).

Writes JSON lines; run detached (one axon client at a time):
  setsid nohup python tools/tracker_fleet_bench.py > /tmp/fleet.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[fleet {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def textured_pair(src_hw, dx=12, dy=5, seed=7):
    """A structured frame pair with a known global shift for the GMC
    stages: smooth sinusoid shading (ECC gradients) + scattered bright
    squares (ORB corners). Pure uniform noise is the pathological case
    for both methods — ORB detects thousands of junk keypoints
    (~10 s/frame at 1080p) and ECC's Gauss-Newton never converges —
    and says nothing about real-scene cost."""
    h, w = src_hw
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (128 + 50 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
            + 40 * np.sin((xx + yy) / 41.0))
    rng = np.random.default_rng(seed)
    for _ in range(400):
        y = int(rng.integers(0, h - 6))
        x = int(rng.integers(0, w - 6))
        base[y:y + 4, x:x + 4] = float(rng.uniform(0, 255))
    a = np.clip(base, 0, 255).astype(np.uint8)
    b = np.clip(np.roll(np.roll(base, dy, 0), dx, 1),
                0, 255).astype(np.uint8)
    to3 = lambda x: np.repeat(x[..., None], 3, -1)  # noqa: E731
    return to3(a), to3(b)


def result(name, **kw):
    print(json.dumps({"measure": name, **kw}), flush=True)


# (report name, BENCH_TRACKER, BENCH_REID, BENCH_DHN, note)
CONFIGS = [
    ("sort", "sort", "none", "", ""),
    ("bytetrack", "bytetrack", "none", "", ""),
    ("c_biou", "c_bioutracker", "none", "", ""),
    ("uavmot", "uavmot", "none", "", ""),
    ("deepmot", "deepmot", "none", "sinkhorn",
     "parallel sinkhorn DHN (weights/dhn_sinkhorn)"),
    ("deepmot_gru", "deepmot", "none", "gru",
     "sequential GRU DHN (weights/dhn_h32, reference Munkrs shape)"),
    ("deepsort", "deepsort", "deepsort_cnn", "",
     "on-device 128x64 crops"),
    ("strongsort", "strongsort", "osnet_x0_25", "",
     "on-device 128x256 crops"),
    ("botsort", "botsort", "none", "",
     "motion-only (GMC timed separately)"),
    ("botsort_reid", "botsort", "osnet_x0_25", "",
     "dual-threshold fusion"),
]


def main():
    import jax

    from yolov7_tracker_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    log(f"device: {jax.devices()[0]}")
    os.environ.setdefault("BENCH_DET_CAP", "300")
    import bench

    from yolov7_tracker_tpu.trackers import slab as S

    model, img, batch = "yolov7-w6", 1088, 32
    n_frames = int(os.environ.get("FLEET_FRAMES", "128"))
    n_batches = n_frames // batch
    src_hw = (1080, 1920)
    rng = np.random.default_rng(0)
    f0 = rng.integers(0, 255, (batch,) + src_hw + (3,), np.uint8)
    host_frames = [f0, np.roll(f0, 8, axis=2)]
    dev_frames = jax.device_put(host_frames[0])
    warps = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (batch, 1, 1))

    def emit(pipe, outs_host):
        res = []
        valid = outs_host.valid
        for b in range(valid.shape[0]):
            v = valid[b]
            res.append((outs_host.track_id[b][v].tolist(),
                        outs_host.tlwh[b][v],
                        outs_host.cls[b][v].astype(int).tolist()))
        return res

    def timed_best(pipe, init_fn, step_fn, reps=2):
        state = init_fn()
        for _ in range(n_batches):          # untimed warm pass
            state, outs = step_fn(state)
        np.asarray(pipe.pack_output(outs))
        best = float("inf")
        for _ in range(reps):
            state = init_fn()
            results = []
            t0 = time.time()
            prev = None
            for _ in range(n_batches):
                state, outs = step_fn(state)
                packed = pipe.pack_output(outs)
                packed.copy_to_host_async()
                if prev is not None:
                    results.extend(
                        emit(pipe, pipe.unpack_output(np.asarray(prev))))
                prev = packed
            results.extend(emit(pipe, pipe.unpack_output(np.asarray(prev))))
            best = min(best, time.time() - t0)
            assert len(results) == n_frames
        return n_frames / best

    only = os.environ.get("FLEET_ONLY", "")
    sections = os.environ.get("FLEET_SECTIONS", "trackers,gmc").split(",")
    det_ms = None
    for name, tracker, reid, dhn_arch, note in CONFIGS:
        if "trackers" not in sections:
            break
        if only and name not in only.split(","):
            continue
        os.environ["BENCH_TRACKER"] = tracker
        os.environ["BENCH_REID"] = reid
        if dhn_arch:
            os.environ["BENCH_DHN"] = dhn_arch
        log(f"building {name} (tracker={tracker}, reid={reid})...")
        t0 = time.time()
        pipe = bench.build_pipeline(model, img, batch)
        slab0 = pipe.init_tracker()
        slab, outs = pipe.process_batch(slab0, dev_frames, warps)
        jax.block_until_ready(outs.valid)
        log(f"  fused step compiled+ran in {time.time()-t0:.1f}s")
        n_tracks = float(np.asarray(outs.valid.sum(-1).mean()))

        if det_ms is None:  # detector-only baseline, measured once
            out = pipe.detect_batch(dev_frames)
            np.asarray(out[3])
            t0 = time.time()
            for _ in range(3 * n_batches):
                out = pipe.detect_batch(dev_frames)
            np.asarray(out[3])
            det_ms = (time.time() - t0) / (3 * n_frames) * 1e3
            result("detector_only", ms_per_frame=round(det_ms, 3))

        fps = timed_best(
            pipe, pipe.init_tracker,
            lambda s, p=pipe: p.process_batch(s, dev_frames, warps))

        slabs = pipe.init_multistream(batch)
        slabs, mouts = pipe.process_multistream(slabs, dev_frames)
        jax.block_until_ready(mouts.valid)
        ms_fps = timed_best(
            pipe, lambda p=pipe: p.init_multistream(batch),
            lambda s, p=pipe: p.process_multistream(s, dev_frames))

        step_ms = 1e3 / fps
        result(
            "tracker_fps", tracker=name, fps=round(fps, 2),
            multistream_fps=round(ms_fps, 2),
            fused_ms_per_frame=round(step_ms, 3),
            tracker_stage_ms=round(step_ms - det_ms, 3),
            tracks_per_frame=round(n_tracks, 1), reid=reid, note=note,
        )

        # ReID stage cost in isolation: detect + crops + CNN, no tracker
        if reid != "none":
            d = pipe.tcfg.det_capacity

            @jax.jit
            def detect_embed(variables, frames):
                boxes, score, cls, counts = pipe._detect_fn(src_hw)(
                    variables, frames)
                feats = jax.lax.map(
                    lambda fb: pipe._embed_dets(fb[0], fb[1]),
                    (frames, boxes[:, :d]),
                )
                return jnp.sum(feats)

            v = detect_embed(pipe.variables, dev_frames)
            np.asarray(v)
            t0 = time.time()
            for _ in range(n_batches):
                v = detect_embed(pipe.variables, dev_frames)
            np.asarray(v)
            de_ms = (time.time() - t0) / n_frames * 1e3
            rc = pipe.pcfg.reid_capacity
            result("reid_stage", reid=reid,
                   detect_plus_embed_ms=round(de_ms, 3),
                   embed_ms_per_frame=round(de_ms - det_ms, 3),
                   crops_per_frame=(min(rc, d) if rc > 0 else d))
        del pipe

    # ---- GMC warp estimation -------------------------------------------
    if "gmc" not in sections:
        log("done (gmc skipped)")
        return
    from yolov7_tracker_tpu.trackers.gmc import GMC

    frame_a, frame_b = textured_pair(src_hw)
    tex = [frame_a, frame_b]
    gmc_ms = {}
    for method in ("orb", "ecc"):
        g = GMC(method=method)
        g.apply(frame_a)
        w = g.apply(frame_b)  # warm (compiles the ecc jit)
        t0 = time.time()
        n = 16
        for i in range(n):
            w = g.apply(tex[i % 2])
        dt = (time.time() - t0) / n * 1e3
        gmc_ms[method] = dt
        result("gmc_stage", method=method, ms_per_frame=round(dt, 2),
               warp_dx=round(float(w[0, 2]), 2))

    # ---- BoT-SORT + GMC end-to-end: warps computed per frame on the
    # host (reference cadence, botsort.py:78-109), fused step on device
    os.environ["BENCH_TRACKER"] = "botsort"
    os.environ["BENCH_REID"] = "none"
    pipe = bench.build_pipeline(model, img, batch)
    for method in ("ecc", "orb"):
        g = GMC(method=method)
        g.apply(frame_a)
        slab = pipe.init_tracker()
        results = []
        t0 = time.time()
        prev = None
        for bi in range(n_batches):
            wb = np.stack(
                [g.apply(tex[(bi * batch + j) % 2]) for j in range(batch)])
            slab, outs = pipe.process_batch(
                slab, dev_frames, jnp.asarray(wb, jnp.float32))
            packed = pipe.pack_output(outs)
            packed.copy_to_host_async()
            if prev is not None:
                results.extend(
                    emit(pipe, pipe.unpack_output(np.asarray(prev))))
            prev = packed
        results.extend(emit(pipe, pipe.unpack_output(np.asarray(prev))))
        dt = time.time() - t0
        assert len(results) == n_frames
        result("botsort_gmc_e2e", method=method,
               fps=round(n_frames / dt, 2),
               gmc_ms_per_frame=round(gmc_ms[method], 2))
    log("done")


if __name__ == "__main__":
    main()
