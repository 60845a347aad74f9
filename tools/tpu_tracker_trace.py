#!/usr/bin/env python
"""Capture + parse a jax.profiler trace of the single-stream ByteTrack
scan (bench shapes) and print op-class totals per frame — the op-golf
map for the non-solver step cost (greedy-floor 0.48 ms/frame in
tools/tpu_tracker_probe.py)."""

import glob
import os
import re
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/jaxtrace_trk"
N_FRAMES = 128
CAP = 128
DETCAP = 300


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/root/repo/.jax_cache-{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tools.tpu_tracker_probe import make_det_streams
    from yolov7_tracker_tpu.trackers import build_tracker
    from yolov7_tracker_tpu.trackers import slab as S
    from yolov7_tracker_tpu.trackers.slab import TrackerConfig

    print(f"device: {jax.devices()[0]}", flush=True)
    tlbr, score, valid = make_det_streams(N_FRAMES, DETCAP, 300, 0.55,
                                          0.99)
    dets = S.DetSlab(
        tlbr=jnp.asarray(tlbr), score=jnp.asarray(score),
        cls=jnp.zeros((N_FRAMES, DETCAP)), valid=jnp.asarray(valid),
        feature=jnp.zeros((N_FRAMES, DETCAP, 0), jnp.float32),
        warp=jnp.tile(S.IDENTITY_WARP, (N_FRAMES, 1, 1)),
    )
    tcfg = TrackerConfig(tracker="bytetrack", conf_thresh=0.5,
                         capacity=CAP, det_capacity=DETCAP)
    step, tcfg = build_tracker(tcfg)
    slab0 = S.init_slab(tcfg)

    @jax.jit
    def scan_full(s, d):
        s, outs = jax.lax.scan(step, s, d)
        return outs.valid

    np.asarray(scan_full(slab0, dets))
    reps = 4
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(reps):
            v = scan_full(slab0, dets)
        np.asarray(v)
    print("trace captured", flush=True)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(os.path.join(
        TRACE_DIR, "**", "*.xplane.pb"), recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    plane = [p for p in xs.planes if "TPU" in p.name][0]
    ev_meta = plane.event_metadata
    line = [l for l in plane.lines if l.name == "XLA Ops"][0]
    tot = defaultdict(float)
    cnt = defaultdict(int)
    by_class = defaultdict(float)
    for ev in line.events:
        name = ev_meta[ev.metadata_id].name
        ms = ev.duration_ps / 1e9
        tot[name] += ms
        cnt[name] += 1
        by_class[re.match(r"%?([a-zA-Z_.-]+)", name).group(1)] += ms
    denom = reps * N_FRAMES
    print("== by class (us/frame):")
    for c, ms in sorted(by_class.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {ms / denom * 1e3:8.2f}  {c}")
    print("total us/frame:", round(sum(by_class.values()) / denom * 1e3, 2))
    print("== top individual ops (us/frame):")
    for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {ms / denom * 1e3:8.2f} x{cnt[name]:6d}  {name[:120]}")


if __name__ == "__main__":
    main()
