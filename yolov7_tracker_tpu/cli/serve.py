"""Multi-camera serving CLI: S independent streams advance in lockstep,
one fused device call per tick — the detector batches across the
streams' current frames and the tracker steps every stream in parallel
(vmapped slab step), the production many-camera configuration that
bench.py measures as multistream fps.

No reference counterpart: tracker/track_demo.py serves one source at a
time and pays a host round trip per frame per camera; here S cameras
cost one device call per tick, and the vmapped tracker amortizes the
association solver's lockstep iterations ~S-fold.

Fault tolerance: per-stream tracker state checkpoints under
--state_dir every --state_ckpt_every ticks; SIGTERM/SIGINT checkpoints
every stream and exits 75 (EX_TEMPFAIL) so a supervisor relaunches the
same command — existing state files auto-resume, with ids and frame
numbering continuing per stream.

    python -m yolov7_tracker_tpu.cli.serve \
        --streams rtsp://cam/1 rtsp://cam/2 rtsp://cam/3 \
        --model yolov7-w6 --model_path best.pt --img_size 1088 \
        --state_dir ./serve_state --save_dir ./serve_out
"""

from __future__ import annotations

import argparse
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser("tpu multi-stream tracking server")
    p.add_argument("--streams", type=str, nargs="+", required=True,
                   help="N sources: video files, image directories, "
                        "webcam ids, or rtsp/http URLs (same resolution)")
    p.add_argument("--tracker", type=str, default="bytetrack")
    p.add_argument("--model", type=str, default="yolov7-tiny")
    p.add_argument("--model_path", type=str, default="")
    p.add_argument("--nc", type=int, default=80)
    p.add_argument("--img_size", type=int, default=640)
    p.add_argument("--conf_thresh", type=float, default=0.2)
    p.add_argument("--kalman_format", type=str, default="default")
    p.add_argument("--capacity", type=int, default=128)
    p.add_argument("--det_capacity", type=int, default=300)
    p.add_argument("--max_frames", type=int, default=0,
                   help="stop after N ticks (0 = run until all streams "
                        "end)")
    p.add_argument("--save_dir", type=str, default="./serve_result")
    p.add_argument("--state_dir", type=str, default="",
                   help="per-stream tracker-state checkpoints "
                        "(stream_<i>.npz); existing files auto-resume")
    p.add_argument("--state_ckpt_every", type=int, default=100,
                   help="ticks between state checkpoints")
    return p.parse_args(argv)


def _stream_name(i, obj):
    base = os.path.splitext(os.path.basename(obj.rstrip("/")))[0]
    safe = base.replace("://", "_").replace("/", "_") or "stream"
    return f"{i:02d}_{safe}"


def _open_source(obj, max_frames):
    """Uniform frame iterator over the demo CLI's source kinds."""
    from ..data import sequence as seqmod

    if obj.isdigit() or "://" in obj:
        return iter(seqmod.StreamFrames(obj, max_frames=max_frames))
    if os.path.isdir(obj):
        import cv2

        paths = sorted(
            os.path.join(obj, f) for f in os.listdir(obj)
            if f.lower().endswith(seqmod.IMG_EXTS)
        )
        return iter(cv2.imread(p) for p in paths)
    return iter(seqmod.VideoFrames(obj))


def main(argv=None):
    opts = parse_args(argv)
    import signal

    import jax
    import numpy as np

    from ..data import writer
    from ..pipeline import PipelineConfig, TrackingPipeline
    from ..trackers import slab as S
    from ..trackers.slab import TrackerConfig

    n = len(opts.streams)
    pcfg = PipelineConfig(model=opts.model, nc=opts.nc,
                          img_size=opts.img_size, conf_thres=0.001)
    tcfg = TrackerConfig(tracker=opts.tracker,
                         kalman_format=opts.kalman_format,
                         conf_thresh=opts.conf_thresh,
                         capacity=opts.capacity,
                         det_capacity=opts.det_capacity)
    variables = None
    if opts.model_path:
        from ..utils import checkpoint

        variables = checkpoint.load_variables(opts.model_path)
    pipe = TrackingPipeline(pcfg, tcfg, variables=variables)

    def state_path(i):
        return os.path.join(opts.state_dir, f"stream_{i:02d}.npz")

    # per-stream slabs (auto-resume), stacked over the stream axis
    per_stream = []
    for i in range(n):
        if opts.state_dir and os.path.isfile(state_path(i)):
            per_stream.append(S.load_slab(state_path(i), pipe.tcfg))
            print(f"stream {i}: resumed state from {state_path(i)}")
        else:
            per_stream.append(S.init_slab(pipe.tcfg))
    slabs = jax.tree.map(lambda *xs: np.stack(xs), *per_stream)
    bases = [int(np.asarray(s.frame)) for s in per_stream]

    def checkpoint_states(slabs):
        if not opts.state_dir:
            return
        os.makedirs(opts.state_dir, exist_ok=True)
        for i in range(n):
            S.save_slab(
                state_path(i),
                jax.tree.map(lambda x: np.asarray(x)[i], slabs),
                pipe.tcfg,
            )

    stop = {"requested": False}

    def _on_term(signum, frame):
        stop["requested"] = True

    old = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            old[sig] = signal.signal(sig, _on_term)
        except ValueError:
            pass

    sources = [_open_source(s, opts.max_frames) for s in opts.streams]
    names = [_stream_name(i, s) for i, s in enumerate(opts.streams)]
    results = [[] for _ in range(n)]
    live = [True] * n
    last = [None] * n
    preempted = False
    t0 = time.time()
    tick = 0
    while not stop["requested"]:
        if opts.max_frames and tick >= opts.max_frames:
            break
        frames = []
        for i, src in enumerate(sources):
            f = next(src, None) if live[i] else None
            if f is None:
                live[i] = False
                f = last[i]  # finished stream coasts on its last frame
            else:
                last[i] = f
            frames.append(f)
        if not any(live):
            break
        if any(f is None for f in frames):  # a source yielded nothing
            raise SystemExit(
                "empty stream(s): "
                + ", ".join(opts.streams[i] for i, f in enumerate(frames)
                            if f is None))
        shapes = {f.shape for f in frames}
        if len(shapes) != 1:
            raise SystemExit(
                f"streams must share one resolution, got {sorted(shapes)}")
        slabs, outs = pipe.process_multistream(slabs, np.stack(frames))
        host = pipe.unpack_output(np.asarray(pipe.pack_output(outs)))
        tick += 1
        for i in range(n):
            if not live[i]:
                continue
            valid = np.asarray(host.valid[i])
            results[i].append((
                bases[i] + len(results[i]) + 1,
                np.asarray(host.track_id[i])[valid].tolist(),
                list(np.asarray(host.tlwh[i])[valid]),
                np.asarray(host.cls[i])[valid].astype(int).tolist(),
            ))
        if (opts.state_dir and opts.state_ckpt_every > 0
                and tick % opts.state_ckpt_every == 0):
            checkpoint_states(slabs)
    preempted = stop["requested"]

    checkpoint_states(slabs)
    for sig, h in old.items():
        signal.signal(sig, h)

    dt = time.time() - t0
    total = sum(len(r) for r in results)
    print(f"served {n} streams, {tick} ticks, {total} frames in "
          f"{dt:.1f}s ({total / max(dt, 1e-9):.1f} fps aggregate)"
          + (" [preempted]" if preempted else ""))
    os.makedirs(opts.save_dir, exist_ok=True)
    for i in range(n):
        if results[i]:
            writer.save_results(opts.save_dir, names[i], results[i])
    if preempted and opts.state_dir:
        with open(os.path.join(opts.state_dir, "preempted.json"),
                  "w") as f:
            f.write('{"tick": %d}' % tick)
    return results, preempted


if __name__ == "__main__":
    import sys

    _, was_preempted = main()
    if was_preempted:
        sys.exit(75)  # EX_TEMPFAIL: supervisor should relaunch
