"""Single video / image-folder tracking demo
(reference tracker/track_demo.py surface): no GT, no eval — just run the
pipeline and write txt/overlays/video."""

from __future__ import annotations

import argparse
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser("tpu tracker demo")
    p.add_argument("--obj", type=str, required=True,
                   help="video file, image directory, webcam id (e.g. 0)"
                        " or rtsp/http stream URL")
    p.add_argument("--max_frames", type=int, default=0,
                   help="stop a live stream after N frames (0 = run on)")
    p.add_argument("--tracker", type=str, default="bytetrack")
    p.add_argument("--model", type=str, default="yolov7-tiny")
    p.add_argument("--model_path", type=str, default="")
    p.add_argument("--nc", type=int, default=80)
    p.add_argument("--img_size", type=int, default=640)
    p.add_argument("--conf_thresh", type=float, default=0.2)
    p.add_argument("--kalman_format", type=str, default="default")
    p.add_argument("--reid_model_path", type=str, default="",
                   help="appearance embeddings for the feature "
                        "trackers (deepsort CNN / OSNet; arch inferred "
                        "from the filename)")
    p.add_argument("--reid_capacity", type=int, default=0,
                   help="embed only the top-K score-ordered dets per "
                        "frame (0 = all det_capacity)")
    p.add_argument("--save_images", action="store_true")
    p.add_argument("--save_videos", action="store_true")
    p.add_argument("--save_dir", type=str, default="./demo_result")
    p.add_argument("--state_ckpt", type=str, default="",
                   help="checkpoint tracker state to this npz (live "
                        "streams: every --state_ckpt_every frames; "
                        "always at end of input)")
    p.add_argument("--state_ckpt_every", type=int, default=100)
    p.add_argument("--resume_state", type=str, default="",
                   help="resume tracker state from an npz written by "
                        "--state_ckpt: track ids and frame numbering "
                        "continue across the restart (the reference "
                        "resets state per sequence, track.py:132)")
    return p.parse_args(argv)


def _write_results(writer, opts, name, results):
    """A resumed run (--resume_state) appends past the rows the
    pre-preemption run already wrote, instead of clobbering the txt."""
    os.makedirs(opts.save_dir, exist_ok=True)
    append = bool(opts.resume_state)
    rows = results
    if append:
        upto = writer.last_written_frame(opts.save_dir, name)
        rows = [r for r in results if r[0] > upto]
    writer.save_results(opts.save_dir, name, rows, append=append)


def main(argv=None):
    opts = parse_args(argv)
    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from ..data import sequence as seqmod
    from ..data import writer
    from ..pipeline import PipelineConfig, TrackingPipeline
    from ..trackers.slab import TrackerConfig

    from ..reid import resolve_reid

    reid, reid_variables = resolve_reid(opts.tracker,
                                        opts.reid_model_path)
    pcfg = PipelineConfig(model=opts.model, nc=opts.nc,
                          img_size=opts.img_size, conf_thres=0.001,
                          reid=reid, reid_capacity=opts.reid_capacity)
    tcfg = TrackerConfig(tracker=opts.tracker,
                         kalman_format=opts.kalman_format,
                         conf_thresh=opts.conf_thresh,
                         feature_dim=512 if reid != "none" else 0)
    variables = None
    if opts.model_path:
        from ..utils import checkpoint

        variables = checkpoint.load_variables(opts.model_path)
    pipe = TrackingPipeline(pcfg, tcfg, variables=variables,
                            reid_variables=reid_variables)

    is_stream = opts.obj.isdigit() or "://" in opts.obj
    if is_stream:
        # live source: per-frame fused detect+associate (one device
        # round trip/frame — the latency path), results emitted as we go
        src = seqmod.StreamFrames(opts.obj, max_frames=opts.max_frames)
        name = f"stream_{opts.obj.replace('://', '_').replace('/', '_')}"
        import numpy as np

        slab = (pipe.load_tracker_state(opts.resume_state)
                if opts.resume_state else pipe.init_tracker())
        base = int(np.asarray(slab.frame))
        results = []

        # results flush at the state-checkpoint cadence (flush BEFORE
        # the state save, like serve.py): a live stream cannot be
        # replayed, so rows held only in memory at a SIGKILL would be
        # a permanent hole in the txt
        pending = []
        append = bool(opts.resume_state)
        written_upto = (writer.last_written_frame(opts.save_dir, name)
                        if append else 0)

        def flush_rows():
            nonlocal append, written_upto
            rows = [r for r in pending if r[0] > written_upto]
            if rows or not append:
                writer.save_results(opts.save_dir, name, rows,
                                    append=append)
                if rows:
                    written_upto = rows[-1][0]
                append = True
            pending.clear()

        t0 = time.time()
        n = 0
        for frame in src:
            slab, out = pipe.step_frame(slab, frame)
            valid = np.asarray(out.valid)
            row = (
                base + n + 1,
                np.asarray(out.track_id)[valid].tolist(),
                list(np.asarray(out.tlwh)[valid]),
                np.asarray(out.cls)[valid].astype(int).tolist(),
            )
            results.append(row)
            pending.append(row)
            n += 1
            if (opts.state_ckpt and opts.state_ckpt_every > 0
                    and n % opts.state_ckpt_every == 0):
                flush_rows()
                pipe.save_tracker_state(slab, opts.state_ckpt)
        src.release()
        flush_rows()
        if opts.state_ckpt:
            pipe.save_tracker_state(slab, opts.state_ckpt)
        dt = time.time() - t0
        print(f"{name}: {n} frames in {dt:.1f}s "
              f"({n/max(dt,1e-9):.1f} fps)")
        return results

    if os.path.isdir(opts.obj):
        spec = seqmod.SequenceSpec(
            os.path.basename(opts.obj.rstrip("/")),
            sorted(
                os.path.join(opts.obj, f)
                for f in os.listdir(opts.obj)
                if f.lower().endswith(seqmod.IMG_EXTS)
            ),
        )
        frames = (
            f for batch, _ in seqmod.iter_frames(spec, 1) for f in batch
        )
        name = spec.name
    else:
        src = seqmod.VideoFrames(opts.obj)
        frames = iter(src)
        name = os.path.splitext(os.path.basename(opts.obj))[0]

    frames = list(frames)
    t0 = time.time()
    init_slab = (pipe.load_tracker_state(opts.resume_state)
                 if opts.resume_state else None)
    results, final_slab = pipe.run_sequence_stateful(
        iter(frames), initial_slab=init_slab)
    if opts.state_ckpt:
        pipe.save_tracker_state(final_slab, opts.state_ckpt)
    dt = time.time() - t0
    print(f"{name}: {len(frames)} frames in {dt:.1f}s "
          f"({len(frames)/max(dt,1e-9):.1f} fps)")
    _write_results(writer, opts, name, results)
    if opts.save_images or opts.save_videos:
        img_dir = os.path.join(opts.save_dir, name + "_imgs")
        for (fid, ids, tlwhs, _), frame in zip(results, frames):
            writer.plot_frame(frame, fid, ids, tlwhs, save_dir=img_dir)
        if opts.save_videos:
            writer.save_video(
                img_dir, os.path.join(opts.save_dir, name + ".mp4")
            )
    return results


if __name__ == "__main__":
    main()
