"""Host decode-ring throughput: what fps can native.FrameLoader feed?

The co-located deployment story (README "H2D byte budget") budgets the
link; this tool budgets the remaining host stage — JPEG decode. It
writes a synthetic 1080p JPEG directory once, then streams it through
the C++ decode pool (native/frameloader.cpp) at 1/2/4/8 worker
threads, timing the steady-state in-order consume rate. The consumer
loop is the same fl_next path the serving CLIs use, so the number is
what a tracker loop would actually see, not a raw cv2.imread rate.

    python tools/decode_bench.py [--frames 200] [--height 1080]
        [--width 1920] [--threads 1 2 4 8] [--quality 90]

Prints one JSON line: per-thread-count fps, fps/core, and the frame
budget vs the bench headline (does the host keep up at N cores?).
Replaces the stage the reference runs as cv2.imread in its loader
thread pool (tracker/tracker_dataloader.py:77-85).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_jpeg_dir(root, n, h, w, quality):
    import cv2

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    # realistic-entropy content: smooth gradient + blocky structure +
    # mild noise compresses like a street scene (~200-600 kB at 1080p),
    # unlike pure noise (worst case) or a flat fill (trivial case)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        96 + 64 * np.sin(xx / 97.0) + 48 * np.cos(yy / 61.0)
    )[..., None].repeat(3, axis=2)
    paths = []
    for i in range(n):
        img = base + rng.normal(0, 12, (h, w, 3))
        x0, y0 = rng.integers(0, w - 256), rng.integers(0, h - 256)
        img[y0:y0 + 256, x0:x0 + 256] += 60  # a moving bright "car"
        p = os.path.join(root, f"{i + 1:06d}.jpg")
        cv2.imwrite(p, np.clip(img, 0, 255).astype(np.uint8),
                    [cv2.IMWRITE_JPEG_QUALITY, quality])
        paths.append(p)
    return paths


def run_once(paths, n_threads, h, w):
    from yolov7_tracker_tpu import native

    t0 = time.time()
    n = 0
    checksum = 0
    with native.FrameLoader(paths, n_threads=n_threads,
                            capacity=max(8, 2 * n_threads)) as fl:
        for frame in fl:
            # touch one pixel so the in-order handoff is actually
            # consumed (fl_next already memcpy'd the full frame)
            checksum += int(frame[0, 0, 0])
            n += 1
    dt = time.time() - t0
    assert n == len(paths), (n, len(paths))
    return n / dt, checksum


def main(argv=None):
    ap = argparse.ArgumentParser("host decode-ring throughput")
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--quality", type=int, default=90)
    ap.add_argument("--threads", type=int, nargs="+",
                    default=[1, 2, 4, 8])
    ap.add_argument("--target_fps", type=float, default=340.0,
                    help="device-side headline the host must feed")
    args = ap.parse_args(argv)

    from yolov7_tracker_tpu import native

    if native._fl_load() is None:
        raise SystemExit("native frameloader unavailable "
                         "(build failed?) — nothing to measure")

    cores = os.cpu_count() or 1
    with tempfile.TemporaryDirectory(prefix="decode_bench_") as root:
        paths = make_jpeg_dir(root, args.frames, args.height,
                              args.width, args.quality)
        kb = np.mean([os.path.getsize(p) for p in paths]) / 1024
        rates = {}
        for nt in args.threads:
            run_once(paths[: min(16, len(paths))], nt,
                     args.height, args.width)  # warm page cache
            fps, _ = run_once(paths, nt, args.height, args.width)
            rates[nt] = round(fps, 1)
            print(f"  {nt} threads: {fps:.1f} fps")
        one = rates.get(1) or rates[min(rates)]
        print(json.dumps({
            "metric": "host_decode_fps",
            "resolution": f"{args.width}x{args.height}",
            "jpeg_kb_mean": round(float(kb), 1),
            "host_cores": cores,
            "fps_by_threads": rates,
            "fps_per_core": round(one, 1),
            "target_fps": args.target_fps,
            "cores_needed_for_target": round(args.target_fps / one, 1),
        }))


if __name__ == "__main__":
    main()
