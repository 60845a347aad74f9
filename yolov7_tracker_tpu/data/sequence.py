"""Per-sequence frame loader — TrackerLoader equivalent
(tracker/tracker_dataloader.py:7-134).

'origin' mode lists a sequence image directory; 'yolo' mode parses a
train/test txt list and filters by sequence name (:39-53). Frames decode
on the host (cv2) and are handed to the device as raw uint8 batches —
the letterbox/normalize happens on device (data.letterbox).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class SequenceSpec:
    name: str
    frame_paths: List[str]

    def __len__(self):
        return len(self.frame_paths)


IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def discover_sequences(
    data_root: str,
    data_format: str = "origin",
    split: str = "test",
    seqs: Optional[Sequence[str]] = None,
    ignore_seqs: Sequence[str] = (),
    split_txt: Optional[str] = None,
) -> List[SequenceSpec]:
    """Find sequences like track.py:95-111.

    'origin': data_root/images/<split>/<seq>/(img1/)fNNN.jpg
    'yolo'  : parse split txt of image paths, group by sequence dir name.
    """
    out: List[SequenceSpec] = []
    if data_format == "origin":
        candidates = [
            os.path.join(data_root, "images", split),
            os.path.join(data_root, split, "sequences"),  # VisDrone layout
            os.path.join(data_root, f"VisDrone2019-MOT-{split}", "sequences"),
            os.path.join(data_root, split),
        ]
        base = next((c for c in candidates if os.path.isdir(c)), None)
        if base is None:
            raise FileNotFoundError(
                f"no sequence dir under {data_root!r} for split {split!r}"
            )
        names = seqs if seqs else sorted(os.listdir(base))
        for name in names:
            if name in ignore_seqs:
                continue
            seq_dir = os.path.join(base, name)
            if os.path.isdir(os.path.join(seq_dir, "img1")):
                seq_dir = os.path.join(seq_dir, "img1")
            frames = sorted(
                os.path.join(seq_dir, f)
                for f in os.listdir(seq_dir)
                if f.lower().endswith(IMG_EXTS)
            )
            if frames:
                out.append(SequenceSpec(name, frames))
    elif data_format == "yolo":
        assert split_txt, "'yolo' format needs the split txt path"
        by_seq = {}
        with open(split_txt) as f:
            for line in f:
                p = line.strip()
                if not p:
                    continue
                seq = os.path.basename(os.path.dirname(p))
                if seq in ignore_seqs:
                    continue
                if seqs and seq not in seqs:
                    continue
                by_seq.setdefault(seq, []).append(
                    p if os.path.isabs(p) else os.path.join(data_root, p)
                )
        for name in sorted(by_seq):
            out.append(SequenceSpec(name, sorted(by_seq[name])))
    else:
        raise ValueError(data_format)
    return out


def iter_frames(spec: SequenceSpec, batch: int = 1) -> Iterator[Tuple[np.ndarray, List[int]]]:
    """Yield (uint8 BHWC batch, frame indices). Decoding is the only host
    work; it runs ahead of the consumer on the native C++ worker pool
    (native/frameloader.cpp — the analogue of the reference's DataLoader
    workers, tracker/track.py:130) so decode overlaps device compute;
    falls back to synchronous cv2 when the native lib can't build."""
    from .. import native

    buf, idxs = [], []
    for i, img in enumerate(native.FrameLoader(spec.frame_paths)):
        buf.append(img)
        idxs.append(i + 1)
        if len(buf) == batch:
            yield np.stack(buf), idxs
            buf, idxs = [], []
    if buf:
        yield np.stack(buf), idxs


class VideoFrames:
    """Video-file frame source (track_demo.py:95-106 equivalent)."""

    def __init__(self, path: str):
        import cv2

        self.cap = cv2.VideoCapture(path)
        assert self.cap.isOpened(), f"cannot open {path}"
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or 30

    def __iter__(self):
        while True:
            ok, frame = self.cap.read()
            if not ok:
                return
            yield frame


class StreamFrames:
    """Live webcam / RTSP / HTTP stream source (the reference's
    LoadWebcam/LoadStreams, utils/datasets.py:140-356): unbounded frame
    iterator over cv2.VideoCapture with optional frame-skip for
    real-time pacing; pair with TrackingPipeline.step_frame for the
    single-round-trip streaming path."""

    def __init__(self, source, skip: int = 0, max_frames: int = 0):
        import cv2

        src = int(source) if str(source).isdigit() else source
        self.cap = cv2.VideoCapture(src)
        assert self.cap.isOpened(), f"cannot open stream {source!r}"
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or 30
        self.skip = skip
        self.max_frames = max_frames

    def __iter__(self):
        n = 0
        while True:
            for _ in range(self.skip):
                self.cap.grab()
            ok, frame = self.cap.read()
            if not ok:
                return
            yield frame
            n += 1
            if self.max_frames and n >= self.max_frames:
                return

    def release(self):
        self.cap.release()


class SynthFrames:
    """Deterministic synthetic camera for soak/fault testing — no
    reference counterpart (the reference has no serving loop to soak).

    Spec string: ``synth://<n>x<h>x<w>[?seed=K&shift=PX&stall=F:SEC,...]``
      n          frames to emit
      h, w       frame size (HWC uint8 BGR)
      seed       RNG seed for the base scene (default 0)
      shift      horizontal pixels the scene moves per frame (default 2)
      stall      injected hiccups: at frame F the reader sleeps SEC
                 seconds before yielding (comma-separated list)

    The scene is a fixed noise background plus bright blocks that
    translate ``shift`` px/frame, so a sharpened detector yields stable
    boxes that re-associate frame to frame; replaying the same spec
    reproduces the identical frame sequence (resume fast-forward safe).
    """

    def __init__(self, spec: str):
        import re as _re
        from urllib.parse import parse_qs, urlparse

        u = urlparse(spec)
        m = _re.fullmatch(r"(\d+)x(\d+)x(\d+)", u.netloc + u.path)
        assert m, f"bad synth spec {spec!r} (want synth://NxHxW)"
        self.n, self.h, self.w = (int(g) for g in m.groups())
        q = parse_qs(u.query)
        self.seed = int(q.get("seed", ["0"])[0])
        self.shift = int(q.get("shift", ["2"])[0])
        self.stalls = {}
        for part in q.get("stall", [""])[0].split(","):
            if part:
                f, sec = part.split(":")
                self.stalls[int(f)] = float(sec)
        rng = __import__("numpy").random.default_rng(self.seed)
        np = __import__("numpy")
        base = rng.integers(0, 96, (self.h, self.w, 3), np.uint8)
        for _ in range(6):  # bright trackable blocks
            y = int(rng.integers(0, max(1, self.h - 24)))
            x = int(rng.integers(0, max(1, self.w - 24)))
            base[y:y + 24, x:x + 24] = rng.integers(200, 255, 3)
        self.base = base
        self.fps = 30

    def __iter__(self):
        import time as _time

        import numpy as np

        for i in range(self.n):
            sec = self.stalls.get(i)
            if sec:
                _time.sleep(sec)
            yield np.roll(self.base, (i * self.shift) % self.w, axis=1)
