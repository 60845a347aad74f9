"""Multi-stream serving CLI (cli/serve.py): S sources advance in
lockstep through one fused device call per tick, with per-stream state
checkpoints and auto-resume. No reference counterpart (track_demo.py
serves one source at a time)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def stream_dirs(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("streams")
    rng = np.random.default_rng(0)
    dirs = []
    for s in range(2):
        d = root / f"cam{s}"
        d.mkdir()
        for i in range(8):
            img = rng.integers(0, 255, (160, 240, 3), np.uint8)
            cv2.imwrite(str(d / f"{i + 1:06d}.jpg"), img)
        dirs.append(str(d))
    return dirs


def _common(tmp_path):
    return ["--model", "yolov7-tiny", "--nc", "1", "--img_size", "160",
            "--det_capacity", "16", "--capacity", "32",
            "--save_dir", str(tmp_path / "out")]


def test_serve_two_streams(stream_dirs, tmp_path):
    from yolov7_tracker_tpu.cli import serve

    results, preempted = serve.main(
        ["--streams", *stream_dirs] + _common(tmp_path))
    assert not preempted
    assert len(results) == 2
    for r in results:
        assert [fid for fid, *_ in r] == list(range(1, 9))
    # per-stream MOT txts written
    outs = sorted(os.listdir(tmp_path / "out"))
    assert len(outs) == 2 and all(o.endswith(".txt") for o in outs)


def test_serve_state_resume(stream_dirs, tmp_path):
    """--state_dir: a second invocation auto-resumes each stream's
    tracker state, so frame numbering continues per stream — and the
    relaunch APPENDS to the result txts instead of clobbering the rows
    the first run wrote."""
    from yolov7_tracker_tpu.cli import serve

    state = str(tmp_path / "state")
    common = _common(tmp_path) + ["--state_dir", state,
                                  "--state_ckpt_every", "2"]
    r1, _ = serve.main(
        ["--streams", *stream_dirs, "--max_frames", "4"] + common)
    assert sorted(os.listdir(state)) == ["stream_00.npz", "stream_01.npz"]
    # sentinel row standing in for the first run's output (the untrained
    # detector tracks nothing on noise frames): the relaunch must APPEND
    # past it, never clobber it
    sentinel = "3,999,1.00,1.00,8.00,8.00,1.0,-1,-1,-1\n"
    txts = sorted(os.listdir(tmp_path / "out"))
    assert len(txts) == 2
    with open(tmp_path / "out" / txts[0], "a") as f:
        f.write(sentinel)
    r2, _ = serve.main(
        ["--streams", *stream_dirs, "--max_frames", "4"] + common)
    for r in r1:
        assert [fid for fid, *_ in r] == [1, 2, 3, 4]
    for r in r2:
        assert [fid for fid, *_ in r] == [5, 6, 7, 8]
    with open(tmp_path / "out" / txts[0]) as f:
        assert sentinel in f.read()


def test_serve_reordered_streams_rejected(stream_dirs, tmp_path):
    """State checkpoints are tagged with their source: resuming with a
    swapped --streams order fails loudly instead of silently feeding
    camera A's tracker state camera B's frames."""
    import pytest

    from yolov7_tracker_tpu.cli import serve

    state = str(tmp_path / "state_swap")
    common = _common(tmp_path) + ["--state_dir", state]
    serve.main(
        ["--streams", *stream_dirs, "--max_frames", "2"] + common)
    with pytest.raises(ValueError, match="different stream"):
        serve.main(
            ["--streams", *reversed(stream_dirs), "--max_frames", "2"]
            + common)


def test_serve_dead_stream_state_frozen(stream_dirs, tmp_path):
    """A stream that ends early must not keep advancing: its checkpoint
    is frozen at its last real frame while other streams continue (the
    fused call still steps every lane, but the dead lane's phantom
    updates are never persisted or emitted)."""
    import cv2

    from yolov7_tracker_tpu.cli import serve

    short = tmp_path / "short"
    short.mkdir()
    rng = np.random.default_rng(1)
    for i in range(3):
        cv2.imwrite(str(short / f"{i + 1:06d}.jpg"),
                    rng.integers(0, 255, (160, 240, 3), np.uint8))

    state = str(tmp_path / "state_dead")
    results, _ = serve.main(
        ["--streams", str(short), stream_dirs[0], "--state_dir", state]
        + _common(tmp_path))
    assert [fid for fid, *_ in results[0]] == [1, 2, 3]
    assert [fid for fid, *_ in results[1]] == list(range(1, 9))
    with np.load(os.path.join(state, "stream_00.npz")) as z:
        assert int(z["frame"]) == 3  # frozen at death, not dragged to 8
    with np.load(os.path.join(state, "stream_01.npz")) as z:
        assert int(z["frame"]) == 8


def test_serve_skips_unreadable_frame(tmp_path):
    """One truncated image in a camera dump must not end the stream:
    the loader warns and skips it, and the remaining frames are
    tracked."""
    import cv2

    from yolov7_tracker_tpu.cli import serve

    d = tmp_path / "dump"
    d.mkdir()
    rng = np.random.default_rng(2)
    for i in range(6):
        cv2.imwrite(str(d / f"{i + 1:06d}.jpg"),
                    rng.integers(0, 255, (160, 240, 3), np.uint8))
    (d / "000003.jpg").write_bytes(b"not a jpeg")

    results, _ = serve.main(["--streams", str(d)] + _common(tmp_path))
    assert [fid for fid, *_ in results[0]] == [1, 2, 3, 4, 5]


def test_serve_sigterm_checkpoints_and_flags(stream_dirs, tmp_path,
                                             monkeypatch):
    """SIGTERM mid-serve (raised deterministically while reading tick
    3's frames) checkpoints every stream's state and returns
    preempted=True (the CLI exits 75 for the supervisor loop)."""
    import signal

    from yolov7_tracker_tpu.cli import serve

    orig = serve._open_source

    def wrapped(obj, max_frames):
        def gen():
            for k, f in enumerate(orig(obj, max_frames)):
                if k == 2 and obj == stream_dirs[0]:
                    os.kill(os.getpid(), signal.SIGTERM)
                yield f
        return gen()

    monkeypatch.setattr(serve, "_open_source", wrapped)
    state = str(tmp_path / "state_sig")
    results, preempted = serve.main(
        ["--streams", *stream_dirs, "--state_dir", state]
        + _common(tmp_path))
    assert preempted
    # the tick that observed the signal still completed: 3 frames out
    assert all(len(r) == 3 for r in results)
    assert sorted(os.listdir(state)) == ["preempted.json",
                                         "stream_00.npz",
                                         "stream_01.npz"]
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL


def test_serve_mismatched_resolution(stream_dirs, tmp_path):
    import cv2

    from yolov7_tracker_tpu.cli import serve

    odd = tmp_path / "odd"
    odd.mkdir()
    cv2.imwrite(str(odd / "000001.jpg"),
                np.zeros((120, 200, 3), np.uint8))
    with pytest.raises(SystemExit, match="resolution"):
        serve.main(["--streams", stream_dirs[0], str(odd)]
                   + _common(tmp_path))


def test_serve_resume_past_exhausted_stream(stream_dirs, tmp_path):
    """A relaunch where one replayable stream's source was already fully
    consumed before the checkpoint must serve the remaining streams, not
    crash-loop on 'empty stream': the exhausted stream is dead on
    arrival (state frozen), the others resume normally."""
    import cv2

    from yolov7_tracker_tpu.cli import serve

    short = tmp_path / "short"
    short.mkdir()
    rng = np.random.default_rng(4)
    for i in range(3):
        cv2.imwrite(str(short / f"{i + 1:06d}.jpg"),
                    rng.integers(0, 255, (160, 240, 3), np.uint8))

    state = str(tmp_path / "state_exh")
    common = _common(tmp_path) + ["--state_dir", state]
    streams = ["--streams", str(short), stream_dirs[0]]
    r1, _ = serve.main(streams + ["--max_frames", "5"] + common)
    assert [fid for fid, *_ in r1[0]] == [1, 2, 3]   # exhausted at 3
    assert [fid for fid, *_ in r1[1]] == [1, 2, 3, 4, 5]

    # relaunch: short's source has nothing past its checkpoint — it is
    # finished, and the long stream serves its remaining frames
    r2, _ = serve.main(streams + common)
    assert r2[0] == []
    assert [fid for fid, *_ in r2[1]] == [6, 7, 8]
    with np.load(os.path.join(state, "stream_00.npz")) as z:
        assert int(z["frame"]) == 3  # still frozen at death


def test_serve_fresh_run_truncates_stale_txt(stream_dirs, tmp_path):
    """A fresh (non-resumed) run into a save_dir holding a previous
    run's txts must truncate them: appending would silently drop every
    new row at or below the old file's last frame and mix two runs' id
    spaces in one MOT file."""
    from yolov7_tracker_tpu.cli import serve

    args = ["--streams", stream_dirs[0], "--max_frames", "3"] \
        + _common(tmp_path)
    serve.main(args)
    txts = sorted(os.listdir(tmp_path / "out"))
    assert len(txts) == 1
    stale = "500,999,1.00,1.00,8.00,8.00,1.0,-1,-1,-1\n"
    with open(tmp_path / "out" / txts[0], "a") as f:
        f.write(stale)

    serve.main(args)  # no --state_dir: fresh id space
    path = tmp_path / "out" / txts[0]
    if path.exists():
        with open(path) as f:
            assert stale not in f.read()
