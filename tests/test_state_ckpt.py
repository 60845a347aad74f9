"""Mid-sequence tracker state checkpointing (save_slab/load_slab).

The reference cannot resume a stream: tracker state is a web of STrack
objects plus the process-global id counter (basetrack.py:22,43-46) and
resets per sequence (track.py:132). The slab pytree round-trips through
one npz, so a long-running stream survives a process restart with ids,
Kalman state and frame numbering continuing bit-exactly.
"""

import numpy as np
import pytest

from yolov7_tracker_tpu.trackers import TrackerConfig, build_tracker, init_slab
from yolov7_tracker_tpu.trackers import slab as S

from tests.test_trackers_golden import run_slab_tracker, synth_stream


def _run_steps(step, cfg, slab, stream):
    """Per-frame step over a det stream, returning (results, final slab)
    in the same {id: (tlwh, score)} per-frame form as run_slab_tracker."""
    results = []
    for dets in stream:
        det_slab = S.make_det_slab(
            cfg, dets[:, :4], dets[:, 4], dets[:, 5],
            np.ones(len(dets), bool),
        )
        slab, out = step(slab, det_slab)
        ids = np.asarray(out.track_id)
        valid = np.asarray(out.valid)
        tlwh = np.asarray(out.tlwh)
        score = np.asarray(out.score)
        results.append({
            int(ids[i]): (tlwh[i], float(score[i]))
            for i in range(len(ids)) if valid[i]
        })
    return results, slab


def test_slab_roundtrip_exact(tmp_path):
    cfg = TrackerConfig(tracker="bytetrack", conf_thresh=0.5,
                        capacity=64, det_capacity=32)
    step, cfg = build_tracker(cfg)
    slab = init_slab(cfg)
    _, slab = _run_steps(step, cfg, slab, synth_stream(0, frames=15))

    path = str(tmp_path / "state.npz")
    S.save_slab(path, slab, cfg)
    back = S.load_slab(path, cfg)
    for field, a, b in zip(slab._fields, slab, back):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=field)


@pytest.mark.parametrize("tracker,fmt", [
    ("bytetrack", "default"),
    pytest.param("sort", "naive", marks=pytest.mark.slow),
    pytest.param("c_bioutracker", "default", marks=pytest.mark.slow),
])
def test_checkpoint_resume_matches_uninterrupted(tmp_path, tracker, fmt):
    """save at frame 20 + restore in a FRESH tracker build == one
    uninterrupted 40-frame run: identical ids, boxes, scores."""
    cfg = TrackerConfig(tracker=tracker, kalman_format=fmt,
                        conf_thresh=0.5, capacity=64, det_capacity=32)
    stream = synth_stream(7, frames=40)

    want = run_slab_tracker(stream, cfg)

    step, bcfg = build_tracker(cfg)
    got1, slab = _run_steps(step, bcfg, init_slab(bcfg), stream[:20])
    path = str(tmp_path / "state.npz")
    S.save_slab(path, slab, bcfg)

    # fresh build, as after a process restart
    step2, bcfg2 = build_tracker(cfg)
    resumed = S.load_slab(path, bcfg2)
    assert int(np.asarray(resumed.frame)) == 20
    got2, _ = _run_steps(step2, bcfg2, resumed, stream[20:])

    got = got1 + got2
    assert len(got) == len(want) == 40
    for f, (g, w) in enumerate(zip(got, want)):
        assert sorted(g) == sorted(w), f"frame {f}: ids diverge"
        for tid in g:
            np.testing.assert_allclose(
                g[tid][0], w[tid][0], atol=1e-5,
                err_msg=f"frame {f} id {tid}")


def test_mismatched_stream_tag_rejected(tmp_path):
    """A checkpoint tagged with its stream source refuses to resume as a
    different stream — a reordered --streams list fails loudly instead
    of silently swapping two cameras' tracker states."""
    cfg = TrackerConfig(tracker="bytetrack", capacity=64, det_capacity=32)
    _, cfg = build_tracker(cfg)
    path = str(tmp_path / "state.npz")
    S.save_slab(path, init_slab(cfg), cfg, tag="rtsp://cam/1")

    S.load_slab(path, cfg, expect_tag="rtsp://cam/1")  # same stream: ok
    with pytest.raises(ValueError, match="different stream"):
        S.load_slab(path, cfg, expect_tag="rtsp://cam/2")
    # an untagged legacy checkpoint also fails a tagged load
    S.save_slab(path, init_slab(cfg), cfg)
    with pytest.raises(ValueError, match="different stream"):
        S.load_slab(path, cfg, expect_tag="rtsp://cam/2")


def test_aux_arrays_roundtrip(tmp_path):
    """Host-side aux state (e.g. GMC previous-frame arrays) rides along
    in the same npz and round-trips exactly."""
    cfg = TrackerConfig(tracker="bytetrack", capacity=64, det_capacity=32)
    _, cfg = build_tracker(cfg)
    path = str(tmp_path / "state.npz")
    rng = np.random.default_rng(0)
    aux = {"gmc_gray": rng.integers(0, 255, (60, 80), np.uint8),
           "gmc_kp": rng.random((12, 2)).astype(np.float32)}
    S.save_slab(path, init_slab(cfg), cfg, aux=aux)

    _, back = S.load_slab(path, cfg, with_aux=True)
    assert sorted(back) == sorted(aux)
    for k in aux:
        np.testing.assert_array_equal(back[k], aux[k])
    # plain load still works and ignores aux
    S.load_slab(path, cfg)


def test_gmc_state_resume_matches_uninterrupted():
    """GMC get_state/set_state: a resumed ECC estimator computes the
    same prev->curr warp as an uninterrupted one (the slab checkpoint
    alone can't — the warp depends on host-side previous-frame state,
    botsort.py:78-109)."""
    from yolov7_tracker_tpu.trackers.gmc import GMC

    rng = np.random.default_rng(5)
    base = rng.integers(0, 255, (64, 96, 3), np.uint8)
    f1 = base
    f2 = np.roll(base, (2, 3), axis=(0, 1))

    g = GMC("ecc", downscale=1)
    g.apply(f1)
    st = g.get_state()
    want = g.apply(f2)

    g2 = GMC("ecc", downscale=1)
    g2.set_state(st)
    got = g2.apply(f2)
    np.testing.assert_allclose(got, want, atol=1e-6)

    # orb state (keypoints/descriptors) survives the same round trip
    g3 = GMC("orb")
    g3.apply(f1)
    st3 = g3.get_state()
    g4 = GMC("orb")
    g4.set_state(st3)
    for k in st3:
        np.testing.assert_array_equal(g4.get_state()[k], st3[k])


def test_mismatched_config_rejected(tmp_path):
    cfg = TrackerConfig(tracker="bytetrack", capacity=64, det_capacity=32)
    _, cfg = build_tracker(cfg)
    path = str(tmp_path / "state.npz")
    S.save_slab(path, init_slab(cfg), cfg)

    other = TrackerConfig(tracker="bytetrack", capacity=128,
                          det_capacity=32)
    _, other = build_tracker(other)
    with pytest.raises(ValueError, match="different"):
        S.load_slab(path, other)


@pytest.mark.slow
def test_demo_cli_state_resume(tmp_path):
    """track_demo --state_ckpt / --resume_state: two half-runs over an
    image dir emit the same frame numbering as one full run, and the
    second half resumes the saved id counter."""
    import cv2

    from yolov7_tracker_tpu.cli import track_demo

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (8, 160, 240, 3), np.uint8)
    d_all, d_a, d_b = (tmp_path / n for n in ("all", "a", "b"))
    for d in (d_all, d_a, d_b):
        d.mkdir()
    for i, f in enumerate(frames):
        cv2.imwrite(str(d_all / f"{i + 1:06d}.jpg"), f)
        cv2.imwrite(str((d_a if i < 4 else d_b) / f"{i + 1:06d}.jpg"), f)

    common = ["--model", "yolov7-tiny", "--nc", "1", "--img_size", "160",
              "--save_dir", str(tmp_path / "out")]
    state = str(tmp_path / "state.npz")
    r_a = track_demo.main(
        ["--obj", str(d_a), "--state_ckpt", state] + common)
    assert (tmp_path / "state.npz").exists()
    r_b = track_demo.main(
        ["--obj", str(d_b), "--resume_state", state] + common)
    # frame numbering continues across the restart
    assert [fid for fid, *_ in r_a] == [1, 2, 3, 4]
    assert [fid for fid, *_ in r_b] == [5, 6, 7, 8]


@pytest.mark.slow
def test_demo_cli_live_stream_flushes_incrementally(tmp_path, monkeypatch):
    """Live-stream track_demo with --state_ckpt flushes result rows to
    disk at the same cadence as the state checkpoints: a hard kill
    after a checkpoint must not leave a permanent hole in the txt
    (a live source cannot be replayed). Verified by spying on
    writer.save_results across a crash + resume."""
    from yolov7_tracker_tpu.cli import track_demo
    from yolov7_tracker_tpu.data import sequence as seqmod
    from yolov7_tracker_tpu.data import writer as writer_mod

    rng = np.random.default_rng(7)
    crash = {"armed": True}

    class FakeStream:
        def __init__(self, obj, max_frames=0):
            self.n = 5 if crash["armed"] else 2

        def __iter__(self):
            for _ in range(self.n):
                yield rng.integers(0, 255, (160, 240, 3), np.uint8)
            if crash["armed"]:
                raise RuntimeError("camera died")

        def release(self):
            pass

    calls = []
    real_save = writer_mod.save_results

    def spy(folder, name, rows, data_type="mot17", append=False):
        calls.append(([r[0] for r in rows], append))
        return real_save(folder, name, rows, data_type, append)

    monkeypatch.setattr(seqmod, "StreamFrames", FakeStream)
    monkeypatch.setattr(writer_mod, "save_results", spy)

    state = str(tmp_path / "live_state.npz")
    common = ["--model", "yolov7-tiny", "--nc", "1", "--img_size", "160",
              "--save_dir", str(tmp_path / "out"),
              "--state_ckpt", state, "--state_ckpt_every", "2"]

    with pytest.raises(RuntimeError, match="camera died"):
        track_demo.main(["--obj", "rtsp://fake/cam"] + common)
    # rows 1-4 hit disk at the two checkpoints BEFORE the crash; the
    # first flush truncates (fresh run), later ones append
    assert calls == [([1, 2], False), ([3, 4], True)]
    import numpy as _np
    with _np.load(state) as z:
        assert int(z["frame"]) == 4

    # resume: numbering continues at 5, appending past the crash point
    calls.clear()
    crash["armed"] = False
    r2 = track_demo.main(
        ["--obj", "rtsp://fake/cam", "--resume_state", state] + common)
    assert [fid for fid, *_ in r2] == [5, 6]
    assert all(append for _, append in calls)
    assert [5, 6] in [rows for rows, _ in calls]
