"""End-to-end pipeline tests on CPU: synthetic frames through preprocess
-> detector -> NMS -> coordinate rescale -> tracker -> MOT txt, plus the
sharded sequence-parallel tracker over the virtual 8-device mesh."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov7_tracker_tpu.pipeline import PipelineConfig, TrackingPipeline
from yolov7_tracker_tpu.trackers.slab import TrackerConfig


@pytest.fixture(scope="module")
def pipe():
    pcfg = PipelineConfig(model="yolov7-tiny", nc=8, img_size=160,
                          detector_batch=2, dtype="float32")
    tcfg = TrackerConfig(tracker="bytetrack", conf_thresh=0.5,
                         capacity=32, det_capacity=16)
    return TrackingPipeline(pcfg, tcfg)


def test_detect_batch_shapes(pipe):
    frames = np.random.default_rng(0).integers(
        0, 255, (2, 120, 160, 3), np.uint8
    )
    boxes, scores, cls, counts = pipe.detect_batch(frames)
    assert boxes.shape == (2, 300, 4)
    assert counts.shape == (2,)
    # rescaled coords stay inside the original frame
    b = np.asarray(boxes)
    assert (b[..., [0, 2]] <= 160).all() and (b[..., [1, 3]] <= 120).all()
    assert (b >= 0).all()


@pytest.mark.slow  # full-sequence compile; detect/track/writer stages covered by faster fast-lane tests
def test_run_sequence_and_writer(pipe, tmp_path):
    frames = [
        np.random.default_rng(i).integers(0, 255, (120, 160, 3), np.uint8)
        for i in range(5)
    ]
    results = pipe.run_sequence(iter(frames))
    assert len(results) == 5
    from yolov7_tracker_tpu.data import writer

    path = writer.save_results(str(tmp_path), "seq01", results)
    assert os.path.isfile(path)


def test_writer_append_and_last_frame(tmp_path):
    """Append-mode results writing for resume-after-preemption: a
    relaunch extends the txt past last_written_frame instead of
    clobbering the rows the first run emitted."""
    from yolov7_tracker_tpu.data import writer

    box = np.array([10.0, 20.0, 30.0, 40.0])
    first = [(1, [1], [box], [0]), (2, [1, 2], [box, box], [0, 0])]
    writer.save_results(str(tmp_path), "seq", first)
    assert writer.last_written_frame(str(tmp_path), "seq") == 2

    second = [(3, [2], [box], [0])]
    writer.save_results(str(tmp_path), "seq", second, append=True)
    with open(tmp_path / "seq.txt") as f:
        lines = f.read().splitlines()
    assert len(lines) == 4  # 1 + 2 + 1 rows, nothing clobbered
    assert [int(ln.split(",")[0]) for ln in lines] == [1, 2, 2, 3]
    assert writer.last_written_frame(str(tmp_path), "seq") == 3
    # absent file: 0 (fresh start)
    assert writer.last_written_frame(str(tmp_path), "nope") == 0


def test_sharded_sequence_tracking():
    """8 sequences sharded over the 8-device CPU mesh."""
    from yolov7_tracker_tpu.parallel.mesh import data_mesh
    from yolov7_tracker_tpu.parallel.tracking import (
        make_sharded_tracker, stack_slabs,
    )
    from yolov7_tracker_tpu.trackers import build_tracker
    from yolov7_tracker_tpu.trackers import slab as S

    n_seq = len(jax.devices())
    cfg = TrackerConfig(tracker="sort", conf_thresh=0.5, capacity=16,
                        det_capacity=8)
    step, cfg = build_tracker(cfg)
    mesh = data_mesh()
    tracker = make_sharded_tracker(step, mesh)
    slabs = stack_slabs(cfg, n_seq)
    t_frames = 4
    rng = np.random.default_rng(0)
    tlbr = rng.uniform(0, 100, (t_frames, n_seq, 8, 4)).astype(np.float32)
    tlbr[..., 2:] += tlbr[..., :2]
    det_streams = S.DetSlab(
        tlbr=jnp.asarray(tlbr),
        score=jnp.full((t_frames, n_seq, 8), 0.9, jnp.float32),
        cls=jnp.zeros((t_frames, n_seq, 8)),
        valid=jnp.ones((t_frames, n_seq, 8), bool),
        feature=jnp.zeros((t_frames, n_seq, 8, 0)),
        warp=jnp.tile(S.IDENTITY_WARP, (t_frames, n_seq, 1, 1)),
    )
    slabs2, outs = tracker(
        jax.tree.map(jnp.asarray, slabs), det_streams
    )
    assert outs.valid.shape == (t_frames, n_seq, 16)
    # every sequence tracked something by the last frame
    assert bool(np.asarray(outs.valid[-1]).any())


def test_apply_classifier_filters():
    import numpy as np

    from yolov7_tracker_tpu.cli.detect import apply_classifier

    frame = np.random.default_rng(0).integers(
        0, 255, (160, 240, 3), np.uint8
    )
    dets = np.array([
        [10, 10, 60, 80, 0.9, 0],
        [100, 20, 160, 90, 0.8, 1],
        [30, 100, 90, 150, 0.7, 2],
    ], np.float32)
    # classifier agrees with classes 0 and 2 only
    out = apply_classifier(dets, frame,
                           lambda crops: np.array([0, 5, 2]))
    assert out.shape == (2, 6)
    assert set(out[:, 5].astype(int)) == {0, 2}
    assert apply_classifier(np.zeros((0, 6)), frame,
                            lambda c: c).shape == (0, 6)


@pytest.mark.slow  # 25 s: compiles process_multistream AND step_frame
def test_multistream_matches_per_stream_steps():
    """process_multistream advances S independent slabs exactly like S
    separate step_frame calls on the same frames. Slow lane: the cost
    is two fresh program compiles, and the multistream path keeps
    fast-lane coverage through test_sharded_sequence_tracking while
    the serve CLI suite (also slow) drives it end-to-end."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from yolov7_tracker_tpu.pipeline import (PipelineConfig,
                                             TrackingPipeline)
    from yolov7_tracker_tpu.trackers import slab as S
    from yolov7_tracker_tpu.trackers.slab import TrackerConfig

    pipe = TrackingPipeline(
        PipelineConfig(model="yolov7-tiny", nc=4, img_size=160,
                       detector_batch=2, dtype="float32"),
        TrackerConfig(tracker="bytetrack", conf_thresh=0.5,
                      capacity=16, det_capacity=16))
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 200, 280, 3), np.uint8)

    slabs = pipe.init_multistream(2)
    for _ in range(2):
        slabs, outs_ms = pipe.process_multistream(slabs, frames)

    singles = []
    for si in range(2):
        slab = pipe.init_tracker()
        for _ in range(2):
            slab, out = pipe.step_frame(slab, frames[si])
        singles.append((slab, out))

    for si in range(2):
        want_slab, want_out = singles[si]
        got_slab = jax.tree_util.tree_map(lambda x: x[si], slabs)
        np.testing.assert_array_equal(
            np.asarray(got_slab.state), np.asarray(want_slab.state))
        np.testing.assert_allclose(
            np.asarray(got_slab.det_tlwh),
            np.asarray(want_slab.det_tlwh), rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(got_slab.mean), np.asarray(want_slab.mean),
            rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(outs_ms.valid[si]), np.asarray(want_out.valid))


def test_pack_output_ids_exact_past_float32():
    """Track ids cross the packed D2H transfer bit-cast, not
    value-cast: ids at or past 2^24 (reachable by a long-lived serve
    process that persists next_id across relaunches) must round-trip
    exactly instead of colliding on float32's 24-bit mantissa."""
    from yolov7_tracker_tpu import pipeline as P
    from yolov7_tracker_tpu.trackers import slab as S

    ids = np.array([0, 1, 2**24 + 1, 2**24 + 2, 2**31 - 1], np.int32)
    t = len(ids)
    outs = S.FrameOutput(
        track_id=jnp.asarray(ids),
        tlwh=jnp.arange(t * 4, dtype=jnp.float32).reshape(t, 4),
        score=jnp.linspace(0.0, 1.0, t),
        cls=jnp.asarray([0, 1, 2, 3, 4], jnp.float32),
        valid=jnp.asarray([1, 1, 0, 1, 1], bool),
    )
    arr = np.asarray(P._pack_frame_output(outs))
    assert arr.shape == (t, 8)
    back = P.TrackingPipeline.unpack_output(arr)
    # 2^24+1 and 2^24+2 are NOT representable in float32 — a value
    # cast would map both to the same id
    assert back.track_id.tolist() == ids.tolist()
    assert back.valid.tolist() == [True, True, False, True, True]
    np.testing.assert_allclose(back.tlwh,
                               np.arange(t * 4).reshape(t, 4))
    np.testing.assert_allclose(back.score, np.linspace(0, 1, t),
                               rtol=1e-6)
    # batched layout (B, T, 8) unpacks identically
    b2 = P.TrackingPipeline.unpack_output(np.stack([arr, arr]))
    assert b2.track_id.shape == (2, t)
    assert b2.track_id[1].tolist() == ids.tolist()


def test_detect_cadence_survives_resume(pipe, monkeypatch):
    """detect_per_frame=k: the detect/predict-only phase is keyed on
    the slab's global frame counter, so a checkpoint/resume split at an
    arbitrary frame detects on exactly the frames an uninterrupted run
    would have (resume previously reset the cadence to the local loop
    index). Detector stubbed out — this exercises only the scheduling
    in run_sequence_stateful."""
    import dataclasses

    from yolov7_tracker_tpu.trackers import slab as S

    monkeypatch.setattr(
        pipe, "pcfg", dataclasses.replace(pipe.pcfg, detect_per_frame=3))

    detected = []   # global frame indices that ran the detector
    t_cap = pipe.tcfg.capacity

    def fake_out(n):
        z = jnp.zeros((n, t_cap))
        return S.FrameOutput(
            track_id=z.astype(jnp.int32),
            tlwh=jnp.zeros((n, t_cap, 4)), score=z, cls=z,
            valid=jnp.zeros((n, t_cap), bool))

    def fake_process_batch(slab, frames, warps):
        start = int(np.asarray(slab.frame))
        detected.extend(range(start, start + len(frames)))
        return (slab._replace(frame=slab.frame + len(frames)),
                fake_out(len(frames)))

    def fake_predict_only(slab):
        out = fake_out(1)
        return (slab._replace(frame=slab.frame + 1),
                jax.tree_util.tree_map(lambda x: x[0], out))

    monkeypatch.setattr(pipe, "process_batch", fake_process_batch)
    monkeypatch.setattr(pipe, "_predict_only", fake_predict_only)

    frames = [np.zeros((120, 160, 3), np.uint8) for _ in range(8)]

    # uninterrupted: detect at global indices 0, 3, 6
    res_full, _ = pipe.run_sequence_stateful(iter(frames))
    assert detected == [0, 3, 6]
    assert [fid for fid, *_ in res_full] == list(range(1, 9))

    # split mid-cadence at frame 4 (between detect frames 3 and 6)
    detected.clear()
    res_a, mid = pipe.run_sequence_stateful(iter(frames[:4]))
    assert int(np.asarray(mid.frame)) == 4
    res_b, _ = pipe.run_sequence_stateful(iter(frames[4:]),
                                          initial_slab=mid)
    assert detected == [0, 3, 6]  # same detect frames as uninterrupted
    assert [fid for fid, *_ in res_a + res_b] == list(range(1, 9))
