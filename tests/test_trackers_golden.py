"""Golden tests: slab trackers vs the numpy object-list oracle.

Synthetic detection streams (moving boxes + dropouts + clutter) run
through both implementations frame by frame; emitted (id, box, score)
sets must agree.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from yolov7_tracker_tpu.trackers import TrackerConfig, init_slab, build_tracker
from yolov7_tracker_tpu.trackers import slab as S
from tests import oracle_tracker as OT


def synth_stream(seed, frames=60, n_obj=8, img=(800, 800), drop_p=0.15,
                 clutter_p=0.3):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(100, 600, (n_obj, 2))
    vel = rng.uniform(-4, 4, (n_obj, 2))
    size = rng.uniform(30, 80, (n_obj, 2))
    born = rng.integers(0, frames // 2, n_obj)
    died = born + rng.integers(frames // 3, frames, n_obj)
    out = []
    for f in range(frames):
        dets = []
        for i in range(n_obj):
            if not (born[i] <= f < died[i]):
                continue
            if rng.uniform() < drop_p:
                continue
            c = pos[i] + vel[i] * f + rng.normal(0, 1.0, 2)
            wh = size[i] * (1 + rng.normal(0, 0.02, 2))
            score = np.clip(0.75 + rng.normal(0, 0.1), 0.05, 0.99)
            dets.append([c[0] - wh[0] / 2, c[1] - wh[1] / 2,
                         c[0] + wh[0] / 2, c[1] + wh[1] / 2, score, 0.0])
        # low-conf clutter
        if rng.uniform() < clutter_p:
            c = rng.uniform(100, 700, 2)
            wh = rng.uniform(20, 60, 2)
            dets.append([c[0], c[1], c[0] + wh[0], c[1] + wh[1],
                         rng.uniform(0.2, 0.45), 0.0])
        out.append(np.asarray(dets, np.float64).reshape(-1, 6))
    return out


def run_slab_tracker(stream, cfg):
    step, cfg = build_tracker(cfg)
    slab = init_slab(cfg)
    results = []
    for dets in stream:
        det_slab = S.make_det_slab(
            cfg,
            dets[:, :4],
            dets[:, 4],
            dets[:, 5],
            np.ones(len(dets), bool),
        )
        slab, out = step(slab, det_slab)
        ids = np.asarray(out.track_id)
        valid = np.asarray(out.valid)
        tlwh = np.asarray(out.tlwh)
        score = np.asarray(out.score)
        frame = {
            int(ids[i]): (tlwh[i], float(score[i]))
            for i in range(len(ids))
            if valid[i]
        }
        results.append(frame)
    return results


def run_oracle(stream, tracker_cls, min_area=150.0, **kw):
    tr = tracker_cls(**kw)
    results = []
    for dets in stream:
        out = tr.update(dets.copy())
        frame = {}
        for t in out:
            tlwh = t.tlwh
            if tlwh[2] * tlwh[3] > min_area:
                frame[int(t.track_id)] = (tlwh, float(t.score))
        results.append(frame)
    return results


def compare(got, want, box_atol=0.75):
    for f, (g, w) in enumerate(zip(got, want)):
        assert set(g) == set(w), (
            f"frame {f}: ids differ: got {sorted(g)} want {sorted(w)}"
        )
        for tid in w:
            np.testing.assert_allclose(
                g[tid][0], w[tid][0], atol=box_atol,
                err_msg=f"frame {f} id {tid} box",
            )
            assert abs(g[tid][1] - w[tid][1]) < 1e-3


CASES = [
    ("sort", "default", OT.OracleSORT, {}),
    ("sort", "naive", OT.OracleSORT, {}),
    ("sort", "botsort", OT.OracleSORT, {}),
    ("bytetrack", "default", OT.OracleByteTrack, {}),
    # slow: the reference-code golden covers 3 seeds and the
    # perfect-detector gate keeps fast e2e coverage
    pytest.param("c_bioutracker", "none", OT.OracleCBIoU, {},
                 marks=pytest.mark.slow),
]


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize(
    "name,fmt,oracle_cls,kw", CASES,
    ids=[
        (c.values[0] + "-" + c.values[1]) if hasattr(c, "values")
        else (c[0] + "-" + c[1])
        for c in CASES
    ])
def test_tracker_matches_oracle(name, fmt, oracle_cls, kw, seed):
    stream = synth_stream(seed)
    cfg = TrackerConfig(
        tracker=name, kalman_format=fmt, conf_thresh=0.5,
        capacity=64, det_capacity=32,
    )
    got = run_slab_tracker(stream, cfg)
    okw = dict(conf_thresh=0.5)
    if fmt not in ("none",):
        okw["kalman_format"] = fmt
    okw.update(kw)
    want = run_oracle(stream, oracle_cls, **okw)
    compare(got, want)


def test_track_ids_sequential():
    stream = synth_stream(3, frames=30)
    cfg = TrackerConfig(tracker="sort", conf_thresh=0.5, capacity=64,
                        det_capacity=32)
    got = run_slab_tracker(stream, cfg)
    all_ids = sorted({tid for f in got for tid in f})
    assert all_ids[0] >= 1
    # ids are assigned from a sequential counter
    assert all_ids == list(range(all_ids[0], all_ids[0] + len(all_ids)))


@pytest.mark.slow  # scan-vs-loop equivalence compile; per-step goldens cover semantics fast
def test_scan_equivalence():
    """Running the tracker under lax.scan gives identical output to the
    per-frame python loop (whole-sequence on-device path)."""
    import jax

    stream = synth_stream(5, frames=25)
    cfg = TrackerConfig(tracker="bytetrack", conf_thresh=0.5, capacity=64,
                        det_capacity=32)
    step, cfg2 = build_tracker(cfg)
    # stack padded det slabs
    det_slabs = [
        S.make_det_slab(cfg2, d[:, :4], d[:, 4], d[:, 5],
                        np.ones(len(d), bool))
        for d in stream
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *det_slabs)
    slab0 = init_slab(cfg2)

    def body(slab, det):
        slab, out = step(slab, det)
        return slab, out

    _, outs = jax.lax.scan(body, slab0, stacked)
    loop = run_slab_tracker(stream, cfg)
    for f in range(len(stream)):
        valid = np.asarray(outs.valid[f])
        ids = set(np.asarray(outs.track_id[f])[valid].tolist())
        assert ids == set(loop[f].keys()), f"frame {f}"
