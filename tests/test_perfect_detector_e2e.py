"""Oracle-detector integration test: with GT boxes fed as detections,
the slab trackers must produce near-perfect MOT metrics through the full
eval stack (slab -> scan -> txt rows -> HOTA/CLEAR/Identity). This
validates tracking quality end-to-end without a trained detector."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _synthetic_gt(seed=0, T=60, n_obj=6, H=600, W=800):
    """Smooth crossing trajectories; returns per-frame [id, tlwh]."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(80, 400, (n_obj, 2))
    vel = rng.uniform(-4, 4, (n_obj, 2))
    wh = rng.uniform(30, 60, (n_obj, 2))
    frames = []
    for t in range(T):
        rows = []
        for i in range(n_obj):
            x, y = pos[i] + vel[i] * t
            x = float(np.clip(x, 0, W - wh[i, 0]))
            y = float(np.clip(y, 0, H - wh[i, 1]))
            rows.append((i + 1, np.array([x, y, wh[i, 0], wh[i, 1]])))
        frames.append(rows)
    return frames


@pytest.mark.parametrize(
    "tracker",
    ["bytetrack", "sort", "botsort", "c_bioutracker", "uavmot", "deepsort",
     "strongsort",
     # deepmot's DHN compile is the slowest gate; its reference-code
     # golden (test_reference_deepmot_golden) covers it in the slow lane
     pytest.param("deepmot", marks=pytest.mark.slow)],
)
def test_perfect_detections_near_perfect_mot(tracker, tmp_path):
    import os

    from yolov7_tracker_tpu.eval import evaluator
    from yolov7_tracker_tpu.trackers import slab as S
    from yolov7_tracker_tpu.trackers.registry import build_tracker

    frames = _synthetic_gt()
    kfmt = {"botsort": "botsort", "strongsort": "strongsort",
            "c_bioutracker": "none"}.get(tracker, "default")
    extra = {}
    if tracker == "deepmot":
        # run the REAL DHN path with the committed trained weights
        # (tracker/deepmot.py:221-233); trained by train/dhn_train.py
        extra = {"dhn_weights": os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "weights", "dhn_h32.msgpack"), "dhn_hidden": 32}
    cfg = S.TrackerConfig(tracker=tracker, kalman_format=kfmt,
                          capacity=32, det_capacity=16,
                          conf_thresh=0.6, **extra)
    step, cfg = build_tracker(cfg)
    slab = S.init_slab(cfg)
    step = jax.jit(step)

    results = []
    d = cfg.det_capacity
    for t, rows in enumerate(frames):
        tlbr = np.zeros((d, 4), np.float32)
        score = np.zeros(d, np.float32)
        cls = np.zeros(d, np.float32)
        valid = np.zeros(d, bool)
        for k, (_, tlwh) in enumerate(rows):
            tlbr[k] = [tlwh[0], tlwh[1],
                       tlwh[0] + tlwh[2], tlwh[1] + tlwh[3]]
            score[k] = 0.95
            valid[k] = True
        # appearance trackers get a perfect id-keyed one-hot embedding
        fd = max(cfg.feature_dim, 1)
        feats = np.zeros((d, fd), np.float32)
        if cfg.feature_dim > 0:
            for k, (gid, _) in enumerate(rows):
                feats[k, gid % fd] = 1.0
        feats = feats[:, :cfg.feature_dim] if cfg.feature_dim else \
            np.zeros((d, 0), np.float32)
        det = S.DetSlab(
            tlbr=jnp.asarray(tlbr), score=jnp.asarray(score),
            cls=jnp.asarray(cls), valid=jnp.asarray(valid),
            feature=jnp.asarray(feats),
        )
        slab, out = step(slab, det)
        v = np.asarray(out.valid)
        results.append((t + 1, np.asarray(out.track_id)[v],
                        np.asarray(out.tlwh)[v]))

    # write tracker txt + gt txt, then score
    res_dir = tmp_path / "res"
    res_dir.mkdir()
    gt_dir = tmp_path / "gt" / "SYN" / "gt"
    gt_dir.mkdir(parents=True)
    with open(res_dir / "SYN.txt", "w") as f:
        for fid, ids, tlwhs in results:
            for tid, tl in zip(ids, tlwhs):
                f.write(f"{fid},{tid},{tl[0]:.2f},{tl[1]:.2f},"
                        f"{tl[2]:.2f},{tl[3]:.2f},1.0,-1,-1,-1\n")
    with open(gt_dir / "gt.txt", "w") as f:
        for t, rows in enumerate(frames):
            for gid, tl in rows:
                f.write(f"{t + 1},{gid},{tl[0]:.2f},{tl[1]:.2f},"
                        f"{tl[2]:.2f},{tl[3]:.2f},1,1,1.0\n")

    table = evaluator.evaluate_benchmark(
        str(tmp_path / "gt"), str(res_dir), {"SYN": len(frames)},
        benchmark="MOT17", classes=["pedestrian"],
    )
    summ = evaluator.summarize(table["pedestrian"]["SYN"])
    assert summ["MOTA"] > 0.95, (tracker, summ)
    assert summ["IDF1"] > 0.95, (tracker, summ)
    assert summ["IDSW"] <= 1, (tracker, summ)
    assert summ["HOTA"] > 0.85, (tracker, summ)
