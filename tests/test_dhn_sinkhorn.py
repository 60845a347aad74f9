"""SinkhornDHN — the parallel Deep Hungarian Net (reid/dhn.py).

The reference's Munkrs is a flattened Bi-GRU whose TPU cost is
sequential in H*W (tracker/deepmot.py:10-140); SinkhornDHN reaches the
same soft-assignment targets with matrix-parallel ops only. These tests
pin (1) the arch registry, (2) trained-weight quality against exact
Hungarian labels — including that it does not trail the shipped GRU —
and (3) the DeepMOT tracker running on it end-to-end.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

SKH = "weights/dhn_sinkhorn.msgpack"
GRU = "weights/dhn_h32.msgpack"


def test_build_dhn_archs():
    from yolov7_tracker_tpu.reid.dhn import DHN, SinkhornDHN, build_dhn

    assert isinstance(build_dhn("gru", 32), DHN)
    assert isinstance(build_dhn("sinkhorn"), SinkhornDHN)
    with pytest.raises(ValueError, match="unknown dhn arch"):
        build_dhn("nope")

    m = build_dhn("sinkhorn")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((4, 6)))
    d = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (4, 6)), jnp.float32)
    out = m.apply(v, d)
    assert out.shape == (4, 6)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # size-agnostic: the same variables serve any matrix geometry
    assert m.apply(v, jnp.ones((9, 3)) * 0.5).shape == (9, 3)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isfile(SKH),
                    reason="trained sinkhorn DHN weights not present")
def test_sinkhorn_trained_quality():
    """Held-out synthetic Hungarian problems at the serving padding
    geometry: high cell accuracy, and positives recovered above the
    deepmot serving threshold (score > 0.1 <=> cost < 0.9)."""
    from yolov7_tracker_tpu.train.dhn_train import eval_dhn
    from yolov7_tracker_tpu.utils.checkpoint import load_variables

    m = eval_dhn(load_variables(SKH), arch="sinkhorn",
                 h=64, w=64, pad_to=(64, 64), n=32, seed=7)
    assert m["cell_acc"] >= 0.98, m
    assert m["match_recall"] >= 0.9, m


@pytest.mark.slow
@pytest.mark.skipif(not (os.path.isfile(SKH) and os.path.isfile(GRU)),
                    reason="both trained DHNs needed")
def test_sinkhorn_not_worse_than_gru():
    """The parallel head must not trade accuracy for speed: on the same
    held-out problems (at the GRU's 16x16 training size) its Hungarian
    match recall is within 2 points of the shipped GRU's."""
    from yolov7_tracker_tpu.train.dhn_train import eval_dhn
    from yolov7_tracker_tpu.utils.checkpoint import load_variables

    kw = dict(h=16, w=16, n=32, seed=11)
    skh = eval_dhn(load_variables(SKH), arch="sinkhorn", **kw)
    gru = eval_dhn(load_variables(GRU), arch="gru", hidden=32, **kw)
    assert skh["match_recall"] >= gru["match_recall"] - 0.02, (skh, gru)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isfile(SKH),
                    reason="trained sinkhorn DHN weights not present")
def test_deepmot_tracks_with_sinkhorn():
    """DeepMOT + SinkhornDHN keeps identities on clean constant-velocity
    objects (the same smoke contract as test_deepmot_runs, plus id
    stability — the DHN sits in the stage-1 match path, so a broken one
    fragments every track)."""
    from yolov7_tracker_tpu.trackers import (TrackerConfig, build_tracker,
                                             init_slab)
    from yolov7_tracker_tpu.trackers import slab as S

    cfg = TrackerConfig(tracker="deepmot", conf_thresh=0.5, capacity=32,
                        det_capacity=16, dhn_weights=SKH,
                        dhn_arch="sinkhorn", min_area=0.0)
    step, cfg = build_tracker(cfg)
    slab = init_slab(cfg)
    rng = np.random.default_rng(3)
    pos = rng.uniform(150, 500, (5, 2))
    vel = rng.uniform(-3, 3, (5, 2))
    ids_per_obj = [set() for _ in range(5)]
    for f in range(20):
        c = pos + vel * f
        tlbr = np.concatenate([c - 25.0, c + 25.0], axis=1)
        det = S.make_det_slab(cfg, tlbr, np.full(5, 0.9), np.zeros(5),
                              np.ones(5, bool))
        slab, out = step(slab, det)
        valid = np.asarray(out.valid)
        tlwh = np.asarray(out.tlwh)
        tid = np.asarray(out.track_id)
        for i in range(5):
            for j in np.nonzero(valid)[0]:
                bc = tlwh[j, :2] + tlwh[j, 2:] / 2
                if np.linalg.norm(bc - c[i]) < 10.0:
                    ids_per_obj[i].add(int(tid[j]))
    # every object tracked, with one stable id
    for s in ids_per_obj:
        assert len(s) == 1, ids_per_obj
