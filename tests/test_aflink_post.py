"""AFLink offline linking plumbing: fragment merge behavior under
forced thresholds (net weights are random; protocol/merge logic is what
is tested)."""

import numpy as np

import jax
import jax.numpy as jnp


def _params():
    from yolov7_tracker_tpu.reid.aflink import PostLinker

    m = PostLinker()
    x = jnp.zeros((1, 30, 3))
    return m.init(jax.random.PRNGKey(0), x, x)


def _fragmented_rows():
    """One trajectory split into id 1 (frames 1-20) and id 5 (frames
    26-45), plus an unrelated far-away id 9."""
    rows = []
    for f in range(1, 21):
        rows.append([f, 1, 100 + 2 * f, 50 + f, 20, 40])
    for f in range(26, 46):
        rows.append([f, 5, 100 + 2 * f, 50 + f, 20, 40])
    for f in range(1, 46):
        rows.append([f, 9, 900, 700, 20, 40])
    return np.asarray(rows, float)


def test_link_tracks_merges_and_gates():
    from yolov7_tracker_tpu.trackers.aflink_post import link_tracks

    params = _params()
    rows = _fragmented_rows()

    # thr=0: every gated candidate links -> 5 merges into 1
    out = link_tracks(rows, params, thr=0.0)
    assert set(np.unique(out[:, 1]).astype(int)) == {1, 9}
    assert (out[rows[:, 1] == 5, 1] == 1).all()

    # thr > 1: nothing links
    out = link_tracks(rows, params, thr=1.1)
    assert set(np.unique(out[:, 1]).astype(int)) == {1, 5, 9}

    # spatial gate: distant fragment never a candidate even at thr=0
    far = rows.copy()
    far[far[:, 1] == 5, 2] += 5000
    out = link_tracks(far, params, thr=0.0)
    assert set(np.unique(out[:, 1]).astype(int)) == {1, 5, 9}


def test_gsi_interpolation_fills_and_smooths():
    from yolov7_tracker_tpu.trackers.aflink_post import gsi_interpolation

    rng = np.random.default_rng(0)
    rows = []
    for f in range(1, 31):
        if f in (10, 11, 12):   # a 3-frame hole
            continue
        rows.append([f, 1, 100 + 3 * f + rng.normal(0, 4), 50 + f,
                     20, 40])
    rows = np.asarray(rows, float)
    out = gsi_interpolation(rows, interval=20, tau=5.0)
    # hole filled
    assert set(out[:, 0].astype(int)) == set(range(1, 31))
    # smoothing reduces jitter vs the ideal line x = 100 + 3f
    f = out[:, 0]
    resid_out = np.abs(out[:, 2] - (100 + 3 * f)).mean()
    resid_in = np.abs(rows[:, 2] - (100 + 3 * rows[:, 0])).mean()
    assert resid_out < resid_in
