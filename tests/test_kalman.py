import numpy as np
import pytest

import jax.numpy as jnp

from yolov7_tracker_tpu.ops import kalman
from tests import oracles

FMTS = ["default", "naive", "botsort", "strongsort"]


def rand_meas(fmt, n, rng):
    if fmt == "naive":
        # (xc, yc, area, r)
        wh = rng.uniform(10, 100, (n, 2))
        return np.stack(
            [
                rng.uniform(0, 800, n),
                rng.uniform(0, 800, n),
                wh[:, 0] * wh[:, 1],
                wh[:, 1] / wh[:, 0],
            ],
            axis=1,
        ).astype(np.float32)
    if fmt == "botsort":
        return np.stack(
            [
                rng.uniform(0, 800, n),
                rng.uniform(0, 800, n),
                rng.uniform(10, 100, n),
                rng.uniform(10, 100, n),
            ],
            axis=1,
        ).astype(np.float32)
    return np.stack(
        [
            rng.uniform(0, 800, n),
            rng.uniform(0, 800, n),
            rng.uniform(0.3, 3.0, n),
            rng.uniform(10, 100, n),
        ],
        axis=1,
    ).astype(np.float32)


def crop(fmt, mean, cov):
    d = oracles.kf_dims(fmt)
    return np.asarray(mean)[..., :d], np.asarray(cov)[..., :d, :d]


@pytest.mark.parametrize("fmt", FMTS)
def test_initiate_predict_update_vs_oracle(fmt):
    rng = np.random.default_rng(7)
    n = 16
    meas = rand_meas(fmt, n, rng)
    mean, cov = kalman.initiate(fmt, jnp.asarray(meas))
    for i in range(n):
        om, oc = oracles.kf_initiate(fmt, meas[i].astype(np.float64))
        gm, gc = crop(fmt, mean[i], cov[i])
        np.testing.assert_allclose(gm, om, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(gc, oc, rtol=1e-4, atol=1e-6)

    pmean, pcov = kalman.predict(fmt, mean, cov)
    for i in range(n):
        om, oc = oracles.kf_initiate(fmt, meas[i].astype(np.float64))
        om, oc = oracles.kf_predict(fmt, om, oc)
        gm, gc = crop(fmt, pmean[i], pcov[i])
        np.testing.assert_allclose(gm, om, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(gc, oc, rtol=1e-3, atol=1e-4)

    new_meas = rand_meas(fmt, n, rng)
    conf = rng.uniform(0.3, 0.9, n).astype(np.float32)
    kwargs = {"confidence": jnp.asarray(conf)} if fmt == "strongsort" else {}
    umean, ucov = kalman.update(fmt, pmean, pcov, jnp.asarray(new_meas), **kwargs)
    for i in range(n):
        om, oc = oracles.kf_initiate(fmt, meas[i].astype(np.float64))
        om, oc = oracles.kf_predict(fmt, om, oc)
        oconf = conf[i] if fmt == "strongsort" else None
        om, oc = oracles.kf_update(fmt, om, oc, new_meas[i].astype(np.float64), oconf)
        gm, gc = crop(fmt, umean[i], ucov[i])
        np.testing.assert_allclose(gm, om, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(gc, oc, rtol=1e-2, atol=1e-3)


@pytest.mark.parametrize("fmt", ["default", "botsort"])
@pytest.mark.parametrize("only_pos", [False, True])
def test_gating_distance_vs_oracle(fmt, only_pos):
    rng = np.random.default_rng(11)
    t, d = 8, 12
    meas = rand_meas(fmt, t, rng)
    mean, cov = kalman.initiate(fmt, jnp.asarray(meas))
    mean, cov = kalman.predict(fmt, mean, cov)
    dets = rand_meas(fmt, d, rng)
    got = np.asarray(
        kalman.gating_distance(fmt, mean, cov, jnp.asarray(dets), only_pos)
    )
    assert got.shape == (t, d)
    for i in range(t):
        om, oc = crop(fmt, mean[i], cov[i])
        want = oracles.kf_gating(fmt, om.astype(np.float64), oc.astype(np.float64),
                                 dets.astype(np.float64), only_pos)
        np.testing.assert_allclose(got[i], want, rtol=1e-3, atol=1e-3)


def test_zero_stale_velocity():
    mean = jnp.ones((4, 8))
    tracked = jnp.array([True, False, True, False])
    out8 = kalman.zero_stale_velocity("default", mean, tracked)
    np.testing.assert_allclose(np.asarray(out8)[:, 7], [1, 0, 1, 0])
    out7 = kalman.zero_stale_velocity("naive", mean, tracked)
    np.testing.assert_allclose(np.asarray(out7)[:, 6], [1, 0, 1, 0])
    np.testing.assert_allclose(np.asarray(out7)[:, 7], [1, 1, 1, 1])
