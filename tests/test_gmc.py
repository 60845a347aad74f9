"""GMC tests: device ECC recovers a known translation; host ORB runs on
textured frames; warp application matches the kron(I4, R) math."""

import numpy as np
import pytest

import jax.numpy as jnp


def synth_frame(rng, h=240, w=320):
    base = rng.integers(0, 255, (h // 8, w // 8, 3), np.uint8)
    import cv2

    return cv2.resize(base, (w, h), interpolation=cv2.INTER_NEAREST)


def test_ecc_recovers_translation():
    import cv2

    from yolov7_tracker_tpu.trackers.gmc import ecc_affine

    rng = np.random.default_rng(0)
    img = synth_frame(rng).astype(np.float32).mean(-1)
    m = np.float32([[1, 0, 4.0], [0, 1, -3.0]])
    shifted = cv2.warpAffine(img, m, (img.shape[1], img.shape[0]))
    params = np.asarray(
        ecc_affine(jnp.asarray(img), jnp.asarray(shifted), iters=60)
    )
    # params = [a11, a12, tx, a21, a22, ty]; translation signs follow the
    # ref->cur sampling convention
    assert np.isfinite(params).all()
    # the correlation objective should have moved tx/ty toward the truth
    assert abs(params[2] - 4.0) < 2.5
    assert abs(params[5] + 3.0) < 2.5


def test_orb_gmc_runs():
    from yolov7_tracker_tpu.trackers.gmc import GMC

    rng = np.random.default_rng(1)
    g = GMC(method="orb", downscale=1)
    f1 = synth_frame(rng)
    w1 = g.apply(f1)
    np.testing.assert_allclose(w1, [[1, 0, 0], [0, 1, 0]])  # first frame
    import cv2

    m = np.float32([[1, 0, 6.0], [0, 1, 2.0]])
    f2 = cv2.warpAffine(f1, m, (f1.shape[1], f1.shape[0]))
    w2 = g.apply(f2)
    assert np.isfinite(w2).all()


def test_apply_gmc_math():
    from yolov7_tracker_tpu.trackers import slab as S
    from yolov7_tracker_tpu.trackers.appearance import apply_gmc
    from yolov7_tracker_tpu.trackers.slab import TrackerConfig, init_slab

    cfg = TrackerConfig(capacity=4)
    slab = init_slab(cfg)
    slab = slab._replace(
        mean=jnp.arange(32, dtype=jnp.float32).reshape(4, 8),
        occupied=jnp.ones(4, bool),
    )
    warp = jnp.asarray([[2.0, 0.0, 5.0], [0.0, 2.0, -1.0]])
    out = apply_gmc(slab, warp, jnp.ones(4, bool))
    m = np.asarray(out.mean)
    base = np.arange(32, dtype=np.float32).reshape(4, 8)
    np.testing.assert_allclose(m[:, 0], base[:, 0] * 2 + 5)
    np.testing.assert_allclose(m[:, 1], base[:, 1] * 2 - 1)
    np.testing.assert_allclose(m[:, 2], base[:, 2] * 2)  # wh scaled, no t
    np.testing.assert_allclose(m[:, 4], base[:, 4] * 2)  # velocities scaled


# ---------------------------------------------------------------------------
# VERDICT r1 #8: device-ECC golden vs cv2.findTransformECC on
# rotation+scale+translation warps, and a GMC-ON BoT-SORT golden.
# ---------------------------------------------------------------------------


def _textured(rng, h=240, w=320):
    import cv2

    base = rng.integers(0, 255, (h // 8, w // 8, 3), np.uint8)
    img = cv2.resize(base, (w, h),
                     interpolation=cv2.INTER_NEAREST).astype(np.float32)
    img = img.mean(-1)
    return cv2.GaussianBlur(img, (5, 5), 1.5)


@pytest.mark.parametrize("deg,t", [(2.0, (4.0, -3.0)), (0.0, (7.0, 4.0)),
                                   (-1.5, (-5.0, 2.0))])
def test_ecc_golden_vs_cv2_euclidean(deg, t):
    """Rotation+translation: our device ECC must match
    cv2.findTransformECC(MOTION_EUCLIDEAN) to sub-pixel accuracy."""
    import cv2

    from yolov7_tracker_tpu.trackers.gmc import ecc_affine

    rng = np.random.default_rng(0)
    img = _textured(rng)
    M = cv2.getRotationMatrix2D((160, 120), deg, 1.0)
    M[:, 2] += t
    warped = cv2.warpAffine(img, M, (320, 240))
    warp0 = np.eye(2, 3, dtype=np.float32)
    crit = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 100, 1e-6)
    _, w_cv = cv2.findTransformECC(img, warped, warp0,
                                   cv2.MOTION_EUCLIDEAN, crit, None, 5)
    p = np.asarray(
        ecc_affine(jnp.asarray(img), jnp.asarray(warped), iters=60)
    ).reshape(2, 3)
    np.testing.assert_allclose(p[:, :2], w_cv[:, :2], atol=2e-3)
    np.testing.assert_allclose(p[:, 2], w_cv[:, 2], atol=0.3)


@pytest.mark.parametrize("deg,scale,t", [(1.0, 1.02, (-5.0, 2.0)),
                                         (3.0, 0.98, (2.0, 2.0))])
def test_ecc_recovers_scale_warps(deg, scale, t):
    """Rotation+SCALE+translation: cv2's euclidean model cannot express
    scale; our 4-parameter similarity warp recovers the ground truth."""
    import cv2

    from yolov7_tracker_tpu.trackers.gmc import ecc_affine

    rng = np.random.default_rng(0)
    img = _textured(rng)
    M = cv2.getRotationMatrix2D((160, 120), deg, scale)
    M[:, 2] += t
    warped = cv2.warpAffine(img, M, (320, 240))
    p = np.asarray(
        ecc_affine(jnp.asarray(img), jnp.asarray(warped), iters=60)
    ).reshape(2, 3)
    np.testing.assert_allclose(p[:, :2], M[:, :2], atol=2e-3)
    np.testing.assert_allclose(p[:, 2], M[:, 2], atol=0.3)


def _run_slab_warps(stream, warps, cfg):
    from yolov7_tracker_tpu.trackers import build_tracker, init_slab
    from yolov7_tracker_tpu.trackers import slab as S

    step, cfg = build_tracker(cfg)
    slab = init_slab(cfg)
    results = []
    for dets, warp in zip(stream, warps):
        det_slab = S.make_det_slab(
            cfg, dets[:, :4], dets[:, 4], dets[:, 5],
            np.ones(len(dets), bool), warp=warp,
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
    return results


def test_botsort_gmc_golden():
    """GMC-ON BoT-SORT: slab step with per-frame warps in the DetSlab
    matches the numpy oracle applying the reference's multi_gmc
    (botsort.py:379-382) with the same warps."""
    from tests import oracle_tracker2 as OT2
    from tests.test_trackers_golden import compare, synth_stream
    from yolov7_tracker_tpu.trackers import TrackerConfig

    stream = synth_stream(0, frames=40)
    rng = np.random.default_rng(7)
    warps = []
    for _ in stream:
        a = rng.uniform(-0.01, 0.01)          # small rotation
        t = rng.uniform(-3.0, 3.0, 2)         # small pan
        warps.append(np.asarray(
            [[np.cos(a), -np.sin(a), t[0]], [np.sin(a), np.cos(a), t[1]]],
            np.float32,
        ))

    cfg = TrackerConfig(tracker="botsort", conf_thresh=0.5, capacity=64,
                        det_capacity=32)
    got = _run_slab_warps(stream, warps, cfg)

    tr = OT2.OracleBoTSORT(conf_thresh=0.5, kalman_format="botsort")
    want = []
    for dets, warp in zip(stream, warps):
        tr.warp = warp
        out = tr.update(dets)
        frame = {}
        for t_ in out:
            tlwh = t_.tlwh
            if tlwh[2] * tlwh[3] > 150.0:
                frame[int(t_.track_id)] = (tlwh, float(t_.score))
        want.append(frame)
    compare(got, want)


def test_botsort_gmc_survives_camera_pan():
    """Static world objects under a hard 40px/frame camera pan: with the
    correct compensating warps, identities persist; with identity warps
    the 30px boxes lose all overlap and the id set churns."""
    from yolov7_tracker_tpu.trackers import TrackerConfig

    rng = np.random.default_rng(1)
    world = rng.uniform(100, 400, (5, 2))
    wh = np.full((5, 2), 30.0)
    pan = np.array([40.0, 10.0])
    frames = 12
    stream = []
    for f in range(frames):
        off = pan * f
        c = world + off
        stream.append(np.concatenate(
            [c - wh / 2, c + wh / 2,
             np.full((5, 1), 0.9), np.zeros((5, 1))], axis=1,
        ))
    warp_gmc = np.asarray([[1, 0, pan[0]], [0, 1, pan[1]]], np.float32)
    cfg = TrackerConfig(tracker="botsort", conf_thresh=0.5, capacity=64,
                        det_capacity=32)

    with_gmc = _run_slab_warps(
        stream, [warp_gmc] * frames, cfg)
    without = _run_slab_warps(
        stream, [np.asarray([[1, 0, 0], [0, 1, 0]], np.float32)] * frames,
        cfg)

    ids_start = set(with_gmc[1])
    assert len(ids_start) == 5
    for f in range(2, frames):
        assert set(with_gmc[f]) == ids_start, f"GMC lost ids at frame {f}"
    # without compensation every association fails: after the first
    # frame the tracker never confirms another track (fresh unconfirmed
    # tracks are not output), so tracking collapses entirely
    assert all(len(without[f]) == 0 for f in range(1, frames)), (
        "pan should break no-GMC tracking"
    )
