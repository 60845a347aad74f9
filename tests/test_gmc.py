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
