"""extract_crops' banded-matmul crop+resize is pinned to the original
gather formulation (_bilinear_crop): same half-pixel sample positions,
same clamp semantics, same output — the matmul exists purely so the
crops ride the MXU instead of gathers (reid/extractor.py docstring)."""

import numpy as np

import jax
import jax.numpy as jnp

from yolov7_tracker_tpu.reid import extractor


def _gather_reference(frame, tlbr, out_hw):
    crops = jax.vmap(
        lambda b: extractor._bilinear_crop(frame, b, out_hw))(tlbr)
    crops = crops / 255.0
    return (crops - extractor.IMAGENET_MEAN) / extractor.IMAGENET_STD


def test_matmul_crops_match_gather_reference():
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (90, 160, 3), np.uint8))
    # mixed geometry: interior, off-edge (clamped), sub-pixel, tiny,
    # degenerate (x2 <= x1 -> 1px wide), and the padded-slab zero box
    tlbr = jnp.asarray(np.array([
        [10.3, 20.7, 50.9, 80.2],
        [-5.0, -8.0, 30.0, 40.0],
        [100.0, 40.0, 170.0, 95.0],
        [12.0, 12.0, 13.0, 13.0],
        [30.0, 30.0, 30.0, 30.0],
        [0.0, 0.0, 0.0, 0.0],
    ], np.float32))
    for out_hw in [(128, 64), (128, 256), (8, 8)]:
        got = np.asarray(extractor.extract_crops(frame, tlbr, out_hw))
        want = np.asarray(_gather_reference(frame, tlbr, out_hw))
        assert got.shape == want.shape == (6, *out_hw, 3)
        np.testing.assert_allclose(got, want, atol=5e-3, rtol=0)


def test_tap_weights_rows_sum_to_one_inside():
    ys = jnp.asarray(np.linspace(0.0, 9.0, 13, dtype=np.float32))[None]
    w = np.asarray(extractor._tap_weights(ys, 10))[0]
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-6)
    assert (np.count_nonzero(w, axis=-1) <= 2).all()
