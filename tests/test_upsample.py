"""upsample_nearest (nn.Upsample in the reference cfgs, consumed by
parse_model, models/yolo.py) is implemented as broadcast+reshape rather
than jax.image.resize: for integer factors the two are element-identical
but the broadcast lowers without the per-pixel gather loops the resize
path emits on TPU (1.7 ms/iter of pure gather at the w6@1088 b64 trace).
This pins the element-level identity."""

import numpy as np

import jax
import jax.numpy as jnp

from yolov7_tracker_tpu.models import blocks


def test_upsample_nearest_matches_image_resize():
    rng = np.random.default_rng(0)
    for shape, f in [((2, 7, 5, 3), 2), ((1, 4, 6, 8), 4),
                     ((3, 1, 1, 2), 2)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        b, h, w, c = shape
        got = blocks.upsample_nearest(x, f)
        want = jax.image.resize(x, (b, h * f, w * f, c), "nearest")
        assert got.shape == want.shape
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_upsample_nearest_bf16_passthrough():
    x = jnp.arange(24, dtype=jnp.bfloat16).reshape(1, 2, 3, 4)
    y = blocks.upsample_nearest(x, 2)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(y[0, :, :, 0], np.float32),
        np.asarray(jnp.repeat(jnp.repeat(x[0, :, :, 0], 2, 0), 2, 1),
                   np.float32))
