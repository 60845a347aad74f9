"""On-device ReID feature extraction.

The reference crops each detection on the host with python slicing and
cv2.resize (deepsort.py:19-40, strongsort.py:47-72), then batches
through the CNN. Here crop + resize + normalize is one fused bilinear
gather on device over the padded det slab — no host round trip.

Preprocessing parity:
- DeepSORT CNN: crop -> /255 -> resize to 128h x 64w (cv2 INTER_LINEAR)
  -> ImageNet normalize (deepsort_reid.py:123-146). The reference feeds
  BGR frames to RGB normalization constants; we keep the frame as given.
- OSNet (StrongSORT): /255 -> cv2.resize(dsize=(256, 128)) which is
  128h x 256w (reference quirk, strongsort.py:56-58) -> ImageNet
  normalize.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# numpy on purpose: this module is imported lazily from inside traced
# code (pipeline._embed_dets under a scanned multistream step), and a
# module-level jnp constant created while a trace is live becomes a
# tracer that escapes into the module globals (UnexpectedTracerError on
# the next trace). numpy constants are trace-inert.
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _bilinear_crop(img: jnp.ndarray, tlbr: jnp.ndarray,
                   out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Sample one crop (out_h, out_w, 3) from img (H, W, 3).

    Matches int-truncated python-slice cropping + cv2.INTER_LINEAR resize
    (half-pixel centers) closely enough for feature parity.
    """
    h, w = out_hw
    x1 = jnp.floor(tlbr[0])
    y1 = jnp.floor(tlbr[1])
    x2 = jnp.floor(tlbr[2])
    y2 = jnp.floor(tlbr[3])
    cw = jnp.maximum(x2 - x1, 1.0)
    ch = jnp.maximum(y2 - y1, 1.0)
    # half-pixel-center sample positions in source space
    ys = y1 + (jnp.arange(h, dtype=jnp.float32) + 0.5) * ch / h - 0.5
    xs = x1 + (jnp.arange(w, dtype=jnp.float32) + 0.5) * cw / w - 0.5
    ys = jnp.clip(ys, 0.0, img.shape[0] - 1.0)
    xs = jnp.clip(xs, 0.0, img.shape[1] - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, img.shape[0] - 1)
    x1i = jnp.minimum(x0 + 1, img.shape[1] - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    f = img.astype(jnp.float32)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1i] * wx
    bot = f[y1i][:, x0] * (1 - wx) + f[y1i][:, x1i] * wx
    return top * (1 - wy) + bot * wy


def _sample_coords(tlbr: jnp.ndarray, out_hw: Tuple[int, int],
                   src_hw: Tuple[int, int]):
    """Half-pixel-center sample positions for (D, 4) boxes: the same
    math as _bilinear_crop, batched -> ys (D, out_h), xs (D, out_w)."""
    h, w = out_hw
    x1 = jnp.floor(tlbr[:, 0:1])
    y1 = jnp.floor(tlbr[:, 1:2])
    x2 = jnp.floor(tlbr[:, 2:3])
    y2 = jnp.floor(tlbr[:, 3:4])
    cw = jnp.maximum(x2 - x1, 1.0)
    ch = jnp.maximum(y2 - y1, 1.0)
    ys = y1 + (jnp.arange(h, dtype=jnp.float32)[None] + 0.5) * ch / h - 0.5
    xs = x1 + (jnp.arange(w, dtype=jnp.float32)[None] + 0.5) * cw / w - 0.5
    ys = jnp.clip(ys, 0.0, src_hw[0] - 1.0)
    xs = jnp.clip(xs, 0.0, src_hw[1] - 1.0)
    return ys, xs


def _tap_weights(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """(D, out) clipped positions -> (D, out, size) 2-tap triangle rows:
    row i holds max(0, 1 - |coords_i - j|), i.e. the bilinear lerp of
    _bilinear_crop written as a banded matrix (weight 1-frac at floor,
    frac at floor+1; a single 1 at clipped/integer positions)."""
    j = jnp.arange(size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - j))


@functools.partial(jax.jit, static_argnames=("out_hw",))
def extract_crops(frame: jnp.ndarray, tlbr: jnp.ndarray,
                  out_hw: Tuple[int, int]):
    """frame (H, W, 3) uint8 + det boxes (D, 4) -> normalized crops
    (D, out_h, out_w, 3).

    Crop+resize runs as two banded matmuls per crop (einsum over the
    2-tap triangle weight rows), not as a gather: the gather form
    materialized a (D, out_h, W, 3) row-gather intermediate and ran at
    ~0.5% MFU (22 ms/frame for 300 crops at 1080p, tracker_fleet_bench
    r5); the dense form rides the MXU. The W axis contracts first so
    the intermediate is (D, H, out_w, 3) — the smaller of the two
    orders. Sample positions and weights are exactly _bilinear_crop's
    (pinned by tests/test_reid_crops.py); on TPU the contraction runs
    in bf16 (error <=1 LSB of the uint8 source, far inside ReID
    feature tolerance), elsewhere f32.
    """
    H, W = frame.shape[0], frame.shape[1]
    ys, xs = _sample_coords(tlbr, out_hw, (H, W))
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    wy = _tap_weights(ys, H).astype(dt)          # (D, h, H)
    wx = _tap_weights(xs, W).astype(dt)          # (D, w, W)
    f = frame.astype(dt)
    t = jnp.einsum("dwW,HWc->dHwc", wx, f,
                   preferred_element_type=jnp.float32)
    crops = jnp.einsum("dhH,dHwc->dhwc", wy, t.astype(dt),
                       preferred_element_type=jnp.float32)
    crops = crops / 255.0
    return (crops - IMAGENET_MEAN) / IMAGENET_STD


def make_reid_fn(model, variables, out_hw: Tuple[int, int]):
    """Return jitted (frame, det_tlbr) -> (D, F) features."""

    @jax.jit
    def run(frame, tlbr):
        crops = extract_crops(frame, tlbr, out_hw)
        return model.apply(variables, crops)

    return run
