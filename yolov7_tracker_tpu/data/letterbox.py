"""Letterbox preprocessing: host reference + fused device path.

The reference letterboxes each frame on the host with cv2 (stride-aware
minimum-rectangle pad, color 114, tracker/tracker_dataloader.py:100-130)
and then converts BGR->RGB, CHW, float/255 (:77-85). Here:

- ``letterbox_params`` / ``letterbox_host`` reproduce that math exactly
  (used by the CPU loader and for parity tests);
- ``device_preprocess`` runs resize+pad+BGR->RGB+normalize as one fused
  XLA computation on a batch of raw uint8 frames, so only the compact
  uint8 image crosses host->device and everything else stays on chip;
- ``scale_coords_device`` inverts the letterbox on detector boxes
  (utils/general.py:319-340 incl. the .round() in post_process_v7,
  tracker/track.py:238-243).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

PAD_VALUE = 114.0


def _resize_linear(x: jnp.ndarray, uh: int, uw: int) -> jnp.ndarray:
    """Bilinear (B, H, W, C) -> (B, uh, uw, C).

    Kept as jax.image.resize's dense banded-matmul lowering ON PURPOSE:
    its matrices are 2-tap banded (~64x algorithmic FLOP waste) but run
    at ~166 TFLOP/s on the MXU, and every lower-FLOP reformulation
    measured SLOWER on a v5e at the serving geometry — blocked
    einsum 5.5 ms/iter, transpose-sandwich 5.0, 2-tap gather 6.3,
    grouped-conv 6.7, vs dense 3.9 (tools/tpu_resize_probe.py). The
    C=3-minor tensor gives reductions/gathers no lane parallelism;
    only the MXU formulation has full tiles.

    (A scale_and_translate variant that landed the resize directly in
    the padded canvas was probed and reverted — its fused 114-band add
    ran at 127 GB/s, slower end-to-end; see device_preprocess below.)
    """
    return jax.image.resize(
        x, (x.shape[0], uh, uw, x.shape[3]), method="linear",
        antialias=False,
    )


def letterbox_params(shape_hw: Tuple[int, int], new_shape: Tuple[int, int],
                     stride: int = 32, auto: bool = True,
                     scaleup: bool = True):
    """Compute (ratio, unpadded (w, h), (dw, dh)) exactly like the
    reference _letterbox (tracker_dataloader.py:100-124)."""
    h, w = shape_hw
    r = min(new_shape[0] / h, new_shape[1] / w)
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = (int(round(w * r)), int(round(h * r)))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    dw /= 2
    dh /= 2
    return r, new_unpad, (dw, dh)


def letterbox_host(img: np.ndarray, new_shape=(640, 640), stride: int = 32,
                   auto: bool = True, scaleup: bool = True):
    """Host letterbox (cv2), byte-compatible with the reference."""
    import cv2

    r, new_unpad, (dw, dh) = letterbox_params(
        img.shape[:2], new_shape, stride, auto, scaleup
    )
    if img.shape[1::-1] != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(
        img, top, bottom, left, right, cv2.BORDER_CONSTANT,
        value=(PAD_VALUE,) * 3,
    )
    return img, (r, r), (dw, dh)


@functools.partial(
    jax.jit,
    static_argnames=("out_hw", "src_hw", "unpad_hw", "bgr_to_rgb", "dtype",
                     "normalize", "pad_to_canvas"),
)
def device_preprocess(frames: jnp.ndarray, src_hw: Tuple[int, int],
                      out_hw: Tuple[int, int],
                      unpad_hw: Tuple[int, int] | None = None,
                      bgr_to_rgb: bool = True, dtype=jnp.float32,
                      normalize: bool = True, pad_to_canvas: bool = True):
    """Fused on-device preprocessing for a (B, H, W, 3) uint8 batch.

    Bilinear-resizes to the letterbox rectangle for a *fixed* source size
    (one compiled graph per camera resolution — sequences have constant
    resolution), pads with 114, channel-swaps and scales to [0, 1].
    Returns NHWC (B, outH, outW, 3) in `dtype` (bf16 halves the resize's
    HBM traffic; detection deltas are far below score tolerance) plus the
    (ratio, (dw, dh)) needed to invert boxes.

    ``out_hw`` is the FINAL canvas (already stride-padded by the caller);
    the image is placed symmetrically in it — no `% stride` is re-applied
    here (the old stride=32 re-modulo mis-placed the image for stride-64
    P6 models whose caller pad exceeded 32). Pass ``unpad_hw`` (the exact
    resize target, e.g. from ``letterbox_params``) to reproduce the host
    letterbox's rounding bit-for-bit; if omitted it is derived from
    ``out_hw`` with auto=False.
    """
    if unpad_hw is None:
        r, (uw, uh), _ = letterbox_params(src_hw, out_hw, auto=False)
    else:
        uh, uw = unpad_hw
        r = min(uh / src_hw[0], uw / src_hw[1])
    dw = (out_hw[1] - uw) / 2
    dh = (out_hw[0] - uh) / 2
    x = _resize_linear(frames.astype(dtype), uh, uw)
    if not pad_to_canvas:
        # unpadded resize: the caller's stem conv absorbs the 114 band
        # via explicit conv padding + an exact per-row correction
        # (blocks._WPackConv bands) — the canvas-sized pad write
        # never happens. Probed alternatives: the original
        # full+dynamic_update_slice costs 0.78 ms/iter of data
        # formatting at w6@1088 b32, and a scale_and_translate-into-
        # canvas + fused 114-mask add measured WORSE (the add absorbed
        # the layout copy at 127 GB/s: 2.11 ms/iter, r5 trace).
        if normalize:
            if bgr_to_rgb:
                x = x[..., ::-1]
            return x / 255.0, (r, (dw, dh))
        return x, (r, (dw, dh))
    top = int(round(dh - 0.1))
    left = int(round(dw - 0.1))
    out = jnp.full(
        (frames.shape[0], out_hw[0], out_hw[1], 3), PAD_VALUE, dtype
    )
    out = jax.lax.dynamic_update_slice(out, x, (0, top, left, 0))
    if not normalize:
        # raw-scale BGR canvas (pad band stays 114): the width-packed
        # stem kernel absorbs the channel swap and the /255 scale
        # (models/wpack.stem_kernel_unpacked + blocks._WPackConv
        # raw_in) — drops a canvas-sized elementwise pass.
        return out, (r, (dw, dh))
    if bgr_to_rgb:
        out = out[..., ::-1]
    return out / 255.0, (r, (dw, dh))


def scale_coords_device(coords: jnp.ndarray, img1_hw, img0_hw,
                        do_round: bool = True):
    """Map xyxy boxes from letterboxed space back to the original frame
    (utils/general.py:319-340; .round() as in post_process_v7)."""
    gain = min(img1_hw[0] / img0_hw[0], img1_hw[1] / img0_hw[1])
    pad_x = (img1_hw[1] - img0_hw[1] * gain) / 2
    pad_y = (img1_hw[0] - img0_hw[0] * gain) / 2
    x1 = (coords[..., 0] - pad_x) / gain
    y1 = (coords[..., 1] - pad_y) / gain
    x2 = (coords[..., 2] - pad_x) / gain
    y2 = (coords[..., 3] - pad_y) / gain
    out = jnp.stack(
        [
            jnp.clip(x1, 0, img0_hw[1]),
            jnp.clip(y1, 0, img0_hw[0]),
            jnp.clip(x2, 0, img0_hw[1]),
            jnp.clip(y2, 0, img0_hw[0]),
        ],
        axis=-1,
    )
    if do_round:
        out = jnp.round(out)
    return out
