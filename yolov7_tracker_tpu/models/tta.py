"""Test-time augmentation inference (reference Model.forward augment=True,
models/yolo.py:301-317): multi-scale (1, 0.83, 0.67) x flip (none, lr,
none) forwards with prediction de-scaling, concatenated for NMS."""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

SCALES = (1.0, 0.83, 0.67)
FLIPS = (None, "lr", None)


def _scale_img(x: jnp.ndarray, ratio: float, gs: int = 64) -> jnp.ndarray:
    """Resize then pad to gs-multiple (utils/torch_utils.scale_img)."""
    if ratio == 1.0:
        return x
    b, h, w, c = x.shape
    nh, nw = int(h * ratio), int(w * ratio)
    y = jax.image.resize(x, (b, nh, nw, c), "linear")
    ph = int((h * ratio // gs + 1) * gs) if nh % gs else nh
    pw = int((w * ratio // gs + 1) * gs) if nw % gs else nw
    ph, pw = max(ph, nh), max(pw, nw)
    out = jnp.full((b, ph, pw, c), 0.447, x.dtype)
    return jax.lax.dynamic_update_slice(out, y, (0, 0, 0, 0))


def forward_tta(model, variables, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, W, 3) -> concatenated decoded predictions (B, N_total, no)."""
    h, w = x.shape[1:3]
    outs: List[jnp.ndarray] = []
    for s, f in zip(SCALES, FLIPS):
        xi = _scale_img(jnp.flip(x, 2) if f == "lr" else x, s)
        y, _ = model.apply(variables, xi, training=False)
        y = jnp.concatenate([y[..., :4] / s, y[..., 4:]], axis=-1)
        if f == "lr":
            y = jnp.concatenate(
                [w - y[..., 0:1], y[..., 1:]], axis=-1
            )
        outs.append(y)
    return jnp.concatenate(outs, axis=1)
