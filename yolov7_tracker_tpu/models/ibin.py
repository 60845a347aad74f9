"""SigmoidBin decode for the IBin head (reference utils/loss.py:33-118,
models/yolo.py:161-233).

The head predicts, per value (w or h), 1 regression logit + bin_count
bin logits over [0, 4]; the decoded value is the argmax bin center plus
the scaled regression residual (use_fw_regression=True path,
loss.py:70-80). Inputs here are already sigmoided, matching the head's
``y = x.sigmoid()``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .spec import BIN_COUNT

BIN_MIN, BIN_MAX = 0.0, 4.0
_SCALE = BIN_MAX - BIN_MIN
_STEP = _SCALE / BIN_COUNT
_REG_SCALE = 2.0


def bin_centers() -> jnp.ndarray:
    start = BIN_MIN + _SCALE / 2.0 / BIN_COUNT
    return start + _STEP * jnp.arange(BIN_COUNT, dtype=jnp.float32)


def sigmoid_bin_decode(pred: jnp.ndarray) -> jnp.ndarray:
    """pred (..., bin_count+1) sigmoided -> decoded scalar (...,)."""
    reg = (pred[..., 0] * _REG_SCALE - _REG_SCALE / 2.0) * _STEP
    idx = jnp.argmax(pred[..., 1:], axis=-1)
    return bin_centers()[idx] + reg
