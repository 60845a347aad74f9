"""Post-training W8A8 quantization of the fused detector (TPU serving).

No reference counterpart: the reference serves fp16 (test.py:64-67,
track.py half()); this is a TPU-native lever — the v5e MXU runs int8
MACs at twice the bf16 rate, and the detector backbone is the dominant
per-frame cost. Opt-in (`PipelineConfig.quant="int8"`), heads always
stay in the compute dtype.

Scheme (standard static PTQ):
  * weights: symmetric int8, per-output-channel scales (absmax/127);
  * activations: symmetric int8, one static per-tensor scale per conv,
    measured by running the FUSED model over calibration batches with a
    flax method interceptor recording each ConvBnAct/RepConv input
    absmax (the interceptor sees the exact tensor the quantized conv
    will consume — including the raw pre-ReOrg image of folded stems);
  * detection heads (path "head*") and every block that is not a plain
    ConvBnAct/RepConv stay un-quantized.

The transform is tree-to-tree: `quantize_variables` turns
``fuse_variables`` output into the parameter tree of
``YoloV7(spec, fused="int8")`` (blocks._QuantConv leaves), so the
quantized model loads like any other variable set.

Accuracy caveat: calibration requires representative images; with the
synthetic calibration used in tests/bench the mode is a performance
measurement, not an accuracy claim — run real calibration data through
``calibrate`` before deploying.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from . import blocks, yolo
from .spec import ModelSpec

_EPS = 1e-12


def _is_quant_target(path: Tuple[str, ...]) -> bool:
    return not (path and path[0].startswith("head"))


def calibrate(spec: ModelSpec, fused_variables: Dict,
              batches: List[jax.Array]) -> Dict[Tuple[str, ...], float]:
    """Per-conv input absmax over calibration batches.

    Runs ``YoloV7(spec, fused=True)`` under jit with an interceptor
    that records ``max |input|`` for every ConvBnAct / RepConv call
    (the tensors the quantized convs will consume). Returns
    {module path: absmax} with paths like ("layer5", "cv1").
    """
    model = yolo.YoloV7(spec, fused=True)

    def one_batch(variables, x):
        vals: Dict[Tuple[str, ...], jax.Array] = {}

        def interceptor(next_fun, args, kwargs, context):
            m = context.module
            if (context.method_name == "__call__"
                    and isinstance(m, (blocks.ConvBnAct, blocks.RepConv))
                    and _is_quant_target(m.path)):
                amax = jnp.max(jnp.abs(args[0])).astype(jnp.float32)
                prev = vals.get(m.path)
                vals[m.path] = amax if prev is None else jnp.maximum(
                    prev, amax)
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            model.apply(variables, x, training=False)
        return vals

    jitted = jax.jit(one_batch)
    absmax: Dict[Tuple[str, ...], float] = {}
    for b in batches:
        vals = jax.device_get(jitted(fused_variables, b))
        for path, v in vals.items():
            absmax[path] = max(absmax.get(path, 0.0), float(v))
    return absmax


def default_calib_batches(rng: np.random.Generator, n: int = 2,
                          batch: int = 1, size: int = 384) -> List:
    """Synthetic calibration images: smooth low-frequency fields in
    [0, 1] (bilinearly upsampled noise) — closer to natural-image
    activation statistics than white noise, still NOT a substitute for
    real calibration data (see module docstring)."""
    out = []
    for _ in range(n):
        coarse = rng.uniform(0.0, 1.0, (batch, size // 16, size // 16, 3))
        img = jax.image.resize(
            jnp.asarray(coarse, jnp.float32), (batch, size, size, 3),
            method="bilinear",
        )
        out.append(jnp.clip(img, 0.0, 1.0))
    return out


def _quantize_conv(p: Dict, amax: float) -> Dict:
    k = np.asarray(jax.device_get(p["kernel"]), np.float32)
    w_absmax = np.max(np.abs(k), axis=(0, 1, 2))
    w_scale = np.maximum(w_absmax, _EPS) / 127.0
    qk = np.clip(np.round(k / w_scale), -127, 127).astype(np.int8)
    return {
        "kernel": jnp.asarray(qk),
        "w_scale": jnp.asarray(w_scale, jnp.float32),
        "bias": jnp.asarray(
            jax.device_get(p["bias"]), jnp.float32),
        "a_scale": jnp.asarray(max(amax, _EPS) / 127.0, jnp.float32),
    }


def _walk(node: Dict, path: Tuple[str, ...],
          absmax: Dict[Tuple[str, ...], float]) -> Dict:
    keys = set(node.keys())
    amax = absmax.get(path)
    if (keys == {"conv"} and isinstance(node["conv"], dict)
            and set(node["conv"]) == {"kernel", "bias"}
            and amax is not None and _is_quant_target(path)):
        return {"conv": _quantize_conv(node["conv"], amax)}
    if (keys == {"rbr_reparam"}
            and set(node["rbr_reparam"]) == {"kernel", "bias"}
            and amax is not None and _is_quant_target(path)):
        return {"rbr_reparam": _quantize_conv(node["rbr_reparam"], amax)}
    out = {}
    for key, val in node.items():
        out[key] = (_walk(val, path + (key,), absmax)
                    if isinstance(val, dict) else val)
    return out


def quantize_variables(spec: ModelSpec, fused_variables: Dict,
                       calib_batches: Optional[List] = None,
                       absmax: Optional[Dict] = None) -> Dict:
    """fuse_variables output -> variables for YoloV7(spec, fused="int8").

    Either pass precomputed ``absmax`` (from `calibrate`) or
    ``calib_batches`` ((B, H, W, 3) float images in [0, 1]); with
    neither, synthetic calibration batches are generated (performance
    mode — see module docstring).
    """
    if absmax is None:
        if calib_batches is None:
            calib_batches = default_calib_batches(
                np.random.default_rng(0))
        absmax = calibrate(spec, fused_variables, calib_batches)
    params = _walk(dict(fused_variables["params"]), (), absmax)
    return {"params": params, "batch_stats": {}}
