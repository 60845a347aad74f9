"""Model export (reference models/export.py analogue).

The torch reference exports TorchScript/ONNX/CoreML; the TPU-native
equivalents are:

- StableHLO text of the jitted inference graph (portable across XLA
  runtimes — the deployment IR for TPU serving);
- a serialized compiled executable for the current device (AOT);
- flax msgpack weights (utils/checkpoint.save_variables).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp


def export_stablehlo(model, variables, img_hw: Tuple[int, int],
                     out_path: str, batch: int = 1,
                     dtype=jnp.float32) -> str:
    """Lower the inference graph and write StableHLO text."""

    def infer(variables, x):
        decoded, _ = model.apply(variables, x, training=False)
        return decoded

    x = jax.ShapeDtypeStruct((batch, img_hw[0], img_hw[1], 3), dtype)
    lowered = jax.jit(infer).lower(variables, x)
    txt = lowered.as_text("stablehlo")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(txt)
    return out_path


def export_compiled_stats(model, variables, img_hw: Tuple[int, int],
                          batch: int = 1) -> dict:
    """AOT-compile and report cost analysis (FLOPs / bytes), the
    analogue of the reference's thop profiling (models/yolo.py:334-343)."""

    def infer(variables, x):
        decoded, _ = model.apply(variables, x, training=False)
        return decoded

    x = jax.ShapeDtypeStruct((batch, img_hw[0], img_hw[1], 3), jnp.float32)
    compiled = jax.jit(infer).lower(variables, x).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return {
        "flops": cost.get("flops", -1.0),
        "bytes_accessed": cost.get("bytes accessed", -1.0),
        "memory_mb": compiled.memory_analysis().temp_size_in_bytes / 1e6
        if compiled.memory_analysis() else -1.0,
    }
