#!/usr/bin/env python
"""A/B the letterbox resize formulations on the real TPU at the bench
geometry (uint8 1080x1920 -> bf16 608x1088, b32).

The dense jax.image.resize lowering runs its banded matrices as full
matmuls (489 GFLOP/iter at ~166 TFLOP/s = 2.94 ms/iter, trace r5); the
naive blocked einsum has 64x fewer FLOPs but a degenerate W-axis dot
(free dims = C of 3) plus layout-assignment reshape copies that made it
NET SLOWER in-graph (1.50 -> 1.66 ms/frame). This probe measures the
candidates standalone to pick device_preprocess's default:

  dense      jax.image.resize (status quo)
  blocked    H/W block einsums in NHWC order (r5 first attempt)
  transpose  H einsum, transpose W<->H, W einsum wide, transpose back
  gather     2-tap constant-index take along each axis
  conv_w     H einsum + W as a grouped stride-30 conv (phases->channels)

Run detached: setsid nohup python tools/tpu_resize_probe.py > /tmp/rsz.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _resize_weight_block(src, dst):
    """One (T_b, S_b) block of the (block-diagonal, for these ratios)
    linear-resize weight matrix — same triangle weights jax.image.resize
    uses, contracted per block of gcd(src, dst)."""
    import math

    g = math.gcd(src, dst)
    tb, sb = dst // g, src // g
    f = (np.arange(dst, dtype=np.float64) + 0.5) * (src / dst) - 0.5
    w = np.clip(1.0 - np.abs(f[:, None] - np.arange(src)[None, :]),
                0.0, None)
    w /= w.sum(-1, keepdims=True)
    return w.reshape(g, tb, g, sb)[0, :, 0, :].astype(np.float32)


def main():
    import jax

    from yolov7_tracker_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", flush=True)
    B, H, W = 32, 1080, 1920
    UH, UW = 608, 1088
    rng = np.random.default_rng(0)
    dev = jax.device_put(rng.integers(0, 255, (B, H, W, 3), np.uint8))

    wh = _resize_weight_block(H, UH)   # (76, 135)
    ww = _resize_weight_block(W, UW)   # (17, 30)
    gh, gw = H // wh.shape[1], W // ww.shape[1]

    def h_block(x):
        b, h, w, c = x.shape
        x = x.reshape(b, gh, wh.shape[1], w, c)
        x = jnp.einsum("ts,bkswc->bktwc", jnp.asarray(wh, x.dtype), x)
        return x.reshape(b, UH, w, c)

    def dense(x):
        return jax.image.resize(x, (B, UH, UW, 3), method="linear",
                                antialias=False)

    def blocked(x):
        x = h_block(x)
        x = x.reshape(B, UH, gw, ww.shape[1], 3)
        x = jnp.einsum("ts,bhksc->bhktc", jnp.asarray(ww, x.dtype), x)
        return x.reshape(B, UH, UW, 3)

    def transpose(x):
        x = h_block(x)
        x = jnp.swapaxes(x, 1, 2)                  # (B, W, UH, 3)
        x = x.reshape(B, gw, ww.shape[1], UH, 3)
        x = jnp.einsum("ts,bkswc->bktwc", jnp.asarray(ww, x.dtype), x)
        return jnp.swapaxes(x.reshape(B, UW, UH, 3), 1, 2)

    def taps(src, dst):
        f = (np.arange(dst) + 0.5) * (src / dst) - 0.5
        i0 = np.clip(np.floor(f).astype(np.int32), 0, src - 2)
        fr = (f - i0).astype(np.float32)
        return jnp.asarray(i0), fr

    def gather(x):
        i0h, frh = taps(H, UH)
        i0w, frw = taps(W, UW)
        frh = jnp.asarray(frh, x.dtype)[None, :, None, None]
        frw = jnp.asarray(frw, x.dtype)[None, None, :, None]
        x = jnp.take(x, i0h, axis=1) * (1 - frh) + \
            jnp.take(x, i0h + 1, axis=1) * frh
        return jnp.take(x, i0w, axis=2) * (1 - frw) + \
            jnp.take(x, i0w + 1, axis=2) * frw

    def conv_w(x):
        x = h_block(x)
        # depthwise grouped conv: kernel (30, 1, 3*17), groups=3, out
        # channel layout (c, t) per conv semantics (group-major)
        k = np.zeros((ww.shape[1], 1, 3 * ww.shape[0]), np.float32)
        for c in range(3):
            k[:, 0, c * ww.shape[0]:(c + 1) * ww.shape[0]] = ww.T
        y = jax.lax.conv_general_dilated(
            x.reshape(B * UH, W, 3), jnp.asarray(k, x.dtype),
            (ww.shape[1],), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=3)
        y = y.reshape(B, UH, gw, 3, ww.shape[0])
        return jnp.transpose(y, (0, 1, 2, 4, 3)).reshape(B, UH, UW, 3)

    fns = {"dense": dense, "blocked": blocked, "transpose": transpose,
           "gather": gather, "conv_w": conv_w}
    ref = None
    for name, fn in fns.items():
        @jax.jit
        def run(frames, fn=fn):
            return fn(frames.astype(jnp.bfloat16))

        out = jax.block_until_ready(run(dev))
        if ref is None:
            ref = np.asarray(out, np.float32)
            err = 0.0
        else:
            err = float(np.abs(np.asarray(out, np.float32) - ref).max())
        t0 = time.time()
        n = 64
        for _ in range(n):
            out = run(dev)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / n * 1e3
        print(json.dumps({"measure": f"resize_{name}",
                          "ms_per_iter": round(ms, 3),
                          "ms_per_frame": round(ms / B, 4),
                          "max_err_vs_dense": round(err, 3)}), flush=True)


if __name__ == "__main__":
    main()
