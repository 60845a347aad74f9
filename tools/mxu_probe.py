"""MXU micro-probe: measure bf16 vs int8 conv/matmul rates on the
attached device.

Motivates/validates the int8 serving mode (models/quant.py): on the
v5e runtime measured here, a pure s8xs8->s32 conv runs BELOW the bf16
MAC rate (73 vs 114 TFLOP/s at w6-like shapes), while the fused
quantize->int8-conv->dequant pattern gains ~10% from halved HBM
weight/activation traffic. Run this after runtime upgrades to re-check
whether int8 convs gained a native doubled-rate path.

Timing idiom for remote-attached (axon) runtimes: block_until_ready
can return before the dispatch queue drains, so every measurement
enqueues N calls and barriers with ONE small device-side reduction
fetched to host (D2H forces the drain; the transferred payload is one
scalar so the tunnel bandwidth doesn't pollute the number).

Usage: python tools/mxu_probe.py [--batch 16] [--hw 68] [--chan 320]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def bench_fn(f, *args, n: int = 100):
    import jax
    import jax.numpy as jnp

    for _ in range(3):
        r = f(*args)
    np.asarray(jnp.sum(r))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    np.asarray(jnp.sum(r))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, default=68)
    ap.add_argument("--chan", type=int, default=320)
    ap.add_argument("--reps", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print("device:", jax.devices()[0])
    B, H, W = args.batch, args.hw, args.hw
    C = K = args.chan
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    kb = jnp.asarray(rng.standard_normal((3, 3, C, K)), jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 127, (B, H, W, C)), jnp.int8)
    ki = jnp.asarray(rng.integers(-127, 127, (3, 3, C, K)), jnp.int8)
    ws = jnp.abs(jnp.asarray(rng.standard_normal(K), jnp.float32)) * 0.01

    dn = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def conv_bf16(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)

    @jax.jit
    def conv_int8(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    @jax.jit
    def conv_int8_qdq(x, k):
        # the exact pattern blocks._QuantConv emits
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / 0.05),
                     -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            q, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * ws).astype(jnp.bfloat16)

    flops = 2 * B * H * W * C * K * 9
    for name, f, a, b in [("bf16      ", conv_bf16, xb, kb),
                          ("int8      ", conv_int8, xi, ki),
                          ("int8+qdq  ", conv_int8_qdq, xb, ki)]:
        t = bench_fn(f, a, b, n=args.reps)
        print(f"conv {name}: {t: 8.4f} ms   {flops / t / 1e9:8.1f} "
              "TFLOP-equiv/s")

    M = N = Kd = 4096
    ab = jnp.asarray(rng.standard_normal((M, Kd)), jnp.bfloat16)
    bb = jnp.asarray(rng.standard_normal((Kd, N)), jnp.bfloat16)
    ai = jnp.asarray(rng.integers(-127, 127, (M, Kd)), jnp.int8)
    bi = jnp.asarray(rng.integers(-127, 127, (Kd, N)), jnp.int8)
    mm_b = jax.jit(lambda a, b: a @ b)
    mm_i = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32))
    fl = 2 * M * N * Kd
    for name, f, a, b in [("bf16", mm_b, ab, bb), ("int8", mm_i, ai, bi)]:
        t = bench_fn(f, a, b, n=args.reps)
        print(f"matmul 4096^3 {name}: {t: 8.4f} ms   "
              f"{fl / t / 1e9:8.1f} TFLOP-equiv/s")


if __name__ == "__main__":
    main()
