#!/usr/bin/env python
"""Width-packing probe: measure each w6 front-layer conv baseline vs
its exact packed equivalent (models/wpack.py) at the real b32 @1088
shapes, verifying numerics on-device. Decides whether the packed
region ships (tools/tpu_r5_profile.py measured the baselines at
15-30 TFLOP/s; packed should run the ~150 the 128-channel convs do).

Run detached: setsid nohup python tools/tpu_pack_probe.py > /tmp/pack.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[pack {time.strftime('%H:%M:%S')}] {m}", flush=True)


def result(name, **kw):
    print(json.dumps({"measure": name, **kw}), flush=True)


def main():
    import jax

    from yolov7_tracker_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from yolov7_tracker_tpu.models import wpack

    log(f"device: {jax.devices()[0]}")
    B = 32
    rng = np.random.default_rng(0)

    def timeit(f, *args, n=24):
        v = f(*args)
        np.asarray(v)
        t0 = time.time()
        for _ in range(n):
            v = f(*args)
        np.asarray(v)
        return (time.time() - t0) / n

    def measure(name, h, w, cin, cout, k, s, pad=None, flavors=("base", "pack", "exit")):
        pad = k // 2 if pad is None else pad
        x = jnp.asarray(rng.normal(0, 1, (B, h, w, cin)).astype(np.float32))
        kern = jnp.asarray(
            rng.normal(0, 0.1, (k, k, cin, cout)).astype(np.float32))
        xb, kb = x.astype(jnp.bfloat16), kern.astype(jnp.bfloat16)

        def base_conv(x, kern):
            return jax.lax.conv_general_dilated(
                x, kern, (s, s), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        # timing fns return a SCALAR: fetching the full activation
        # would measure the ~20 MB/s tunnel, not the conv
        base = jax.jit(lambda x, kern: jnp.sum(
            base_conv(x, kern).astype(jnp.float32)))
        yb = jax.jit(base_conv)(xb, kb)
        flops = 2 * np.prod(np.asarray(yb.shape)) * k * k * cin
        dt = timeit(base, xb, kb)
        result(f"{name}_base", ms=round(dt * 1e3, 3),
               tflops=round(flops / dt / 1e12, 1),
               ms_per_frame=round(dt / B * 1e3, 4))

        for q in (2, 1):
            tag = {2: "pack", 1: "exit"}[q]
            if tag not in flavors or (q == 1 and s != 2):
                continue

            def packed_conv(x, kern, q=q):
                kp, sp, pads = wpack.pack_kernel(kern, s=s, pad=pad, q=q)
                y = jax.lax.conv_general_dilated(
                    wpack.pack_w(x), kp, (s, sp), ((pad, pad), pads),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return wpack.unpack_w(y) if q == 2 else y

            # numerics: ONE on-device max-abs-diff (scalar fetch)
            err = float(jax.jit(lambda x, kern: jnp.max(jnp.abs(
                packed_conv(x, kern).astype(jnp.float32)
                - base_conv(x, kern).astype(jnp.float32))))(xb, kb))
            ref = float(jnp.max(jnp.abs(yb.astype(jnp.float32))))
            packed = jax.jit(lambda x, kern: jnp.sum(
                packed_conv(x, kern).astype(jnp.float32)))
            dt = timeit(packed, xb, kb)
            result(f"{name}_{tag}", ms=round(dt * 1e3, 3),
                   eff_tflops=round(flops / dt / 1e12, 1),
                   ms_per_frame=round(dt / B * 1e3, 4),
                   max_err=round(err, 4), ref_max=round(ref, 2))

            # packed-resident (no pack/unpack at the boundary): the
            # in-region steady state where neighbors are packed too
            def packed_res_conv(xp, kern, q=q):
                kp, sp, pads = wpack.pack_kernel(kern, s=s, pad=pad, q=q)
                return jax.lax.conv_general_dilated(
                    xp, kp, (s, sp), ((pad, pad), pads),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            packed_res = jax.jit(lambda xp, kern: jnp.sum(
                packed_res_conv(xp, kern).astype(jnp.float32)))
            xp = jax.block_until_ready(wpack.pack_w(xb))
            dt = timeit(packed_res, xp, kb)
            result(f"{name}_{tag}_resident", ms=round(dt * 1e3, 3),
                   eff_tflops=round(flops / dt / 1e12, 1),
                   ms_per_frame=round(dt / B * 1e3, 4))

    # stem: folded-ReOrg 6x6/s2 on the raw image
    measure("stem6x6_3to64_640x1088", 640, 1088, 3, 64, 6, 2, pad=2)
    # L2: 3x3/s2 64->128 @ (320,544)
    measure("l2_64to128_s2_320x544", 320, 544, 64, 128, 3, 2)
    # L3: 1x1 128->64 @ (160,272)
    measure("l3_1x1_128to64_160x272", 160, 272, 128, 64, 1, 1)
    # L5-8: 3x3 64->64 @ (160,272) — the two 3.6 ms ops
    measure("elan_64to64_160x272", 160, 272, 64, 64, 3, 1)
    # L10: 1x1 256->128 @ (160,272)
    measure("l10_1x1_256to128_160x272", 160, 272, 256, 128, 1, 1)
    # L11 exit: 3x3/s2 128->256 @ (160,272)
    measure("l11_128to256_s2_160x272", 160, 272, 128, 256, 3, 2)
    # stage-3 anomaly: 3x3 128->128 @ (80,136) ran at 73 TF/s in-graph
    measure("stage3_128to128_80x136", 80, 136, 128, 128, 3, 1)
    # head conv: 1x1 256->255 @ (80,136) vs 256 outputs
    measure("head_1x1_256to255_80x136", 80, 136, 256, 255, 1, 1,
            flavors=("base",))
    measure("head_1x1_256to256_80x136", 80, 136, 256, 256, 1, 1,
            flavors=("base",))
    log("done")


if __name__ == "__main__":
    main()
