"""Training-step throughput on the attached device(s).

The inference bench (bench.py) covers the serving path; this measures
the pjit data-parallel training step (parallel/train_step.py — the
analogue of the reference's train.py/train_aux.py hot loop,
train.py:308-399) in imgs/s: forward + SimOTA loss (aux heads for P6
models) + backward + optimizer/EMA update, bf16 compute, batch sharded
over the data mesh.

Usage:
  python tools/train_bench.py                     # w6 @640, batch 8
  python tools/train_bench.py --model yolov7-tiny --img 640 --batch 32
  TRAIN_BENCH_REMAT=1 ...                         # rematerialized bwd

Prints one JSON line: {"model", "img", "batch", "imgs_per_s",
"step_ms", "device"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov7-w6")
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--labels", type=int, default=32)
    args = ap.parse_args()

    import jax

    from yolov7_tracker_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )
    enable_persistent_cache()

    import jax.numpy as jnp
    from jax.sharding import Mesh

    from yolov7_tracker_tpu.models import zoo
    from yolov7_tracker_tpu.parallel.train_step import (
        make_train_state,
        make_train_step,
    )

    spec = zoo.get_spec(args.model, nc=80)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    state = make_train_state(
        spec, img_size=args.img, rng=jax.random.PRNGKey(0), mesh=mesh
    )
    step = make_train_step(
        spec, mesh, img_size=args.img, compute_dtype="bfloat16",
        remat=bool(int(os.environ.get("TRAIN_BENCH_REMAT", "0"))),
    )

    rng = np.random.default_rng(0)
    b, L = args.batch, args.labels
    imgs = jnp.asarray(
        rng.uniform(0, 1, (b, args.img, args.img, 3)), jnp.float32
    )
    # plausible boxes: normalized cxcywh in [0.05, 0.95]
    cxy = rng.uniform(0.1, 0.9, (b, L, 2))
    wh = rng.uniform(0.02, 0.3, (b, L, 2))
    cls = rng.integers(0, 80, (b, L, 1))
    targets = jnp.asarray(
        np.concatenate([cls, cxy, wh], -1), jnp.float32
    )
    tmask = jnp.asarray(rng.uniform(size=(b, L)) < 0.5)

    print(f"[train_bench] compiling {args.model} @ {args.img} "
          f"batch {b} on {len(jax.devices())} device(s)...",
          file=sys.stderr)
    t0 = time.time()
    state, metrics = step(state, imgs, targets, tmask)
    np.asarray(metrics["loss"])  # D2H barrier (drains the dispatch queue)
    print(f"[train_bench] compiled+ran in {time.time() - t0:.1f}s "
          f"loss={float(np.asarray(metrics['loss'])):.3f}",
          file=sys.stderr)

    t0 = time.time()
    for _ in range(args.steps):
        state, metrics = step(state, imgs, targets, tmask)
    np.asarray(metrics["loss"])
    dt = (time.time() - t0) / args.steps

    # step FLOPs from XLA's own cost analysis -> achieved TFLOP/s and
    # MFU against the chip's bf16 peak (same pattern as bench.py's
    # detector MFU) so the training hot loop's efficiency is a tracked
    # number, not arithmetic from imgs/s
    tflops = mfu = flops_per_step = None
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197.0"))
    try:
        cost = step.lower(
            state, imgs, targets, tmask).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost["flops"])
        tflops = flops_per_step / dt / 1e12
        mfu = tflops / (peak * len(jax.devices()))
    except Exception as e:  # cost analysis is backend-best-effort
        print(f"[train_bench] cost analysis unavailable: {e}",
              file=sys.stderr)

    print(json.dumps({
        "model": args.model,
        "img": args.img,
        "batch": b,
        "imgs_per_s": round(b / dt, 2),
        "step_ms": round(dt * 1e3, 2),
        "step_gflops": (round(flops_per_step / 1e9, 1)
                        if flops_per_step else None),
        "tflops": round(tflops, 1) if tflops else None,
        "mfu": round(mfu, 3) if mfu else None,
        "device": str(jax.devices()[0]),
        "n_devices": len(jax.devices()),
    }))


if __name__ == "__main__":
    main()
