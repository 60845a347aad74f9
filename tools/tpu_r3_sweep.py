#!/usr/bin/env python
"""Round-3 TPU measurement session — everything in ONE process (the
axon tunnel grants one client at a time and each new process can wait
10-20 min for the grant).

Measures, in order:
  1. tracker single-stream ms/frame at det_capacity 300 vs 64 with the
     lockstep stage-2+3 ByteTrack (the round-2 number was 1.96 ms at
     cap 64 with 3 sequential solves);
  2. detector forward-only vs detect_batch (NMS + rescale share);
  3. batch sweep for w6@1088 at the new config;
  4. resident-pipeline INVALID_ARGUMENT flake repro: w6 pipeline
     resident, then the vmapped seq-par tracker scan in the SAME
     process (bench.py:246-251 works around this in a subprocess);
  5. full bench.py main() inline for the headline numbers.

Writes JSON lines to stdout; run detached:
  setsid nohup python tools/tpu_r3_sweep.py > /tmp/r3sweep.log 2>&1 &
"""

import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[sweep {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def result(name, **kw):
    print(json.dumps({"measure": name, **kw}), flush=True)


def main():
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"
    )
    cache_dir = f"{cache_dir}-{jax.default_backend()}"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    log(f"device: {jax.devices()[0]}")

    from yolov7_tracker_tpu.trackers import build_tracker
    from yolov7_tracker_tpu.trackers import slab as S
    from yolov7_tracker_tpu.trackers.slab import TrackerConfig

    # ---- 1. tracker-only single-stream scan at cap 300 and 64 ---------
    def tracker_ms(det_cap, frames=256, streams=1):
        tcfg = TrackerConfig(tracker="bytetrack", conf_thresh=0.5,
                             capacity=128, det_capacity=det_cap)
        step, tcfg = build_tracker(tcfg)
        d = tcfg.det_capacity
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        shape = (frames, streams, d) if streams > 1 else (frames, d)
        xy = jax.random.uniform(k1, shape + (2,), minval=0, maxval=1800)
        wh = jax.random.uniform(k2, shape + (2,), minval=20, maxval=120)
        nvalid = min(d, 48) if det_cap <= 64 else 250
        dets = S.DetSlab(
            tlbr=jnp.concatenate([xy, xy + wh], -1),
            score=jax.random.uniform(k3, shape, minval=0.1, maxval=0.99),
            cls=jnp.zeros(shape),
            valid=jnp.broadcast_to(jnp.arange(d) < nvalid, shape),
            feature=jnp.zeros(shape + (0,), jnp.float32),
            warp=jnp.broadcast_to(S.IDENTITY_WARP, shape[:-1] + (2, 3)),
        )
        slab0 = S.init_slab(tcfg)
        if streams > 1:
            slab0 = jax.tree.map(
                lambda x: jnp.stack([x] * streams, 0), slab0)
            vstep = jax.vmap(step)

            @jax.jit
            def scan(s, dd):
                return jax.lax.scan(lambda c, d_: vstep(c, d_), s, dd)
        else:
            @jax.jit
            def scan(s, dd):
                return jax.lax.scan(lambda c, d_: step(c, d_), s, dd)

        t0 = time.time()
        _, outs = scan(slab0, dets)
        np.asarray(outs.valid)
        compile_s = time.time() - t0
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            _, outs = scan(slab0, dets)
            np.asarray(outs.valid)
        ms = (time.time() - t0) / (reps * frames * streams) * 1e3
        return ms, compile_s

    for cap in (300, 64):
        ms, cs = tracker_ms(cap)
        result("tracker_single_stream", det_capacity=cap,
               ms_per_frame=round(ms, 3), compile_s=round(cs, 1))
    ms16, _ = tracker_ms(300, streams=16)
    result("tracker_16stream", det_capacity=300,
           ms_per_frame=round(ms16, 3))

    # ---- 2+3. detector forward vs detect + batch sweep ---------------
    sys.argv = [sys.argv[0]]
    os.environ.setdefault("BENCH_DET_CAP", "300")
    import bench

    model, img = "yolov7-w6", 1088
    src_hw = (1080, 1920)
    for batch in (16, 24, 32):
        try:
            pipe = bench.build_pipeline(model, img, batch)
            rng = np.random.default_rng(0)
            f0 = rng.integers(0, 255, (batch,) + src_hw + (3,), np.uint8)
            dev = jax.device_put(f0)
            # forward-only (no NMS): model.apply on preprocessed input
            from yolov7_tracker_tpu.data import letterbox as LB

            r, (uw, uh), (dw, dh) = LB.letterbox_params(
                src_hw, (img, img), stride=64)
            top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
            left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
            out_h, out_w = uh + top + bottom, uw + left + right

            @jax.jit
            def fwd(variables, frames_u8):
                imgs, _ = LB.device_preprocess(
                    frames_u8, src_hw, (out_h, out_w), unpad_hw=(uh, uw),
                    dtype=jnp.bfloat16)
                _, raw = pipe.model.apply(variables, imgs, training=False)
                # cheap reduction forces execution of the whole net
                return sum(jnp.sum(r_[..., 0].astype(jnp.float32))
                           for r_ in raw)

            v = fwd(pipe.variables, dev)
            np.asarray(v)
            n = 96 // (batch // 16)
            t0 = time.time()
            for _ in range(n):
                v = fwd(pipe.variables, dev)
            np.asarray(v)
            fwd_ms = (time.time() - t0) / (n * batch) * 1e3

            out = pipe.detect_batch(dev)
            np.asarray(out[3])
            t0 = time.time()
            for _ in range(n):
                out = pipe.detect_batch(dev)
            np.asarray(out[3])
            det_ms = (time.time() - t0) / (n * batch) * 1e3
            result("detector_split", batch=batch,
                   forward_ms=round(fwd_ms, 3),
                   detect_ms=round(det_ms, 3),
                   nms_rescale_ms=round(det_ms - fwd_ms, 3))

            # fused pipeline step at this batch
            slab = pipe.init_tracker()
            warps = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None],
                             (batch, 1, 1))
            slab, outs = pipe.process_batch(slab, dev, warps)
            jax.block_until_ready(outs.valid)
            slab = pipe.init_tracker()
            t0 = time.time()
            prev = None
            for _ in range(n):
                slab, outs = pipe.process_batch(slab, dev, warps)
                packed = pipe.pack_output(outs)
                packed.copy_to_host_async()
                if prev is not None:
                    np.asarray(prev)
                prev = packed
            np.asarray(prev)
            fps = (n * batch) / (time.time() - t0)
            result("fused_step", batch=batch, fps=round(fps, 2),
                   det_capacity=int(os.environ["BENCH_DET_CAP"]))
            if batch == 16:
                w6_pipe = pipe  # keep resident for the flake repro
            else:
                del pipe
        except Exception:
            result("batch_error", batch=batch,
                   error=traceback.format_exc()[-2000:])

    # ---- 4. resident-pipeline seq-par flake repro ---------------------
    log("flake repro: seq-par scan with w6 pipeline resident...")
    try:
        ms = None
        tcfg = TrackerConfig(tracker="bytetrack", conf_thresh=0.5,
                             capacity=128, det_capacity=300)
        step, tcfg = build_tracker(tcfg)
        nseq, frames = 16, 64
        d = tcfg.det_capacity
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        xy = jax.random.uniform(k1, (frames, nseq, d, 2), minval=0,
                                maxval=1800)
        wh = jax.random.uniform(k2, (frames, nseq, d, 2), minval=20,
                                maxval=120)
        det_streams = S.DetSlab(
            tlbr=jnp.concatenate([xy, xy + wh], -1),
            score=jax.random.uniform(k3, (frames, nseq, d), minval=0.1,
                                     maxval=0.99),
            cls=jnp.zeros((frames, nseq, d)),
            valid=jnp.tile((jnp.arange(d) < 48)[None, None],
                           (frames, nseq, 1)),
            feature=jnp.zeros((frames, nseq, d, 0), jnp.float32),
            warp=jnp.tile(S.IDENTITY_WARP, (frames, nseq, 1, 1)),
        )
        slabs = jax.tree.map(
            lambda x: jnp.stack([x] * nseq, 0), S.init_slab(tcfg))
        vstep = jax.vmap(step)

        @jax.jit
        def scan(s, dd):
            return jax.lax.scan(lambda c, d_: vstep(c, d_), s, dd)

        _, outs = scan(slabs, det_streams)
        np.asarray(outs.valid)
        t0 = time.time()
        for _ in range(3):
            _, outs = scan(slabs, det_streams)
            np.asarray(outs.valid)
        ms = (time.time() - t0) / (3 * frames * nseq) * 1e3
        result("flake_repro", ok=True, ms_per_frame=round(ms, 4),
               note="seq-par scan ran WITH w6 pipeline resident")
    except Exception:
        err = traceback.format_exc()
        result("flake_repro", ok=False, error=err[-3000:])
        # bisect: does a fresh smaller scan work? does dropping the
        # pipeline's buffers fix it?
        try:
            del w6_pipe
            import gc

            gc.collect()
            _, outs = scan(slabs, det_streams)
            np.asarray(outs.valid)
            result("flake_repro_after_free", ok=True,
                   note="works after freeing the w6 pipeline buffers"
                        " -> live-buffer/memory pressure trigger")
        except Exception:
            result("flake_repro_after_free", ok=False,
                   error=traceback.format_exc()[-2000:])

    # ---- 5. full bench ------------------------------------------------
    log("running bench.main() inline...")
    try:
        bench.main()
    except SystemExit:
        pass
    except Exception:
        result("bench_error", error=traceback.format_exc()[-3000:])


if __name__ == "__main__":
    main()
