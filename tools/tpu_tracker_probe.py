#!/usr/bin/env python
"""Single-stream tracker latency breakdown on the real TPU.

bench r3: tracker ~0.83 ms/frame single-stream vs 0.553 amortized over
16 vmapped streams. This probe decomposes the per-frame cost at the
bench shapes (capacity 128, det_capacity 300) into:

  full[load]   the real bytetrack_step scanned over frames, under the
               bench-like load (300 dets, all high-conf) and a mixed
               load (96 dets, scores U(0.1, 0.99))
  solve1       sequential stage-1-shaped solve_assignment chain
  solve23      the vmapped stage-2+3 pair chain
  iou          the (128, 300) IoU-distance chain (cost-matrix build)

plus phase-count sensitivity with agreement and scipy-exactness
checks, and auction sweep counts — so solver changes are measured
(speed, exactness) trades, not guesses.

Measured r4 (this probe, TPU v5e): per while-loop sweep costs ~20 us
regardless of matrix bytes (op-dispatch-bound); unrolling sweeps into
the loop body does NOT help (more sweeps execute, same per-sweep
cost) — the lever is SWEEP COUNT (phases / eps schedule), not per-
sweep work.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FRAMES = 128
CAP = 128
DETCAP = 300


def make_det_streams(n_frames, cap_d, n_obj, smin, smax, seed=0):
    """Association-like detection stream: persistent boxes in random
    walk, so consecutive frames' cost matrices are sparse IoU with
    frame-to-frame coherence (what a tracker actually solves)."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 1800, (n_obj, 2))
    wh = rng.uniform(30, 120, (n_obj, 2))
    frames = []
    for _ in range(n_frames):
        xy = xy + rng.normal(0, 4, xy.shape)
        tlbr = np.concatenate([xy, xy + wh], -1)
        score = rng.uniform(smin, smax, n_obj)
        pad = cap_d - n_obj
        frames.append((
            np.concatenate([tlbr, np.zeros((pad, 4))], 0),
            np.concatenate([score, np.zeros(pad)], 0),
            np.concatenate([np.ones(n_obj, bool), np.zeros(pad, bool)]),
        ))
    tlbr = np.stack([f[0] for f in frames]).astype(np.float32)
    score = np.stack([f[1] for f in frames]).astype(np.float32)
    valid = np.stack([f[2] for f in frames])
    return tlbr, score, valid


def timed(fn, reps=3):
    fn()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        np.asarray(out)
        best = min(best, time.time() - t0)
    return best


def main():
    import jax

    cache_dir = f"/root/repo/.jax_cache-{jax.default_backend()}"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    from yolov7_tracker_tpu.ops import assignment as A
    from yolov7_tracker_tpu.ops import boxes as boxops
    from yolov7_tracker_tpu.trackers import build_tracker
    from yolov7_tracker_tpu.trackers import slab as S
    from yolov7_tracker_tpu.trackers.slab import TrackerConfig

    print(f"device: {jax.devices()[0]}", flush=True)
    out = {}

    loads = {
        "bench": make_det_streams(N_FRAMES, DETCAP, 300, 0.55, 0.99),
        "mixed": make_det_streams(N_FRAMES, DETCAP, 96, 0.10, 0.99),
    }

    tcfg = TrackerConfig(tracker="bytetrack", conf_thresh=0.5,
                         capacity=CAP, det_capacity=DETCAP)
    step, tcfg = build_tracker(tcfg)
    slab0 = S.init_slab(tcfg)

    @jax.jit
    def scan_full(s, d):
        s, outs = jax.lax.scan(step, s, d)
        return outs.valid

    for name, (tlbr, score, valid) in loads.items():
        dets = S.DetSlab(
            tlbr=jnp.asarray(tlbr), score=jnp.asarray(score),
            cls=jnp.zeros((N_FRAMES, DETCAP)), valid=jnp.asarray(valid),
            feature=jnp.zeros((N_FRAMES, DETCAP, 0), jnp.float32),
            warp=jnp.tile(S.IDENTITY_WARP, (N_FRAMES, 1, 1)),
        )
        dt = timed(lambda: scan_full(slab0, dets))
        out[f"full_ms_{name}"] = round(dt / N_FRAMES * 1e3, 4)
        print(f"full step [{name}]: {out[f'full_ms_{name}']} ms/frame",
              flush=True)

    # ---- component chains at the bench-load shapes -------------------
    tlbr, score, valid = loads["bench"]
    rng = np.random.default_rng(3)
    t_tlbr = jnp.asarray(tlbr[0][:CAP], jnp.float32)
    costs = []
    for f in range(N_FRAMES):
        costs.append(np.asarray(
            1.0 - np.asarray(boxops.iou_matrix(
                t_tlbr, jnp.asarray(tlbr[f], jnp.float32)))))
    costs = jnp.asarray(np.stack(costs), jnp.float32)
    rmask = jnp.asarray(np.arange(CAP) < CAP)       # all tracks live
    cmask = jnp.asarray(valid[0])                   # all 300 high
    dets_tlbr = jnp.asarray(tlbr, jnp.float32)

    @jax.jit
    def iou_chain(dets_tlbr):
        def body(carry, d):
            c = boxops.iou_distance(t_tlbr + carry, d)
            return c[0, :1], c
        _, cs = jax.lax.scan(body, jnp.zeros((1,)), dets_tlbr)
        return cs

    dt = timed(lambda: iou_chain(dets_tlbr))
    out["iou_ms"] = round(dt / N_FRAMES * 1e3, 4)
    print(f"iou chain: {out['iou_ms']} ms/frame", flush=True)

    def chain(n_phases):
        @jax.jit
        def run(costs):
            def body(carry, c):
                r2c, _ = A.masked_assignment_v2(
                    c, rmask, cmask, 0.9, n_phases=n_phases)
                return r2c[:1].astype(jnp.float32), r2c
            _, rs = jax.lax.scan(body, jnp.zeros((1,)), costs)
            return rs
        return run

    def chain23(n_phases):
        # the vmapped stage-2+3 pair: same cost matrix, two mask pairs
        u_rows = jnp.stack([rmask & (jnp.arange(CAP) % 3 == 0),
                            rmask & (jnp.arange(CAP) % 5 == 0)])
        u_cols = jnp.stack([cmask & (jnp.arange(DETCAP) % 2 == 0),
                            cmask & (jnp.arange(DETCAP) % 4 == 0)])
        th = jnp.asarray([0.5, 0.7], jnp.float32)

        @jax.jit
        def run(costs):
            def body(carry, c):
                r2c, _ = jax.vmap(
                    A.masked_assignment_v2, in_axes=(None, 0, 0, 0),
                )(c, u_rows, u_cols, th)
                return r2c[0, :1].astype(jnp.float32), r2c
            _, rs = jax.lax.scan(body, jnp.zeros((1,)), costs)
            return rs
        return run

    ref_r2c = None
    for p in (5, 4, 3):
        run = chain(p)
        dt = timed(lambda: run(costs))
        r2c = np.asarray(run(costs))
        if ref_r2c is None:
            ref_r2c = r2c
        agree = float((r2c == ref_r2c).mean())
        out[f"solve1_ms_p{p}"] = round(dt / N_FRAMES * 1e3, 4)
        out[f"agree_p{p}"] = round(agree, 5)
        print(f"solve1 n_phases={p}: {out[f'solve1_ms_p{p}']} ms, "
              f"agreement vs p5: {agree:.5f}", flush=True)

    run23 = chain23(5)
    dt = timed(lambda: run23(costs))
    out["solve23_ms_p5"] = round(dt / N_FRAMES * 1e3, 4)
    print(f"solve23 pair n_phases=5: {out['solve23_ms_p5']} ms",
          flush=True)

    # ---- eps-schedule variants on the REAL step ----------------------
    # same final eps as the 5-phase/factor-4 baseline (scale/4^5), but
    # reached in fewer phases: fewer loop boundaries and re-settles.
    # Compared at the OUTPUT level (ids + boxes over the sequence).
    import functools

    import yolov7_tracker_tpu.trackers.bytetrack as BT

    orig_solver = BT.masked_assignment
    # step WITHOUT the registry's jax.jit wrapper: the jit cache would
    # otherwise serve the first trace (original solver) to every
    # patched variant, silently re-measuring the baseline
    step_raw = functools.partial(BT.bytetrack_step, cfg=tcfg)

    def make_solver(p, ff):
        def solver(cost, rm, cm, th):
            return A.masked_assignment_v2(
                cost, rm, cm, th, n_phases=p, phase_factor=ff)
        return solver

    base_outs = {}
    for name, (tlbr_, score_, valid_) in loads.items():
        dets = S.DetSlab(
            tlbr=jnp.asarray(tlbr_), score=jnp.asarray(score_),
            cls=jnp.zeros((N_FRAMES, DETCAP)), valid=jnp.asarray(valid_),
            feature=jnp.zeros((N_FRAMES, DETCAP, 0), jnp.float32),
            warp=jnp.tile(S.IDENTITY_WARP, (N_FRAMES, 1, 1)),
        )
        for (p, ff) in ((5, 4.0), (3, 10.0), (2, 32.0)):
            BT.masked_assignment = make_solver(p, ff)

            @jax.jit
            def scan2(s, d):
                s, outs = jax.lax.scan(
                    lambda c, dd: step_raw(c, dd), s, d)
                return outs
            dt = timed(lambda: np.asarray(scan2(slab0, dets).valid))
            outs = scan2(slab0, dets)
            key = f"step_ms_{name}_p{p}_f{int(ff)}"
            out[key] = round(dt / N_FRAMES * 1e3, 4)
            ids = np.asarray(outs.track_id)
            vv = np.asarray(outs.valid)
            if (p, ff) == (5, 4.0):
                base_outs[name] = (ids, vv)
                agree = 1.0
            else:
                bi, bv = base_outs[name]
                agree = float(((ids == bi) & (vv == bv)).mean())
            out[f"outagree_{name}_p{p}_f{int(ff)}"] = round(agree, 6)
            print(f"real step [{name}] p{p} f{ff}: {out[key]} ms/frame, "
                  f"output agreement {agree:.6f}", flush=True)
    # solver share floor: replace the auction with a one-sweep greedy
    # (NOT a valid matching — purely a cost floor for the solver share)
    def greedy(cost, rm, cm, th):
        n, m = cost.shape
        j = jnp.argmin(jnp.where(cm[None, :], cost, 1e9),
                       axis=1).astype(jnp.int32)
        ok = rm & (cost[jnp.arange(n), j] <= th)
        r2c = jnp.where(ok, j, -1)
        c2r = jnp.full((m,), -1, jnp.int32).at[
            jnp.where(ok, j, m)].set(
            jnp.where(ok, jnp.arange(n, dtype=jnp.int32), -1),
            mode="drop")
        return r2c, c2r

    for name, (tlbr_, score_, valid_) in loads.items():
        dets = S.DetSlab(
            tlbr=jnp.asarray(tlbr_), score=jnp.asarray(score_),
            cls=jnp.zeros((N_FRAMES, DETCAP)), valid=jnp.asarray(valid_),
            feature=jnp.zeros((N_FRAMES, DETCAP, 0), jnp.float32),
            warp=jnp.tile(S.IDENTITY_WARP, (N_FRAMES, 1, 1)),
        )
        BT.masked_assignment = greedy

        @jax.jit
        def scan3(s, d):
            s, outs = jax.lax.scan(lambda c, dd: step_raw(c, dd), s, d)
            return outs
        dt = timed(lambda: np.asarray(scan3(slab0, dets).valid))
        out[f"step_ms_{name}_greedy"] = round(dt / N_FRAMES * 1e3, 4)
        print(f"real step [{name}] greedy solver: "
              f"{out[f'step_ms_{name}_greedy']} ms/frame", flush=True)

    BT.masked_assignment = orig_solver

    # scipy exactness on a subset (bench-load stage-1 matrices)
    sub = np.asarray(costs[:16])
    for p in (5, 3):
        run = chain(p)
        r2c = np.asarray(run(costs))[:16]
        n_same = n_tot = 0
        for f in range(16):
            c = sub[f].copy()
            matches, _, _ = A.linear_assignment_host(c, 0.9)
            ref = np.full(CAP, -1, np.int64)
            if len(matches):
                ref[np.asarray(matches)[:, 0]] = np.asarray(matches)[:, 1]
            n_same += int((r2c[f] == ref).sum())
            n_tot += CAP
        out[f"scipy_exact_p{p}"] = round(n_same / n_tot, 5)
        print(f"scipy exactness p{p}: {out[f'scipy_exact_p{p}']}",
              flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
