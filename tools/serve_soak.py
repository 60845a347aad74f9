#!/usr/bin/env python
"""Soak test for the multi-camera serving loop (cli/serve.py).

The unit tests exercise the fault machinery at ~dozen-tick scale; the
production claim is hours. This drives serve end-to-end at thousands
of ticks with everything the field throws at it:

  * 4 synthetic camera streams (data/sequence.SynthFrames) with
    deterministic motion so tracks persist;
  * injected stalls on one stream (reader sleeps > --stall_timeout,
    forcing the freeze -> coast -> rejoin path repeatedly);
  * one SIGTERM mid-run + relaunch (the preemption contract: exit 75,
    state checkpointed, txts appended — never clobbered);
  * RSS sampled throughout (memory must plateau, not creep).

Asserts, per stream: every frame 1..N present in the MOT txt exactly
once per (frame, id); ids never reset across the resume; the pre-kill
rows are byte-identical after the relaunch; RSS growth from the 25% to
the 95% mark of each phase's steady-state window (samples taken after
the first output row appears — the JAX compile/warmup ramp is a fixed
cost, not a leak) stays under --rss_slack.

    python tools/serve_soak.py              # 10k ticks (~minutes, CPU)
    python tools/serve_soak.py --ticks 600  # CI-scale

Exit 0 = soak passed; prints one JSON line with the evidence.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(m):
    print(f"[soak {time.strftime('%H:%M:%S')}] {m}", flush=True)


def make_checkpoint(path):
    """Random-init yolov7-tiny with sharpened heads (bench.py's load
    tuning) so synthetic frames yield a steady detection load."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from yolov7_tracker_tpu.models import yolo, zoo
    from yolov7_tracker_tpu.utils import checkpoint

    spec = zoo.get_spec("yolov7-tiny", nc=1)
    _, variables = yolo.build_model(spec, img_size=96, init="random")
    params = dict(variables["params"])
    for k, v in params.items():
        if not k.startswith("head_m"):
            continue
        v = dict(v)
        v["kernel"] = v["kernel"] * 8.0
        b = np.asarray(v["bias"]).reshape(spec.na, spec.no).copy()
        b[:, 4] += 6.0
        b[:, 5:] += 6.0
        v["bias"] = b.reshape(-1)
        params[k] = v
    checkpoint.save_variables(
        path, {"params": params, "batch_stats": variables["batch_stats"]})
    return path


def read_txt(path):
    rows = []
    if not os.path.isfile(path):
        return rows
    with open(path) as f:
        for line in f:
            p = line.strip().split(",")
            if len(p) >= 6:
                rows.append((int(float(p[0])), int(float(p[1]))))
    return rows


def rss_kb(pid):
    try:
        with open(f"/proc/{pid}/statm") as f:
            return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") // 1024
    except OSError:
        return None


def _txt_sizes(save_dir):
    try:
        return {t: os.path.getsize(os.path.join(save_dir, t))
                for t in os.listdir(save_dir) if t.endswith(".txt")}
    except OSError:
        return {}


def run_phase(cmd, kill_after_frames=None, watch_txt=None, env=None,
              save_dir=None):
    """Run serve; optionally SIGTERM once watch_txt reaches
    kill_after_frames. Returns (returncode, rss_samples, output,
    sigterm_sent, steady_idx) where steady_idx is the first RSS-sample
    index taken AFTER serving demonstrably started (a txt grew beyond
    its size at phase start) — the compile/warmup ramp before that
    point is fixed-cost, not steady-state, and must not count as
    'memory creep' at short tick counts."""
    sizes0 = _txt_sizes(save_dir) if save_dir else {}
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env)
    rss = []
    sent = False
    steady_idx = None
    while proc.poll() is None:
        time.sleep(0.5)
        r = rss_kb(proc.pid)
        if r:
            rss.append(r)
        if steady_idx is None and save_dir:
            now = _txt_sizes(save_dir)
            if any(now[t] > sizes0.get(t, 0) for t in now):
                steady_idx = len(rss)
        if (kill_after_frames and not sent and watch_txt
                and os.path.isfile(watch_txt)):
            rows = read_txt(watch_txt)
            if rows and rows[-1][0] >= kill_after_frames:
                log(f"SIGTERM at frame {rows[-1][0]}")
                proc.send_signal(signal.SIGTERM)
                sent = True
    out = proc.stdout.read()
    return proc.returncode, rss, out, sent, steady_idx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=10000)
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--hw", default="96x160")
    ap.add_argument("--img", type=int, default=96)
    ap.add_argument("--workdir", default="/tmp/serve_soak")
    ap.add_argument("--rss_slack", type=float, default=0.25,
                    help="max allowed RSS growth 25%%->95%% of a phase")
    ap.add_argument("--stall_every", type=int, default=0,
                    help="stall injection period on stream 0 "
                         "(default ticks//6)")
    ap.add_argument("--dump_rss", default="",
                    help="write per-phase RSS sample curves (KB, 0.5 s "
                         "cadence) to this JSON path for leak triage")
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split("x"))
    n = args.ticks
    wd = args.workdir
    import shutil

    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(wd, exist_ok=True)

    log("building sharpened tiny checkpoint...")
    ckpt = make_checkpoint(os.path.join(wd, "tiny_sharp.msgpack"))

    stall_every = args.stall_every or max(50, n // 6)
    stalls = ",".join(f"{f}:1.5" for f in range(stall_every, n,
                                                stall_every))
    streams = [f"synth://{n}x{h}x{w}?seed={i}&shift=2"
               + (f"&stall={stalls}" if i == 0 else "")
               for i in range(args.streams)]
    save_dir, state_dir = os.path.join(wd, "out"), os.path.join(wd, "state")
    cmd = [sys.executable, "-m", "yolov7_tracker_tpu.cli.serve",
           "--streams", *streams,
           "--model", "yolov7-tiny", "--nc", "1",
           "--model_path", ckpt, "--img_size", str(args.img),
           "--det_capacity", "16", "--capacity", "32",
           "--conf_thresh", "0.3",
           "--stall_timeout", "0.5", "--state_ckpt_every", "50",
           "--save_dir", save_dir, "--state_dir", state_dir]
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    from yolov7_tracker_tpu.cli.serve import _stream_name

    names = [_stream_name(i, s) for i, s in enumerate(streams)]
    # watch a stall-free stream's txt: its frame counter tracks wall
    # progress (stream 0 freezes during injected stalls)
    watch = os.path.join(save_dir, names[1] + ".txt")

    log(f"phase A: {args.streams} streams x {n} frames, SIGTERM at ~50%")
    rc_a, rss_a, out_a, sent, steady_a = run_phase(
        cmd, kill_after_frames=n // 2, watch_txt=watch, env=env,
        save_dir=save_dir)
    if not sent:
        # first run finished before the watcher armed (tiny tick
        # counts) — treat as single-phase soak
        log(f"phase A ran to completion (rc={rc_a}) — no preemption leg")
    txts = sorted(os.listdir(save_dir)) if os.path.isdir(save_dir) else []
    assert len(txts) == args.streams, (txts, out_a[-2000:])

    evidence = {"phases": 1, "rc_a": rc_a}
    pre_rows = {t: read_txt(os.path.join(save_dir, t)) for t in txts}
    phases_rss = [rss_a[steady_a or 0:]]

    if sent or rc_a == 75:
        assert rc_a == 75, (rc_a, out_a[-2000:])
        max_id_pre = {t: max((i for _, i in r), default=0)
                      for t, r in pre_rows.items()}
        log(f"phase B: relaunch to completion "
            f"(pre-kill rows: {[len(r) for r in pre_rows.values()]})")
        rc_b, rss_b, out_b, _, steady_b = run_phase(
            cmd, env=env, save_dir=save_dir)
        assert rc_b == 0, (rc_b, out_b[-2000:])
        evidence.update(phases=2, rc_b=rc_b)
        for t in txts:
            rows = read_txt(os.path.join(save_dir, t))
            k = len(pre_rows[t])
            assert rows[:k] == pre_rows[t], \
                f"{t}: relaunch rewrote pre-kill rows"
            post_new = {i for _, i in rows[k:]} - {i for _, i in rows[:k]}
            if post_new:
                assert min(post_new) > max_id_pre[t], \
                    f"{t}: id counter reset across resume"
        phases_rss.append(rss_b[steady_b or 0:])

    # row integrity per stream: every frame 1..n exactly once per id,
    # and full frame coverage (stalled stream included — it rejoins and
    # finishes its source)
    total_rows = 0
    for t in txts:
        rows = read_txt(os.path.join(save_dir, t))
        total_rows += len(rows)
        frames = [f for f, _ in rows]
        assert frames == sorted(frames), f"{t}: rows out of frame order"
        covered = set(frames)
        missing = [f for f in range(1, n + 1) if f not in covered]
        assert not missing, f"{t}: missing frames {missing[:10]}..."
        assert max(covered) == n, f"{t}: ran past source length?"
        assert len(set(rows)) == len(rows), f"{t}: duplicate (frame,id)"

    if args.dump_rss:
        with open(args.dump_rss, "w") as f:
            json.dump({"phases_rss_kb": phases_rss}, f)

    # memory: within EACH phase's steady-state window, RSS growth
    # between the 25% and 95% marks must be a plateau, not a creep
    # (phases are separate processes; comparing across them is
    # meaningless). Phases too short to judge (<8 steady samples)
    # contribute nothing.
    q = lambda xs, f: xs[min(int(len(xs) * f), len(xs) - 1)]
    growth = max(
        ((q(r, 0.95) - q(r, 0.25)) / max(q(r, 0.25), 1)
         for r in phases_rss if len(r) >= 8),
        default=0.0,
    )
    assert growth < args.rss_slack, \
        f"RSS grew {growth * 100:.1f}% between 25% and 95% marks"

    r0 = max(phases_rss, key=len)
    evidence.update(
        ticks=n, streams=args.streams, total_rows=total_rows,
        rss_25_mb=round(q(r0, 0.25) / 1024, 1) if r0 else None,
        rss_95_mb=round(q(r0, 0.95) / 1024, 1) if r0 else None,
        rss_growth_pct=round(growth * 100, 1),
        stalls_injected=len(stalls.split(",")) if stalls else 0,
    )
    print(json.dumps({"soak": "pass", **evidence}))


if __name__ == "__main__":
    main()
