#!/usr/bin/env python
"""Per-op attribution table from a jax.profiler trace directory.

Aggregates XLA device ops by tf_op (falling back to HLO name), printing
time, achieved TFLOP/s, and HBM GB/s per row — the table VERDICT r4
asked for to attack the detector's MFU. Pure-host parsing of the
Chrome-trace json; no TPU session needed.

    python tools/trace_table.py /tmp/jaxtrace_r5_wpack [top_n]
"""

import collections
import glob
import gzip
import json
import sys


def load_events(trace_dir):
    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        raise SystemExit(f"no trace json under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        tr = json.load(f)
    return tr["traceEvents"]


def device_pids(events):
    return {e["pid"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in e["args"].get("name", "")}


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    events = load_events(trace_dir)
    pids = device_pids(events)
    tids = {(e["pid"], e["tid"]): e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"}

    rows = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0, "", ""])
    module_runs = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in pids:
            continue
        tname = tids.get((e["pid"], e["tid"]), "")
        if tname == "XLA Modules":
            module_runs[e["name"].split("(")[0]] += 1
            continue
        if tname != "XLA Ops":
            continue
        a = e.get("args", {})
        key = a.get("tf_op") or e["name"]
        r = rows[key]
        r[0] += e.get("dur", 0.0)                       # us
        r[1] += float(a.get("model_flops", 0) or 0)
        r[2] += float(a.get("raw_bytes_accessed", 0) or 0)
        r[3] += 1
        r[4] = a.get("hlo_category", "")
        r[5] = (a.get("source", "") or "").rsplit("/", 1)[-1]

    n_runs = max(module_runs.values()) if module_runs else 1
    total_us = sum(r[0] for r in rows.values())
    print(f"modules: {dict(module_runs)}  (per-iter = /{n_runs})")
    print(f"device total: {total_us / 1e3:.2f} ms, "
          f"{total_us / 1e3 / n_runs:.3f} ms/iter")
    print(f"{'ms/iter':>8} {'%':>5} {'TFLOP/s':>8} {'GB/s':>7} "
          f"{'n':>3}  op")
    for key, (us, fl, by, n, cat, src) in sorted(
            rows.items(), key=lambda kv: -kv[1][0])[:top_n]:
        tflops = fl / (us * 1e-6) / 1e12 if us else 0.0
        gbs = by / (us * 1e-6) / 1e9 if us else 0.0
        label = key.replace("jit(stage_fwd)/", "").replace(
            "/conv_general_dilated:", "")
        print(f"{us / 1e3 / n_runs:8.3f} {100 * us / total_us:5.1f} "
              f"{tflops:8.1f} {gbs:7.0f} {n // n_runs:3d}  "
              f"{label[:70]} [{cat}] {src}")


if __name__ == "__main__":
    main()
