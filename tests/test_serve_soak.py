"""CI-scale soak of the serving loop (tools/serve_soak.py at reduced
tick count): 4 synthetic streams, injected stalls, SIGTERM + relaunch,
row/ID continuity, and bounded RSS. The full 10k-tick soak runs via
``python tools/serve_soak.py``; this keeps the same machinery green in
the slow lane."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_serve_soak_short(tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "serve_soak.py"),
         "--ticks", "400", "--workdir", str(tmp_path / "soak"),
         "--stall_every", "120"],
        capture_output=True, text=True, timeout=1200,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    summary = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith('{"soak"')][-1]
    )
    assert summary["soak"] == "pass"
    assert summary["ticks"] == 400 and summary["streams"] == 4
    # the preemption leg actually ran (SIGTERM mid-run -> relaunch)
    assert summary["phases"] == 2, summary


def test_synth_frames_deterministic_replay():
    from yolov7_tracker_tpu.data.sequence import SynthFrames

    import numpy as np

    a = list(SynthFrames("synth://6x24x32?seed=7&shift=3"))
    b = list(SynthFrames("synth://6x24x32?seed=7&shift=3"))
    assert len(a) == 6
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # frames actually move (tracking has something to follow)
    assert not np.array_equal(a[0], a[1])
